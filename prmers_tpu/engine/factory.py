"""Engine factory and backend selection.

Analog of the reference's backend configuration + factory
(reference: src/marin/gpu.cpp:26-152 configure_gpu_backend/create_gpu).
Backends:
  * "jax"    — device engine (TPU when available, else CPU XLA)
  * "numpy"  — host oracle engine (testing / tiny exponents)
  * "auto"   — jax unless overridden via PRMERS_BACKEND
"""

from __future__ import annotations

import os

from .api import Engine

_BACKEND = "auto"
_WORKLOAD = "generic"


def configure_backend(backend: str, workload: str = "generic") -> None:
    global _BACKEND, _WORKLOAD
    assert backend in ("auto", "jax", "numpy")
    _BACKEND = backend
    _WORKLOAD = workload


def configured_backend() -> str:
    return _BACKEND


def create_engine(p: int, reg_count: int, backend: str | None = None,
                  device=None) -> Engine:
    b = backend or os.environ.get("PRMERS_BACKEND") or _BACKEND
    if b == "auto":
        b = "jax"
    if b == "numpy":
        from .np_engine import NumpyEngine
        return NumpyEngine(p, reg_count)
    if b == "jax":
        from .jax_engine import JaxEngine
        return JaxEngine(p, reg_count, device=device)
    raise ValueError(f"unknown backend {b!r}")
