"""Engine factory and backend selection.

Analog of the reference's backend configuration + factory
(reference: src/marin/gpu.cpp:26-152 configure_gpu_backend/create_gpu).
Backends:
  * "pallas" — fused Pallas TPU kernel engine (power-of-two n >= 2^14)
  * "jax"    — XLA device engine (any transform size; TPU or CPU)
  * "numpy"  — host oracle engine (testing / tiny exponents)
  * "auto"   — pallas when eligible on TPU, else jax (the workload-aware
               auto policy analog of src/aevum/AutoPolicy.cpp:36-152)
"""

from __future__ import annotations

import os
import sys

from .api import Engine

_BACKEND = "auto"
_WORKLOAD = "generic"


def configure_backend(backend: str, workload: str = "generic") -> None:
    global _BACKEND, _WORKLOAD
    assert backend in ("auto", "jax", "numpy", "pallas", "sharded")
    _BACKEND = backend
    _WORKLOAD = workload


def _pallas_eligible(p: int) -> bool:
    """Pallas path needs n in {2^k, 5*2^k} big enough for the MXU weight
    folds (rs.L1 >= 32), small enough for the VMEM-resident fused-C
    variant tables (the four-step caps: R <= 8192/20480, C <= 8192,
    ca_count <= 64 — covers the full reference ladder incl. n = 2^26
    and MM31's 5*2^25), and a TPU device. Probes the actual kernel plan
    so shape-cap changes can never make the factory hand out an engine
    that asserts."""
    import os as _os
    if _os.environ.get("PRMERS_NO_PALLAS"):
        return False
    from ..core.plan import cached_plan
    plan = cached_plan(p)
    n = plan.n
    if n % 5 == 0:
        base = n // 5
        if base & (base - 1) or n < 163840:
            return False
    elif n & (n - 1) or n < (1 << 15):
        return False
    try:
        from ..ops.pallas.fourstep import FourStepPlan
        fp = FourStepPlan.from_plan(plan)
    except AssertionError:
        return False        # beyond the kernel plan's shape caps
    C, ca = fp.C, fp.C // 128
    if (C % 128 or fp.rs.L1 < 32 or ca < 2 or ca & (ca - 1)
            or ca > 64):
        return False        # fused-C tables would not attach / fit VMEM
    try:
        from .. import jaxconf  # noqa: F401
        import jax
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


def _mesh_auto_eligible(p: int) -> bool:
    """auto -> the sharded mesh-Pallas engine when the job has more than
    one TPU chip and the shape runs the fused kernel pipeline (the
    multi-chip analog of the reference's one-fast-engine rule)."""
    import os as _os
    if _os.environ.get("PRMERS_NO_PALLAS") or \
            _os.environ.get("PRMERS_SHARDED_IMPL") == "xla":
        return False
    try:
        from .. import jaxconf  # noqa: F401
        import jax
        if jax.devices()[0].platform in ("cpu",) or len(jax.devices()) < 2:
            return False
        from ..parallel.mesh_engine import mesh_pallas_eligible
        return mesh_pallas_eligible(p)
    except Exception:
        return False


def _mesh_beats_pallas(p: int, reg_count: int) -> bool:
    """Record-driven single-chip routing (VERDICT r4 next #4): prefer
    MeshPallasEngine on a 1-device mesh over PallasEngine when the tune
    ladder MEASURED it faster at this transform size (it won 1.58x at
    n=2^19 on the real chip, PERF.md r4 — the fori-of-pipeline with
    donated buffers vs the chain kernel at the top of its range). No
    record -> no switch; assumptions never route."""
    import os as _os
    if _os.environ.get("PRMERS_NO_MESH_SINGLE") or \
            _os.environ.get("PRMERS_NO_ROWCARRY"):
        # the mesh engine REQUIRES the row-carry pipeline; under the
        # bench degrade ladder's PRMERS_NO_ROWCARRY the sharded branch
        # would silently fall back to the slow XLA mesh engine
        return False
    try:
        from ..core import tune
        from ..core.plan import cached_plan
        n = cached_plan(p).n
        mesh_rate = tune.lookup(n, "MeshPallasEngine")
        base_rate = tune.lookup(n, "PallasEngine")
        if not mesh_rate or mesh_rate <= base_rate * 1.02:
            return False
        from .paged import device_reg_budget
        if reg_count > device_reg_budget(n):
            return False        # mesh engine has no host-paging wrapper
        from ..parallel.mesh_engine import mesh_pallas_eligible
        return mesh_pallas_eligible(p)
    except Exception:
        return False


def configured_backend() -> str:
    return _BACKEND


def create_engine(p: int, reg_count: int, backend: str | None = None,
                  device=None, arith: str | None = None,
                  workload: str = "generic") -> Engine:
    eng = _create_engine(p, reg_count, backend=backend, device=device,
                         arith=arith, workload=workload)
    from ..core.profile import maybe_wrap
    return maybe_wrap(eng)


def _create_engine(p: int, reg_count: int, backend: str | None = None,
                   device=None, arith: str | None = None,
                   workload: str = "generic") -> Engine:
    b = backend or os.environ.get("PRMERS_BACKEND") or _BACKEND
    a = arith or os.environ.get("PRMERS_ARITH") or "auto"
    if a == "auto":
        if b in ("numpy", "sharded"):
            # the host oracle and the mesh engine are gl64-only surfaces
            a = "gl64"
        else:
            from .policy import decide_arith
            a = decide_arith(p, workload).arith
    if a == "fft3161":
        from .engine3161 import Engine3161
        if b == "numpy":
            import numpy as _np
            return Engine3161(p, reg_count, xp=_np)
        from .. import jaxconf  # noqa: F401
        import jax.numpy as jnp
        return Engine3161(p, reg_count, xp=jnp)
    if b == "auto":
        if _mesh_auto_eligible(p):
            b = "sharded"           # >1 TPU chip: the mesh IS the device
        else:
            b = "pallas" if _pallas_eligible(p) else "jax"
            if b == "pallas" and _mesh_beats_pallas(p, reg_count):
                b = "sharded"       # tune records: 1-device mesh wins
    if b in ("pallas", "jax"):
        # huge register counts spill to host via the LRU paging wrapper
        # (reference: engine_gpu host paging, include/marin/engine_gpu.h:2172)
        from ..core.plan import cached_plan
        from .paged import PagedEngine, device_reg_budget
        budget = device_reg_budget(cached_plan(p).n)
        if os.environ.get("PRMERS_GPU_ALLOC_DIAG") == "1":
            # reference diagnostics spelling (README.md:580-590):
            # report the logical slab vs the device register budget
            n = cached_plan(p).n
            gib = reg_count * n * 8 / (1 << 30)
            print(f"[ALLOC] logical regs={reg_count} slab={gib:.2f} GiB "
                  f"device budget={budget} regs"
                  f"{' -> host-paged LRU' if reg_count > budget else ''}",
                  file=sys.stderr)
        if reg_count > budget:
            inner = _create_engine(p, budget, backend=b, device=device,
                                   arith="gl64")
            return PagedEngine(inner, reg_count)
    if b == "sharded":
        # the mesh-Pallas engine is the production sharded path; the XLA
        # u64 four-step remains the any-shape capacity fallback
        impl = os.environ.get("PRMERS_SHARDED_IMPL", "auto")
        if impl != "xla":
            try:
                from ..parallel.mesh_engine import MeshPallasEngine
                return MeshPallasEngine(p, reg_count)
            except (ValueError, AssertionError):
                if impl == "pallas":
                    raise
        from ..parallel.sharded import ShardedEngine
        return ShardedEngine(p, reg_count)
    if b == "pallas":
        from .pallas_engine import PallasEngine
        return PallasEngine(p, reg_count)
    if b == "numpy":
        from .np_engine import NumpyEngine
        return NumpyEngine(p, reg_count)
    if b == "jax":
        from ..core.plan import cached_plan
        from .jax_engine import ROW_MODE_MIN_N, JaxEngine, JaxRowEngine
        if cached_plan(p).n >= ROW_MODE_MIN_N:
            return JaxRowEngine(p, reg_count, device=device)
        return JaxEngine(p, reg_count, device=device)
    raise ValueError(f"unknown backend {b!r}")
