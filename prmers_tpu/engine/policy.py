"""Workload-aware arithmetic-path auto policy (gl64 vs fft3161).

Analog of the reference's Aevum/Marin auto policy
(reference: src/aevum/AutoPolicy.cpp:36-152 — per-workload transform-ratio
thresholds with AEVUM_AUTO_*_MAX_RATIO env overrides, decided per run in
engine::create_gpu, src/marin/gpu.cpp:52).

TPU adaptation: measured rates from the tune cache take precedence over
the ratio heuristic — the Goldilocks path carries the MXU-optimized Pallas
kernels, so a smaller fft3161 transform does not automatically win. With
no tune data the policy keeps gl64 unless forced (-arith fft3161 or
PRMERS_ARITH); the reference-parity ratio thresholds remain inspectable in
the decision record.
"""

from __future__ import annotations

import dataclasses
import os

# per-workload max n_3161/n_gl64 ratio at which the second path is viable
# (reference AutoPolicy profile_for :36-69)
THRESHOLDS = {
    "prp": 1.00,
    "ll": 1.00,
    "pm1_s1": 0.75,
    "pm1": 1.00,
    "ecm": 0.75,
    "generic": 1.00,
}


@dataclasses.dataclass
class ArithDecision:
    arith: str            # "gl64" | "fft3161"
    n_gl64: int
    n_3161: int
    ratio: float
    threshold: float
    ips_gl64: float
    ips_3161: float
    reason: str


def decide_arith(p: int, workload: str = "generic",
                 save_dir: str = ".",
                 gl64_has_pallas: bool | None = None) -> ArithDecision:
    """Pick the arithmetic path. Decision order (reference:
    aevum_auto_decide, src/aevum/AutoPolicy.cpp:86-152):
      1. forced (PRMERS_ARITH / -arith),
      2. measured tune rates when both paths have entries,
      3. when the Goldilocks path has NO Pallas kernel set for this shape
         (both paths run on XLA), the smaller transform wins within the
         per-workload ratio threshold — the reference's core rule,
      4. otherwise gl64 (it carries the MXU kernel set).
    gl64_has_pallas overrides the eligibility probe (policy-boundary
    tests)."""
    from ..core.plan import transform_size
    from ..core import tune
    from ..ops.ntt2 import transform_size_3161

    n_gl = transform_size(p)
    n_2 = transform_size_3161(p)
    ratio = n_2 / n_gl
    thr = THRESHOLDS.get(workload, 1.0)
    env = os.environ.get(f"PRMERS_AUTO_{workload.upper()}_MAX_RATIO")
    if env:
        thr = float(env)

    data = tune.load(save_dir)
    ips_gl = max((v for k in (str(n_gl),)
                  for e, v in data.get(k, {}).items()
                  if e != "Engine3161"), default=0.0)
    ips_2 = data.get(str(n_2), {}).get("Engine3161", 0.0)

    forced = os.environ.get("PRMERS_ARITH")
    if forced in ("gl64", "fft3161"):
        return ArithDecision(forced, n_gl, n_2, ratio, thr, ips_gl, ips_2,
                             "forced by PRMERS_ARITH")
    if ips_gl > 0 and ips_2 > 0:
        pick = "fft3161" if ips_2 > ips_gl else "gl64"
        return ArithDecision(pick, n_gl, n_2, ratio, thr, ips_gl, ips_2,
                             "measured rates (tune cache)")
    if gl64_has_pallas is None:
        from .factory import _pallas_eligible
        try:
            gl64_has_pallas = _pallas_eligible(p)
        except Exception:
            gl64_has_pallas = False
    if not gl64_has_pallas and ratio <= thr:
        # both paths run as XLA graphs: per-word costs are comparable and
        # the smaller transform wins (the reference's decision rule)
        return ArithDecision("fft3161", n_gl, n_2, ratio, thr,
                             ips_gl, ips_2,
                             f"no gl64 kernel set; ratio {ratio:.2f} "
                             f"within {thr:.2f}")
    if ratio > thr:
        return ArithDecision("gl64", n_gl, n_2, ratio, thr, ips_gl, ips_2,
                             f"ratio {ratio:.2f} exceeds {thr:.2f}")
    return ArithDecision("gl64", n_gl, n_2, ratio, thr, ips_gl, ips_2,
                         "gl64 carries the MXU kernel set")
