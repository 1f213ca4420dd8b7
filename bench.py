"""Benchmark: PRP squarings/sec at p=136279841 on the attached device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: ~1225 iter/s on RTX 4090 (PRMERS_SCORE 100 card,
reference README.md:983 / BASELINE.md).
"""

import json
import os
import sys
import time

BASELINE_4090 = 1225.0
P_BENCH = int(os.environ.get("PRMERS_BENCH_P", "136279841"))
WARM = int(os.environ.get("PRMERS_BENCH_WARM", "16"))
ITERS = int(os.environ.get("PRMERS_BENCH_ITERS", "192"))


def _build_warm(K):
    """Create the engine and warm-compile the timed chunk length."""
    from prmers_tpu.engine.factory import create_engine

    eng = create_engine(P_BENCH, 2)
    eng.set(0, 3)
    # warm-up compiles the exact chunk length used in the timed region
    eng._SEQ_CHUNK = K
    eng.square_mul_seq(0, [1] * K)
    eng.sync()
    return eng


def _device_reachable(timeout_s: int = 300) -> bool:
    """Probe jax device init in a child process: the axon tunnel, when
    down, HANGS jax.devices() indefinitely — a bounded child probe turns
    that into a fast, diagnosable failure instead of a silent stall.
    The child imports prmers_tpu.jaxconf first so the PRMERS_PLATFORM
    pin applies and the probe tests the backend the run will use."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "from prmers_tpu import jaxconf; "
             "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        return r.returncode == 0 and "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if os.environ.get("PRMERS_BENCH_NO_PROBE") != "1" and \
            not _device_reachable():
        print("bench: jax device init unreachable (axon tunnel down?); "
              "aborting instead of hanging", file=sys.stderr)
        sys.exit(2)
    import jax
    jax.config.update("jax_enable_x64", True)

    # fastest path first; on a kernel-set compile/run failure fall back to
    # progressively more conservative pipelines rather than losing the run
    K = 64
    eng = None
    for fallback_env in (None, "PRMERS_NO_ROWCARRY", "PRMERS_NO_PALLAS"):
        if fallback_env:
            os.environ[fallback_env] = "1"
        try:
            eng = _build_warm(K)
            break
        except Exception as e:  # noqa: BLE001 — report and degrade
            print(f"bench: pipeline failed ({type(e).__name__}: {e}); "
                  f"degrading", file=sys.stderr)
    if eng is None:
        eng = _build_warm(K)
    rounds = max(ITERS // K, 1)
    t0 = time.perf_counter()
    for _ in range(rounds):
        eng.square_mul_seq(0, [1] * K)
    eng.sync()
    dt = time.perf_counter() - t0
    ips = rounds * K / dt
    print(json.dumps({
        "metric": f"PRP iter/s @ p={P_BENCH}",
        "value": round(ips, 2),
        "unit": "iter/s",
        "vs_baseline": round(ips / BASELINE_4090, 4),
    }))


if __name__ == "__main__":
    main()
