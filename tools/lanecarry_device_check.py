"""C = 8192 lane-tiled carry ON DEVICE: correctness + rate vs the
r4 xla-carry hybrid at the 600M-class shape (n = 2^25, the smallest
production C = 8192 config; VERDICT r4 missing #1 'Done' criterion:
measured either way).

Runs each variant in a SUBPROCESS: use_xla_carry is read at trace time
and the (p, n) table cache is shared, so the two pipelines cannot be
traced in one process.

Usage: python tools/lanecarry_device_check.py [inner <variant>]
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 25
P = int(N * 16.2) | 1          # 600M-class: C = 8192, same as p=600000001
ITERS = 48


def inner(variant: str) -> None:
    if variant == "hybrid":
        os.environ["PRMERS_XLA_CARRY"] = "1"
    from prmers_tpu import jaxconf  # noqa: F401
    from prmers_tpu.core.plan import cached_plan
    from prmers_tpu.engine.pallas_engine import PallasEngine
    from prmers_tpu.ops.pallas import kernels as kn
    from prmers_tpu.ops.pallas.fourstep import FourStepPlan

    plan = cached_plan(P, N)
    fp = FourStepPlan.from_plan(plan)
    mp = (1 << P) - 1
    info = {"variant": variant, "n": N, "C": fp.C,
            "carry_tiles": kn.carry_tiles(fp),
            "xla_carry": kn.use_xla_carry(fp)}
    t0 = time.time()
    eng = PallasEngine(P, 2, plan=plan)
    info["rowcarry"] = eng._rc
    info["setup_s"] = round(time.time() - t0, 1)
    print(f"setup done {info['setup_s']}s rowcarry={eng._rc}", flush=True)

    # correctness: chain with the fast-3 operand + a wrap-heavy value
    eng.set(0, 3)
    eng.square_mul_seq(0, [1, 3, 1])
    print(f"chain dispatched {time.time() - t0:.1f}s", flush=True)
    want = 3
    for a in (1, 3, 1):
        want = want * want * a % mp
    got = eng.get_int(0)
    print(f"chain fetched {time.time() - t0:.1f}s", flush=True)
    assert got == want, "600M-class chain mismatch"
    eng.set(1, mp - 5)
    eng.square_mul(1, 7)
    assert eng.get_int(1) == (mp - 5) ** 2 * 7 % mp, "wrap mismatch"
    info["bitexact"] = True
    print(f"bitexact OK {time.time() - t0:.1f}s", flush=True)

    # rate (warm the exact chunk length first)
    eng._SEQ_CHUNK = ITERS
    eng.set(0, 3)
    eng.square_mul_seq(0, [1] * ITERS)
    eng.sync()
    t0 = time.perf_counter()
    eng.square_mul_seq(0, [1] * ITERS)
    eng.sync()
    info["ips"] = round(ITERS / (time.perf_counter() - t0), 2)
    print("RESULT " + json.dumps(info), flush=True)


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "inner":
        inner(sys.argv[2])
        return
    out = {}
    for variant in ("lanecarry", "hybrid"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "inner", variant],
            capture_output=True, text=True, timeout=3600)
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("RESULT ")]
        if line:
            out[variant] = json.loads(line[-1][7:])
            print(line[-1], flush=True)
        else:
            print(f"{variant} FAILED rc={r.returncode}\n{r.stderr[-2000:]}",
                  flush=True)
    if len(out) == 2:
        lc, hy = out["lanecarry"]["ips"], out["hybrid"]["ips"]
        print(f"lane-tiled {lc} iter/s vs hybrid {hy} iter/s "
              f"({lc / hy:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
