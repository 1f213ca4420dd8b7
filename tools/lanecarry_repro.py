"""Minimal repro ladder for the n=2^25 single-square worker crash.

Each case runs in a subprocess (worker crashes poison the client).
Usage: python tools/lanecarry_repro.py [case]
Cases: roundtrip | sq_small | sq_dense | seq_dense
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 25
P = int(N * 16.2) | 1


def inner(case: str) -> None:
    from prmers_tpu import jaxconf  # noqa: F401
    from prmers_tpu.core.plan import cached_plan
    from prmers_tpu.engine.pallas_engine import PallasEngine

    plan = cached_plan(P, N)
    mp = (1 << P) - 1
    t0 = time.time()
    eng = PallasEngine(P, 2, plan=plan)
    print(f"setup {time.time() - t0:.1f}s", flush=True)
    if case == "roundtrip":
        eng.set(1, mp - 5)
        assert eng.get_int(1) == mp - 5
    elif case == "sq_small":
        eng.set(1, 5)
        eng.square_mul(1, 7)
        assert eng.get_int(1) == 25 * 7
    elif case == "sq_dense":
        eng.set(1, mp - 5)
        eng.square_mul(1, 7)
        assert eng.get_int(1) == (mp - 5) ** 2 * 7 % mp
    elif case == "seq_dense":
        eng.set(1, mp - 5)
        eng.square_mul_seq(1, [7])
        assert eng.get_int(1) == (mp - 5) ** 2 * 7 % mp
    print(f"{case} OK {time.time() - t0:.1f}s", flush=True)


def main() -> None:
    cases = sys.argv[1:] or ["roundtrip", "sq_small", "sq_dense",
                             "seq_dense"]
    for case in cases:
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "inner", case],
            capture_output=True, text=True, timeout=2400)
        ok = r.returncode == 0
        tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
        print(f"[{'PASS' if ok else 'FAIL'}] {case} "
              f"({time.time() - t0:.1f}s) {' | '.join(tail)}", flush=True)
        if not ok:
            break


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "inner":
        inner(sys.argv[2])
    else:
        main()
