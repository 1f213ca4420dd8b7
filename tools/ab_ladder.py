"""A/B ladder: measure PRP iter/s for each kernel-pipeline variant.

Runs one subprocess per env combo (the pipeline flags are read at
table-build time) and prints a table, so on-device time is spent
measuring rather than editing. Usage:

    python tools/ab_ladder.py [p] [combo ...]

Combos are comma-joined env assignments; defaults cover the round-2
levers: full fast path, no-bytecast, no-rowcarry, no-mxu, no-fuse.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

P_DEFAULT = 136279841

_CHILD = r"""
import os, sys, time
sys.path.insert(0, __ROOT__)
from prmers_tpu import jaxconf  # noqa: F401
from prmers_tpu.engine.factory import create_engine

p = __P__
K = int(os.environ.get("AB_K", "64"))
eng = create_engine(p, 2)
eng.set(0, 3)
eng._SEQ_CHUNK = K
eng.square_mul_seq(0, [1] * K)   # warm compile at the timed length
eng.sync()
t0 = time.perf_counter()
rounds = max(int(os.environ.get("AB_ITERS", "192")) // K, 1)
for _ in range(rounds):
    eng.square_mul_seq(0, [1] * K)
eng.sync()
dt = time.perf_counter() - t0
print(f"AB_RESULT {rounds * K / dt:.2f} {type(eng).__name__}")
"""

DEFAULT_COMBOS = [
    "",                                 # full fast path
    "PRMERS_BYTECAST=0,PRMERS_LHS_BITCAST=0",
    "PRMERS_NO_ROWCARRY=1",
    "PRMERS_NO_ROWCARRY=1,PRMERS_BYTECAST=0,PRMERS_LHS_BITCAST=0",
    "PRMERS_NO_MXU=1",
    "PRMERS_NO_PALLAS=1",
]


def run_combo(p: int, combo: str, timeout_s: int = 3000):
    env = dict(os.environ)
    for kv in combo.split(","):
        if kv:
            k, _, v = kv.partition("=")
            env[k] = v
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _CHILD.replace("__ROOT__", repr(root)).replace("__P__", str(p))
    try:
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           timeout=timeout_s, capture_output=True,
                           text=True)
    except subprocess.TimeoutExpired:
        return None, "TIMEOUT"
    for line in r.stdout.splitlines():
        if line.startswith("AB_RESULT"):
            _, ips, engine = line.split()
            return float(ips), engine
    tail = (r.stderr or r.stdout).strip().splitlines()
    return None, tail[-1][:100] if tail else f"rc={r.returncode}"


def main() -> int:
    args = sys.argv[1:]
    p = int(args[0]) if args and args[0].isdigit() else P_DEFAULT
    combos = [a for a in args if not a.isdigit()] or DEFAULT_COMBOS
    base = None
    for combo in combos:
        ips, detail = run_combo(p, combo)
        label = combo or "(fast path)"
        if ips is None:
            print(f"{label:55s} FAILED: {detail}")
            continue
        if base is None:
            base = ips
        print(f"{label:55s} {ips:8.1f} iter/s  "
              f"({ips / base * 100:5.1f}% of first) [{detail}]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
