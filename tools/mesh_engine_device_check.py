"""MeshPallasEngine on the REAL device: correctness + rate vs PallasEngine.

VERDICT r4 item 1 'Done' criterion: on the single real chip, a 1-device
mesh PRP chain must match PallasEngine bit-exactly and run within ~10%
of its rate (the mesh step is the same kernel pipeline plus degenerate
collectives).

Usage: python tools/mesh_engine_device_check.py [log2n] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from prmers_tpu import jaxconf  # noqa: F401
import jax

from prmers_tpu.core.plan import build_plan
from prmers_tpu.engine.pallas_engine import PallasEngine
from prmers_tpu.parallel.mesh_engine import MeshPallasEngine
from prmers_tpu.parallel.sharded import make_mesh

LOG2N = int(sys.argv[1]) if len(sys.argv) > 1 else 19
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 128


def rate(eng, iters):
    eng.set(0, 3)
    eng.square_mul_seq(0, [1] * iters)   # warm: same chain length
    eng.sync()
    t0 = time.perf_counter()
    eng.square_mul_seq(0, [1] * iters)
    eng.sync()
    return iters / (time.perf_counter() - t0)


def main():
    n = 1 << LOG2N
    p = int(n * 16.25) | 1
    mp = (1 << p) - 1
    plan = build_plan(p, n=n)
    mesh = make_mesh(len(jax.devices()))
    print(f"p={p} n={n} mesh={mesh.size} device(s)", flush=True)

    t0 = time.time()
    me = MeshPallasEngine(p, 2, mesh, n=n)
    print(f"mesh engine tables {time.time() - t0:.1f}s", flush=True)
    pe = PallasEngine(p, 2, plan=plan)

    # bit-exact: chain + fast-3 + multiplicand mul vs big-int AND vs
    # the single-chip engine
    for eng in (me, pe):
        eng.set(0, 3)
        eng.square_mul_seq(0, [1, 1, 3, 1])
        eng.set(1, 7)
        eng.set_multiplicand(1, 1)
        eng.mul(0, 1, 5)
    want = 3
    for a in (1, 1, 3, 1):
        want = want * want * a % mp
    want = want * 7 * 5 % mp
    vm, vp = me.get_int(0), pe.get_int(0)
    assert vm == want, f"mesh engine diverges from big-int: {hex(vm)[:20]}"
    assert vp == want, f"pallas engine diverges: {hex(vp)[:20]}"
    print("bit-exact: mesh == single-chip == big-int OK", flush=True)

    rm = rate(me, ITERS)
    rp = rate(pe, ITERS)
    print(f"PallasEngine      {rp:9.2f} iter/s", flush=True)
    print(f"MeshPallasEngine  {rm:9.2f} iter/s  ({rm / rp:.3f}x)",
          flush=True)
    ok = rm >= 0.90 * rp
    print(f"within 10%: {ok}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
