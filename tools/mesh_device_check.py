"""Run the sharded Pallas pipeline on the REAL device mesh.

The CPU tests validate the mesh step on an 8-virtual-device mesh in
Pallas interpret mode; this drives the SAME shard_map step through
Mosaic on the attached TPU (mesh = all real devices; on a single chip
the collectives degenerate but still lower through the TPU path), and
big-int-checks a squaring chain, the fast-3 iteration, and the
multiplicand prepare/mul ops.

Usage: python tools/mesh_device_check.py [log2n] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from prmers_tpu import jaxconf  # noqa: F401
import jax

from prmers_tpu.core.plan import build_plan
from prmers_tpu.parallel.sharded_pallas import PallasShardedStep
from prmers_tpu.parallel.sharded import make_mesh
from prmers_tpu.utils import digits as dgu

LOG2N = int(sys.argv[1]) if len(sys.argv) > 1 else 17
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main():
    devs = jax.devices()
    mesh = make_mesh(len(devs))
    n = 1 << LOG2N
    p = int(n * 16.25) | 1
    plan = build_plan(p, n=n)
    mp = (1 << p) - 1
    print(f"mesh={len(devs)} device(s) p={p} n={n}", flush=True)

    t0 = time.time()
    st = PallasShardedStep(p, mesh, n=n)
    print(f"tables+placement {time.time() - t0:.1f}s", flush=True)

    v = 3
    st.set_digits(dgu.int_to_digits(v, plan.widths))
    t0 = time.time()
    st.step(1)
    print(f"first step (compile+run) {time.time() - t0:.1f}s", flush=True)
    v = v * v % mp
    for _ in range(ITERS - 1):
        st.step(1)
        v = v * v % mp
    got = st.get_int()
    ok_sqr = got == v % mp
    print(f"square chain x{ITERS} correct: {ok_sqr}", flush=True)

    st.step(1, a=3)
    v = v * v * 3 % mp
    ok_a = st.get_int() == v
    print(f"fast-3 step correct: {ok_a}", flush=True)

    w = 0xDEADBEEF
    st.prepare_multiplicand(dgu.int_to_digits(w, plan.widths))
    st.mul(1)
    v = v * w % mp
    ok_mul = st.get_int() == v
    print(f"multiplicand mul correct: {ok_mul}", flush=True)

    # steady-state rate (collectives + kernels through Mosaic)
    st.step(4)
    np.asarray(jax.device_get(st.co0))[0:1]
    t0 = time.perf_counter()
    K = 32
    st.step(K)
    np.asarray(jax.device_get(st.co0))[0:1]
    dt = time.perf_counter() - t0
    print(f"rate {K / dt:.1f} iter/s on {len(devs)} device(s)", flush=True)

    assert ok_sqr and ok_a and ok_mul
    print("ALL OK")


if __name__ == "__main__":
    main()
