"""Per-pass timing of the square_step pipeline at bench size (rep slopes).

Usage: python tools/profile_passes.py [log2n] [reps]
"""
import functools
import sys
import time

sys.path.insert(0, ".")
import numpy as np
from prmers_tpu import jaxconf  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

from prmers_tpu.core.plan import build_plan
from prmers_tpu.ops.pallas import fourstep as fs
from prmers_tpu.ops.pallas import kernels as kn

LOG2N = int(sys.argv[1]) if len(sys.argv) > 1 else 23
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8

n = 1 << LOG2N
p = int(n * 16.25) | 1
plan = build_plan(p, n=n)
fp = fs.FourStepPlan.from_plan(plan)
print(f"p={p} n={n} R={fp.R} C={fp.C} rs=({fp.rs.L1},{fp.rs.L2}) "
      f"cs=({fp.cs.L1},{fp.cs.L2})", flush=True)

tbl = jax.jit(lambda w: fs.FourStepTables.build(
    fp, jnp, G=8, lanes=128, widths_arr=w))(
        fp.widths.astype(np.uint32))
import os
if not os.environ.get("PRMERS_NO_MXU"):
    fs.attach_mxu_tables(tbl, device_put=jax.device_put)
if not os.environ.get("PRMERS_NO_FUSE"):
    fs.attach_fused_c_tables(tbl, device_put=jax.device_put)
jax.block_until_ready(jax.tree_util.tree_leaves(tbl))
print(f"tables ready (fused={tbl.fused is not None})", flush=True)

R1, R2 = fp.rs.L1, fp.rs.L2
key = jax.random.PRNGKey(0)
ax_shape = (R1, R2, fp.C)
x0 = jax.random.randint(key, ax_shape, 0, 1 << 30, dtype=jnp.int32
                        ).astype(jnp.uint32)
x1 = jax.random.randint(key, ax_shape, 0, 1 << 18, dtype=jnp.int32
                        ).astype(jnp.uint32)
z11 = jnp.zeros((1, 1), jnp.uint32)
a_pair = (jnp.full((1, 1), np.uint32(1)), z11)

if not kn._fused_ok(fp, tbl):
    s0 = kn._forward_r(fp, tbl, x0, x1, cin=(z11, z11))
    ay0 = kn._to_ay(fp, s0[0])
    ay1 = kn._to_ay(fp, s0[1])


def timeit(fn, *args, reps=REPS, warm=2):
    for _ in range(warm):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def serial(fn2):
    """Chain fn2 (tbl, pair)->pair K times with a data dependency; the
    tables ride as a jit ARGUMENT (closure constants over the fused
    tables exceed the remote compiler's HTTP body limit)."""
    K = 8

    @jax.jit
    def run(tb, a, b):
        def step(i, ab):
            r0, r1 = fn2(tb, ab[0], ab[1])
            return r0.reshape(ab[0].shape), r1.reshape(ab[1].shape)
        return lax.fori_loop(0, K, step, (a, b))

    def timed(a, b):
        return timeit(run, tbl, a, b) / K
    return timed


stages = []

if kn._fused_ok(fp, tbl):
    kn.attach_cinrow(tbl, device_put=jax.device_put)
rowcarry = kn.use_rowcarry(fp, tbl)
if rowcarry:
    rc0 = jnp.zeros((R1, R2, 128), jnp.uint32)
    rc1 = jnp.zeros((R1, R2, 128), jnp.uint32)
    stages.append(("P1c inject+dot", serial(
        lambda tb, a, b: kn.p1_carry_pass(fp, tb, a, b, rc0, rc1)),
        (x0, x1)))
    stages.append(("F2BIG r2+C+sqr+mirrors", serial(
        lambda tb, a, b: kn.fused_c_pass(fp, tb, a, b, "sqr",
                                         r2fold=True)), (x0, x1)))
    stages.append(("P7c dot+carry", serial(
        lambda tb, a, b: kn.p7_carry_pass(fp, tb, a, b, None, True)[:2]),
        (x0, x1)))

    @jax.jit
    def full_rc(tb, a, b):
        d0, d1, c0, c1 = kn.square_step(fp, tb, a, b, rc0, rc1, a_pair,
                                        a_is_one=True)
        return d0, d1

if kn._fused_ok(fp, tbl):
    wf = kn._wfold_ok(fp, tbl)
    stages.append(("P1+P2 fwd_r (fused mid)", serial(
        lambda tb, a, b: kn._forward_r(fp, tb, a, b, cin=(z11, z11),
                                       wfold=wf,
                                       mid_tab=kn._fused_mid_tabs(tb)[0])),
        (x0, x1)))
    stages.append(("F2 fused C (sqr)", serial(
        lambda tb, a, b: kn.fused_c_pass(fp, tb, a, b, "sqr")), (x0, x1)))
    stages.append(("P6+P7 inverse_r", serial(
        lambda tb, a, b: kn._inverse_r(
            fp, tb, a, b, wfold=wf,
            mid_inv_tab=kn._fused_mid_tabs(tb)[1])), (x0, x1)))
    stages.append(("P8 carry k4", serial(
        lambda tb, a, b: kn.k4(fp, tb, a, b, a_pair)[:2]), (x0, x1)))
    stages.append(("P8 carry k4 (a=1)", serial(
        lambda tb, a, b: kn.k4(fp, tb, a, b, a_pair,
                               a_is_one=True)[:2]), (x0, x1)))
else:
    stages.append(("P1+P2 fwd_r (incl cin)", serial(
        lambda tb, a, b: kn._forward_r(fp, tb, a, b, cin=(z11, z11))),
        (x0, x1)))
    stages.append(("T to_ay (transpose)", serial(
        lambda tb, a, b: (kn._to_ay(fp, a), kn._to_ay(fp, b))),
        (s0[0], s0[1])))
    stages.append(("P3+P4+P5 middle sqr", serial(
        lambda tb, a, b: kn._middle(fp, tb, a, b, "sqr")), (ay0, ay1)))
    stages.append(("T' to_ax (transpose)", serial(
        lambda tb, a, b: (kn._to_ax(fp, a), kn._to_ax(fp, b))),
        (ay0, ay1)))
    stages.append(("P6+P7 inverse_r", serial(
        lambda tb, a, b: kn._inverse_r(fp, tb, a, b)), (x0, x1)))
    stages.append(("P8 carry k4", serial(
        lambda tb, a, b: kn.k4(fp, tb, a, b, a_pair)[:2]), (x0, x1)))


@jax.jit
def full(tb, a, b):
    d0, d1, c0, c1 = kn.square_step(fp, tb, a, b, z11, z11, a_pair,
                                    a_is_one=True)
    return d0, d1


total = 0.0
for name, fn, args in stages:
    dt = fn(*args)
    total += dt
    print(f"{name:28s} {dt*1e3:8.3f} ms", flush=True)
print(f"{'SUM':28s} {total*1e3:8.3f} ms", flush=True)
if rowcarry:
    dt_rc = timeit(full_rc, tbl, x0, x1)
    print(f"{'square_step (rowcarry)':28s} {dt_rc*1e3:8.3f} ms "
          f"-> {1.0/dt_rc:7.1f} iter/s", flush=True)
dt_full = timeit(full, tbl, x0, x1)
print(f"{'square_step (jit whole)':28s} {dt_full*1e3:8.3f} ms "
      f"-> {1.0/dt_full:7.1f} iter/s")
