"""On-device validation of the Pallas square_step vs big-int arithmetic."""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
from prmers_tpu import jaxconf  # noqa: F401
import jax
import jax.numpy as jnp

from prmers_tpu.core.plan import build_plan
from prmers_tpu.ops.pallas import fourstep as fs
from prmers_tpu.ops.pallas import kernels as kn
from prmers_tpu.ops.pallas.gl64 import to_pairs, from_pairs
from prmers_tpu.utils import digits as dg

LOG2N = int(sys.argv[1]) if len(sys.argv) > 1 else 17
A = int(sys.argv[2]) if len(sys.argv) > 2 else 1

n = 1 << LOG2N
p = int(n * 16.5) | 1  # any odd exponent with comfortable digit widths
plan = build_plan(p, n=n)
fp = fs.FourStepPlan.from_plan(plan)
print(f"p={p} n={n} R={fp.R} C={fp.C} rs=({fp.rs.L1},{fp.rs.L2}) "
      f"cs=({fp.cs.L1},{fp.cs.L2})")

t0 = time.time()
tbl = jax.jit(lambda: fs.FourStepTables.build(fp, jnp, G=8, lanes=128))()
import os
if not os.environ.get("PRMERS_NO_MXU"):
    fs.attach_mxu_tables(tbl, device_put=jax.device_put)
jax.block_until_ready(jax.tree_util.tree_leaves(tbl))
print(f"tables built in {time.time()-t0:.1f}s (mxu={bool(tbl.mxu)})")

rng = np.random.default_rng(11)
mp = (1 << p) - 1
v = int.from_bytes(rng.bytes(p // 8), "little") % mp
digits = dg.int_to_digits(v, plan.widths)
lo, hi = to_pairs(digits)
R1, R2 = fp.rs.L1, fp.rs.L2
CB = tbl.w[0].shape[2]
LN = tbl.w[0].shape[4]
x0 = jnp.asarray(lo.reshape(R1, R2, CB, 8, LN))
x1 = jnp.asarray(hi.reshape(R1, R2, CB, 8, LN))
z11 = jnp.zeros((1, 1), jnp.uint32)
a_pair = (jnp.full((1, 1), np.uint32(A)), z11)

# tables must be jit ARGS: closed-over they become HLO constants and the
# remote compiler rejects the program with HTTP 413 at n >= 2^23
step = jax.jit(lambda t, x0, x1, c0, c1: kn.square_step(fp, t, x0, x1,
                                                        c0, c1, a_pair))
t0 = time.time()
d0, d1, co0, co1 = step(tbl, x0, x1, z11, z11)
out = np.asarray(d0), np.asarray(d1)
print(f"first step (compile+run) {time.time()-t0:.1f}s")

got_digits = from_pairs(out[0].reshape(n), out[1].reshape(n))
cout = int(np.asarray(co0)[0, 0]) | (int(np.asarray(co1)[0, 0]) << 32)
val = (dg.digits_to_int(got_digits, plan.widths) + cout) % mp
from prmers_tpu.utils import gmp
want = gmp.mod(gmp.mul(gmp.mul(v, v), A), mp)
print("square_step correct:", val == want)
assert val == want

# second iteration consuming the carry
d0b, d1b, co0b, co1b = step(tbl, d0, d1, co0, co1)
out2 = from_pairs(np.asarray(d0b).reshape(n), np.asarray(d1b).reshape(n))
cout2 = int(np.asarray(co0b)[0, 0]) | (int(np.asarray(co1b)[0, 0]) << 32)
val2 = (dg.digits_to_int(out2, plan.widths) + cout2) % mp
want2 = gmp.mod(gmp.mul(gmp.mul(want, want), A), mp)
print("second step (carry chain) correct:", val2 == want2)
assert val2 == want2
print("ALL OK")
