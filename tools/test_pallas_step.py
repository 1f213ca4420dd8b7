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

ARG = sys.argv[1] if len(sys.argv) > 1 else "17"
A = int(sys.argv[2]) if len(sys.argv) > 2 else 1

# "17" -> n = 2^17; "5x16" -> n = 5 * 2^16 (radix-5 shapes)
if ARG.startswith("5x"):
    n = 5 << int(ARG[2:])
else:
    n = 1 << int(ARG)
p = int(n * 16.5) | 1  # any odd exponent with comfortable digit widths
plan = build_plan(p, n=n)
fp = fs.FourStepPlan.from_plan(plan)
print(f"p={p} n={n} R={fp.R} C={fp.C} rs=({fp.rs.L1},{fp.rs.L2}) "
      f"cs=({fp.cs.L1},{fp.cs.L2})")

t0 = time.time()
tbl = jax.jit(lambda w: fs.FourStepTables.build(
    fp, jnp, G=8, lanes=128, widths_arr=w))(
        fp.widths.astype(np.uint32))
import os
if not os.environ.get("PRMERS_NO_MXU"):
    fs.attach_mxu_tables(tbl, device_put=jax.device_put)
if not os.environ.get("PRMERS_NO_FUSE"):
    fs.attach_fused_c_tables(tbl, device_put=jax.device_put)
jax.block_until_ready(jax.tree_util.tree_leaves(tbl))
print(f"tables built in {time.time()-t0:.1f}s (mxu={bool(tbl.mxu)} "
      f"fused={tbl.fused is not None})")

rng = np.random.default_rng(11)
mp = (1 << p) - 1
v = int.from_bytes(rng.bytes(p // 8), "little") % mp
digits = dg.int_to_digits(v, plan.widths)
lo, hi = to_pairs(digits)
R1, R2 = fp.rs.L1, fp.rs.L2

x0 = jnp.asarray(lo.reshape(R1, R2, fp.C))
x1 = jnp.asarray(hi.reshape(R1, R2, fp.C))
z11 = jnp.zeros((fp.rs.L1, 1), jnp.uint32)   # per-block carry vector
a_pair = (jnp.full((1, 1), np.uint32(A)), jnp.zeros((1, 1), jnp.uint32))

# tables must be jit ARGS: closed-over they become HLO constants and the
# remote compiler rejects the program with HTTP 413 at n >= 2^23
step = jax.jit(lambda t, x0, x1, c0, c1: kn.square_step(fp, t, x0, x1,
                                                        c0, c1, a_pair))
t0 = time.time()
d0, d1, co0, co1 = step(tbl, x0, x1, z11, z11)
out = np.asarray(d0), np.asarray(d1)
print(f"first step (compile+run) {time.time()-t0:.1f}s")

got_digits = from_pairs(out[0].reshape(n), out[1].reshape(n))
def co_value(co0, co1):
    """Total pending value of the per-block carry vector: block b's carry
    enters the first digit of block b+1 (last wraps to bit 0)."""
    R1 = fp.rs.L1
    bs = n // R1
    q = np.concatenate([[0], np.cumsum(plan.widths.astype(np.int64))])
    c0v = np.asarray(co0)[:, 0].astype(np.uint64)
    c1v = np.asarray(co1)[:, 0].astype(np.uint64)
    tot = 0
    for b in range(R1):
        c = int(c0v[b]) | (int(c1v[b]) << 32)
        pos = 0 if b == R1 - 1 else int(q[(b + 1) * bs])
        tot += c << pos
    return tot

val = (dg.digits_to_int(got_digits, plan.widths) + co_value(co0, co1)) % mp
from prmers_tpu.utils import gmp
want = gmp.mod(gmp.mul(gmp.mul(v, v), A), mp)
print("square_step correct:", val == want)
assert val == want

# second iteration consuming the carry
d0b, d1b, co0b, co1b = step(tbl, d0, d1, co0, co1)
out2 = from_pairs(np.asarray(d0b).reshape(n), np.asarray(d1b).reshape(n))
val2 = (dg.digits_to_int(out2, plan.widths) + co_value(co0b, co1b)) % mp
want2 = gmp.mod(gmp.mul(gmp.mul(want, want), A), mp)
print("second step (carry chain) correct:", val2 == want2)
assert val2 == want2

# row-carry pipeline (3 kernels/iter: carry fused into P7, injection
# into P1) — the engine default when its tables attach
kn.attach_cinrow(tbl, device_put=jax.device_put)
if kn.use_rowcarry(fp, tbl):
    R1, R2 = fp.rs.L1, fp.rs.L2
    zrc = jnp.zeros((R1, R2, 128), jnp.uint32)

    def co_value_rows(co0, co1):
        """Per-ROW boundary carries: row b's carry enters the first digit
        of row b+1 (last wraps to bit 0)."""
        rows = R1 * R2
        bs = n // rows
        q = np.concatenate([[0], np.cumsum(plan.widths.astype(np.int64))])
        c0v = np.asarray(co0).reshape(rows, 128)[:, 0].astype(np.uint64)
        c1v = np.asarray(co1).reshape(rows, 128)[:, 0].astype(np.uint64)
        tot = 0
        for b in range(rows):
            c = int(c0v[b]) | (int(c1v[b]) << 32)
            pos = 0 if b == rows - 1 else int(q[(b + 1) * bs])
            tot += c << pos
        return tot

    t0 = time.time()
    e0, e1, ko0, ko1 = step(tbl, x0, x1, zrc, zrc)
    oute = from_pairs(np.asarray(e0).reshape(n), np.asarray(e1).reshape(n))
    vale = (dg.digits_to_int(oute, plan.widths)
            + co_value_rows(ko0, ko1)) % mp
    print(f"rowcarry first step {time.time()-t0:.1f}s "
          f"correct: {vale == want}")
    assert vale == want
    e0b, e1b, ko0b, ko1b = step(tbl, e0, e1, ko0, ko1)
    oute2 = from_pairs(np.asarray(e0b).reshape(n),
                       np.asarray(e1b).reshape(n))
    vale2 = (dg.digits_to_int(oute2, plan.widths)
             + co_value_rows(ko0b, ko1b)) % mp
    print("rowcarry second step (carry chain) correct:", vale2 == want2)
    assert vale2 == want2

    if kn.chain_ok(fp, tbl):
        # whole-chain VMEM kernel: K squarings in ONE kernel
        K = 3
        a_vec = jnp.full((K,), np.uint32(A))
        chain = jax.jit(lambda t, x0, x1, c0, c1, av: kn.square_chain(
            fp, t, x0, x1, c0, c1, av))
        t0 = time.time()
        f0, f1, qo0, qo1 = chain(tbl, x0, x1, zrc, zrc, a_vec)
        outf = from_pairs(np.asarray(f0).reshape(n),
                          np.asarray(f1).reshape(n))
        valf = (dg.digits_to_int(outf, plan.widths)
                + co_value_rows(qo0, qo1)) % mp
        wantf = v
        for _ in range(K):
            wantf = wantf * wantf * A % mp
        print(f"chain kernel (K={K}) {time.time()-t0:.1f}s "
              f"correct: {valf == wantf}")
        assert valf == wantf
    else:
        print("chain kernel: not eligible at this shape, skipped")
else:
    print("rowcarry: not eligible at this shape, skipped")
print("ALL OK")
