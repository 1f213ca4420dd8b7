"""Byte-order RHS pack (PRMERS_BYTECAST): one XOR + int8 bitcast per
word with row-permuted W tables must be bit-identical to the plane-order
pack, in the numpy oracle and through the interpret-mode kernels."""

import numpy as np
import pytest

from prmers_tpu.core.plan import build_plan
from prmers_tpu.utils import digits as dg
from prmers_tpu.utils import gmp


N = 1 << 15
P_EXP = int(N * 16.5) | 1


def test_rhs_bytes_pack_matches_plane_pack():
    from prmers_tpu.ops.pallas.gl64 import GL
    from prmers_tpu.ops.pallas import mxu_dft as mxm

    g = GL(np)
    rng = np.random.default_rng(2)
    L = 128
    Ms = rng.integers(0, (1 << 63), (2, L, L), dtype=np.uint64)
    w8, corr = mxm.build_rhs_tables(Ms)
    w8b = mxm.permute_rhs_rows_bytes(w8)
    x0 = rng.integers(0, 1 << 32, (16, L), dtype=np.uint32)
    x1 = rng.integers(0, 1 << 32, (16, L), dtype=np.uint32)
    for v in range(2):
        a = mxm.mxu_rhs_apply(g, x0, x1, L, w8[v], corr[v])
        b = mxm.mxu_rhs_apply(g, x0, x1, L, w8b[v], corr[v],
                              bytes_order=True)
        assert (g.canon(*a)[0] == g.canon(*b)[0]).all()
        assert (g.canon(*a)[1] == g.canon(*b)[1]).all()


@pytest.mark.heavy  # smoke budget: RHS-pack equality tests stay in smoke
@pytest.mark.parametrize("seed", [11])
def test_square_step_bytecast_interpret(seed, monkeypatch):
    monkeypatch.setenv("PRMERS_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("PRMERS_BYTECAST", "1")
    import jax.numpy as jnp
    from prmers_tpu.ops.pallas import fourstep as fs
    from prmers_tpu.ops.pallas import kernels as kn
    from prmers_tpu.ops.pallas.gl64 import from_pairs, to_pairs

    plan = build_plan(P_EXP, n=N)
    fp = fs.FourStepPlan.from_plan(plan)
    tbl = fs.FourStepTables.build(fp, jnp, G=8, lanes=128)
    fs.attach_mxu_tables(tbl)
    fs.attach_fused_c_tables(tbl)     # byte-permuted under the env flag

    mp = (1 << P_EXP) - 1
    rng = np.random.default_rng(seed)
    v = int.from_bytes(rng.bytes(P_EXP // 8), "little") % mp
    lo, hi = to_pairs(dg.int_to_digits(v, plan.widths))
    sh = (fp.rs.L1, fp.rs.L2, fp.C)
    z11 = jnp.zeros((fp.rs.L1, 1), jnp.uint32)
    one = (jnp.full((1, 1), np.uint32(1)), jnp.zeros((1, 1), jnp.uint32))
    d0, d1, co0, co1 = kn.square_step(
        fp, tbl, jnp.asarray(lo.reshape(sh)), jnp.asarray(hi.reshape(sh)),
        z11, z11, one, a_is_one=True)

    digs = from_pairs(np.asarray(d0).reshape(N), np.asarray(d1).reshape(N))
    q = np.concatenate([[0], np.cumsum(plan.widths.astype(np.int64))])
    bs = N // fp.rs.L1
    tot = 0
    c0 = np.asarray(co0)[:, 0].astype(np.uint64)
    c1 = np.asarray(co1)[:, 0].astype(np.uint64)
    for b in range(fp.rs.L1):
        c = int(c0[b]) | (int(c1[b]) << 32)
        pos = 0 if b == fp.rs.L1 - 1 else int(q[(b + 1) * bs])
        tot += c << pos
    got = (dg.digits_to_int(digs, plan.widths) + tot) % mp
    assert got == gmp.mod(gmp.mul(v, v), mp)
