"""Row-carry fused pipeline (carry inside P7, injection inside P1;
3 kernels per squaring) vs big-int arithmetic, in Pallas interpret mode
on CPU — the same kernel code lowers through Mosaic on the TPU.

Reference behavior parity: the two-phase carry of src/marin/engine_gpu
(SURVEY A4); here phase 1 rides the inverse-transform kernel and phase 2
the next forward kernel, so the standalone carry kernel's HBM round trip
disappears.
"""

import numpy as np
import pytest

from prmers_tpu.core.plan import build_plan
from prmers_tpu.utils import digits as dg
from prmers_tpu.utils import gmp


N = 1 << 15                    # smallest fused-eligible shape (rs.L1=32)
P_EXP = int(N * 16.5) | 1


@pytest.fixture(scope="module")
def setup():
    import os
    os.environ["PRMERS_PALLAS_INTERPRET"] = "1"
    import jax
    import jax.numpy as jnp
    from prmers_tpu.ops.pallas import fourstep as fs
    from prmers_tpu.ops.pallas import kernels as kn

    plan = build_plan(P_EXP, n=N)
    fp = fs.FourStepPlan.from_plan(plan)
    tbl = fs.FourStepTables.build(fp, jnp, G=8, lanes=128)
    fs.attach_mxu_tables(tbl)
    fs.attach_fused_c_tables(tbl)
    kn.attach_cinrow(tbl)
    assert kn.use_rowcarry(fp, tbl), "row-carry must be eligible at 2^15"
    yield plan, fp, tbl, kn
    del os.environ["PRMERS_PALLAS_INTERPRET"]


def _rows_value(fp, plan, co0, co1):
    """Pending value of the per-row boundary carries (row b -> first digit
    of row b+1, last wraps to bit 0 — the mod-M_p fold)."""
    rows = fp.rs.L1 * fp.rs.L2
    bs = fp.n // rows
    q = np.concatenate([[0], np.cumsum(plan.widths.astype(np.int64))])
    c0v = np.asarray(co0).reshape(rows, 128)[:, 0].astype(np.uint64)
    c1v = np.asarray(co1).reshape(rows, 128)[:, 0].astype(np.uint64)
    tot = 0
    for b in range(rows):
        c = int(c0v[b]) | (int(c1v[b]) << 32)
        pos = 0 if b == rows - 1 else int(q[(b + 1) * bs])
        tot += c << pos
    return tot


def _to_state(fp, plan, v):
    from prmers_tpu.ops.pallas.gl64 import to_pairs
    import jax.numpy as jnp
    lo, hi = to_pairs(dg.int_to_digits(v, plan.widths))
    sh = (fp.rs.L1, fp.rs.L2, fp.C)
    return jnp.asarray(lo.reshape(sh)), jnp.asarray(hi.reshape(sh))


def _value(fp, plan, d0, d1, co0, co1):
    from prmers_tpu.ops.pallas.gl64 import from_pairs
    mp = (1 << P_EXP) - 1
    digs = from_pairs(np.asarray(d0).reshape(fp.n),
                      np.asarray(d1).reshape(fp.n))
    return (dg.digits_to_int(digs, plan.widths)
            + _rows_value(fp, plan, co0, co1)) % mp


def test_square_chain_with_a(setup):
    plan, fp, tbl, kn = setup
    import jax.numpy as jnp
    mp = (1 << P_EXP) - 1
    rng = np.random.default_rng(5)
    v = int.from_bytes(rng.bytes(P_EXP // 8), "little") % mp
    x0, x1 = _to_state(fp, plan, v)
    zrc = jnp.zeros((fp.rs.L1, fp.rs.L2, 128), jnp.uint32)
    a = (jnp.full((1, 1), np.uint32(3)), jnp.zeros((1, 1), jnp.uint32))

    d0, d1, co0, co1 = kn.square_step(fp, tbl, x0, x1, zrc, zrc, a)
    want = gmp.mod(gmp.mul(gmp.mul(v, v), 3), mp)
    assert _value(fp, plan, d0, d1, co0, co1) == want

    # second step consumes the pending row carries
    d0, d1, co0, co1 = kn.square_step(fp, tbl, d0, d1, co0, co1, a)
    want = gmp.mod(gmp.mul(gmp.mul(want, want), 3), mp)
    assert _value(fp, plan, d0, d1, co0, co1) == want


def test_edge_values(setup):
    """0 and M_p - 1 ((-1)^2 = 1 exercises every wrap), then a follow-up
    step consuming the pending carries."""
    plan, fp, tbl, kn = setup
    import jax.numpy as jnp
    mp = (1 << P_EXP) - 1
    zrc = jnp.zeros((fp.rs.L1, fp.rs.L2, 128), jnp.uint32)
    one = (jnp.full((1, 1), np.uint32(1)), jnp.zeros((1, 1), jnp.uint32))
    for v in (0, mp - 1):
        x0, x1 = _to_state(fp, plan, v)
        d0, d1, co0, co1 = kn.square_step(fp, tbl, x0, x1, zrc, zrc, one,
                                          a_is_one=True)
        want = v * v % mp
        assert _value(fp, plan, d0, d1, co0, co1) == want, v
        d0, d1, co0, co1 = kn.square_step(fp, tbl, d0, d1, co0, co1, one,
                                          a_is_one=True)
        assert _value(fp, plan, d0, d1, co0, co1) == want * want % mp, v


def test_mul_and_fwd(setup):
    plan, fp, tbl, kn = setup
    import jax.numpy as jnp
    mp = (1 << P_EXP) - 1
    rng = np.random.default_rng(9)
    v = int.from_bytes(rng.bytes(P_EXP // 8), "little") % mp
    u = int.from_bytes(rng.bytes(P_EXP // 8), "little") % mp
    x0, x1 = _to_state(fp, plan, v)
    y0, y1 = _to_state(fp, plan, u)
    zrc = jnp.zeros((fp.rs.L1, fp.rs.L2, 128), jnp.uint32)
    one = (jnp.full((1, 1), np.uint32(1)), jnp.zeros((1, 1), jnp.uint32))

    s0, s1 = kn.fwd_step(fp, tbl, y0, y1, zrc, zrc)
    d0, d1, co0, co1 = kn.mul_step(fp, tbl, x0, x1, s0, s1, zrc, zrc, one)
    assert _value(fp, plan, d0, d1, co0, co1) == gmp.mod(gmp.mul(v, u), mp)


@pytest.mark.heavy
def test_whole_chain_kernel(setup):
    """square_chain (K squarings in ONE kernel, VMEM-resident) must
    match big-int x^(2^K) * prod(a) and leave the same carry state the
    per-step pipeline would."""
    plan, fp, tbl, kn = setup
    import jax.numpy as jnp
    assert kn.chain_ok(fp, tbl), "chain kernel must be eligible at 2^15"
    mp = (1 << P_EXP) - 1
    rng = np.random.default_rng(17)
    v = int.from_bytes(rng.bytes(P_EXP // 8), "little") % mp
    x0, x1 = _to_state(fp, plan, v)
    zrc = jnp.zeros((fp.rs.L1, fp.rs.L2, 128), jnp.uint32)
    a_np = np.array([3, 1, 3], dtype=np.uint32)

    d0, d1, co0, co1 = kn.square_chain(fp, tbl, x0, x1, zrc, zrc,
                                       jnp.asarray(a_np))
    want = v
    for a in a_np:
        want = want * want * int(a) % mp
    assert _value(fp, plan, d0, d1, co0, co1) == want

    # a follow-up chain consumes the pending row carries
    d0, d1, co0, co1 = kn.square_chain(fp, tbl, d0, d1, co0, co1,
                                       jnp.asarray(a_np[:2]))
    for a in a_np[:2]:
        want = want * want * int(a) % mp
    assert _value(fp, plan, d0, d1, co0, co1) == want
