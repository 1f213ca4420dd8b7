"""Radix-5 shapes whose r2 extent is NOT a multiple of 8 (R2 = 10, 20).

Regression for the device GL-smoke failures at n = 5*2^17 / 5*2^18: the
r2-tiled passes picked S = 8 whenever R2 >= 8, so grid = R2 // 8
truncated and sub-columns 8.. were silently dropped. The kernel plans
here hand-shrink C so the R2 = 10 / 20 splits are exercised at test
sizes (FourStepPlan.from_plan only produces them at n >= 5*2^17).
"""

import numpy as np
import pytest

from prmers_tpu.core.plan import build_plan
from prmers_tpu.utils import digits as dg
from prmers_tpu.utils import gmp


@pytest.fixture(scope="module", params=[
    640,
    # smoke budget: the larger radix-5 shape rides the heavy tier
    pytest.param(1280, marks=pytest.mark.heavy)])
def setup(request):
    import os
    os.environ["PRMERS_PALLAS_INTERPRET"] = "1"
    import jax.numpy as jnp
    from prmers_tpu.ops.pallas import fourstep as fs
    from prmers_tpu.ops.pallas import kernels as kn

    R = request.param                    # 640 -> rs (64, 10); 1280 -> (64, 20)
    C = 256
    n = R * C
    p = int(n * 16.5) | 1
    plan = build_plan(p, n=n)
    fp = fs.FourStepPlan(p=p, n=n, R=R, C=C, rs=fs.make_split(R),
                         cs=fs.make_split(C), widths=plan.widths,
                         max_word=plan.max_word)
    assert fp.rs.L2 in (10, 20)
    tbl = fs.FourStepTables.build(fp, jnp, G=8, lanes=128)
    fs.attach_mxu_tables(tbl)
    fs.attach_fused_c_tables(tbl)
    kn.attach_cinrow(tbl)
    assert kn.use_rowcarry(fp, tbl)
    yield p, plan, fp, tbl, kn
    del os.environ["PRMERS_PALLAS_INTERPRET"]


def _state(fp, plan, v):
    from prmers_tpu.ops.pallas.gl64 import to_pairs
    import jax.numpy as jnp
    lo, hi = to_pairs(dg.int_to_digits(v, plan.widths))
    sh = (fp.rs.L1, fp.rs.L2, fp.C)
    return jnp.asarray(lo.reshape(sh)), jnp.asarray(hi.reshape(sh))


def _value(p, fp, plan, d0, d1, co0, co1):
    from prmers_tpu.ops.pallas.gl64 import from_pairs
    mp = (1 << p) - 1
    digs = from_pairs(np.asarray(d0).reshape(fp.n),
                      np.asarray(d1).reshape(fp.n))
    v = dg.digits_to_int(digs, plan.widths)
    rows = fp.rs.L1 * fp.rs.L2
    bs = fp.n // rows
    q = np.concatenate([[0], np.cumsum(plan.widths.astype(np.int64))])
    c0 = np.asarray(co0).reshape(rows, 128)[:, 0].astype(np.uint64)
    c1 = np.asarray(co1).reshape(rows, 128)[:, 0].astype(np.uint64)
    for b in range(rows):
        c = int(c0[b]) | (int(c1[b]) << 32)
        pos = 0 if b == rows - 1 else int(q[(b + 1) * bs])
        v += c << pos
    return v % mp


def test_square_steps_r2_not_multiple_of_8(setup):
    p, plan, fp, tbl, kn = setup
    import jax.numpy as jnp
    mp = (1 << p) - 1
    rng = np.random.default_rng(11)
    v = int.from_bytes(rng.bytes(p // 8), "little") % mp
    x0, x1 = _state(fp, plan, v)
    zrc = jnp.zeros((fp.rs.L1, fp.rs.L2, 128), jnp.uint32)
    a3 = (jnp.full((1, 1), np.uint32(3)), jnp.zeros((1, 1), jnp.uint32))

    d0, d1, co0, co1 = kn.square_step(fp, tbl, x0, x1, zrc, zrc, a3)
    want = gmp.mod(gmp.mul(gmp.mul(v, v), 3), mp)
    assert _value(p, fp, plan, d0, d1, co0, co1) == want

    d0, d1, co0, co1 = kn.square_step(fp, tbl, d0, d1, co0, co1, a3)
    want = gmp.mod(gmp.mul(gmp.mul(want, want), 3), mp)
    assert _value(p, fp, plan, d0, d1, co0, co1) == want
