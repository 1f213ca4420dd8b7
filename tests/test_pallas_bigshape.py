"""Shape-cap extension of the fused Pallas pipeline (VERDICT r3 missing
#2): R2 factors > 64 (general MXU matrices, no shift-twiddle family),
the separate-P2/P6 pipeline for shapes whose R2*C exceeds the fused
kernel's VMEM tile budget, lane tiling in the axis-1 pass, and plan
construction for the full reference ladder incl. n = 2^25, 2^26 and
MM31's 5*2^25 (reference: include/marin/ibdwt.h:17-43,
engine_gpu.h:1623).

Numeric checks run the REAL kernel code (interpret mode) at synthetic
small-C shapes that exercise the same code paths as the flagship sizes.
"""

import numpy as np
import pytest

from prmers_tpu.core.plan import cached_plan
from prmers_tpu.ops.pallas import fourstep as fsm
from prmers_tpu.ops.pallas import kernels as kn
from prmers_tpu.ops.pallas.fourstep import (FourStepPlan, FourStepTables,
                                            make_split)
from prmers_tpu.utils import digits as dg


class TestPlans:
    """Plan-level probes: construction only (no table build at full n)."""

    @pytest.mark.parametrize("n,R,C,L2", [
        (1 << 24, 4096, 4096, 64),
        (1 << 25, 4096, 8192, 64),
        (1 << 26, 8192, 8192, 128),
        (5 << 24, 20480, 4096, 320),
        (5 << 25, 20480, 8192, 320),    # MM31's N = 5*2^25
    ])
    @pytest.mark.heavy
    def test_fourstep_plan_builds(self, n, R, C, L2):
        p = int(n * 12.5) | 1
        fp = FourStepPlan.from_plan(cached_plan(p, n))
        assert (fp.R, fp.C) == (R, C)
        assert fp.rs.L1 == 64 and fp.rs.L2 == L2

    def test_mm31_natural_plan(self):
        # MM31 = M(2^31-1): the reference's headline double-Mersenne
        # config runs N = 5*2^25 (reference: engine_gpu.h:1623)
        p = (1 << 31) - 1
        plan = cached_plan(p)
        assert plan.n == 5 << 25
        fp = FourStepPlan.from_plan(plan)
        assert (fp.R, fp.C) == (20480, 8192)

    def test_600m_bench_exponent_plan(self):
        # the largest bench-ladder exponent (reference: App.cpp:670-674)
        fp = FourStepPlan.from_plan(cached_plan(600000001))
        assert fp.n in (1 << 25, 1 << 26)

    def test_r2fold_budget_rule(self):
        fp = FourStepPlan.from_plan(cached_plan(136279841))
        assert kn.use_r2fold(fp)            # flagship: in-kernel P2/P6
        fp26 = FourStepPlan.from_plan(cached_plan(int((1 << 26) * 12.5) | 1,
                                                  1 << 26))
        assert not kn.use_r2fold(fp26)      # 1M-element tile: split path

    def test_big_shapes_lane_tiled_carry_and_mesh(self):
        """C = 8192 shapes (p ~ 500M-1G, MM31) ride the row-carry fast
        path with a LANE-TILED carry phase (carry_ct < C: the within-row
        ripple stops at lane-tile boundaries, the boundary carries defer
        to the next iteration like row carries always did) — and are
        therefore mesh-eligible too. VERDICT r4 missing #1: these were
        the xla-carry hybrid (+2 HBM sweeps/iter) and mesh-excluded."""
        from prmers_tpu.ops.pallas import kernels as kn
        from prmers_tpu.parallel.mesh_engine import mesh_pallas_eligible
        for n in (1 << 25, 1 << 26, 5 << 25):
            p = int(n * 12.5) | 1
            fp = FourStepPlan.from_plan(cached_plan(p, n))
            assert not kn.use_xla_carry(fp)
            assert fp.C == 8192 and kn.carry_tiles(fp) == 2
            # per-(L1-block, r2-tile, lane-tile) carry kernel block is
            # back at the flagship working set
            assert fp.rs.L1 * 8 * kn.carry_ct(fp) <= (1 << 21)
            assert mesh_pallas_eligible(p, n_devices=8, n=n)
        # the flagship family keeps whole-row carries (identical codegen)
        fpf = FourStepPlan.from_plan(cached_plan(136279841))
        assert kn.carry_tiles(fpf) == 1
        assert mesh_pallas_eligible(136279841, n_devices=8)
        # MM31 / 600M production configs: mesh-eligible now
        assert mesh_pallas_eligible((1 << 31) - 1, n_devices=8)
        assert mesh_pallas_eligible(600000001, n_devices=8)

    def test_no_shift_twiddles_past_64(self):
        with pytest.raises(AssertionError):
            fsm.shift_exponents(128)


def _mk_tables(p, n, R, C):
    plan = cached_plan(p, n)
    fp = FourStepPlan(p=p, n=n, R=R, C=C, rs=make_split(R),
                      cs=make_split(C), widths=plan.widths,
                      max_word=plan.max_word)
    t = FourStepTables.build(fp, np, G=kn.G, lanes=kn.LANES)
    fsm.attach_mxu_tables(t)
    fsm.attach_fused_c_tables(t)
    kn.attach_cinrow(t)
    assert t.fused is not None and (kn.use_rowcarry(fp, t)
                                    or kn.use_xla_carry(fp))
    return fp, t


def _square_chain_val(fp, t, v0, steps, a=1):
    """Run `steps` squarings (x^2 * a) through the REAL square_step and
    export the canonical value."""
    import jax.numpy as jnp
    from prmers_tpu.engine.pallas_engine import op_settle
    from prmers_tpu.ops.pallas.gl64 import from_pairs

    digits = dg.int_to_digits(v0, fp.widths)
    sh = (fp.rs.L1, fp.rs.L2, fp.C)
    x0 = jnp.asarray((digits & np.uint64(0xFFFFFFFF)
                      ).astype(np.uint32).reshape(sh))
    x1 = jnp.asarray((digits >> np.uint64(32)
                      ).astype(np.uint32).reshape(sh))
    c0 = jnp.zeros((fp.rs.L1, fp.rs.L2, 128), jnp.uint32)
    c1 = jnp.zeros_like(c0)
    ap = (jnp.full((1, 1), np.uint32(a)), jnp.zeros((1, 1), jnp.uint32))
    for _ in range(steps):
        x0, x1, c0, c1 = kn.square_step(fp, t, x0, x1, c0, c1, ap,
                                        a_is_one=(a == 1))
    w32 = jnp.asarray(fp.widths.astype(np.uint32))
    x0, x1 = op_settle(fp.n, w32, x0, x1, c0, c1)
    d = from_pairs(np.asarray(x0).reshape(fp.n),
                   np.asarray(x1).reshape(fp.n))
    return dg.digits_to_int(d, fp.widths)


@pytest.mark.heavy
class TestBigR2Kernels:
    """R2 = 128 (the n >= 2^25 row split) through the real kernels at a
    synthetic small-C shape; checked against big-int squaring."""

    N = 1 << 21
    P = int((1 << 21) * 16.2) | 1

    def test_r2_128_r2fold_in_kernel(self, monkeypatch):
        """Default budgets: in-kernel P2/P6 runs the L2 = 128 dots."""
        monkeypatch.setenv("PRMERS_PALLAS_INTERPRET", "1")
        fp, t = _mk_tables(self.P, self.N, 8192, 256)
        assert fp.rs.L2 == 128 and kn.use_r2fold(fp)
        mp = (1 << self.P) - 1
        got = _square_chain_val(fp, t, 3, steps=2)
        assert got == pow(3, 4, mp)

    def test_r2_128_split_pipeline(self, monkeypatch):
        """Forced budgets: separate P2/P6 axis passes (the n >= 2^26 /
        MM31 pipeline) + r2-tiled fused kernel + fast-3 carry."""
        monkeypatch.setenv("PRMERS_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("PRMERS_R2FOLD_BUDGET", "16384")
        fp, t = _mk_tables(self.P, self.N, 8192, 256)
        assert not kn.use_r2fold(fp)
        mp = (1 << self.P) - 1
        got = _square_chain_val(fp, t, 3, steps=2, a=3)
        want = (3 * 3 * 3) % mp
        want = (want * want * 3) % mp
        assert got == want


@pytest.mark.heavy
class TestAxis1LaneTiling:
    """CT < C lane tiling in the axis-1 pass (the MM31 / n = 2^26 VMEM
    guard), exercised via the split pipeline at n = 2^19."""

    def test_ct_tiled_axis1_bit_exact(self, monkeypatch):
        monkeypatch.setenv("PRMERS_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("PRMERS_R2FOLD_BUDGET", "4096")
        monkeypatch.setenv("PRMERS_AXIS1_BUDGET", "4096")
        n = 1 << 19
        p = int(n * 16.2) | 1
        fp, t = _mk_tables(p, n, 512, 1024)
        assert not kn.use_r2fold(fp)
        mp = (1 << p) - 1
        got = _square_chain_val(fp, t, 12345, steps=2)
        assert got == pow(12345, 4, mp)


@pytest.mark.heavy
class TestXlaCarryHybrid:
    """The C = 8192 pipeline (Pallas transforms + XLA carry + split
    fwd/inv fused kernels), forced at a small shape via the env levers;
    bit-exact against big-int incl. fast-3 and the multiplicand mul."""

    def test_hybrid_square_chain(self, monkeypatch):
        monkeypatch.setenv("PRMERS_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("PRMERS_XLA_CARRY", "1")
        monkeypatch.setenv("PRMERS_FC_SPLIT", "1")
        n = 1 << 19
        p = int(n * 16.2) | 1
        fp, t = _mk_tables(p, n, 512, 1024)
        assert kn.use_xla_carry(fp) and kn._fc_split(fp)
        assert not kn.use_rowcarry(fp, t)
        mp = (1 << p) - 1
        got = _square_chain_val(fp, t, 3, steps=2, a=3)
        want = (3 * 3 * 3) % mp
        want = (want * want * 3) % mp
        assert got == want

    def test_hybrid_engine_mul(self, monkeypatch):
        monkeypatch.setenv("PRMERS_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("PRMERS_XLA_CARRY", "1")
        monkeypatch.setenv("PRMERS_FC_SPLIT", "1")
        from prmers_tpu.engine.pallas_engine import (PallasEngine,
                                                     _TABLES_CACHE)
        _TABLES_CACHE.clear()
        n = 1 << 19
        p = int(n * 16.2) | 1
        mp = (1 << p) - 1
        from prmers_tpu.core.plan import build_plan
        eng = PallasEngine(p, 3, plan=build_plan(p, n=n))
        assert not eng._rc          # (R1, 1) zero carry state
        eng.set(0, 5)
        eng.square_mul_seq(0, [1, 3])
        want = pow(5, 4, mp) * 3 % mp
        assert eng.get_int(0) == want
        eng.set(1, 7)
        eng.set_multiplicand(2, 1)
        eng.mul(0, 2, 3)
        assert eng.get_int(0) == want * 21 % mp
        _TABLES_CACHE.clear()
