"""Lane-tiled carry phase (kn.carry_ct < C): the C = 8192 production
shapes' carry path, exercised at a small shape by forcing the budget
down (PRMERS_CARRY_BUDGET). Within-row ripple stops at lane-tile
boundaries; boundary carries defer to the next iteration exactly like
row carries (carry units become CT consecutive digits).

Reference analog: the two-phase carry-weight kernels
(kernels/marin.cl:1696-2414) — the reference runs MM31-class shapes
natively on its one fast engine (include/marin/engine_gpu.h:1623);
this is the TPU equivalent (VERDICT r4 missing #1 / next #3).
"""

import numpy as np
import pytest

N0 = 1 << 16
P0 = int(N0 * 16.2) | 1
MP = (1 << P0) - 1


@pytest.fixture(scope="module")
def eng():
    mp = pytest.MonkeyPatch()
    mp.setenv("PRMERS_PALLAS_INTERPRET", "1")
    # (L1, S, CT) = (64, 1, 256): T = 4 lane tiles per row
    mp.setenv("PRMERS_CARRY_BUDGET", "16384")
    from prmers_tpu.core.plan import cached_plan
    from prmers_tpu.ops.pallas import kernels as kn
    from prmers_tpu.ops.pallas.fourstep import FourStepPlan
    from prmers_tpu.engine.pallas_engine import PallasEngine
    plan = cached_plan(P0, N0)
    fp = FourStepPlan.from_plan(plan)
    assert kn.carry_tiles(fp) == 4 and not kn.use_xla_carry(fp)
    e = PallasEngine(P0, 2, plan=plan)
    assert e._rc, "lane-tiled carry must ride the row-carry pipeline"
    assert e._csh == (fp.rs.L1, fp.rs.L2, 4 * 128)
    yield e
    mp.undo()


@pytest.mark.heavy
class TestLaneTiledCarry:
    def test_square_chain_bit_exact(self, eng):
        eng.set(0, 3)
        want = 3
        for a in (1, 3, 1, 1, 3):
            eng.square_mul(0, a)
            want = want * want * a % MP
        assert eng.get_int(0) == want

    def test_wrap_fold(self, eng):
        eng.set(1, MP - 5)
        eng.square_mul(1, 7)
        assert eng.get_int(1) == (MP - 5) ** 2 * 7 % MP

    def test_seq_and_multiplicand(self, eng):
        a_vec = [1, 3, 1, 3, 1, 1, 3, 9]
        eng.set(0, 12345)
        eng.square_mul_seq(0, a_vec)
        want = 12345
        for a in a_vec:
            want = want * want * a % MP
        assert eng.get_int(0) == want
        eng.set_multiplicand(1, 0)
        eng.mul(0, 1, 5)
        want = want * want * 5 % MP
        assert eng.get_int(0) == want


@pytest.mark.heavy
class TestFusedLlSub2:
    """The LL step's -2 fused into the P7 carry kernel as +(M_p - 2)
    (digits computed in-kernel from the widths; no table). Before this,
    every PallasEngine LL iteration paid op_settle + op_linear — two
    full HBM digit passes (reference fuses the same way,
    kernels/marin.cl:1696-2414). `eng` runs the lane-tiled carry
    (T = 4), so this also covers the 2D-grid digit-0 predicate."""

    def test_ll_chain_bit_exact_lane_tiled(self, eng):
        eng.set(0, 4)
        eng.square_sub2_seq(0, 6)
        want = 4
        for _ in range(6):
            want = (want * want - 2) % MP
        assert eng.get_int(0) == want

    def test_ll_chain_whole_row_carry(self):
        # T = 1 variant: restore the default budget (the module fixture
        # leaves the forced-small one in the environment)
        mp = pytest.MonkeyPatch()
        mp.setenv("PRMERS_PALLAS_INTERPRET", "1")
        mp.setenv("PRMERS_CARRY_BUDGET", str(1 << 21))
        try:
            from prmers_tpu.core.plan import cached_plan
            from prmers_tpu.engine.pallas_engine import PallasEngine
            from prmers_tpu.ops.pallas import kernels as kn
            from prmers_tpu.ops.pallas.fourstep import FourStepPlan
            n = 1 << 15
            p = int(n * 16.3) | 1
            m = (1 << p) - 1
            assert kn.carry_tiles(
                FourStepPlan.from_plan(cached_plan(p, n))) == 1
            e = PallasEngine(p, 1, plan=cached_plan(p, n))
            assert e._rc
            e.set(0, 4)
            e.square_sub2_seq(0, 5)
            want = 4
            for _ in range(5):
                want = (want * want - 2) % m
            assert e.get_int(0) == want
        finally:
            mp.undo()
