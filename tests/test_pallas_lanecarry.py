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
