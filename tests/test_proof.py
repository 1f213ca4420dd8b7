"""PRP proof golden tests (reference unit_tests.sh:188-204 M9941 hashes)."""

import os

import pytest

from prmers_tpu.core.plan import cached_plan
from prmers_tpu.core.proof import (Proof, ProofSet, best_power,
                                   is_in_points, proof_points)
from prmers_tpu.io.options import Options
from prmers_tpu.modes.prp_ll import run_prp_or_ll

GOLDEN_9941 = [
    "proof [0] : M 87f3d3eabe4d6049, h 4526397be82cea45",
    "proof [1] : M d6a355de518574d7, h 7faf92dd48dc2013",
    "proof [2] : M 5aac235405ca84c7, h 934611f5f1192dd0",
]


class TestPoints:
    def test_best_power(self):
        assert best_power(9941) == 3
        assert best_power(60_000_000) == 10
        assert best_power(240_000_000) == 11
        assert best_power(127) == 2

    def test_points_consistency(self):
        E, power = 9941, 3
        pts = proof_points(E, power)
        assert len(pts) == 1 << power
        assert pts[-1] == E
        for pt in pts:
            assert is_in_points(E, power, pt)
        assert not is_in_points(E, power, 1234)


class TestGoldenProof:
    @pytest.mark.slow
    def test_m9941_proof_hashes(self, tmp_path):
        os.chdir(tmp_path)
        p = 9941
        ps = ProofSet(p, 3, widths=cached_plan(p).widths)
        o = Options(exponent=p, mode="prp", backend="numpy", verbose=False)
        r = run_prp_or_ll(o, proof_set=ps, log=lambda *a: None)
        assert r.is_prime
        lines = []
        proof = ps.compute_proof(log=lines.append)
        assert lines == GOLDEN_9941
        path = proof.save()
        again = Proof.load(path)
        assert again.B == proof.B and again.middles == proof.middles
        assert proof.verify(log=lambda *a: None)

    def test_tampered_proof_fails(self, tmp_path):
        os.chdir(tmp_path)
        p = 1279
        ps = ProofSet(p, 2, widths=cached_plan(p).widths)
        o = Options(exponent=p, mode="prp", backend="numpy", verbose=False)
        run_prp_or_ll(o, proof_set=ps, log=lambda *a: None)
        proof = ps.compute_proof(log=lambda *a: None)
        assert proof.verify(log=lambda *a: None)
        bad = Proof(E=proof.E, B=proof.B ^ 4, middles=proof.middles)
        assert not bad.verify(log=lambda *a: None)


class TestShardedResidueStore:
    """Sharded proof-residue store (VERDICT r4 weak #6): mesh runs write
    per-process digit shards instead of gathering each residue through
    the primary host; the full value materializes only at
    proof-compute time. Forced on single-process via
    PRMERS_PROOF_SHARDED=1 so the CPU mesh exercises the store."""

    def test_round_trip_matches_plain_store(self, tmp_path, monkeypatch):
        import jax
        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-virtual-device mesh")
        monkeypatch.setenv("PRMERS_PROOF_SHARDED", "1")
        from prmers_tpu.parallel.sharded import ShardedEngine
        p = 1279
        mp = (1 << p) - 1
        eng = ShardedEngine(p, 1)
        v = pow(3, 2 ** 19, mp)
        eng.set(0, v)
        ps = ProofSet(p, 2, widths=eng.widths,
                      save_dir=str(tmp_path / "shards"))
        it = ps.points[0]
        ps.checkpoint_engine(eng, it, 0)
        # shard layout on disk, no monolithic residue file
        assert os.path.exists(os.path.join(ps._shard_dir(it),
                                           "manifest.json"))
        assert not os.path.exists(ps._file(it))
        assert ps.load(it) == v
        # equivalence with the packed-words store of the same register
        monkeypatch.delenv("PRMERS_PROOF_SHARDED")
        ps2 = ProofSet(p, 2, widths=eng.widths,
                       save_dir=str(tmp_path / "plain"))
        ps2.checkpoint_engine(eng, it, 0)
        assert os.path.exists(ps2._file(it))
        assert ps2.load(it) == ps.load(it) == v

    def test_corrupt_shard_detected(self, tmp_path, monkeypatch):
        import jax
        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-virtual-device mesh")
        monkeypatch.setenv("PRMERS_PROOF_SHARDED", "1")
        from prmers_tpu.parallel.sharded import ShardedEngine
        p = 1279
        eng = ShardedEngine(p, 1)
        eng.set(0, 12345)
        ps = ProofSet(p, 2, widths=eng.widths, save_dir=str(tmp_path))
        it = ps.points[0]
        ps.checkpoint_engine(eng, it, 0)
        fn = os.path.join(ps._shard_dir(it), "shard_0.bin")
        blob = bytearray(open(fn, "rb").read())
        blob[20] ^= 0xFF
        open(fn, "wb").write(bytes(blob))
        with pytest.raises(ValueError, match="CRC"):
            ps.load(it)
