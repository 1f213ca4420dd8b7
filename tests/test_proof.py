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
