"""ECM mode tests: Suyama curve construction and end-to-end factor finds."""

import math

import pytest

from prmers_tpu.io.options import Options
from prmers_tpu.modes.ecm import run_ecm, splitmix64, suyama_curve


def _silent(*a, **k):
    pass


class TestCurve:
    def test_splitmix_deterministic(self):
        assert splitmix64(1) == splitmix64(1)
        assert splitmix64(1) != splitmix64(2)

    def test_suyama_point_on_curve(self):
        # verify B*y^2 = x^3 + A x^2 + x is satisfiable: with Suyama's
        # construction, A = 4*a24 - 2 and x0 must give a QR-consistent RHS;
        # here just check algebraic consistency of a24 vs A recomputed.
        n = (1 << 101) - 1  # composite Mersenne as a ring
        sigma = 987654321
        x0, a24 = suyama_curve(sigma, n)
        u = (sigma * sigma - 5) % n
        v = (4 * sigma) % n
        # x0 = u^3/v^3
        assert x0 * pow(v, 3, n) % n == pow(u, 3, n)
        # (A+2)*4 u^3 v == (v-u)^3 (3u+v) with A = 4 a24 - 2
        lhs = (4 * a24) % n * 4 * pow(u, 3, n) * v % n
        rhs = pow(v - u, 3, n) * (3 * u + v) % n
        assert lhs == rhs


class TestEcmFactors:
    def test_m29_small_factors(self):
        # M29 = 233 * 1103 * 2089: every prime factor has tiny group orders
        o = Options(exponent=29, mode="ecm", b1=300, b2=0, curves=2,
                    curve_seed=7, backend="numpy")
        r = run_ecm(o, log=_silent)
        assert r.factor > 1
        assert ((1 << 29) - 1) % r.factor == 0

    def test_m37_stage2(self):
        # M37 = 223 * 616318177; 223 found fast, usually in stage 1 or 2
        o = Options(exponent=37, mode="ecm", b1=20, b2=400, curves=4,
                    curve_seed=3, backend="numpy")
        r = run_ecm(o, log=_silent)
        assert r.factor > 1
        assert ((1 << 37) - 1) % r.factor == 0

    @pytest.mark.slow
    def test_m67_stage2(self):
        o = Options(exponent=67, mode="ecm", b1=2000, b2=50000, curves=12,
                    curve_seed=1, backend="numpy")
        r = run_ecm(o, log=_silent)
        assert r.factor == 193707721
        assert r.stage == 2

    def test_batched_matches_classic(self, monkeypatch):
        """SPMD curve batching (lanes of one register file) must report
        the same factor/curve/stage as the sequential loop."""
        o = Options(exponent=37, mode="ecm", b1=20, b2=400, curves=4,
                    curve_seed=3, backend="jax")
        logs = []
        r_b = run_ecm(o, log=lambda *a: logs.append(" ".join(map(str, a))))
        assert any("ECM batched" in ln for ln in logs), logs[:3]
        monkeypatch.setenv("PRMERS_ECM_NO_BATCH", "1")
        r_c = run_ecm(o, log=_silent)
        assert (r_b.factor, r_b.stage, r_b.factor_curve) == \
            (r_c.factor, r_c.stage, r_c.factor_curve)
        assert r_b.factor > 1 and ((1 << 37) - 1) % r_b.factor == 0


class TestTorsionFamilies:
    """Montgomery torsion-8 / torsion-16 parametrizations (reference:
    picked_mode 1/2 constructions, src/modes/RunEcm.cpp:1480-1560)."""

    def test_torsion8_curve_on_curve(self):
        from prmers_tpu.modes.ecm import torsion8_curve
        n = (1 << 101) - 1
        x0, a24, a = torsion8_curve(5, n)
        # A = 4*a24 - 2; B y^2 = x^3 + A x^2 + x must have a valid RHS
        A = (4 * a24 - 2) % n
        rhs = (pow(x0, 3, n) + A * x0 % n * x0 + x0) % n
        assert rhs != 0 and x0 != 0

    def test_m29_factor_torsion8(self):
        o = Options(exponent=29, mode="ecm", b1=300, b2=0, curves=6,
                    curve_seed=9, torsion=8, backend="numpy",
                    edwards=False)
        from prmers_tpu.modes.ecm import run_ecm
        r = run_ecm(o, log=_silent)
        assert r.factor and ((1 << 29) - 1) % r.factor == 0

    def test_m37_factor_torsion16(self):
        o = Options(exponent=37, mode="ecm", b1=200, b2=3000, curves=8,
                    curve_seed=3, torsion=16, backend="numpy",
                    edwards=False)
        from prmers_tpu.modes.ecm import run_ecm
        r = run_ecm(o, log=_silent)
        assert r.factor and ((1 << 37) - 1) % r.factor == 0

    def test_resume_line_export(self, tmp_path):
        path = tmp_path / "ecm_resume.save"
        # M127 is prime: no factor interferes, the export always lands
        o = Options(exponent=127, mode="ecm", b1=100, b2=0, curves=1,
                    curve_seed=123456, backend="numpy", edwards=False,
                    torsion=0, resume_save=str(path))
        from prmers_tpu.modes.ecm import run_ecm
        run_ecm(o, log=_silent)
        text = path.read_text()
        assert "METHOD=ECM;" in text and "SIGMA=" in text
        assert "N=2^127-1" in text and "CHECKSUM=" in text


class TestP95EcmHandoff:
    """ECM stage-2 Prime95 handoff orchestration (reference:
    p95_enqueue_curve / ECMSTAGE2 worktodo line,
    RunEcmTwistedEdwards.cpp:1160-1199), driven with a fake mprime."""

    FAKE = r'''#!/usr/bin/env python3
import json, os
line = open("worktodo.txt").read().strip()
assert line.startswith('ECMSTAGE2=N/A,1,2,'), line
parts = line.split("=", 1)[1].split(",")
assert parts[0] == "N/A" and parts[4] == "-1", parts
p = int(parts[3])
fname = parts[5].strip('"')
b2 = int(parts[6])
resume = open(fname).read()
assert "METHOD=ECM;" in resume and f"N=2^{p}-1" in resume, resume
out = {"status": "F", "exponent": p, "worktype": "ECM", "B2": b2,
       "factors": [os.environ["FAKE_FACTOR"]]}
with open("results.json.txt", "w") as f:
    f.write(json.dumps(out) + "\n")
'''

    def test_handoff_factor(self, tmp_path, monkeypatch):
        import os
        import stat
        exe = tmp_path / "mprime"
        exe.write_text(self.FAKE)
        os.chmod(exe, os.stat(exe).st_mode | stat.S_IEXEC)
        monkeypatch.setenv("FAKE_FACTOR", "223")
        # M127 is prime: stage 1 can never find a factor, so the handoff
        # always fires and the reported factor is the fake's answer
        o = Options(exponent=127, mode="ecm", b1=20, b2=400, curves=1,
                    curve_seed=999, backend="numpy", edwards=False,
                    torsion=0, p95_path=str(tmp_path))
        r = run_ecm(o, log=_silent)
        assert r.factor == 223
        assert r.stage == 2
        assert (tmp_path / "results.json.txt").exists()
