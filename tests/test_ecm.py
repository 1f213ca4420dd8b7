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
