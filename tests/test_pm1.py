"""P-1 factoring golden tests (reference unit_tests.sh:54-71 factor table)."""

import pytest

from prmers_tpu.io.options import Options
from prmers_tpu.modes.pm1 import run_pm1, run_pm1_stage1
from prmers_tpu.utils import primes as pr


def _silent(*a, **k):
    pass


class TestPrimes:
    def test_sieve(self):
        ps = pr.sieve(100)
        assert list(ps[:10]) == [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]
        assert len(ps) == 25

    def test_segmented(self):
        import numpy as np
        got = np.concatenate(list(pr.segmented_primes(100, 1000, seg=128)))
        want = pr.sieve(999)
        want = want[want >= 100]
        assert (got == want).all()

    def test_build_e(self):
        # E(10) = 2^3 * 3^2 * 5 * 7 = 2520
        assert pr.build_e(10) == 2520

    def test_build_e_chunks(self):
        full = pr.build_e(1000)
        prod = 1
        for chunk, _ in pr.build_e_chunks(1000, max_bits=64):
            prod *= chunk
        assert prod == full


class TestPm1Golden:
    """Factors from the reference P-1 test table."""

    def test_m541_stage1(self):
        o = Options(exponent=541, mode="pm1", b1=899, backend="numpy")
        r = run_pm1(o, log=_silent)
        assert r.factor == 4312790327
        assert r.stage == 1

    def test_m367_stage1(self):
        o = Options(exponent=367, mode="pm1", b1=11981, backend="numpy")
        r = run_pm1(o, log=_silent)
        assert r.factor == 646300400639

    def test_m367_stage2(self):
        o = Options(exponent=367, mode="pm1", b1=11981, b2=38971,
                    backend="numpy")
        r = run_pm1(o, log=_silent)
        assert r.stage == 2
        assert r.factor == 50500996776315830904406967
        assert r.stage1_factor == 646300400639

    def test_m1277_no_factor_small_bounds(self):
        # M1277 has no small P-1-smooth factor at these bounds
        o = Options(exponent=1277, mode="pm1", b1=100, b2=200,
                    backend="numpy")
        r = run_pm1(o, log=_silent)
        assert r.factor == 0

    @pytest.mark.slow
    def test_gl_window_path(self):
        # large-enough B1 to trigger the GL-checked window path
        o = Options(exponent=541, mode="pm1", b1=50000, backend="numpy",
                    checklevel=2)
        r = run_pm1_stage1(o, log=_silent)
        assert r.factor == 4312790327
