"""LL-safe (√3 pair) and cofactor-PRP golden tests."""

import pytest

from prmers_tpu.io.options import Options
from prmers_tpu.modes.llsafe import run_llsafe
from prmers_tpu.modes.prp_ll import run_prp_or_ll


def _silent(*a, **k):
    pass


class TestLlSafe:
    @pytest.mark.parametrize("p,want", [
        (127, True), (11, False), (521, True),
        # single-core smoke budget (VERDICT r4 next #6): the longest
        # known-composite run rides the heavy tier
        pytest.param(929, False, marks=pytest.mark.heavy)])
    def test_known(self, p, want):
        o = Options(exponent=p, mode="llsafe", backend="numpy",
                    checklevel=2, verbose=False)
        r = run_llsafe(o, log=_silent)
        assert r.is_prime == want

    def test_error_injection_recovery(self):
        o = Options(exponent=521, mode="llsafe", backend="numpy",
                    checklevel=1, erroriter=100)
        r = run_llsafe(o, log=_silent)
        assert r.is_prime
        assert r.gerbicz_errors >= 1


class TestCofactorPrp:
    """Reference golden: M2699 cofactor (unit_tests.sh:216-235)."""
    F4 = ("5399", "307687", "1187561", "7570504839257")

    @pytest.mark.heavy
    def test_m2699_composite_with_4_factors(self):
        o = Options(exponent=2699, mode="prp", backend="numpy",
                    known_factors=self.F4, verbose=False, proof=False)
        r = run_prp_or_ll(o, log=_silent)
        assert r.cofactor_prp is False

    @pytest.mark.slow
    def test_m2699_prp_with_5_factors(self):
        o = Options(exponent=2699, mode="prp", backend="numpy",
                    known_factors=self.F4 + ("1987104667810711",),
                    verbose=False, proof=False)
        r = run_prp_or_ll(o, log=_silent)
        assert r.cofactor_prp is True

    @pytest.mark.heavy
    def test_bad_factor_rejected(self):
        o = Options(exponent=2699, mode="prp", backend="numpy",
                    known_factors=("7",), verbose=False, proof=False)
        with pytest.raises(ValueError):
            run_prp_or_ll(o, log=_silent)


class TestLlSafe2:
    def test_m127_prime(self):
        from prmers_tpu.modes.llsafe import run_llsafe2
        o = Options(exponent=127, mode="llsafe2", backend="numpy")
        r = run_llsafe2(o, log=_silent)
        assert r.is_prime

    def test_m257_composite(self):
        from prmers_tpu.modes.llsafe import run_llsafe2
        o = Options(exponent=257, mode="llsafe2", backend="numpy")
        r = run_llsafe2(o, log=_silent)
        assert not r.is_prime

    def test_error_injection_recovers(self):
        from prmers_tpu.modes.llsafe import run_llsafe2
        logs = []
        o = Options(exponent=127, mode="llsafe2", backend="numpy",
                    erroriter=40, llsafe_block=16)
        r = run_llsafe2(o, log=logs.append)
        assert r.is_prime
        joined = "\n".join(str(x) for x in logs)
        assert "Injected error" in joined
        assert "Check FAILED" in joined
        assert r.gerbicz_errors >= 1

    def test_block_size_flag(self):
        from prmers_tpu.io.cli import parse_args
        o = parse_args(["127", "-llsafe2", "-llsafeb", "32"])
        assert o.mode == "llsafe2"
        assert o.llsafe_block == 32
