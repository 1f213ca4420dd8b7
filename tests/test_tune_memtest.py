"""Tune cache and memtest determinism mode."""

from prmers_tpu.core import tune
from prmers_tpu.io.options import Options
from prmers_tpu.modes.memtest import run_memtest


def _silent(*a, **k):
    pass


class TestTuneCache:
    def test_record_lookup_roundtrip(self, tmp_path):
        d = str(tmp_path)
        tune.record(512, "NpEngine", 123.5, d)
        assert tune.lookup(512, "NpEngine", d) == 123.5
        tune.record(512, "NpEngine", 99.0, d)   # worse: keep best
        assert tune.lookup(512, "NpEngine", d) == 123.5
        tune.record(512, "NpEngine", 200.0, d)  # better: replace
        assert tune.lookup(512, "NpEngine", d) == 200.0
        assert tune.lookup(1024, "NpEngine", d) == 0.0

    def test_run_tune_small(self, tmp_path):
        o = Options(exponent=9941, mode="tune", backend="numpy",
                    bench_iters=4, save_dir=str(tmp_path))
        results = tune.run_tune(o, log=_silent)
        assert results and all(v > 0 for v in results.values())
        data = tune.load(str(tmp_path))
        assert data


class TestMemtest:
    def test_clean_pass(self):
        o = Options(exponent=521, mode="memtest", backend="numpy",
                    bench_iters=2)
        r = run_memtest(o, log=_silent)
        assert r.errors == 0
        assert r.roundtrip_errors == 0
        assert r.ips > 0

    def test_cli_modes(self):
        from prmers_tpu.io.cli import parse_args
        assert parse_args(["521", "-memtest"]).mode == "memtest"
        assert parse_args(["-tune"]).mode == "tune"


class TestAppDispatch:
    def test_tune_via_app_no_exponent(self, tmp_path, monkeypatch):
        from prmers_tpu.core.app import run_app
        from prmers_tpu.io.options import Options
        monkeypatch.chdir(tmp_path)
        o = Options(exponent=521, mode="tune", backend="numpy",
                    bench_iters=2, save_dir=str(tmp_path))
        o.exponent = 0  # exponent-less invocation must still dispatch
        # cap the ladder to the first entry for speed
        from prmers_tpu.core import tune as tmod
        monkeypatch.setattr(tmod, "TUNE_EXPONENTS", (127, 521))
        rc = run_app(o, log=_silent)
        assert rc in (0, 1)
        assert tmod.load(str(tmp_path))
