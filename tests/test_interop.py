"""GMP-ECM / Prime95 interop formats and P-1 B1 extension."""

import struct

import pytest

from prmers_tpu.io import interop
from prmers_tpu.io.options import Options
from prmers_tpu.modes.pm1 import run_pm1
from prmers_tpu.utils.primes import build_e, build_e_delta


def _silent(*a, **k):
    pass


class TestFormats:
    def test_ecm_resume_roundtrip(self, tmp_path):
        path = str(tmp_path / "x.save")
        x = 0x1234DEADBEEF0123456789
        interop.write_ecm_resume(path, 11981, 367, x)
        b1, p, x2 = interop.read_ecm_resume(path)
        assert (b1, p, x2) == (11981, 367, x)
        line = open(path).read()
        assert "METHOD=P-1;" in line and "N=2^367-1;" in line
        assert f"CHECKSUM={interop.ecm_checksum_pm1(11981, 367, x)};" in line

    def test_ecm_resume_checksum_reject(self, tmp_path):
        path = str(tmp_path / "bad.save")
        interop.write_ecm_resume(path, 100, 127, 42)
        s = open(path).read().replace("X=0x2a", "X=0x2b")
        open(path, "w").write(s)
        try:
            interop.read_ecm_resume(path)
            assert False
        except ValueError:
            pass

    def test_p95_roundtrip(self, tmp_path):
        path = str(tmp_path / "m541.p95")
        x = (1 << 500) - 987654321
        interop.write_prime95_s1(path, 541, 9000, x)
        p, b1, x2 = interop.read_prime95_s1(path)
        assert (p, b1, x2) == (541, 9000, x)
        blob = open(path, "rb").read()
        assert struct.unpack_from("<I", blob, 0)[0] == 830093643
        assert b"MOREINFOJSONDATA" in blob

    def test_le_pad4(self):
        assert len(interop.x_to_le_bytes_pad4(1)) == 4
        assert interop.x_to_le_bytes_pad4(0x01020304) == b"\x04\x03\x02\x01"


class TestB1Extension:
    def test_delta_algebra(self):
        # E(b1_new) == E(b1_old) * delta for prime-power bookkeeping
        for old, new in ((300, 899), (100, 1000)):
            assert build_e(old) * build_e_delta(old, new) == build_e(new)

    def test_pm1_resume_extend_finds_factor(self, tmp_path):
        # stage 1 at B1=300 misses 4312790327 (M541); extending the
        # exported file to B1=899 must find it
        path = str(tmp_path / "m541.save")
        o1 = Options(exponent=541, mode="pm1", b1=300, backend="numpy",
                     resume_save=path, save_dir=str(tmp_path))
        r1 = run_pm1(o1, log=_silent)
        assert r1.factor == 0
        o2 = Options(exponent=541, mode="pm1", b1=899, backend="numpy",
                     resume_load=path, save_dir=str(tmp_path))
        r2 = run_pm1(o2, log=_silent)
        assert r2.factor == 4312790327

    def test_filemers_conversion(self, tmp_path):
        """-filemers: a PrMers .mers checkpoint (raw LE u64 digit
        vector, <p>pm<B1>.mers) converts to a checksummed GMP-ECM .save
        (reference: App::exportResumeFromMersFile)."""
        import numpy as np
        from prmers_tpu.core.plan import cached_plan
        from prmers_tpu.utils import digits as dgu
        p, b1 = 541, 899
        x = 0x123456789ABCDEF0FEDCBA
        v = dgu.int_to_digits(x, cached_plan(p).widths)
        mers = str(tmp_path / f"{p}pm{b1}.mers")
        v.astype("<u8").tofile(mers)
        out = interop.convert_mers_to_save(mers)
        assert interop.read_ecm_resume(out) == (b1, p, x)

    def test_auto_resume_export_writes_both(self, tmp_path):
        """-resume: canonical-named .save + .p95 appear after stage 1
        (reference -resume / chainpm1.sh flow)."""
        import os
        o = Options(exponent=541, mode="pm1", b1=300, backend="numpy",
                    save_dir=str(tmp_path), auto_resume_export=True)
        run_pm1(o, log=_silent)
        stem = os.path.join(str(tmp_path), "resume_p541_B1_300")
        assert os.path.exists(stem + ".save")
        assert os.path.exists(stem + ".p95")

    def test_b1old_auto_locate_extends(self, tmp_path):
        """-b1old <old>: the resume_p<p>_B1_<old>.save file is located in
        save_dir automatically and stage 1 extends to the new -b1
        (reference: CliParser.cpp -b1old)."""
        path = str(tmp_path / "resume_p541_B1_300.save")
        o1 = Options(exponent=541, mode="pm1", b1=300, backend="numpy",
                     resume_save=path, save_dir=str(tmp_path))
        r1 = run_pm1(o1, log=_silent)
        assert r1.factor == 0
        o2 = Options(exponent=541, mode="pm1", b1=899, b1_old=300,
                     backend="numpy", save_dir=str(tmp_path))
        r2 = run_pm1(o2, log=_silent)
        assert r2.factor == 4312790327

    @pytest.mark.heavy
    def test_pm1_resume_p95_stage2(self, tmp_path):
        # export .p95 after stage 1, then run stage 2 from the import only
        path = str(tmp_path / "m367.p95")
        o1 = Options(exponent=367, mode="pm1", b1=11981, backend="numpy",
                     p95_save=path, save_dir=str(tmp_path))
        run_pm1(o1, log=_silent)
        o2 = Options(exponent=367, mode="pm1", b1=11981, b2=38971,
                     backend="numpy", resume_load=path,
                     save_dir=str(tmp_path))
        r2 = run_pm1(o2, log=_silent)
        assert r2.factor == 50500996776315830904406967
