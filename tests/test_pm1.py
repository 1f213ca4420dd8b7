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

    # reference: unit_tests.sh pm1_tests (exponent, b1, b2,
    # stage1_factor, stage2_factor) — 0 = expect none; stage-2 factors
    # are the raw gcds the reference prints
    REF_TABLE = [
        (269, 2141, 0, 13822297, 0),
        (269, 192, 0, 0, 0),
        (269, 192, 457, 0, 0),
        (269, 4, 2141, 0, 13822297),
        pytest.param(263, 3527, 16477, 23671, 321269073670148767,
                     marks=pytest.mark.heavy),   # smoke budget
        (569, 9, 677, 0, 55470673),
        (1097, 3, 709, 0, 4576661533441),
        (2151, 256, 4073, 327405968242246366421788399,
         31810015665526476520196715312101168065463218256802641),
        (4133, 23, 2099, 0, 11173615097),
        (44159, 23, 31, 0, 1511297617),
        pytest.param(144139, 3, 3583, 0, 3098700223,
                     marks=pytest.mark.heavy),   # smoke budget
        (544139, 3, 7, 22853839, 22853839),
    ]

    # the reference table's largest case: big transform, run under -m slow
    REF_TABLE_SLOW = [
        (11544157, 19, 101, 0, 44306474567),
    ]

    def _check_row(self, p, b1, b2, f1, f2):
        o = Options(exponent=p, mode="pm1", b1=b1, b2=b2,
                    backend="numpy")
        r = run_pm1(o, log=_silent)
        if b2 <= b1:
            assert r.factor == f1, r.factor
        elif f2 == 0:
            assert r.factor == 0, r.factor
            assert getattr(r, "stage1_factor", 0) == f1
        else:
            # raw stage-2 gcd: must contain the reference factor
            assert r.factor % f2 == 0, r.factor
            # stage-1's own factor: carried on the stage-2 result, or the
            # result IS the stage-1 one when stage 2 found nothing new
            s1 = getattr(r, "stage1_factor",
                         r.factor if r.stage == 1 else 0)
            assert s1 == f1

    @pytest.mark.parametrize("p,b1,b2,f1,f2", REF_TABLE)
    def test_reference_table(self, p, b1, b2, f1, f2):
        self._check_row(p, b1, b2, f1, f2)

    @pytest.mark.slow
    @pytest.mark.parametrize("p,b1,b2,f1,f2", REF_TABLE_SLOW)
    def test_reference_table_slow(self, p, b1, b2, f1, f2):
        self._check_row(p, b1, b2, f1, f2)

    def test_m541_stage1(self):
        o = Options(exponent=541, mode="pm1", b1=899, backend="numpy")
        r = run_pm1(o, log=_silent)
        assert r.factor == 4312790327
        assert r.stage == 1

    @pytest.mark.heavy  # smoke keeps the vtrace m367 golden (S1+S2)
    def test_m367_stage1(self):
        o = Options(exponent=367, mode="pm1", b1=11981, backend="numpy")
        r = run_pm1(o, log=_silent)
        assert r.factor == 646300400639

    @pytest.mark.heavy  # smoke keeps the vtrace m367 golden (S1+S2)
    def test_m367_stage2(self):
        o = Options(exponent=367, mode="pm1", b1=11981, b2=38971,
                    backend="numpy")
        r = run_pm1(o, log=_silent)
        assert r.stage == 2
        assert r.factor == 50500996776315830904406967
        assert r.stage1_factor == 646300400639

    @pytest.mark.heavy
    def test_m367_stage2_b2start(self):
        """-b2start narrows the stage-2 range: the golden's large prime
        is 38971, so starting at 38000 keeps the factor while skipping
        most of (B1, B2]."""
        o = Options(exponent=367, mode="pm1", b1=11981, b2=38971,
                    b2_start=38000, backend="numpy")
        r = run_pm1(o, log=_silent)
        assert r.stage == 2
        assert r.factor % 78138581882953 == 0

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


class TestVTrace:
    def test_m367_stage2_vtrace_golden(self):
        o = Options(exponent=367, mode="pm1", b1=11981, b2=38971,
                    backend="numpy", stage2_variant="vtrace")
        r = run_pm1(o, log=_silent)
        assert r.factor == 50500996776315830904406967
        assert r.stage == 2

    @pytest.mark.heavy
    def test_known_factors_divided_out(self):
        """-factors with P-1: the raw stage-2 gcd contains the known
        factor; the NEW cofactor is reported (reference regression flow:
        README.md:497-505, -nogcd-stage1 -factors ...)."""
        o = Options(exponent=367, mode="pm1", b1=11981, b2=38971,
                    backend="numpy", no_gcd_stage1=True,
                    known_factors=("646300400639",))
        from prmers_tpu.modes.pm1 import run_pm1
        r = run_pm1(o, log=_silent)
        assert r.factor == 78138581882953

    @pytest.mark.slow
    def test_m1362763_vtrace_regression(self):
        """The reference's V-trace stage-2 regression: M1362763 with
        B1=29, B2=6910159, known factors divided out, expected NEW
        factor 28401397572100073 (reference: README.md:497-505).
        q-1 = 2^3*13*29*p*6910159 — the stage-2 prime is B2 itself, so
        the split-range form (-b2start, reference flag) tests the same
        factor hit in minutes instead of scanning 470k primes on CPU."""
        o = Options(exponent=1362763, mode="pm1", b1=29, b2=6910159,
                    b2_start=6900000,
                    backend="jax", no_gcd_stage1=True,
                    known_factors=("46333943", "282345414919"))
        from prmers_tpu.modes.pm1 import run_pm1
        r = run_pm1(o, log=_silent)
        assert r.factor == 28401397572100073

    @pytest.mark.heavy
    def test_classic_variant_still_selectable(self):
        o = Options(exponent=367, mode="pm1", b1=11981, b2=38971,
                    backend="numpy", stage2_variant="classic")
        r = run_pm1(o, log=_silent)
        assert r.factor == 50500996776315830904406967

    def test_auto_d_memory_cap(self):
        from prmers_tpu.modes.pm1 import _vtrace_auto_d, _phi_half_count, \
            VTRACE_BASE_REGS
        d_small = _vtrace_auto_d(10_000, 1_000_000, regs_cap=40)
        assert _phi_half_count(d_small) + VTRACE_BASE_REGS <= 40
        d_big = _vtrace_auto_d(10_000, 1_000_000, regs_cap=400)
        assert d_big >= d_small

    @pytest.mark.heavy
    def test_vtrace_resume(self, tmp_path, monkeypatch):
        """Interrupt after a few giants via a poisoned prime iterator, then
        resume from the compact checkpoint and still find the factor."""
        from prmers_tpu.modes import pm1 as pm1mod
        from prmers_tpu.utils import primes as pr

        o = Options(exponent=367, mode="pm1", b1=11981, b2=38971,
                    backend="numpy", stage2_variant="vtrace",
                    backup_interval=0.0, save_dir=str(tmp_path))
        r1 = pm1mod.run_pm1_stage1(o, log=_silent)

        # interrupt mid-run: with backup_interval=0 a checkpoint lands
        # before every giant's products; kill the run after a few saves
        real_write = pm1mod.ck.write_checkpoint
        saves = {"n": 0}

        def poisoned_write(path, data):
            real_write(path, data)
            saves["n"] += 1
            if saves["n"] >= 4:
                raise KeyboardInterrupt

        monkeypatch.setattr(pm1mod.ck, "write_checkpoint", poisoned_write)
        try:
            pm1mod.run_pm1_stage2_vtrace(o, r1._stage1_x, log=_silent)
            assert False, "poison should have fired"
        except KeyboardInterrupt:
            pass
        monkeypatch.setattr(pm1mod.ck, "write_checkpoint", real_write)

        logs = []
        r2 = pm1mod.run_pm1_stage2_vtrace(o, r1._stage1_x, log=logs.append)
        assert any("Resuming" in str(x) for x in logs)
        assert r2.factor == 50500996776315830904406967


@pytest.mark.heavy
class TestLowMem:
    """Low-memory P-1 variants (reference: 3-reg lowmem / 2-reg
    resume2reg register maps, src/modes/RunPM1.cpp:1408-1700, :6206-6222)."""

    def test_lowmem_full_m367(self, tmp_path):
        o = Options(exponent=367, mode="pm1", b1=11981, b2=38971,
                    backend="numpy", pm1_variant="lowmem",
                    save_dir=str(tmp_path))
        from prmers_tpu.modes.pm1 import run_pm1
        r = run_pm1(o, log=_silent)
        assert r.factor % 50500996776315830904406967 == 0 or \
            r.factor == 50500996776315830904406967

    def test_s2_resume2reg_auto_locate(self, tmp_path):
        """-pm1-s2-resume2reg: stage 1 writes resume_p<p>_B1_<b1>.p95,
        then a stage-2-only run auto-locates it and factors through the
        2-register H^Q stage 2 (reference: RunPM1.cpp resume2reg)."""
        import os
        from prmers_tpu.modes.pm1 import run_pm1
        stem = os.path.join(str(tmp_path), "resume_p367_B1_11981.p95")
        o1 = Options(exponent=367, mode="pm1", b1=11981, b2=0,
                     backend="numpy", save_dir=str(tmp_path),
                     p95_save=stem)
        run_pm1(o1, log=_silent)
        assert os.path.exists(stem)
        o2 = Options(exponent=367, mode="pm1", b1=11981, b2=38971,
                     backend="numpy", save_dir=str(tmp_path),
                     pm1_variant="ultralowmem", s2_resume=True)
        r = run_pm1(o2, log=_silent)
        assert r.factor % 50500996776315830904406967 == 0 or \
            r.factor == 50500996776315830904406967

    def test_s2_resume2reg_missing_file(self, tmp_path):
        o = Options(exponent=367, mode="pm1", b1=11981, b2=38971,
                    backend="numpy", save_dir=str(tmp_path),
                    pm1_variant="ultralowmem", s2_resume=True)
        from prmers_tpu.modes.pm1 import run_pm1
        import pytest as _pt
        with _pt.raises(FileNotFoundError):
            run_pm1(o, log=_silent)

    def test_ultralowmem_1reg_product_exponent_m367(self, tmp_path):
        """Fresh -pm1-ultralowmem: stage 2 is the 1-register
        3^(E*2p*Q) product-exponent recompute (reference:
        README.md:608-636); the gcd covers both stages."""
        o = Options(exponent=367, mode="pm1", b1=11981, b2=38971,
                    backend="numpy", pm1_variant="ultralowmem",
                    no_gcd_stage1=True, save_dir=str(tmp_path))
        from prmers_tpu.modes.pm1 import run_pm1
        r = run_pm1(o, log=_silent)
        assert r.factor % 50500996776315830904406967 == 0 or \
            r.factor == 50500996776315830904406967

    def test_ultralowmem_stage1_m541(self, tmp_path):
        o = Options(exponent=541, mode="pm1", b1=1000, b2=0,
                    backend="numpy", pm1_variant="ultralowmem",
                    save_dir=str(tmp_path))
        from prmers_tpu.modes.pm1 import run_pm1
        r = run_pm1(o, log=_silent)
        assert r.factor == 4312790327

    def test_lowmem_matches_normal_stage1(self, tmp_path):
        """The lowmem exponentiation must produce the same stage-1 X."""
        from prmers_tpu.modes.pm1 import run_pm1_stage1
        o1 = Options(exponent=367, mode="pm1", b1=2000, backend="numpy",
                     save_dir=str(tmp_path / "a"))
        o2 = Options(exponent=367, mode="pm1", b1=2000, backend="numpy",
                     pm1_variant="ultralowmem",
                     save_dir=str(tmp_path / "b"))
        import os
        os.makedirs(o1.save_dir, exist_ok=True)
        os.makedirs(o2.save_dir, exist_ok=True)
        r1 = run_pm1_stage1(o1, log=_silent)
        r2 = run_pm1_stage1(o2, log=_silent)
        assert r1._stage1_x == r2._stage1_x


class TestNkVariant:
    """n^K pairwise-difference stage 2 (reference:
    runPM1Stage2MarinNKVersion, src/modes/RunPM1.cpp:5422)."""

    def test_nk_matches_bigint(self, tmp_path):
        from prmers_tpu.modes.pm1 import run_pm1_stage2_nk
        p = 127
        mp = (1 << p) - 1
        x1 = pow(3, 123456789, mp)
        o = Options(exponent=p, mode="pm1", b1=100, backend="numpy",
                    nmax=5, k_nk=2, save_dir=str(tmp_path))
        logs = []
        r = run_pm1_stage2_nk(o, x1, log=logs.append)
        # acc = prod_{i<j} (x1^(j^2) - x1^(i^2)) mod M_127
        acc = 1
        for i in range(1, 6):
            for j in range(i + 1, 6):
                acc = acc * (pow(x1, j * j, mp) - pow(x1, i * i, mp)) % mp
        import re
        assert r.res64.lower() == f"{acc & 0xFFFFFFFFFFFFFFFF:016x}"

    def test_nk_finds_factor(self, tmp_path):
        """ord_q(H) must divide j^K - i^K for some pair: with H = 3^(2p)
        mod M_29 and factor q = 233 (ord | 232 = 8*29), K=2 and nmax
        covering a pair with j^2 - i^2 divisible by ord works."""
        from prmers_tpu.modes.pm1 import run_pm1
        o = Options(exponent=29, mode="pm1", b1=2, backend="numpy",
                    stage2_variant="nk", nmax=6, k_nk=2,
                    save_dir=str(tmp_path))
        r = run_pm1(o, log=_silent)
        # M29 = 233 * 1103 * 2089; any of them counts
        assert r.factor and ((1 << 29) - 1) % r.factor == 0


class TestP95Handoff:
    """External Prime95 stage-2 orchestration (reference:
    p95_run_pm1_stage2_task, src/modes/RunPM1.cpp:479-633), driven with a
    fake mprime that validates the state file + worktodo line before
    answering — the reference's fake-engine test pattern."""

    FAKE = r'''#!/usr/bin/env python3
import json, os, struct, sys
line = open("worktodo.txt").read().strip()
assert line.startswith("Pminus1=1,2,"), line
parts = line.split("=", 1)[1].split(",")
p, b1, b2 = int(parts[2]), int(parts[4]), int(parts[5])
assert parts[3] == "-1"
with open(f"m{p:07d}", "rb") as f:
    magic, version = struct.unpack("<II", f.read(8))
assert magic == 830093643, magic
out = {"status": os.environ.get("FAKE_STATUS", "F"),
       "exponent": p, "worktype": "PM1", "B1": b1, "B2": b2}
factor = os.environ.get("FAKE_FACTOR", "")
if factor:
    out["factors"] = [factor]
with open("results.json.txt", "w") as f:
    f.write(json.dumps(out) + "\n")
'''

    def _setup_dir(self, tmp_path):
        import os
        import stat
        exe = tmp_path / "mprime"
        exe.write_text(self.FAKE)
        os.chmod(exe, os.stat(exe).st_mode | stat.S_IEXEC)
        return str(tmp_path)

    def test_handoff_factor(self, tmp_path, monkeypatch):
        d = self._setup_dir(tmp_path)
        monkeypatch.setenv("FAKE_FACTOR", "321269073670148767")
        o = Options(exponent=263, mode="pm1", b1=3527, b2=16477,
                    backend="numpy", p95_path=d, save_dir=str(tmp_path))
        r = run_pm1(o, log=_silent)
        assert r.factor == 321269073670148767
        assert r.stage == 2
        assert r.stage1_factor == 23671
        # the state file Prime95 consumed resolves back to the stage-1 X
        from prmers_tpu.io import interop
        import math
        p_in, b1_in, x_in = interop.read_prime95_s1(str(tmp_path /
                                                        "m0000263"))
        assert (p_in, b1_in) == (263, 3527)
        # the handed-off residue carries the stage-1 factor
        assert math.gcd(x_in - 1, (1 << 263) - 1) % 23671 == 0

    def test_handoff_no_factor(self, tmp_path, monkeypatch):
        d = self._setup_dir(tmp_path)
        monkeypatch.setenv("FAKE_STATUS", "NF")
        monkeypatch.delenv("FAKE_FACTOR", raising=False)
        o = Options(exponent=269, mode="pm1", b1=192, b2=457,
                    backend="numpy", p95_path=d, save_dir=str(tmp_path))
        r = run_pm1(o, log=_silent)
        assert r.factor == 0

    def test_handoff_known_factor_skipped(self, tmp_path, monkeypatch):
        d = self._setup_dir(tmp_path)
        monkeypatch.setenv("FAKE_FACTOR", "13822297")
        o = Options(exponent=269, mode="pm1", b1=192, b2=2141,
                    backend="numpy", p95_path=d, save_dir=str(tmp_path),
                    known_factors=("13822297",))
        r = run_pm1(o, log=_silent)
        assert r.factor == 0     # known factor is not re-reported

    def test_missing_exe_falls_back_internal(self, tmp_path):
        # empty dir: orchestration fails, internal stage 2 runs and
        # finds the reference factor
        o = Options(exponent=269, mode="pm1", b1=4, b2=2141,
                    backend="numpy", p95_path=str(tmp_path),
                    save_dir=str(tmp_path))
        logs = []
        r = run_pm1(o, log=logs.append)
        assert r.factor % 13822297 == 0
        assert any("falling back" in str(m) for m in logs)
