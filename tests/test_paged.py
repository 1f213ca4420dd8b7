"""LRU host-paging engine wrapper."""

import numpy as np
import pytest

from prmers_tpu.engine.np_engine import NumpyEngine
from prmers_tpu.engine.paged import PagedEngine, device_reg_budget


class TestPaged:
    P = 1279

    def _pair(self, logical, slots):
        inner = NumpyEngine(self.P, slots)
        return PagedEngine(inner, logical), NumpyEngine(self.P, logical)

    def test_ops_match_unpaged(self):
        paged, ref = self._pair(12, 4)
        mp = (1 << self.P) - 1
        rng = np.random.default_rng(3)
        vals = [int(rng.integers(1, 1 << 60)) for _ in range(12)]
        for e in (paged, ref):
            for i, v in enumerate(vals):
                e.set_int(i, v)
            # touch registers in a pattern that forces eviction cycles
            for i in range(12):
                e.square_mul(i, 3)
            e.set_multiplicand(3, 2)
            e.mul(7, 3, 5)
            e.add(9, 0)
            e.sub_reg(10, 1)
            e.addsub(4, 5, 6, 8)
            e.sub(11, 7)
        for i in range(12):
            assert paged.get_int(i) == ref.get_int(i), f"reg {i}"
        assert paged.page_outs > 0
        assert paged.page_ins > 0

    def test_clean_eviction_skips_writeback(self):
        """Read-only residents (the stage-2 baby-table pattern) evict
        without a device->host dump: the kept host copy is current."""
        paged, _ = self._pair(12, 4)
        for i in range(12):
            paged.set_int(i, 500 + i)          # all dirty, get paged out
        outs0 = paged.page_outs
        # read-only sweep over all 12: every eviction is of a clean page
        for _ in range(3):
            for i in range(12):
                assert paged.get_int(i) == 500 + i
        # after the writes flushed once, pure reads add no write-backs
        assert paged.page_outs <= outs0 + 4   # <= one flush per slot
        assert paged.clean_evictions > 0
        # a write re-dirties and the new value survives eviction
        paged.square_mul(2, 1)
        for i in range(12):
            paged.get_int(i)
        assert paged.get_int(2) == pow(502, 2, (1 << self.P) - 1)

    def test_checkpoint_roundtrip(self):
        paged, _ = self._pair(10, 4)
        for i in range(10):
            paged.set_int(i, 1000 + i)
        blob = paged.get_checkpoint()
        paged2, _ = self._pair(10, 4)
        paged2.set_checkpoint(blob)
        for i in range(10):
            assert paged2.get_int(i) == 1000 + i

    def test_budget_env(self, monkeypatch):
        monkeypatch.setenv("PRMERS_MAX_DEVICE_REGS", "17")
        assert device_reg_budget(1 << 23) == 17
        monkeypatch.delenv("PRMERS_MAX_DEVICE_REGS")
        b = device_reg_budget(1 << 23, hbm_bytes=16 << 30)
        assert 100 < b < 250

    @pytest.mark.heavy  # smoke budget
    def test_ecm_runs_paged(self):
        """Edwards ECM (32+ registers) on a 6-slot inner engine."""
        from prmers_tpu.modes.ecm_edwards import run_ecm_edwards
        from prmers_tpu.io.options import Options
        import prmers_tpu.modes.ecm_edwards as mod
        # run through a paged engine by monkey-wrapping create_engine
        orig = mod.create_engine

        def paged_create(p, regs, **kw):
            inner = NumpyEngine(p, 8)
            return PagedEngine(inner, regs)

        mod.create_engine = paged_create
        try:
            o = Options(exponent=29, mode="ecm", b1=300, b2=0, curves=3,
                        curve_seed=7, backend="numpy")
            r = run_ecm_edwards(o, log=lambda *a: None)
        finally:
            mod.create_engine = orig
        assert r.factor > 1 and ((1 << 29) - 1) % r.factor == 0


def test_paged_multiplicand_survives_eviction():
    """Paging out a prepared multiplicand must keep its spectral tag so a
    later mul against it is still correct (reference: prepared
    multiplicands live in regs 43-50 across ECM paging,
    src/modes/RunEcmTwistedEdwards.cpp:1859-1863)."""
    import random
    from prmers_tpu.engine.jax_engine import JaxEngine
    from prmers_tpu.engine.paged import PagedEngine
    p = 127
    mp = (1 << p) - 1
    rnd = random.Random(3)
    inner = JaxEngine(p, 2)          # only 2 device slots
    eng = PagedEngine(inner, 6)      # 6 logical registers
    x, y = rnd.randrange(mp), rnd.randrange(mp)
    eng.set_int(0, x)
    eng.set_int(1, y)
    eng.set_multiplicand(2, 1)
    # churn other registers so logical 2 (the multiplicand) is evicted
    for r in (3, 4, 5):
        eng.set_int(r, r)
    assert 2 in eng._host            # really paged out
    eng.mul(0, 2)
    assert eng.get_int(0) == x * y % mp
