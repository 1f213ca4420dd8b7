"""Host-side (numpy) tests of the Pallas kernel math: gl64 u32-pair field
ops and the four-step pipeline reference implementation. These validate the
exact arithmetic the TPU kernels run, without needing a TPU (the kernels
share the same namespace-generic code)."""

import numpy as np
import pytest

from prmers_tpu.core import field
from prmers_tpu.core.plan import build_plan
from prmers_tpu.ops.pallas import fourstep as fs
from prmers_tpu.ops.pallas.gl64 import GL, from_pairs, to_pairs
from prmers_tpu.utils import digits as dg

P = field.P
g = GL(np)
rng = np.random.default_rng(42)


def _rand_pairs(n):
    a = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    return a, to_pairs(a)


def _check(got_pair, want_obj):
    got = from_pairs(*got_pair).astype(object)
    assert (got < (1 << 64)).all()
    assert ((got - want_obj) % P == 0).all()


class TestGL64:
    def test_add_sub_mul_sqr(self):
        a, (a0, a1) = _rand_pairs(512)
        b, (b0, b1) = _rand_pairs(512)
        ao, bo = a.astype(object), b.astype(object)
        _check(g.add(a0, a1, b0, b1), ao + bo)
        _check(g.sub(a0, a1, b0, b1), ao - bo)
        _check(g.mul(a0, a1, b0, b1), ao * bo)
        _check(g.sqr(a0, a1), ao * ao)
        _check(g.mul_small(a0, a1, np.uint32(3)), ao * 3)
        _check(g.neg(a0, a1), -ao)

    def test_shiftmul_static(self):
        a, (a0, a1) = _rand_pairs(256)
        ao = a.astype(object)
        for e in (0, 1, 7, 31, 32, 48, 63, 64, 72, 95):
            _check(g.shiftmul(a0, a1, e), ao * (1 << e))

    def test_shiftmul_vector(self):
        a, (a0, a1) = _rand_pairs(256)
        e = rng.integers(0, 96, 256).astype(np.uint32)
        want = np.array([int(x) << int(k) for x, k in zip(a, e)],
                        dtype=object)
        _check(g.shiftmul(a0, a1, e), want)

    def test_canon(self):
        a, (a0, a1) = _rand_pairs(256)
        c0, c1 = g.canon(a0, a1)
        got = from_pairs(c0, c1)
        assert (got.astype(object) == (a.astype(object) % P)).all() or \
            ((got.astype(object) - a.astype(object)) % P == 0).all()
        assert (got.astype(object) < P).all()


class TestFourStep:
    def test_dif_freq_map(self):
        f = fs.dif_freq_of_pos(8)
        assert list(f) == [0, 4, 2, 6, 1, 5, 3, 7]

    def test_root_family(self):
        # omega_m for m | 192 must be the power of two the kernels shift by
        assert fs.root_554(192) == 2
        assert fs.root_554(64) == pow(2, 3, P)
        assert fs.root_554(32) == pow(2, 6, P)

    @pytest.mark.parametrize("n,seed", [(4096, 1), (8192, 2)])
    def test_square_ref_value(self, n, seed):
        p = int(n * 16.5) | 1
        plan = build_plan(p, n=n)
        fp = fs.FourStepPlan.from_plan(plan)
        t = fs.FourStepTables.build(fp, np, G=1, lanes=128)
        r = np.random.default_rng(seed)
        mp = (1 << p) - 1
        v = int.from_bytes(r.bytes(p // 8), "little") % mp
        y = fs.square_ref(t, dg.int_to_digits(v, plan.widths))
        assert int(y.max()) < fp.max_word
        q = np.concatenate(
            [[0], np.cumsum(plan.widths.astype(np.int64))])[:n]
        val = sum(int(x) << int(qq) for x, qq in zip(y, q)) % mp
        assert val == (v * v) % mp
