"""Vectorized complex-Mersenne ops (ops/pallas/mers.py) vs the scalar
field2.Fq2 oracle, including lazy-form edge values."""

import numpy as np

from prmers_tpu.core.field2 import Fq2, M31, M61, S31, S61
from prmers_tpu.ops.pallas import mers

F31 = Fq2(M31, S31)
F61 = Fq2(M61, S61)
rng = np.random.default_rng(3)


def _edges32():
    e = np.array([0, 1, 2, M31 - 1, M31, M31 + 1, (1 << 31),
                  (1 << 32) - 1, (1 << 32) - 2], dtype=np.uint64)
    r = rng.integers(0, 1 << 32, 512 - e.size, dtype=np.uint64)
    return np.concatenate([e, r]).astype(np.uint32)


def _edges62():
    e = np.array([0, 1, M61 - 1, M61, M61 + 1, (1 << 61),
                  (1 << 62) - 1, (1 << 62) - 2], dtype=np.uint64)
    r = rng.integers(0, 1 << 62, 512 - e.size, dtype=np.uint64)
    return np.concatenate([e, r])


class TestM31C:
    def test_mul_sqr_vs_oracle(self):
        g = mers.M31C(np)
        ar, ai = _edges32(), _edges32()[::-1].copy()
        br, bi = _edges32()[::-1].copy(), _edges32()

        rr, ri = g.mul(ar, ai, br, bi)
        cr, ci = g.canon(rr), g.canon(ri)
        sr, si = g.sqr(ar, ai)
        csr, csi = g.canon(sr), g.canon(si)
        assert (rr < (1 << 32)).all() and (ri < (1 << 32)).all()
        for j in range(ar.size):
            a = (int(ar[j]) % M31, int(ai[j]) % M31)
            b = (int(br[j]) % M31, int(bi[j]) % M31)
            w = F31.mul(a, b)
            assert (int(cr[j]), int(ci[j])) == w, j
            w2 = F31.sqr(a)
            assert (int(csr[j]), int(csi[j])) == w2, j

    def test_add_sub(self):
        g = mers.M31C(np)
        a, b = _edges32(), _edges32()[::-1].copy()
        s = g.canon(g.add_base(a, b))
        d = g.canon(g.sub_base(a, b))
        for j in range(a.size):
            av, bv = int(a[j]) % M31, int(b[j]) % M31
            assert int(s[j]) == (av + bv) % M31, j
            assert int(d[j]) == (av - bv) % M31, j


class TestM61C:
    def test_mul_sqr_vs_oracle(self):
        g = mers.M61C(np)
        vals = [_edges62() for _ in range(4)]
        (ar0, ar1), (ai0, ai1) = (mers.m61_to_pairs(vals[0]),
                                  mers.m61_to_pairs(vals[1]))
        (br0, br1), (bi0, bi1) = (mers.m61_to_pairs(vals[2]),
                                  mers.m61_to_pairs(vals[3]))

        rr0, rr1, ri0, ri1 = g.mul(ar0, ar1, ai0, ai1,
                                   br0, br1, bi0, bi1)
        cr = mers.m61_from_pairs(*g.canon(rr0, rr1))
        ci = mers.m61_from_pairs(*g.canon(ri0, ri1))
        sr0, sr1, si0, si1 = g.sqr(ar0, ar1, ai0, ai1)
        csr = mers.m61_from_pairs(*g.canon(sr0, sr1))
        csi = mers.m61_from_pairs(*g.canon(si0, si1))
        # lazy outputs stay in the < 2^62 window
        assert (mers.m61_from_pairs(rr0, rr1) < (1 << 62)).all()
        for j in range(vals[0].size):
            a = (int(vals[0][j]) % M61, int(vals[1][j]) % M61)
            b = (int(vals[2][j]) % M61, int(vals[3][j]) % M61)
            w = F61.mul(a, b)
            assert (int(cr[j]), int(ci[j])) == w, j
            w2 = F61.sqr(a)
            assert (int(csr[j]), int(csi[j])) == w2, j

    def test_add_sub(self):
        g = mers.M61C(np)
        av, bv = _edges62(), _edges62()[::-1].copy()
        a0, a1 = mers.m61_to_pairs(av)
        b0, b1 = mers.m61_to_pairs(bv)
        s = mers.m61_from_pairs(*g.canon(*g.add_base(a0, a1, b0, b1)))
        d = mers.m61_from_pairs(*g.canon(*g.sub_base(a0, a1, b0, b1)))
        for j in range(av.size):
            x, y = int(av[j]) % M61, int(bv[j]) % M61
            assert int(s[j]) == (x + y) % M61, j
            assert int(d[j]) == (x - y) % M61, j
