"""Vectorized GF(M31^2) / GF(M61^2) complex arithmetic on u32 arrays —
the VPU layer of the second arithmetic path ("fft3161").

Namespace-generic (numpy / jax.numpy inside Pallas), int32-lane ops only,
mirroring gl64.GL. Representations:

  * M31 plane: each component one u32, LAZY < 2^32 (any residue class
    mod M31 = 2^31 - 1); `red` folds to < 2^31 + 1 via x -> (x & M31) +
    (x >> 31).
  * M61 plane: each component a (lo, hi) u32 pair, LAZY < 2^62
    (hi < 2^30); `red` folds to < 2^61 + 8.

These ops exist to make the fft3161 hardware economics MEASURABLE
(tools/microbench_fields.py): on 16-bit-multiplier VPU lanes the
complex-Mersenne general multiply costs ~2x the Goldilocks mulmod per
payload bit (see PERF.md "Rejected by op-count analysis"), which is why
the Pallas fft3161 engine is a capacity/shape tool, not a speed path.
Reference counterpart: third_party/aevum/src/cl/math.cl:618-640 (GF31/
GF61 folds — native u32 mul on GPUs, which is the economic difference).
"""

from __future__ import annotations

import numpy as np

M31 = (1 << 31) - 1
M61 = (1 << 61) - 1


def _c(xp, v):
    return xp.uint32(v)


class M31C:
    """GF(M31^2) = a + b*i (i^2 = -1) on u32 arrays, lazy < 2^32."""

    def __init__(self, xp):
        self.xp = xp

    def red(self, x):
        """lazy32 -> < 2^31 + 1."""
        xp = self.xp
        return (x & _c(xp, M31)) + (x >> _c(xp, 31))

    def canon(self, x):
        xp = self.xp
        r = self.red(self.red(x))          # < 2^31 + 1 -> <= 2^31
        ge = r >= _c(xp, M31)
        return xp.where(ge, r - _c(xp, M31), r)

    def _mul_base(self, a, b):
        """base mul of reduced inputs (< 2^31 + 1): lazy32 out (~20 ops)."""
        from .gl64 import _native_mullo
        xp = self.xp
        a0 = a & _c(xp, 0xFFFF)
        a1 = a >> _c(xp, 16)
        b0 = b & _c(xp, 0xFFFF)
        b1 = b >> _c(xp, 16)
        p00 = a0 * b0
        p01 = a0 * b1
        p10 = a1 * b0
        p11 = a1 * b1
        mid = (p00 >> _c(xp, 16)) + (p01 & _c(xp, 0xFFFF)) + \
              (p10 & _c(xp, 0xFFFF))
        if _native_mullo():
            lo = a * b          # native 32-bit muli (wraps mod 2^32)
        else:
            lo = (p00 & _c(xp, 0xFFFF)) | (mid << _c(xp, 16))
        hi = p11 + (p01 >> _c(xp, 16)) + (p10 >> _c(xp, 16)) + \
            (mid >> _c(xp, 16))
        # value mod M31: (lo & M31) + (lo>>31 | hi<<1); hi < 2^30 + 1
        return (lo & _c(xp, M31)) + ((lo >> _c(xp, 31)) |
                                     (hi << _c(xp, 1)))

    def mul_base(self, a, b):
        return self._mul_base(self.red(a), self.red(b))

    def add_base(self, a, b):
        # red(x) can be exactly 2^31; double-red (<= 2^31 - 1) keeps the
        # u32 sum from wrapping
        return self.red(self.red(a)) + self.red(self.red(b))

    def sub_base(self, a, b):
        xp = self.xp
        return (_c(xp, M31) + self.red(self.red(a))) - self.red(b)

    def mul(self, ar, ai, br, bi):
        """Complex schoolbook: 4 base muls (complex Karatsuba would
        overflow the u32 lazy form on the (ar+ai) sums)."""
        rr = self.red(ar)
        ri = self.red(ai)
        sr = self.red(br)
        si = self.red(bi)
        t1 = self._mul_base(rr, sr)
        t2 = self._mul_base(ri, si)
        t3 = self._mul_base(rr, si)
        t4 = self._mul_base(ri, sr)
        return self.sub_base(t1, t2), self.add_base(t3, t4)

    def sqr(self, ar, ai):
        """(a+bi)^2 = (a+b)(a-b) + 2ab i: 2 base muls."""
        xp = self.xp
        rr = self.red(ar)
        ri = self.red(ai)
        s = rr + ri                         # < 2^32
        d = (_c(xp, M31) + rr) - ri
        re = self._mul_base(self.red(s), self.red(d))
        ab = self._mul_base(rr, ri)
        # double-red (<= 2^31 - 1) so the doubling cannot wrap
        return re, self.red(self.red(ab)) * _c(xp, 2)


class M61C:
    """GF(M61^2) on (lo, hi) u32-pair arrays, lazy < 2^62 (hi < 2^30)."""

    def __init__(self, xp):
        self.xp = xp

    # -- pair helpers (shared shapes with gl64.GL) -----------------------
    def _addc(self, a, b):
        s = a + b
        return s, (s < a).astype(self.xp.uint32)

    def _mul32(self, a, b):
        # same native low-word muli fast path as gl64.GL.mul32 (the VPU
        # multiplies 32-bit lanes natively), under the same env lever
        from .gl64 import _native_mullo
        xp = self.xp
        a0 = a & _c(xp, 0xFFFF)
        a1 = a >> _c(xp, 16)
        b0 = b & _c(xp, 0xFFFF)
        b1 = b >> _c(xp, 16)
        p00 = a0 * b0
        p01 = a0 * b1
        p10 = a1 * b0
        p11 = a1 * b1
        mid = (p00 >> _c(xp, 16)) + (p01 & _c(xp, 0xFFFF)) + \
              (p10 & _c(xp, 0xFFFF))
        if _native_mullo():
            lo = a * b          # native 32-bit muli (wraps mod 2^32)
        else:
            lo = (p00 & _c(xp, 0xFFFF)) | (mid << _c(xp, 16))
        hi = p11 + (p01 >> _c(xp, 16)) + (p10 >> _c(xp, 16)) + \
            (mid >> _c(xp, 16))
        return lo, hi

    def red(self, a0, a1):
        """lazy62 -> < 2^61 + 8: (x & M61) + (x >> 61)."""
        xp = self.xp
        m29 = _c(xp, (1 << 29) - 1)
        t = a1 >> _c(xp, 29)                # x >> 61 (fits low word)
        s0, c = self._addc(a0, t)
        return s0, (a1 & m29) + c

    def canon(self, a0, a1):
        xp = self.xp
        r0, r1 = self.red(*self.red(a0, a1))
        ge = ((r1 > _c(xp, 0x1FFFFFFF)) |
              ((r1 == _c(xp, 0x1FFFFFFF)) & (r0 == _c(xp, 0xFFFFFFFF))))
        d0 = r0 - _c(xp, 0xFFFFFFFF)
        br = (r0 < _c(xp, 0xFFFFFFFF)).astype(xp.uint32)
        d1 = r1 - _c(xp, 0x1FFFFFFF) - br
        return xp.where(ge, d0, r0), xp.where(ge, d1, r1)

    def _mul_base(self, a0, a1, b0, b1):
        """base mul of reduced inputs (< 2^61 + 8): lazy62 out (~80 ops)."""
        xp = self.xp
        ll0, ll1 = self._mul32(a0, b0)
        lh0, lh1 = self._mul32(a0, b1)
        hl0, hl1 = self._mul32(a1, b0)
        hh0, hh1 = self._mul32(a1, b1)
        r1, c1 = self._addc(ll1, lh0)
        r1, c1b = self._addc(r1, hl0)
        c1 = c1 + c1b
        r2, c2 = self._addc(lh1, hl1)
        r2, c2b = self._addc(r2, hh0)
        r2, c2c = self._addc(r2, c1)
        c2 = c2 + c2b + c2c
        r3 = hh1 + c2
        # p = (r3:r2:r1:ll0) < 2^123; p mod M61 = (p & M61) + (p >> 61)
        m29 = _c(xp, (1 << 29) - 1)
        lo0 = ll0
        lo1 = r1 & m29
        h0 = (r1 >> _c(xp, 29)) | (r2 << _c(xp, 3))
        h1 = (r2 >> _c(xp, 29)) | (r3 << _c(xp, 3))
        s0, c = self._addc(lo0, h0)
        s1 = lo1 + h1 + c                   # < 2^30 + 2^31: lazy62 ok
        return s0, s1

    def mul_base(self, a0, a1, b0, b1):
        return self._mul_base(*self.red(a0, a1), *self.red(b0, b1))

    def add_base(self, a0, a1, b0, b1):
        r0, r1 = self.red(a0, a1)
        s0, s1 = self.red(b0, b1)
        t0, c = self._addc(r0, s0)
        return t0, r1 + s1 + c

    def sub_base(self, a0, a1, b0, b1):
        """red(a) + 2*M61 - red(b): no borrow, < 2^63... folds to lazy62."""
        xp = self.xp
        r0, r1 = self.red(a0, a1)
        s0, s1 = self.red(b0, b1)
        # 2*M61 = (0xFFFFFFFE, 0x3FFFFFFF)
        t0, c = self._addc(r0, _c(xp, 0xFFFFFFFE))
        t1 = r1 + _c(xp, 0x3FFFFFFF) + c
        d0 = t0 - s0
        br = (t0 < s0).astype(xp.uint32)
        d1 = t1 - s1 - br                   # < 2^63: one red restores lazy62
        # (x & M61) + (x >> 61) with x < 2^63
        m29 = _c(xp, (1 << 29) - 1)
        t = d1 >> _c(xp, 29)
        s0b, c2 = self._addc(d0, t)
        return s0b, (d1 & m29) + c2

    def mul(self, ar0, ar1, ai0, ai1, br0, br1, bi0, bi1):
        """Complex Karatsuba: 3 base muls (the pair form has headroom for
        the (ar+ai) sums, unlike the M31 single-word form)."""
        t1 = self.mul_base(ar0, ar1, br0, br1)
        t2 = self.mul_base(ai0, ai1, bi0, bi1)
        sa = self.add_base(ar0, ar1, ai0, ai1)
        sb = self.add_base(br0, br1, bi0, bi1)
        t3 = self._mul_base(*self.red(*sa), *self.red(*sb))
        re = self.sub_base(*t1, *t2)
        im = self.sub_base(*self.sub_base(*t3, *t1), *t2)
        return re + im

    def sqr(self, ar0, ar1, ai0, ai1):
        """(a+b)(a-b) + 2ab i: 2 base muls."""
        s = self.add_base(ar0, ar1, ai0, ai1)
        d = self.sub_base(ar0, ar1, ai0, ai1)
        re = self._mul_base(*self.red(*s), *self.red(*d))
        ab = self.mul_base(ar0, ar1, ai0, ai1)
        ab = self.red(*ab)
        im0, c = self._addc(ab[0], ab[0])
        im1 = ab[1] * self.xp.uint32(2) + c
        return re + (im0, im1)


# -- host-side pack/unpack ---------------------------------------------------

def m61_to_pairs(x: np.ndarray):
    x = np.asarray(x, dtype=np.uint64)
    return ((x & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (x >> np.uint64(32)).astype(np.uint32))


def m61_from_pairs(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    return lo.astype(np.uint64) | (hi.astype(np.uint64) << np.uint64(32))
