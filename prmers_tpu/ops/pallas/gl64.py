"""Goldilocks GF(P) arithmetic on u32-pair arrays, P = 2^64 - 2^32 + 1.

TPU has no native 64-bit vector arithmetic; every value is carried as a pair
of uint32 arrays (lo, hi) representing v = lo + hi*2^32 < 2^64 with
v ≡ x (mod P) — a *lazy* (non-canonical) representation: ops accept any
v < 2^64 and produce results < 2^64, canonicalization happens only at
export. These functions contain only int32-lane ops (mul/shift/cmp/select)
so they lower 1:1 onto the TPU VPU inside Pallas kernels; they also run
under plain jax.numpy / numpy for oracle tests.

Key identities (Solinas): 2^64 ≡ 2^32 - 1, 2^96 ≡ -1 (mod P), ord(2) = 192.
The reference's host field ops are include/marin/arith.h:23-99; this module
re-derives them for 32-bit lanes.
"""

from __future__ import annotations

import os

import numpy as np

U16MASK = 0xFFFF
U32MASK = 0xFFFFFFFF

# The VPU multiplies 32-bit lanes natively (low 32 bits of the product);
# only the HIGH word needs the 16-bit cross-product assembly. Computing
# the low word with one muli saves ~3 ops per mul32 (~4% of the
# iteration's VPU budget across mid/sqr mulmods). PRMERS_NO_MULLO=1
# restores the all-16-bit form (A/B lever; also the behavior on
# hypothetical lanes without a full 32-bit multiplier).


def _native_mullo() -> bool:
    """Read at trace time (not import time) so tests toggling the env var
    after import get the path they asked for; any common falsy spelling
    keeps the native path on."""
    return os.environ.get("PRMERS_NO_MULLO", "").lower() in (
        "", "0", "off", "false", "no")


def _c(xp, v):
    return xp.uint32(v)


class GL:
    """Namespace-generic (numpy / jax.numpy) u32-pair Goldilocks ops."""

    def __init__(self, xp):
        self.xp = xp

    # -- helpers ---------------------------------------------------------
    def u32(self, v):
        return _c(self.xp, v)

    def addc(self, a, b):
        """32-bit add with carry-out (0/1)."""
        s = a + b
        return s, (s < a).astype(self.xp.uint32)

    def subb(self, a, b):
        """32-bit subtract with borrow-out (0/1)."""
        d = a - b
        return d, (a < b).astype(self.xp.uint32)

    def mul32(self, a, b):
        """u32 x u32 -> (lo32, hi32) via 16-bit halves (int32-lane ops)."""
        xp = self.xp
        a0 = a & _c(xp, U16MASK)
        a1 = a >> _c(xp, 16)
        b0 = b & _c(xp, U16MASK)
        b1 = b >> _c(xp, 16)
        p00 = a0 * b0
        p01 = a0 * b1
        p10 = a1 * b0
        p11 = a1 * b1
        mid = (p00 >> _c(xp, 16)) + (p01 & _c(xp, U16MASK)) + \
              (p10 & _c(xp, U16MASK))
        if _native_mullo():
            lo = a * b          # native 32-bit muli (wraps mod 2^32)
        else:
            lo = (p00 & _c(xp, U16MASK)) | (mid << _c(xp, 16))
        hi = p11 + (p01 >> _c(xp, 16)) + (p10 >> _c(xp, 16)) + \
             (mid >> _c(xp, 16))
        return lo, hi

    # -- 64-bit wrapping add/sub on pairs ---------------------------------
    def add64(self, a0, a1, b0, b1):
        """(a + b) mod 2^64 with carry-out."""
        s0, c = self.addc(a0, b0)
        s1a, c1 = self.addc(a1, b1)
        s1, c2 = self.addc(s1a, c)
        return s0, s1, c1 + c2

    def sub64(self, a0, a1, b0, b1):
        """(a - b) mod 2^64 with borrow-out."""
        d0, br = self.subb(a0, b0)
        d1a, b1_ = self.subb(a1, b1)
        d1, b2 = self.subb(d1a, br)
        return d0, d1, b1_ + b2

    def fold_carry(self, s0, s1, c):
        """value + c*2^64 -> < 2^64 form (adds c*(2^32-1); c in {0,1,2}).

        Tight form: u = s - c + c*2^32 computed wordwise; the net second
        wrap is ca - cb (cb = 1 implies ca = 1), folded the same way.
        """
        xp = self.xp
        u0 = s0 - c
        b1 = (s0 < c).astype(xp.uint32)
        u1a = s1 + c
        ca = (u1a < s1).astype(xp.uint32)
        u1 = u1a - b1
        cb = (u1a < b1).astype(xp.uint32)
        c2 = ca - cb            # in {0, 1}
        v0 = u0 - c2
        b2 = (u0 < c2).astype(xp.uint32)
        v1 = u1 + c2 - b2       # cannot wrap: post-wrap values are tiny
        return v0, v1

    def fold_borrow(self, d0, d1, br):
        """value - br*2^64 -> subtract br*(2^32-1) (br in {0,1})."""
        xp = self.xp
        u0 = d0 + br
        ca = (u0 < d0).astype(xp.uint32)
        u1a = d1 - br
        bb = (d1 < br).astype(xp.uint32)
        u1 = u1a + ca
        cc = (u1 < u1a).astype(xp.uint32)
        b2 = bb - cc            # in {0, 1}
        v0 = u0 + b2
        ca2 = (v0 < u0).astype(xp.uint32)
        v1 = u1 - b2 + ca2
        return v0, v1

    # -- modular ops (lazy domain: in/out < 2^64, any residue class) ------
    def add(self, a0, a1, b0, b1):
        s0, s1, c = self.add64(a0, a1, b0, b1)
        return self.fold_carry(s0, s1, c)

    def sub(self, a0, a1, b0, b1):
        d0, d1, br = self.sub64(a0, a1, b0, b1)
        return self.fold_borrow(d0, d1, br)

    def mul_wide(self, a0, a1, b0, b1):
        """Full 128-bit product as four u32 words (r0..r3)."""
        ll0, ll1 = self.mul32(a0, b0)
        lh0, lh1 = self.mul32(a0, b1)
        hl0, hl1 = self.mul32(a1, b0)
        hh0, hh1 = self.mul32(a1, b1)
        r1, c1 = self.addc(ll1, lh0)
        r1, c1b = self.addc(r1, hl0)
        c1 = c1 + c1b
        r2, c2 = self.addc(lh1, hl1)
        r2, c2b = self.addc(r2, hh0)
        r2, c2c = self.addc(r2, c1)
        c2 = c2 + c2b + c2c
        r3 = hh1 + c2
        return ll0, r1, r2, r3

    def sqr_wide(self, a0, a1):
        """128-bit square: one fewer mul32 than mul_wide (cross term x2)."""
        xp = self.xp
        ll0, ll1 = self.mul32(a0, a0)
        lh0, lh1 = self.mul32(a0, a1)
        hh0, hh1 = self.mul32(a1, a1)
        # double the cross term (lh), keeping the carry chain exact
        x0, cx = self.addc(lh0, lh0)
        x1a, cy = self.addc(lh1, lh1)
        x1, cz = self.addc(x1a, cx)
        x2 = cy + cz
        r1, c1 = self.addc(ll1, x0)
        r2, c2 = self.addc(x1, hh0)
        r2, c2b = self.addc(r2, c1)
        r3 = hh1 + x2 + c2 + c2b
        return ll0, r1, r2, r3

    def reduce128(self, r0, r1, r2, r3):
        """(r3:r2:r1:r0) mod P -> < 2^64 pair.

        x = lo64 + r2*2^64 + r3*2^96 ≡ lo64 + r2*(2^32-1) - r3.
        """
        xp = self.xp
        t0 = _c(xp, 0) - r2
        t1 = r2 - (r2 != 0).astype(xp.uint32)
        s0, s1, c = self.add64(r0, r1, t0, t1)
        s0, s1 = self.fold_carry(s0, s1, c)
        d0, d1, br = self.sub64(s0, s1, r3, _c(xp, 0))
        return self.fold_borrow(d0, d1, br)

    def mul(self, a0, a1, b0, b1):
        return self.reduce128(*self.mul_wide(a0, a1, b0, b1))

    def sqr(self, a0, a1):
        return self.reduce128(*self.sqr_wide(a0, a1))

    def mul_small(self, a0, a1, s):
        """Multiply by a small u32 constant/array s (s < 2^32)."""
        xp = self.xp
        l0, l1 = self.mul32(a0, s)
        h0, h1 = self.mul32(a1, s)
        r1, c = self.addc(l1, h0)
        r2 = h1 + c
        return self.reduce128(l0, r1, r2, _c(xp, 0))

    # -- multiply by 2^e ---------------------------------------------------
    def shl_small(self, a0, a1, e):
        """(a * 2^e) for static/int or traced-array e in [0, 32): 96-bit out.

        Returns three words (w0, w1, w2). The traced-array path uses the
        (x>>1)>>(31-e) funnel so e = 0 is well-defined (shifts >= 32 are UB).
        """
        xp = self.xp
        if isinstance(e, (int, np.integer)):
            e = int(e)
            if e == 0:
                return a0, a1, a0 * _c(xp, 0)
            ec = _c(xp, e)
            rc = _c(xp, 32 - e)
            return a0 << ec, (a0 >> rc) | (a1 << ec), a1 >> rc
        w0 = a0 << e
        rem = _c(xp, 31) - e
        w1 = ((a0 >> _c(xp, 1)) >> rem) | (a1 << e)
        w2 = (a1 >> _c(xp, 1)) >> rem
        return w0, w1, w2

    def fold96(self, w0, w1, w2):
        """(w2:w1:w0) mod P -> pair, via 2^64 ≡ 2^32-1 (w2 < 2^32).

        value ≡ (w1:w0) + (w2<<32) - w2, computed wordwise with a single
        net-wrap correction (cb = 1 implies ca = 1).
        """
        xp = self.xp
        u0 = w0 - w2
        b = (w0 < w2).astype(xp.uint32)
        u1a = w1 + w2
        ca = (u1a < w1).astype(xp.uint32)
        u1 = u1a - b
        cb = (u1a < b).astype(xp.uint32)
        c2 = ca - cb
        v0 = u0 - c2
        b2 = (u0 < c2).astype(xp.uint32)
        v1 = u1 + c2 - b2
        return v0, v1

    def mul_p32(self, a0, a1):
        """a * 2^32 mod P = (a0+a1)*2^32 - a1 (both < 2^64 after folds)."""
        xp = self.xp
        s, c = self.addc(a0, a1)
        # value = (s + c*2^32)*2^32 - a1 = s*2^32 + c*2^64 - a1
        d0, br = self.subb(_c(xp, 0), a1)
        d1, br2 = self.subb(s, br)
        # borrow here means value negative before +c*2^64; combine with c
        r0, r1 = self.fold_carry(d0, d1, c)
        return self.fold_borrow(r0, r1, br2)

    def shiftmul(self, a0, a1, e):
        """a * 2^e mod P for e in [0, 96), e static int or traced u32 array.

        e = 32*q + s: shift by s (96-bit), then 0-2 applications of *2^32.
        For static e this specializes to pure shifts+folds (~15-25 ops);
        for array e it computes all three q-branches and selects (~45 ops).
        """
        xp = self.xp
        if isinstance(e, (int, np.integer)):
            e = int(e)
            assert 0 <= e < 96
            q, s = divmod(e, 32)
            w0, w1, w2 = self.shl_small(a0, a1, s)
            r0, r1 = self.fold96(w0, w1, w2)
            for _ in range(q):
                r0, r1 = self.mul_p32(r0, r1)
            return r0, r1
        # traced exponent array
        q = e >> _c(xp, 5)
        s = e & _c(xp, 31)
        w0, w1, w2 = self.shl_small(a0, a1, s)
        r0, r1 = self.fold96(w0, w1, w2)
        p0, p1 = self.mul_p32(r0, r1)          # q >= 1 branch
        pp0, pp1 = self.mul_p32(p0, p1)        # q == 2 branch
        ge1 = q >= _c(xp, 1)
        eq2 = q == _c(xp, 2)
        r0 = xp.where(eq2, pp0, xp.where(ge1, p0, r0))
        r1 = xp.where(eq2, pp1, xp.where(ge1, p1, r1))
        return r0, r1

    def halve_where(self, x0, x1, mask):
        """Lazy-pair y/2 mod P where mask (y any u64): (y >> 1) +
        lsb*(P+1)/2; (P+1)/2 = 0x7FFFFFFF_80000001, sum cannot wrap."""
        xp = self.xp
        lsb = x0 & _c(xp, 1)
        h0 = (x0 >> _c(xp, 1)) | (x1 << _c(xp, 31))
        h1 = x1 >> _c(xp, 1)
        a0 = lsb * _c(xp, 0x80000001)
        a1 = lsb * _c(xp, 0x7FFFFFFF)
        s0, c = self.addc(h0, a0)
        s1 = h1 + a1 + c
        return xp.where(mask, s0, x0), xp.where(mask, s1, x1)

    def double_where(self, x0, x1, mask):
        """Lazy-pair 2y mod P where mask: shift left with the 2^64
        overflow folded back as 2^32 - 1 (two addc rounds bound it)."""
        xp = self.xp
        b = x1 >> _c(xp, 31)
        l0 = x0 << _c(xp, 1)
        l1 = (x1 << _c(xp, 1)) | (x0 >> _c(xp, 31))
        s0, c0 = self.addc(l0, b * _c(xp, 0xFFFFFFFF))
        s1, c1 = self.addc(l1, c0)
        s0b, c2 = self.addc(s0, c1 * _c(xp, 0xFFFFFFFF))
        s1b = s1 + c2
        return xp.where(mask, s0b, x0), xp.where(mask, s1b, x1)

    def neg(self, a0, a1):
        """P - a in lazy form (valid for any a < 2^64): 0 - a mod P."""
        return self.sub(self.u32(0) * a0, self.u32(0) * a0, a0, a1)

    # -- canonicalization --------------------------------------------------
    def canon(self, a0, a1):
        """Reduce lazy pair to canonical [0, P)."""
        xp = self.xp
        # a < 2^64 < 2P, so at most one subtract of P
        # P = (0x00000001, 0xFFFFFFFF) as (lo, hi)
        ge = (a1 == _c(xp, U32MASK)) & (a0 >= _c(xp, 1))
        d0, br = self.subb(a0, _c(xp, 1))
        d1 = a1 - _c(xp, U32MASK) - br
        return xp.where(ge, d0, a0), xp.where(ge, d1, a1)


# -- host-side pack/unpack ---------------------------------------------------

def to_pairs(x64: np.ndarray):
    """u64 numpy array -> (lo, hi) u32 arrays."""
    x64 = np.asarray(x64, dtype=np.uint64)
    return (x64 & np.uint64(U32MASK)).astype(np.uint32), \
           (x64 >> np.uint64(32)).astype(np.uint32)


def from_pairs(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    return lo.astype(np.uint64) | (hi.astype(np.uint64) << np.uint64(32))
