"""IBDWT transform planning for Mersenne arithmetic mod M_p = 2^p - 1.

Computes the transform size, variable digit widths, DWT weights, and the
two-pass (matrix) NTT decomposition used by the TPU compute path.

Semantics parity with the reference planner (reference: include/marin/ibdwt.h:17-147):
  * transform size n = 2^k or 5*2^k, n | (P-1)/192, chosen so the convolution
    digits cannot overflow the Goldilocks field: n * (2^(w+1)-1)^2 < P.
  * digit widths: width[j] = ceil(p*(j+1)/n) - ceil(p*j/n)  (values w or w+1)
  * weights: weight[j] = nr2^((n - (p*j mod n)) mod n), nr2^n == 2.

The NTT decomposition is TPU-native and intentionally different from the
reference's radix-kernel dispatch tables: we view the length-n transform as an
(R, C) matrix four-step NTT (column pass, factored mid-twiddles, transpose,
column pass), which maps onto lane-parallel columns and ICI all-to-all
transposes when sharded.
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache

import numpy as np

from . import field
from .field import P, FieldOps

F = FieldOps(np)
_U64 = np.uint64


def transform_size(p: int) -> int:
    """Smallest valid Goldilocks IBDWT transform size for exponent p.

    Mirrors the selection rule of the reference (include/marin/ibdwt.h:17-43):
    considers n = 2^k and n = 5*2^k (k <= 26) and picks the smallest n with
    (w+1)*2 + log2(n) < 64 where w = floor(p/n).
    """
    log2_n = 1
    while True:
        log2_n += 1
        w = p >> log2_n
        if (w + 1) * 2 + log2_n < 64:
            break
    log2_n5 = 2
    while True:
        log2_n5 += 1
        w = p // (5 << log2_n5)
        if (w + 1) * 2 + (log2_n5 + 2.4) < 64:
            break
    inf = float("inf")
    n2 = (1 << log2_n) if log2_n <= 26 else inf
    n5 = (5 << log2_n5) if log2_n5 <= 26 else inf
    n = min(n2, n5)
    if n == inf:
        raise ValueError(f"exponent {p} too large for Goldilocks IBDWT")
    return max(int(n), 8)


def digit_widths(p: int, n: int) -> np.ndarray:
    """width[j] = ceil(p*(j+1)/n) - ceil(p*j/n), as uint32."""
    j = np.arange(n + 1, dtype=np.int64)
    ceils = (p * j + n - 1) // n  # p*j < 2^57, exact in int64
    w = (ceils[1:] - ceils[:-1]).astype(np.uint32)
    assert int(w.sum()) == p
    return w


def _pow_by_exponents(base: int, e: np.ndarray) -> np.ndarray:
    """Vectorized base^e[j] mod P for an int64 exponent array (bit decomposition)."""
    n = e.shape[0]
    out = np.ones(n, dtype=_U64)
    sq = base % P
    emax = int(e.max()) if n else 0
    for b in range(max(emax.bit_length(), 1)):
        bit = ((e >> b) & 1).astype(bool)
        if bit.any():
            out = np.where(bit, F.mul(out, np.full(n, _U64(sq))), out)
        sq = (sq * sq) % P
    return out


def _weights(p: int, n: int) -> tuple[np.ndarray, np.ndarray]:
    """DWT weight and inverse-weight arrays (uint64, length n).

    weight[j] = nr2^e[j], e[j] = (n - (p*j mod n)) mod n = (-(p%n)*j) mod n,
    with nr2 the n-th root of 2 in the field.
    """
    nr2 = field.root_two_nth(n)
    nr2i = field.inv(nr2)
    j = np.arange(n, dtype=np.int64)
    e = (-(p % n) * j) % n  # |(p%n)*j| < 2^52, exact in int64
    w = _pow_by_exponents(nr2, e)
    winv = _pow_by_exponents(nr2i, e)
    return w, winv


# ---------------------------------------------------------------------------
# Column-transform stage planning
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Stage:
    radix: int           # 2, 4, or 5
    length: int          # current sub-transform length L at this stage (DIF order)
    tw: np.ndarray       # (radix, L/radix) u64 twiddles omega_L^(r*t)
    tw_inv: np.ndarray   # inverse twiddles


def _radix_seq(length: int) -> list[int]:
    """DIF stage radices for a column transform of `length` = 5^{0,1} * 2^k."""
    seq = []
    L = length
    if L % 5 == 0:
        seq.append(5)
        L //= 5
    k = L.bit_length() - 1
    assert L == 1 << k
    if k % 2 == 1:
        seq.append(2)
        k -= 1
    seq.extend([4] * (k // 2))
    return seq


def _stages(length: int) -> list[Stage]:
    stages = []
    L = length
    for r in _radix_seq(length):
        m = L // r
        w = field.root_nth(L)
        wi = field.inv(w)
        # tw[rdx, t] = w^(rdx*t)
        tw = np.empty((r, m), dtype=_U64)
        twi = np.empty((r, m), dtype=_U64)
        for rdx in range(r):
            tw[rdx] = F.powers(pow(w, rdx, P), m)
            twi[rdx] = F.powers(pow(wi, rdx, P), m)
        stages.append(Stage(radix=r, length=L, tw=tw, tw_inv=twi))
        L = m
    return stages


def pos_of_freq(f: int, radixes: list[int], length: int) -> int:
    """Physical output index of frequency f after the DIF stage sequence.

    DIF recurrence: pos_L(f) = (f mod r) * (L/r) + pos_{L/r}(f div r).
    """
    pos = 0
    L = length
    for r in radixes:
        m = L // r
        pos += (f % r) * m
        f //= r
        L = m
    return pos


def freq_of_pos(length: int) -> np.ndarray:
    """freq[pos] table for the DIF output ordering of a column transform."""
    radixes = _radix_seq(length)
    out = np.empty(length, dtype=np.int64)
    for f in range(length):
        out[pos_of_freq(f, radixes, length)] = f
    return out


# ---------------------------------------------------------------------------
# Full plan
# ---------------------------------------------------------------------------

def _split_rc(n: int) -> tuple[int, int]:
    """Factor n = R*C. The odd factor 5 goes to R; C is a power of two >= 2.

    R is the first-pass column-transform length (kept modest so a Pallas kernel
    can hold an R x 128 tile in VMEM); C is the lane-parallel width.
    """
    if n % 5 == 0:
        m = n // 5
        k = m.bit_length() - 1
        a = min(k // 2, 11)  # R = 5*2^a <= 10240
        R = 5 << a
    else:
        k = n.bit_length() - 1
        a = (k + 1) // 2
        a = min(a, 12)       # R <= 4096
        R = 1 << a
    C = n // R
    if C < 2:  # tiny transforms
        C = 2
        R = n // 2
    return R, C


@dataclasses.dataclass
class Plan:
    """All precomputed tables for exponent p (numpy arrays, host-side)."""
    p: int
    n: int
    R: int
    C: int
    w: int                      # base digit width floor(p/n)
    widths: np.ndarray          # (n,) uint32
    weights: np.ndarray         # (n,) uint64
    inv_weights: np.ndarray     # (n,) uint64, includes 1/n factor folded? (no)
    inv_n: int                  # field inverse of n
    stages_r: list[Stage]       # column transform of length R
    stages_c: list[Stage]       # column transform of length C (after transpose)
    mid_t1: np.ndarray          # (R, C//TILE) factored mid twiddles (row-permuted)
    mid_t2: np.ndarray          # (R, TILE)
    mid_t1_inv: np.ndarray
    mid_t2_inv: np.ndarray
    mid_tile: int

    @property
    def max_word(self) -> int:
        """Upper bound on an unnormalized convolution digit (< P)."""
        return self.n * (2 ** (self.w + 1) - 1) ** 2


def build_plan(p: int, n: int | None = None) -> Plan:
    if n is None:
        n = transform_size(p)
    R, C = _split_rc(n)
    assert R * C == n
    widths = digit_widths(p, n)
    weights, inv_weights = _weights(p, n)
    stages_r = _stages(R)
    stages_c = _stages(C)

    # Mid twiddle: element (i, j) of the (R, C) matrix after the first column
    # pass holds frequency f = freq_r[i]; it must be scaled by omega_n^(f*j).
    # Factored: omega^(f*j) = omega^(f*TILE*(j//TILE)) * omega^(f*(j%TILE)).
    freq_r = freq_of_pos(R)
    tile = min(128, C)
    wn = field.root_nth(n)
    wni = field.inv(wn)
    jhi = C // tile
    mid_t1 = np.empty((R, jhi), dtype=_U64)
    mid_t2 = np.empty((R, tile), dtype=_U64)
    mid_t1i = np.empty((R, jhi), dtype=_U64)
    mid_t2i = np.empty((R, tile), dtype=_U64)
    for i in range(R):
        f = int(freq_r[i])
        base = pow(wn, f, P)
        basei = pow(wni, f, P)
        mid_t2[i] = F.powers(base, tile)
        mid_t2i[i] = F.powers(basei, tile)
        mid_t1[i] = F.powers(pow(base, tile, P), jhi)
        mid_t1i[i] = F.powers(pow(basei, tile, P), jhi)

    return Plan(
        p=p, n=n, R=R, C=C, w=p // n,
        widths=widths, weights=weights, inv_weights=inv_weights,
        inv_n=field.inv(n % P),
        stages_r=stages_r, stages_c=stages_c,
        mid_t1=mid_t1, mid_t2=mid_t2,
        mid_t1_inv=mid_t1i, mid_t2_inv=mid_t2i,
        mid_tile=tile,
    )


@lru_cache(maxsize=8)
def cached_plan(p: int, n: int | None = None) -> Plan:
    return build_plan(p, n)
