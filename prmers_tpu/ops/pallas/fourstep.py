"""Four-step IBDWT squaring pipeline — TPU kernel formulation.

The length-n weighted NTT is decomposed as n = R*C (four-step), and each
column transform further as 64*Lsub so that on TPU:

  * the 64-point DFT runs on the UNTILED leading axis of a (64, Lsub*8, 128)
    VMEM tile — every butterfly is a free leading-dim slice;
  * the Lsub-point DFT runs on axis 1 where each transform element owns 8
    consecutive sublanes, so every butterfly and twiddle slice falls on the
    8-sublane tiling boundary;
  * all twiddles INSIDE a 64/Lsub block are powers of two (ord(2) = 192 in
    the Goldilocks field), applied as static shift-muls (~15 ops) instead of
    general mulmods (~85 ops);
  * the only general mulmods per element are: weight, T (between the 64 and
    Lsub factors), mid (between R and C passes), and the dyadic square.

Orderings are DIF-scrambled and never unscrambled: the inverse consumes the
forward's output order (mirrored DIT), and the dyadic square is elementwise
in any order. Only the carried digit vector is canonical.

The reference reaches the same arithmetic through radix dispatch tables
(reference: include/marin/engine_gpu.h:1568-1630, kernels/marin.cl) — the
decomposition here is chosen for the TPU memory model instead.

This module is namespace-generic: the same transform functions run under
numpy (oracle tests), plain jax.numpy, and inside Pallas kernels.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

from ...core import field
from ...core.field import P
from ...core.plan import Plan
from .gl64 import GL, to_pairs


def root_554(m: int) -> int:
    """The m-th root of unity 554^((P-1)/m). 554 generates GF(P)* and
    554^((P-1)/192) = 2, so omega_m for m | 192 is a power of two — the same
    family the in-kernel shift twiddles (2^(192/m)) use. All general-twiddle
    tables must come from this family to compose with the shift levels."""
    assert (P - 1) % m == 0
    return pow(field.ROOT_TWO_BASE, (P - 1) // m, P)


# ---------------------------------------------------------------------------
# Host-side planning
# ---------------------------------------------------------------------------

def dif_freq_of_pos(L: int) -> np.ndarray:
    """Output permutation of the radix-2 DIF cascade: freq at position p.

    DIF recurrence over levels m = L/2..1: pos(f) interleaves by f mod 2
    per level -> position = bit-reversal of frequency.
    """
    bits = L.bit_length() - 1
    out = np.zeros(L, dtype=np.int64)
    for p in range(L):
        f = 0
        x = p
        for _ in range(bits):
            f = (f << 1) | (x & 1)
            x >>= 1
        out[p] = f
    return out


@dataclasses.dataclass(eq=False)
class SplitSpec:
    """One column-transform split: length L = L1 * L2, L1 on axis 0
    (power of two <= 64, DIF-ordered), L2 on axis 1 (power of two <= 64
    DIF-ordered, or 5*2^b <= 320 in NATURAL order — the radix-5 factor
    runs as a general MXU matrix, so it needs no butterfly ordering;
    reference radix-5 stages: kernels/marin.cl:946-1236)."""
    L: int
    L1: int
    L2: int
    freq1: np.ndarray  # (L1,) DIF output freq per axis-0 position
    freq2: np.ndarray  # (L2,) (identity when L2 is the radix-5 factor)

    @property
    def freq(self) -> np.ndarray:
        """Combined k of the L-point DFT at (pos1, pos2): (L1, L2)."""
        return self.freq1[:, None] + self.L1 * self.freq2[None, :]


def make_split(L: int) -> SplitSpec:
    if L & (L - 1) == 0:
        assert 4 <= L <= 16384, L
        L1 = min(L, 64)
        L2 = L // L1
        # L2 > 64 has NO shift-twiddle path (ord(2) = 192, so omega_L2 is
        # a power of two only for L2 | 64): those factors run exclusively
        # as general MXU matrices — enforced where passes are built.
        assert L2 <= 256, f"column length {L} too large for one kernel"
        return SplitSpec(L, L1, L2, dif_freq_of_pos(L1),
                         dif_freq_of_pos(L2))
    # 5-smooth: L = 5 * 2^m; the 5 rides the axis-1 factor as a
    # natural-order MXU matrix
    assert L % 5 == 0 and (L // 5) & (L // 5 - 1) == 0, L
    m = (L // 5).bit_length() - 1
    a = min(m, 6)
    L1 = 1 << a
    L2 = 5 << (m - a)
    assert L2 <= 320, f"column length {L} too large for one kernel"
    return SplitSpec(L, L1, L2, dif_freq_of_pos(L1),
                     np.arange(L2, dtype=np.int64))


@dataclasses.dataclass(eq=False)
class FourStepPlan:
    """Kernel-level plan for n = R*C (both powers of two)."""
    p: int
    n: int
    R: int
    C: int
    rs: SplitSpec           # R = R1*R2
    cs: SplitSpec           # C = C1*C2
    widths: np.ndarray
    max_word: int

    @classmethod
    def from_plan(cls, plan: Plan):
        n = plan.n
        five = n % 5 == 0
        base = n // 5 if five else n
        assert base & (base - 1) == 0, \
            "pallas path requires n in {2^k, 5*2^k}"
        # C is the pure power-of-two lane extent (the fused C kernel's
        # shift-DFT factor caps at 64 lane tiles => C <= 8192); R takes
        # the radix-5 factor when present. R2 factors > 64 (R > 4096
        # pow2) have no shift-twiddle family and run as general MXU
        # matrices; the fused kernel drops to the separate-P2/P6
        # pipeline when R2*C exceeds the VMEM tile budget (kernels.py
        # R2FOLD_BUDGET_EL). Covers the full reference ladder incl.
        # n = 2^25, 2^26 and MM31's 5*2^25
        # (reference: include/marin/ibdwt.h:17-43, engine_gpu.h:1623).
        r_cap = 20480 if five else 4096
        C = 1024
        while n // C > r_cap and C < 8192:
            C *= 2
        R = n // C
        if not five and R > r_cap:
            r_cap = 8192        # n = 2^26: C is maxed; take R2 = 128
        assert R >= 4 and R <= r_cap, \
            f"transform out of range for pallas path (n={n})"
        return cls(p=plan.p, n=n, R=R, C=C, rs=make_split(R),
                   cs=make_split(C), widths=plan.widths,
                   max_word=plan.max_word)


# ---------------------------------------------------------------------------
# Table building (runs in any namespace; big tables built on device via jit)
# ---------------------------------------------------------------------------

def _pow_mod_vec(F, base: int, e, nbits: int):
    """base^e[...] mod P for an exponent array (u64), via bit decomposition."""
    xp = F.xp
    out = xp.ones(e.shape, dtype=xp.uint64)
    sq = base % P
    for b in range(max(nbits, 1)):
        bit = ((e >> xp.uint64(b)) & xp.uint64(1)) != 0
        out = xp.where(bit, F.mul(out, xp.uint64(sq)), out)
        sq = (sq * sq) % P
    return out


def shift_exponents(L1: int) -> list[tuple[int, list[int]]]:
    """Per-DIF-level (m, [e_j]) shift exponents for a length-L1 block:
    level half-size m has twiddles omega_{2m}^j = 2^(192/(2m)*j), j < m."""
    assert L1 <= 64 and 192 % max(2 * (L1 // 2), 1) == 0, \
        f"no shift-twiddle family for L={L1} (needs L | 64)"
    out = []
    m = L1 // 2
    while m >= 1:
        step = 192 // (2 * m)
        out.append((m, [step * j for j in range(m)]))
        m //= 2
    return out


@dataclasses.dataclass(eq=False)
class FourStepTables:
    """Device tables for the kernel pipeline (wide-lane layout). All
    general-twiddle tables are u64 pairs stored as (lo, hi) u32 arrays,
    pre-shaped for the kernels.

    Layout: the AX array is 3D (R1, R2, C) — the WHOLE length-C axis is
    the lane extent (C/128 lane tiles), so the C-transform's high factor
    is lane-tile arithmetic and every MXU dot runs with N = C. (The
    round-1 narrow layout carried a (CB, G, LN) sublane payload; its
    16-way sublane-strided slicing was the fused kernel's bottleneck.)

      t_r:   (R1, R2, 1)   omega_R^(r2 * freq1[p1])  [R-pass T layer]
      t_c:   (C1, C2, 1)   omega_C^(c2 * freq1'[q1]) [oracle only]
      w,iw:  (R1, R2, C)   weights / inv-weights*1/n, digit order
      mid:   (R1, R2, C)   omega_n^(c * kR(pos))
      widths32/masks: same 3D layout (u32 / pair)
    where the digit at [r1, r2, c] is x[(r1*R2 + r2)*C + c].
    """
    fp: FourStepPlan
    G: int
    w: Any
    iw: Any
    t_r: Any
    t_r_inv: Any
    mid: Any
    mid_inv: Any
    t_c: Any
    t_c_inv: Any
    widths32: Any
    mxu: Any = None        # {key: (w8, corr)} device arrays; string keys
    wcorr: Any = None      # (er (R2,L1,1) u32, ec (CB,1,G,LN) u32) residues
    # fused C-transform (transpose-free): (wf8, corrf, wi8, corri,
    # wrapc (1, C) u32 mask, mid_f lo/hi, mid_inv_f lo/hi). Built by
    # attach_fused_c_tables; when present the pipeline runs P1-P2 /
    # fused-C / P6-P7 with no global transposes. The static plane-offset
    # compensation lives inside every corr (_fold_sub_into_corr).
    fused: Any = None
    # per-ROW carry-injection spread tables (wt, cum) each (R1, R2, k)
    # u32 — built by kernels.attach_cinrow for the row-carry pipeline
    # (carry fused into P7, injection fused into P1)
    cinrow: Any = None

    @classmethod
    def build(cls, fp: FourStepPlan, xp, G: int = 8, lanes: int = 128,
              widths_arr=None):
        """Build all tables in namespace xp (jit this under jax).

        widths_arr: optional pre-placed widths array (u32, any shape with
        n elements). Under jit, PASS THIS AS AN ARGUMENT — closed over,
        the n-sized widths become an HLO constant, and at n = 5*2^25
        that alone exceeds the remote compiler's request-size limit
        (HTTP 413; found by the MM31 device golden)."""
        from ...core.field import FieldOps
        F = FieldOps(xp)
        p, n, R, C = fp.p, fp.n, fp.R, fp.C
        nbits = n.bit_length()

        j = xp.arange(n, dtype=xp.int64)
        # weights (digit order, reshaped (R, C) row-major: digit = r*C + c)
        nr2 = field.root_two_nth(n)
        e_w = ((-(p % n) * j) % n).astype(xp.uint64)
        w = _pow_mod_vec(F, nr2, e_w, nbits).reshape(R, C)
        iw = _pow_mod_vec(F, field.inv(nr2), e_w, nbits)
        iw = F.mul(iw, xp.uint64(field.inv(n))).reshape(R, C)

        # T layer of the R-pass: exponent r2 * freq1[p1] of omega_R
        wR = root_554(R)
        f1 = xp.asarray(fp.rs.freq1, dtype=xp.int64)
        r2 = xp.arange(fp.rs.L2, dtype=xp.int64)
        e_tr = ((f1[:, None] * r2[None, :]) % R).astype(xp.uint64)
        t_r = _pow_mod_vec(F, wR, e_tr, R.bit_length())
        t_r_inv = _pow_mod_vec(F, field.inv(wR), e_tr, R.bit_length())

        # mid layer: exponent c * kR(p1, p2) of omega_n
        wn = root_554(n)
        kR = xp.asarray(fp.rs.freq.reshape(R), dtype=xp.int64)
        c = xp.arange(C, dtype=xp.int64)
        e_mid = ((kR[:, None] % n) * c[None, :] % n).astype(xp.uint64)
        mid = _pow_mod_vec(F, wn, e_mid, nbits)
        mid_inv = _pow_mod_vec(F, field.inv(wn), e_mid, nbits)

        # T layer of the C-pass
        wC = root_554(C)
        g1 = xp.asarray(fp.cs.freq1, dtype=xp.int64)
        c2 = xp.arange(fp.cs.L2, dtype=xp.int64)
        e_tc = ((g1[:, None] * c2[None, :]) % C).astype(xp.uint64)
        t_c = _pow_mod_vec(F, wC, e_tc, C.bit_length())
        t_c_inv = _pow_mod_vec(F, field.inv(wC), e_tc, C.bit_length())

        if widths_arr is None:
            widths = xp.asarray(fp.widths.reshape(R, C).astype(np.uint32))
        else:
            widths = xp.asarray(widths_arr).reshape(R, C).astype(xp.uint32)
        assert int(fp.widths.max()) < 32, \
            "gl64 digit widths must fit one u32 word (in-kernel masks)"

        R1, R2 = fp.rs.L1, fp.rs.L2

        def ax3(a):  # (R, C) -> wide AX kernel layout
            return a.reshape(R1, R2, C)

        def t3(a):  # (L1, L2) -> broadcast form (L1, L2, 1)
            return a.reshape(a.shape[0], a.shape[1], 1)

        def pair(a):
            return ((a & xp.uint64(0xFFFFFFFF)).astype(xp.uint32),
                    (a >> xp.uint64(32)).astype(xp.uint32))

        return cls(
            fp=fp, G=G,
            w=pair(ax3(w)), iw=pair(ax3(iw)),
            t_r=pair(t3(t_r)), t_r_inv=pair(t3(t_r_inv)),
            mid=pair(ax3(mid)), mid_inv=pair(ax3(mid_inv)),
            t_c=pair(t3(t_c)), t_c_inv=pair(t3(t_c_inv)),
            widths32=ax3(widths),
        )


def _register_pytree():
    try:
        from jax import tree_util
    except ImportError:
        return

    def flatten(t):
        children = (t.w, t.iw, t.t_r, t.t_r_inv, t.mid, t.mid_inv,
                    t.t_c, t.t_c_inv, t.widths32,
                    t.mxu, t.wcorr, t.fused, t.cinrow)
        return children, (t.fp, t.G)

    def unflatten(aux, children):
        return FourStepTables(aux[0], aux[1], *children[:-4],
                              mxu=children[-4],
                              wcorr=children[-3], fused=children[-2],
                              cinrow=children[-1])

    tree_util.register_pytree_node(FourStepTables, flatten, unflatten)


_register_pytree()


# ---------------------------------------------------------------------------
# Namespace-generic transform pieces
#
# Data convention inside a tile: x is a pair of u32 arrays shaped
# (L1, L2*G, lanes) where G is the per-element sublane payload (8 on TPU,
# 1 in numpy tests): axis 0 = leading transform index (free slicing),
# axis 1 = r2*G + payload-sublane, axis 2 = lanes.
# ---------------------------------------------------------------------------

def dft_axis0(g: GL, x0, x1, L1: int, inverse: bool):
    """Length-L1 DIF (or mirrored DIT) along axis 0; shift twiddles only."""
    xp = g.xp
    levels = shift_exponents(L1)
    if inverse:
        levels = levels[::-1]
    rest = x0.shape[1:]
    for m, exps in levels:
        B = L1 // (2 * m)
        sh = (B, 2, m) + rest
        v0 = x0.reshape(sh)
        v1 = x1.reshape(sh)
        a0, a1 = v0[:, 0], v1[:, 0]
        b0, b1 = v0[:, 1], v1[:, 1]
        if not inverse:
            s0, s1 = g.add(a0, a1, b0, b1)
            d0, d1 = g.sub(a0, a1, b0, b1)
            # twiddle the difference branch, slice by static exponent
            outs0 = [None] * m
            outs1 = [None] * m
            for jj, e in enumerate(exps):
                t0, t1 = d0[:, jj], d1[:, jj]
                if e:
                    t0, t1 = g.shiftmul(t0, t1, e)
                outs0[jj], outs1[jj] = t0, t1
            d0 = xp.stack(outs0, axis=1)
            d1 = xp.stack(outs1, axis=1)
            x0 = xp.stack([s0, d0], axis=1).reshape(x0.shape)
            x1 = xp.stack([s1, d1], axis=1).reshape(x1.shape)
        else:
            # DIT: untwiddle b with omega^{-e} = 2^{192-e} = -2^{96-e} (e>0);
            # the sign flip swaps the add/sub outputs for j > 0.
            outs0 = [None] * m
            outs1 = [None] * m
            for jj, e in enumerate(exps):
                t0, t1 = b0[:, jj], b1[:, jj]
                if e:
                    t0, t1 = g.shiftmul(t0, t1, 96 - e)
                outs0[jj], outs1[jj] = t0, t1
            bt0 = xp.stack(outs0, axis=1)
            bt1 = xp.stack(outs1, axis=1)
            s0, s1 = g.add(a0, a1, bt0, bt1)
            d0, d1 = g.sub(a0, a1, bt0, bt1)
            if m > 1:  # j = 0 has e = 0 (no swap); j >= 1 are negated
                s0, d0 = (xp.concatenate([s0[:, :1], d0[:, 1:]], axis=1),
                          xp.concatenate([d0[:, :1], s0[:, 1:]], axis=1))
                s1, d1 = (xp.concatenate([s1[:, :1], d1[:, 1:]], axis=1),
                          xp.concatenate([d1[:, :1], s1[:, 1:]], axis=1))
            x0 = xp.stack([s0, d0], axis=1).reshape(x0.shape)
            x1 = xp.stack([s1, d1], axis=1).reshape(x1.shape)
    return x0, x1


def dft_axis1(g: GL, x0, x1, L2: int, G: int, inverse: bool):
    """Length-L2 DIF/DIT along axis 1 (element stride G sublanes)."""
    xp = g.xp
    if L2 == 1:
        return x0, x1
    L1 = x0.shape[0]
    lanes = x0.shape[2]
    levels = shift_exponents(L2)
    if inverse:
        levels = levels[::-1]
    for m, exps in levels:
        B = L2 // (2 * m)
        sh = (L1, B, 2, m * G, lanes)
        v0 = x0.reshape(sh)
        v1 = x1.reshape(sh)
        a0, a1 = v0[:, :, 0], v1[:, :, 0]
        b0, b1 = v0[:, :, 1], v1[:, :, 1]
        if not inverse:
            s0, s1 = g.add(a0, a1, b0, b1)
            d0, d1 = g.sub(a0, a1, b0, b1)
            outs0, outs1 = [], []
            for jj, e in enumerate(exps):
                t0 = d0[:, :, jj * G:(jj + 1) * G]
                t1 = d1[:, :, jj * G:(jj + 1) * G]
                if e:
                    t0, t1 = g.shiftmul(t0, t1, e)
                outs0.append(t0)
                outs1.append(t1)
            d0 = xp.concatenate(outs0, axis=2)
            d1 = xp.concatenate(outs1, axis=2)
            x0 = xp.stack([s0, d0], axis=2).reshape(x0.shape)
            x1 = xp.stack([s1, d1], axis=2).reshape(x1.shape)
        else:
            outs0, outs1 = [], []
            for jj, e in enumerate(exps):
                t0 = b0[:, :, jj * G:(jj + 1) * G]
                t1 = b1[:, :, jj * G:(jj + 1) * G]
                if e:
                    t0, t1 = g.shiftmul(t0, t1, 96 - e)
                outs0.append(t0)
                outs1.append(t1)
            bt0 = xp.concatenate(outs0, axis=2)
            bt1 = xp.concatenate(outs1, axis=2)
            s0, s1 = g.add(a0, a1, bt0, bt1)
            d0, d1 = g.sub(a0, a1, bt0, bt1)
            if m > 1:  # j = 0 untwiddled; j >= 1 negated -> swap outputs
                s0, d0 = (xp.concatenate([s0[:, :, :G], d0[:, :, G:]], axis=2),
                          xp.concatenate([d0[:, :, :G], s0[:, :, G:]], axis=2))
                s1, d1 = (xp.concatenate([s1[:, :, :G], d1[:, :, G:]], axis=2),
                          xp.concatenate([d1[:, :, :G], s1[:, :, G:]], axis=2))
            x0 = xp.stack([s0, d0], axis=2).reshape(x0.shape)
            x1 = xp.stack([s1, d1], axis=2).reshape(x1.shape)
    return x0, x1


def dft_lanes(g: GL, x0, x1, L: int, tile: int, inverse: bool):
    """Length-L DIF/DIT over the lane-TILE index of a (B, L*tile) view:
    element j occupies lanes [j*tile, (j+1)*tile). All slices are
    tile-aligned lane blocks (the wide-lane layout's C-high factor);
    twiddles are shifts (L | 192). Mirrors dft_axis0's orderings exactly."""
    xp = g.xp
    levels = shift_exponents(L)
    if inverse:
        levels = levels[::-1]
    for m, exps in levels:
        Bf = L // (2 * m)
        outs0 = [None] * L
        outs1 = [None] * L

        def tileof(idx):
            return (x0[:, idx * tile:(idx + 1) * tile],
                    x1[:, idx * tile:(idx + 1) * tile])

        for blk in range(Bf):
            for jj in range(m):
                pa = blk * 2 * m + jj
                pb = pa + m
                a0, a1 = tileof(pa)
                b0, b1 = tileof(pb)
                e = exps[jj]
                if not inverse:
                    s0, s1 = g.add(a0, a1, b0, b1)
                    d0, d1 = g.sub(a0, a1, b0, b1)
                    if e:
                        d0, d1 = g.shiftmul(d0, d1, e)
                    outs0[pa], outs1[pa] = s0, s1
                    outs0[pb], outs1[pb] = d0, d1
                else:
                    t0, t1 = (g.shiftmul(b0, b1, 96 - e) if e
                              else (b0, b1))
                    s0, s1 = g.add(a0, a1, t0, t1)
                    d0, d1 = g.sub(a0, a1, t0, t1)
                    if e:   # j >= 1 twiddles are negated: swap outputs
                        outs0[pa], outs1[pa] = d0, d1
                        outs0[pb], outs1[pb] = s0, s1
                    else:
                        outs0[pa], outs1[pa] = s0, s1
                        outs0[pb], outs1[pb] = d0, d1
        x0 = xp.concatenate(outs0, axis=1)
        x1 = xp.concatenate(outs1, axis=1)
    return x0, x1


def _dft_axis1_matrix(g: GL, x0, x1, L2: int, inverse: bool):
    """Natural-order length-L2 DFT along axis 1 via explicit matrix
    apply (numpy-oracle path for the radix-5 factor; the device runs the
    same matrix on the MXU)."""
    from .mxu_dft import dft_matrix
    xp = g.xp
    M = dft_matrix(L2, inverse)
    m0, m1 = to_pairs(M)
    outs0, outs1 = [], []
    for k in range(L2):
        acc0 = acc1 = None
        for j in range(L2):
            t0, t1 = g.mul(x0[:, j], x1[:, j],
                           xp.uint32(int(m0[k, j])),
                           xp.uint32(int(m1[k, j])))
            if acc0 is None:
                acc0, acc1 = t0, t1
            else:
                acc0, acc1 = g.add(acc0, acc1, t0, t1)
        outs0.append(acc0)
        outs1.append(acc1)
    return xp.stack(outs0, axis=1), xp.stack(outs1, axis=1)


def col_transform(g: GL, x0, x1, sp: SplitSpec, tw0, tw1, G: int,
                  inverse: bool):
    """Full length-L column transform on a (L1, L2*G, lanes) tile.

    tw0, tw1: the T-layer table pair pre-expanded to (L1, L2*G, 1).
    Forward: DFT_L1(axis0) -> T -> DFT_L2(axis1).
    Inverse: DFT_L2(axis1) -> T^inv -> DFT_L1(axis0).
    """
    pow2_l2 = sp.L2 & (sp.L2 - 1) == 0

    def fwd2(a0, a1):
        if pow2_l2:
            return dft_axis1(g, a0, a1, sp.L2, G, False)
        assert G == 1
        return _dft_axis1_matrix(g, a0, a1, sp.L2, False)

    def inv2(a0, a1):
        if pow2_l2:
            return dft_axis1(g, a0, a1, sp.L2, G, True)
        assert G == 1
        return _dft_axis1_matrix(g, a0, a1, sp.L2, True)

    if not inverse:
        x0, x1 = dft_axis0(g, x0, x1, sp.L1, False)
        if sp.L2 > 1:
            x0, x1 = g.mul(x0, x1, tw0, tw1)
            x0, x1 = fwd2(x0, x1)
    else:
        if sp.L2 > 1:
            x0, x1 = inv2(x0, x1)
            x0, x1 = g.mul(x0, x1, tw0, tw1)
        x0, x1 = dft_axis0(g, x0, x1, sp.L1, True)
    return x0, x1


# ---------------------------------------------------------------------------
# Reference implementation of the full pipeline (numpy; mirrors the kernel
# sequence block-for-block; used as the oracle for kernel tests)
# ---------------------------------------------------------------------------

def square_ref(t: FourStepTables, digits64: np.ndarray,
               lanes: int = 128) -> np.ndarray:
    """One IBDWT squaring (pre-carry) on numpy. Mathematical oracle for
    the kernel pipeline: the C-transform here uses the (C1, C2) column
    split, while the device kernels use the lane-tile decomposition —
    the dyadic center is elementwise, so the composed result is
    order-independent and must match exactly. Returns the unnormalized
    convolution digit vector (u64 exact integers < max_word)."""
    g = GL(np)
    fp = t.fp
    R, C = fp.R, fp.C
    R1, R2 = fp.rs.L1, fp.rs.L2
    C1, C2 = fp.cs.L1, fp.cs.L2
    x0, x1 = to_pairs(digits64)
    x0 = x0.reshape(R1, R2, C)
    x1 = x1.reshape(R1, R2, C)

    # K1: weights, forward R-column transform, mid twiddle
    x0, x1 = g.mul(x0, x1, t.w[0], t.w[1])
    x0, x1 = col_transform(g, x0, x1, fp.rs, t.t_r[0], t.t_r[1], 1, False)
    x0, x1 = g.mul(x0, x1, t.mid[0], t.mid[1])

    # K2: forward C transform, dyadic square, inverse C transform
    y0 = x0.reshape(R, C).T.reshape(C1, C2, R).copy()
    y1 = x1.reshape(R, C).T.reshape(C1, C2, R).copy()
    y0, y1 = col_transform(g, y0, y1, fp.cs, t.t_c[0], t.t_c[1], 1, False)
    y0, y1 = g.sqr(y0, y1)
    y0, y1 = col_transform(g, y0, y1, fp.cs, t.t_c_inv[0], t.t_c_inv[1],
                           1, True)
    z0 = y0.reshape(C, R).T.reshape(R1, R2, C)
    z1 = y1.reshape(C, R).T.reshape(R1, R2, C)

    # K3: inverse mid, inverse R transform, inverse weights (x 1/n)
    z0, z1 = g.mul(z0, z1, t.mid_inv[0], t.mid_inv[1])
    z0, z1 = col_transform(g, z0, z1, fp.rs, t.t_r_inv[0], t.t_r_inv[1],
                           1, True)
    z0, z1 = g.mul(z0, z1, t.iw[0], t.iw[1])
    z0, z1 = g.canon(z0, z1)

    from .gl64 import from_pairs
    return from_pairs(z0.reshape(fp.n), z1.reshape(fp.n))


def attach_fused_c_tables(t: FourStepTables, device_put=None):
    """Build the transpose-free fused C-transform tables.

    The whole length-C transform runs inside one kernel on the AX layout:
    with c = ca*128 + l (ca = cb*G + s, l = lane),

      X[kl + ca_count*kh] = sum_l [w_C^(l*kl) * w_128^(l*kh) * wcl(l)]
                              * DFT16_ca(x)[kl][l]

    so the forward is a shift-twiddle DFT over ca followed by ONE lane-axis
    int8 MXU dot per output group kl, with the inter-factor twiddle
    w_C^(l*kl) AND the lane part of the IBDWT weight folded into the
    ca_count variant matrices. The ca-part of the weight folds into the
    mid tables (it commutes through the R-transform), and the single
    root-of-2 wrap between the ca/l exponent parts is a masked halve
    (forward) / double (inverse). This replaces passes P3-P5 and BOTH
    global transposes of the original pipeline (reference equivalent:
    fused tail kernels sqrK, kernels/marin.cl:1267-1274 — here the whole
    C-axis fits one kernel because lanes carry it).
    """
    from . import mxu_dft as mxm
    from .mxu_dft import _mulmod_u64, build_rhs_tables
    from ...core import field as fld

    put = device_put if device_put is not None else (lambda a: a)
    fp = t.fp
    C = fp.C
    if C % 128 or fp.rs.L1 < 32:
        # the fused tables assume the weight r-part is folded into the
        # P1/P7 MXU tables (rs.L1 >= 32); without that the wc folds here
        # would double-apply
        return t
    ca_count = C // 128
    if ca_count < 2 or ca_count & (ca_count - 1) or ca_count > 64:
        return t
    n, p = fp.n, fp.p
    pn = p % n
    wC = root_554(C)
    wCi = fld.inv(wC)
    nr2 = fld.root_two_nth(n)
    nr2i = fld.inv(nr2)

    # power tables of w_C (C <= 4096: cheap host loops)
    wpow = np.empty(C, dtype=np.uint64)
    wipow = np.empty(C, dtype=np.uint64)
    acc = acci = 1
    for i in range(C):
        wpow[i] = acc
        wipow[i] = acci
        acc = acc * wC % fld.P
        acci = acci * wCi % fld.P

    ecl = np.array([(-pn * ll) % n for ll in range(128)], dtype=np.uint64)
    eca = np.array([(-pn * 128 * ca) % n for ca in range(ca_count)],
                   dtype=np.uint64)

    def powv(base, exps):
        out = np.empty(len(exps), dtype=np.uint64)
        for i, e in enumerate(exps):
            out[i] = pow(base, int(e), fld.P)
        return out

    wcl = powv(nr2, ecl)
    iwcl = powv(nr2i, ecl)

    freqs = dif_freq_of_pos(ca_count)
    ll = np.arange(128, dtype=np.int64)
    kh = np.arange(128, dtype=np.int64)
    Mf = np.empty((ca_count, 128, 128), dtype=np.uint64)
    Mi = np.empty((ca_count, 128, 128), dtype=np.uint64)
    for j in range(ca_count):
        kl = int(freqs[j])
        e = (ll[:, None] * (kl + ca_count * kh[None, :])) % C
        Mf[j] = _mulmod_u64(wpow[e], wcl[:, None])
        # inverse: rows kh, cols l; unnormalized (1/n lives in iw fold)
        ei = (ll[None, :] * (kl + ca_count * kh[:, None])) % C
        Mi[j] = _mulmod_u64(wipow[ei], iwcl[None, :])
    wf8, corrf = build_rhs_tables(Mf)
    wi8, corri = build_rhs_tables(Mi)
    from .mxu_dft import permute_rhs_rows_bytes, use_bytecast
    if use_bytecast():
        # rows in bitcast byte order: the kernels' x-side pack becomes
        # one XOR + int8 reinterpret per word
        wf8 = permute_rhs_rows_bytes(wf8)
        wi8 = permute_rhs_rows_bytes(wi8)

    # root-of-2 wrap between the ca/l weight-exponent parts: the 2^{-+1}
    # correction depends on c only, so it folds into the mid tables as
    # inv2 (forward) / 2 (inverse) on the wrapped lanes — the masked
    # halve/double that used to run per element per direction is gone.
    # The (1, C) mask stays in t.fused for plumbing/diagnostics only.
    wrapc = ((np.repeat(eca, 128) + np.tile(ecl, ca_count)) >= n
             ).astype(np.uint32).reshape(1, C)
    wrap_flat = wrapc.reshape(C) != 0
    inv2 = fld.inv(2)
    wfac = np.where(wrap_flat, np.uint64(inv2), np.uint64(1))
    ifac = np.where(wrap_flat, np.uint64(2), np.uint64(1))

    # ca-part of the weights folds into the mid tables (it commutes
    # through the R-transform); stored as separate folded copies so the
    # unfused tables stay valid for the numpy oracle
    wca = powv(nr2, eca)
    iwca = powv(nr2i, eca)
    wca_c = _mulmod_u64(np.repeat(wca, 128), wfac).reshape(1, 1, C)
    iwca_c = _mulmod_u64(np.repeat(iwca, 128), ifac).reshape(1, 1, C)

    def mul_tab(pair, fac64):
        gnp = GL(np)
        lo = np.asarray(pair[0])
        hi = np.asarray(pair[1])
        f0, f1 = to_pairs(np.broadcast_to(fac64, lo.shape).copy())
        r0, r1 = gnp.canon(*gnp.mul(lo, hi, f0, f1))
        return put(r0), put(r1)

    mid_f = mul_tab(t.mid, wca_c)
    midi_f = mul_tab(t.mid_inv, iwca_c)

    t.fused = (put(wf8), put(corrf), put(wi8), put(corri),
               put(wrapc),
               mid_f[0], mid_f[1], midi_f[0], midi_f[1])
    return t


def fused_c_ref(t: FourStepTables, x0, x1, mode: str, u0=None, u1=None):
    """Numpy oracle of the fused C kernel's dataflow (exact mirror of the
    wide-lane formulation: lane-tile DFT + per-slot RHS dots)."""
    g = GL(np)
    fp = t.fp
    (wf8, corrf, wi8, corri, wrapc, *_rest) = t.fused
    ca_count = wf8.shape[0]
    sh = x0.shape
    R, C = fp.R, fp.C
    v0 = np.asarray(x0).reshape(R, C)
    v1 = np.asarray(x1).reshape(R, C)
    del wrapc  # the 2^{-+1} wrap lives in the folded mid tables now
    v0, v1 = dft_lanes(g, v0, v1, ca_count, 128, False)
    from .mxu_dft import mxu_rhs_apply

    from .mxu_dft import use_bytecast
    byt = use_bytecast()

    def dots(v0, v1, w8, corr):
        outs0, outs1 = [], []
        for j in range(ca_count):
            y0, y1 = mxu_rhs_apply(
                g, v0[:, j * 128:(j + 1) * 128],
                v1[:, j * 128:(j + 1) * 128], 128,
                np.asarray(w8)[j], np.asarray(corr)[j],
                bytes_order=byt)
            outs0.append(y0)
            outs1.append(y1)
        return (np.concatenate(outs0, axis=1),
                np.concatenate(outs1, axis=1))

    v0, v1 = dots(v0, v1, wf8, corrf)
    if mode == "fwd":
        return v0.reshape(sh), v1.reshape(sh)
    if mode == "sqr":
        v0, v1 = g.sqr(v0, v1)
    else:
        v0, v1 = g.mul(v0, v1, np.asarray(u0).reshape(v0.shape),
                       np.asarray(u1).reshape(v1.shape))
    v0, v1 = dots(v0, v1, wi8, corri)
    v0, v1 = dft_lanes(g, v0, v1, ca_count, 128, True)
    return v0.reshape(sh), v1.reshape(sh)


def mxu_key(L: int, inverse: bool) -> str:
    """Generic (unfolded) table key. String keys only: FourStepTables is a
    pytree and jax sorts dict keys, so they must be mutually comparable."""
    return f"g{L}{'i' if inverse else 'f'}"


def attach_mxu_tables(t: FourStepTables, device_put=None):
    """Build and attach the int8 MXU DFT tables the plan's passes use.

    Generic per-(L, dir) tables, plus twiddle-folded per-grid variants for
    the four inter-factor twiddles (t_r, t_c, t_c_inv, t_r_inv): those
    factors are constant across one kernel invocation's lanes, so they fold
    into the DFT matrix as row scalings — one (9L, 8L) table per grid
    index, eliminating a full general mulmod per element in passes
    P1/P3/P4/P6 (the reference's analog: twiddles baked into fused radix
    kernels, kernels/marin.cl forward*_0 variants).
    """
    from .mxu_dft import (build_mxu_tables, lhs_bitcast_mode,
                          permute_lhs_cols_bytes)
    from .gl64 import from_pairs as _fp64
    put = device_put if device_put is not None else (lambda a: a)
    fp = t.fp
    sizes = {fp.rs.L1, fp.rs.L2}
    mxu = {}
    lhs_mode = lhs_bitcast_mode()

    def add(key, L, inv, row_scale=None, col_scale=None):
        w8, corr = build_mxu_tables(
            L, inv, row_scale=row_scale, col_scale=col_scale)
        if lhs_mode:
            # contraction columns in the device's bitcast byte order:
            # the kernels' LHS pack becomes one XOR + bitcast per word
            w8 = permute_lhs_cols_bytes(w8, lhs_mode)
        mxu[key] = (put(w8), put(corr))

    for L in sorted(sizes):
        if L < 32 and L & (L - 1) == 0:
            # small power-of-two DFTs stay on the VPU (shift twiddles);
            # radix-5 factors ALWAYS need their MXU matrix
            continue
        for inv in (False, True):
            add(mxu_key(L, inv), L, inv)

    def fetch(pair):   # (L1, L2, 1) u32 pair -> (L1, L2) u64 host
        lo = np.asarray(pair[0]).reshape(pair[0].shape[0], pair[0].shape[1])
        hi = np.asarray(pair[1]).reshape(lo.shape)
        return _fp64(lo, hi)

    if fp.rs.L1 >= 32:
        add("tr_fwd", fp.rs.L1, False, row_scale=fetch(t.t_r).T.copy())
    if fp.rs.L2 >= 32 or fp.rs.L2 % 5 == 0:
        add("tr_inv", fp.rs.L2, True, row_scale=fetch(t.t_r_inv))

    # ---- IBDWT weight folds (P1 forward, P7 inverse) -------------------
    # w(r*C + c) = wr(r) * wc(c) * 2^-k,  iw = iwr(r) * iwc(c) * 2^k / n,
    # k = [er(r) + ec(c) >= n] (single wrap of the root-of-two exponent).
    # wr/iwr fold into the r1-pass tables (exact per row x grid); wc/iwc
    # fold into the fused-C tables (attach_fused_c_tables); the 2^{-+k}
    # correction is a masked halve/double in the kernels (t.wcorr).
    if fp.rs.L1 >= 32:
        from ...core import field as fld
        n = fp.n
        R, C = fp.R, fp.C
        R1, R2 = fp.rs.L1, fp.rs.L2
        nr2 = fld.root_two_nth(n)
        nr2i = fld.inv(nr2)
        pn = fp.p % n
        er = np.array([(-pn * r * C) % n for r in range(R)],
                      dtype=np.uint64)
        ec = np.array([(-pn * c) % n for c in range(C)], dtype=np.uint64)

        def powv(base, exps):
            out = np.empty(len(exps), dtype=np.uint64)
            for i, e in enumerate(exps):
                out[i] = pow(base, int(e), fld.P)
            return out

        wr = powv(nr2, er)
        ninv = fld.inv(n)
        iwr = (powv(nr2i, er).astype(object) * ninv % fld.P
               ).astype(np.uint64)
        tw_tr = fetch(t.t_r)          # (R1, R2)
        # column scales indexed [grid k][col j]
        wr_f = wr.reshape(R1, R2).T.copy()        # (R2, R1)
        add("tr_fwd_w", R1, False, row_scale=tw_tr.T.copy(),
            col_scale=wr_f)
        # inverse: output-row scales (including 1/n)
        add("iw_inv", R1, True, row_scale=iwr.reshape(R1, R2).T.copy())
        # correction residue tables in kernel block layouts: er in the
        # AX (R1, R2, 1) arrangement (tiles slice the r2 dim like the
        # data); ec broadcast over rows (1, C)
        er_rc = er.reshape(R1, R2, 1).astype(np.uint32)
        ec_ax = ec.reshape(1, C).astype(np.uint32)
        t.wcorr = (put(np.ascontiguousarray(er_rc)),
                   put(np.ascontiguousarray(ec_ax)))

    t.mxu = mxu
    return t
