"""MXU-backed small DFTs: the length-L (L <= 64) Goldilocks DFT as one int8
matrix multiply on the systolic array.

The per-pass DFT64 cascade is VPU-bound (~2.2 ms per pass at n = 2^23).
Re-expressed as a matmul it rides the 394-TOPS int8 MXU instead:

  out[r] = sum_c M[r, c] * x[c]  (mod P), M = the DIF-ordered DFT matrix.

64-bit operands don't fit the MXU, so both sides are decomposed into 8-bit
limbs (the "scaled-matrix" trick): with x = sum_l u_l 256^l (u_l unsigned
bytes) and M_l = (M * 256^l mod P) pre-scaled host-side,

  out = sum_l M_l @ u_l
      = sum_m 2^(8m) * sum_l limb_m(M_l) @ u_l       (mod P)

so ONE int8 matmul WBIG(8L x 8L) @ X(8L x batch) produces all 8 diagonal
planes D_m, and the combine sum_m D_m 2^(8m) mod P is cheap VPU pair math.

Two offset tricks keep everything in int8/int32 exactly:
  * x-side: u_l - 128 = byte XOR 0x80 bitcast to int8; the constant
    128 * rowsum(WBIG) is added back to D (corr vector).
  * W-side: limbs of M_l are balanced digits in [-128, 127]. EIGHT limb
    planes suffice: each entry is encoded as the signed representative
    v or v - P (whichever the 8-digit balanced range [-128, 127] *
    (256^8-1)/255 covers — one of them always is, since
    P < 2^64 - 1), so no ninth plane exists and the matmul and combine
    are 8/9 the work of the plain unsigned recode.
  * D-side: D + corr may be negative; adding a per-contraction power-of-
    two offset per plane and subtracting the static sum(off * 2^(8m))
    mod P afterwards keeps the combine unsigned.

This file has the host-side table builder and the in-kernel apply; the
reference's counterpart is the radix kernel set (kernels/marin.cl) — the
matmul formulation is TPU-only.
"""

from __future__ import annotations

import numpy as np

from ...core.field import P
from .gl64 import GL, from_pairs, to_pairs

def _plane_offset(contraction: int) -> int:
    """Per-plane offset making D + corr provably non-negative: the dot
    accumulates `contraction` products W*u with |W| <= 128, u <= 255, so
    sum W*u >= -contraction*128*255; the offset is the next power of two.
    (The round-1 fixed 2^23 covered the typical but not the worst case.)"""
    bound = contraction * 128 * 255
    return 1 << (bound - 1).bit_length()


def dft_matrix(L: int, inverse: bool) -> np.ndarray:
    """(L, L) u64 DFT matrix: for power-of-two L it reproduces
    fourstep.dft_axis0's map exactly (DIF output ordering); for other L
    (the radix-5 factors, which only ever run on the MXU) it is the
    NATURAL-order Vandermonde of the L-th root of unity."""
    from . import fourstep as fsm
    g = GL(np)
    if L & (L - 1):
        w = fsm.root_554(L)
        if inverse:
            from ...core import field as fld
            w = fld.inv(w)
        M = np.empty((L, L), dtype=np.uint64)
        for k in range(L):
            M[k] = [pow(w, k * j, P) for j in range(L)]
        return M
    if L > 64:
        # no shift-twiddle network past 64 (ord(2) = 192): build the
        # SAME DIF-ordered map in closed form. Forward: out position k
        # holds frequency freq(k) -> M[k][j] = w^(freq(k)*j). Inverse
        # (mirrored DIT): consumes the forward's order, natural out ->
        # M[k][j] = w^(-k*freq(j)). Equality with dft_axis0 at L <= 64
        # is asserted by test_mxu_dft.
        freq = fsm.dif_freq_of_pos(L)
        w = fsm.root_554(L)
        if inverse:
            from ...core import field as fld
            w = fld.inv(w)
        M = np.empty((L, L), dtype=np.uint64)
        for k in range(L):
            if not inverse:
                M[k] = [pow(w, int(freq[k]) * j, P) for j in range(L)]
            else:
                M[k] = [pow(w, k * int(freq[j]), P) for j in range(L)]
        return M
    eye = np.eye(L, dtype=np.uint64)
    x0, x1 = to_pairs(eye)
    y0, y1 = fsm.dft_axis0(g, x0, x1, L, inverse)
    c0, c1 = g.canon(y0, y1)
    return from_pairs(c0, c1)  # column j = transform of basis vector e_j


N_WPLANES = 8

# Largest value an 8-digit balanced base-256 decomposition can reach:
# 127 * (256^8 - 1) / 255. P - MAXPOS8 <= -(minimum) holds, so every
# residue mod P is representable as v (v <= MAXPOS8) or v - P.
_MAXPOS8 = 127 * ((1 << 64) - 1) // 255


def _balanced_limbs(v: int) -> list[int]:
    """Exact signed 8-limb base-256 decomposition of the representative
    v or v - P (d in [-128, 127]); v - P is encoded by decomposing
    v + 2^32 - 1 (< 2^64) and dropping the +2^64 leftover."""
    digits = []
    x = v if v <= _MAXPOS8 else v + (1 << 32) - 1
    wrap = v > _MAXPOS8
    for _ in range(N_WPLANES):
        d = x & 255
        x >>= 8
        if d >= 128:
            d -= 256
            x += 1
        digits.append(d)
    assert x == (1 if wrap else 0), f"value {v} out of 8-limb range"
    return digits


def _balanced_limbs_vec(v: np.ndarray) -> np.ndarray:
    """Vectorized _balanced_limbs: u64 array -> int8 array (8, *v.shape).
    Entries above _MAXPOS8 are recoded as v - P: v + (2^32 - 1) never
    overflows u64 for v < P, and the leftover +2^64 is dropped."""
    wrap = v > np.uint64(_MAXPOS8)
    x = v + wrap.astype(np.uint64) * np.uint64((1 << 32) - 1)
    out = np.empty((N_WPLANES,) + v.shape, dtype=np.int8)
    for m in range(N_WPLANES):
        d = (x & np.uint64(255)).astype(np.int64)
        x = x >> np.uint64(8)
        neg = d >= 128
        d = np.where(neg, d - 256, d)
        x = x + neg.astype(np.uint64)
        out[m] = d.astype(np.int8)
    assert (x == wrap.astype(np.uint64)).all(), "value out of 8-limb range"
    return out


def _mulmod_u64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    g = GL(np)
    a0, a1 = to_pairs(np.ascontiguousarray(a))
    b0, b1 = to_pairs(np.ascontiguousarray(b))
    r0, r1 = g.canon(*g.mul(a0, a1, b0, b1))
    return from_pairs(r0, r1)


def _fold_sub_into_corr(corr: np.ndarray, off: int, plane_axis_stride: int,
                        plane_axis: int):
    """Fold the static plane-offset compensation into corr: adding the
    byte-planes of (P - sum_m off*2^(8m)) mod P makes the assembled value
    ≡ true + P ≡ true (mod P) directly, so the combine needs NO final
    subtract (saves a sub64 + fold_borrow per element per dot)."""
    sub = sum((off << (8 * m)) for m in range(N_WPLANES)) % P
    sbar = (P - sub) % P
    L = plane_axis_stride
    for m in range(N_WPLANES):
        b = (sbar >> (8 * m)) & 0xFF
        if not b:
            continue
        sl = [slice(None)] * corr.ndim
        sl[plane_axis] = slice(m * L, (m + 1) * L)
        corr[tuple(sl)] += np.int32(b)
    return corr


def build_rhs_tables(Ms: np.ndarray):
    """Limb-encode matrices for RIGHT-side dots: out[b, k] = sum_l x[b, l]
    * M[l, k] (the transform axis is the LANE axis; batch rides sublanes).

    Ms: (K, L, L) u64 — one matrix per variant (twiddles/weights already
    multiplied in). Returns (W8 (K, 8L, 8L) int8, corr (K, 1, 8L) int32)
    where
      W8[v, q*L + l, m*L + k] = balanced limb m of (Ms[v, l, k] * 256^q),
    so D = X8 @ W8[v] with X8[b, q*L + l] = byte q of x[b, l] (XOR 0x80)
    yields the eight diagonal planes along the lane axis; corr adds back
    the 128-offset plus the plane offset plus the byte-planes of the
    offset's mod-P complement (per output lane, broadcast over batch
    rows) — the combine is then subtraction-free."""
    K, L, L2 = Ms.shape
    assert L == L2
    scales = np.array([pow(256, q, P) for q in range(8)], dtype=np.uint64)
    # (K, L, 8, L): [v, l, q, k] = M[l, k] * 256^q
    Mq = _mulmod_u64(Ms[:, :, None, :], scales[None, None, :, None])
    limbs = _balanced_limbs_vec(Mq)          # (8, K, L, 8, L) int8
    # rows = (q, l) -> q*L + l; cols = (m, k) -> m*L + k
    W8 = np.ascontiguousarray(
        limbs.transpose(1, 3, 2, 0, 4).reshape(K, 8 * L, N_WPLANES * L))
    off = _plane_offset(8 * L)
    corr = (W8.astype(np.int64).sum(axis=1) * 128 + off
            ).astype(np.int32).reshape(K, 1, N_WPLANES * L)
    corr = _fold_sub_into_corr(corr, off, L, 2)
    return W8, corr


def build_mxu_tables(L: int, inverse: bool, row_scale: np.ndarray = None,
                     col_scale: np.ndarray = None):
    """Returns (W8 int8, corr int32).

    W8[m*L + r, l*L + c] = balanced limb m of (M[r, c] * 256^l mod P).
    corr adds back the x-side 128 offset, the per-plane offset, and the
    byte-planes of the offset's mod-P complement — the combine is then
    subtraction-free.

    row_scale: optional (K, L) u64 — per-variant OUTPUT-row scalings (the
    inter-factor twiddles / inverse weights, constant across a kernel
    invocation's lanes): variant k encodes diag(row_scale[k]) @ M.
    col_scale: optional (K, L) u64 — per-variant INPUT-column scalings
    (the forward IBDWT weight r-parts): ... @ M @ diag(col_scale[k]).
    With either, W8 is (K, 8L, 8L) and corr (K, 8L, 1); otherwise 2D.
    """
    M = dft_matrix(L, inverse)           # (L, L) u64
    if row_scale is None and col_scale is None:
        Mk = M[None]                     # K = 1
    else:
        Mk = M[None]
        if row_scale is not None:
            Mk = _mulmod_u64(row_scale[:, :, None], Mk)    # (K, L, L)
        if col_scale is not None:
            Mk = _mulmod_u64(Mk, col_scale[:, None, :])
    K = Mk.shape[0]
    scales = np.array([pow(256, l, P) for l in range(8)], dtype=np.uint64)
    # (K, L, 8, L): entry [k, r, l, c] = M_k[r, c] * 256^l mod P
    Ml = _mulmod_u64(Mk[:, :, None, :], scales[None, None, :, None])
    limbs = _balanced_limbs_vec(Ml)      # (8, K, L, 8, L) int8
    W8 = np.ascontiguousarray(
        limbs.transpose(1, 0, 2, 3, 4).reshape(K, N_WPLANES * L, 8 * L))
    # x-side 128-offset compensation, with the plane offset baked in
    # (saves one add per plane in the combine)
    off = _plane_offset(8 * L)
    corr = (W8.astype(np.int64).sum(axis=2) * 128 + off
            ).astype(np.int32)
    corr = corr.reshape(K, N_WPLANES * L, 1)
    corr = _fold_sub_into_corr(corr, off, L, 1)
    if row_scale is None and col_scale is None:
        W8, corr = W8[0], corr[0]
    return W8, corr


# ---------------------------------------------------------------------------
# In-kernel apply (jnp inside Pallas; also runs under numpy for tests
# when given an xp-appropriate dot)
# ---------------------------------------------------------------------------

def _pack_planes(g: GL, Xl, Xh):
    """(L, N) u32 pair -> (8L, N) int8 limb planes (bytes XOR 0x80)."""
    xp = g.xp
    planes = []
    for l in range(8):
        src = Xl if l < 4 else Xh
        sh = 8 * (l % 4)
        byte = (src >> xp.uint32(sh)) & xp.uint32(0xFF)
        byte = byte ^ xp.uint32(0x80)
        if xp is np:
            planes.append(byte.astype(np.uint8).view(np.int8))
        else:
            import jax
            import jax.numpy as jnp
            planes.append(jax.lax.bitcast_convert_type(
                byte.astype(jnp.uint8), jnp.int8))
    return xp.concatenate(planes, axis=0)


def _merge_planes(g: GL, planes):
    """Eight non-negative (< 2^27) int-plane arrays at byte positions 8m
    -> exact lazy (lo, hi) u32 pair mod P. The static plane-offset
    compensation is pre-folded into corr (_fold_sub_into_corr), so there
    is no final subtract.

    Pair-merge scheme: adjacent planes (2j, 2j+1) merge into one value at
    16-bit position j (the odd plane's low byte shifts in; its upper bytes
    carry to position j+1), then the 16-bit-aligned values assemble
    into a 96-bit triple with addc-protected boundaries. Fewer VPU ops
    than per-plane 16-bit splitting, and safe for the wider plane bound
    of the corrected _plane_offset."""
    xp = g.xp
    M8 = xp.uint32(0xFF)
    M16 = xp.uint32(0xFFFF)
    u = []
    carry_in = None
    for j in range(4):
        d_even = planes[2 * j]
        d_odd = planes[2 * j + 1]
        t = d_even + ((d_odd & M8) << xp.uint32(8))
        if carry_in is not None:
            t = t + carry_in
        u.append(t)
        carry_in = d_odd >> xp.uint32(8)
    u.append(planes[8] + carry_in if len(planes) > 8 else carry_in)
    # u[j] < 2^27 + 2^19 at bit position 16j, j = 0..4
    w0, c0 = g.addc(u[0], (u[1] & M16) << xp.uint32(16))
    a = (u[1] >> xp.uint32(16)) + u[2] + c0
    w1, c1 = g.addc(a, (u[3] & M16) << xp.uint32(16))
    w2 = (u[3] >> xp.uint32(16)) + u[4] + c1
    return g.fold96(w0, w1, w2)


def _combine_2d(g: GL, L, D):
    """(8L, N) int32 diagonal planes -> exact (lo, hi) u32 pair mod P.

    Row-slices D (Mosaic supports sublane slicing; it does NOT support the
    (8L, N) -> (8, L, N) leading split); the merge itself is the shared
    pair-merge scheme (_merge_planes)."""
    xp = g.xp
    planes = [D[m * L:(m + 1) * L].astype(xp.uint32)
              for m in range(D.shape[0] // L)]
    return _merge_planes(g, planes)


def _pack_planes_rhs(g: GL, Xl, Xh):
    """(B, L) u32 pair -> (B, 8L) int8 limb planes along lanes."""
    xp = g.xp
    planes = []
    for q in range(8):
        src = Xl if q < 4 else Xh
        sh = 8 * (q % 4)
        byte = (src >> xp.uint32(sh)) & xp.uint32(0xFF)
        byte = byte ^ xp.uint32(0x80)
        if xp is np:
            planes.append(byte.astype(np.uint8).view(np.int8))
        else:
            import jax
            import jax.numpy as jnp
            planes.append(jax.lax.bitcast_convert_type(
                byte.astype(jnp.uint8), jnp.int8))
    return xp.concatenate(planes, axis=1)


def lhs_bitcast_mode() -> str:
    """Sublane byte order of Mosaic's width-changing u32 -> int8 bitcast,
    for the LHS (transform-on-sublanes) pack: "" = off (shift/mask pack),
    "wordmajor" = byte b of word l lands at sublane 4l + b (what
    interpret mode does), "planemajor" = sublane b*L + l.

    Default: "wordmajor" — measured on TPU v5e with tools/probe_bitcast.py
    (sublane order [0, 1, 2, .., 31] = word-major) and worth ~10% end to
    end (the ~24-op shift/mask LHS pack collapses to one XOR + bitcast).
    Override with PRMERS_LHS_BITCAST on hardware whose bitcast order
    differs ("0"/"off" disable; any other value names the order)."""
    import os
    v = os.environ.get("PRMERS_LHS_BITCAST", "wordmajor")
    return "" if v in ("", "0", "off") else v


def lhs_byte_perm(L: int, mode: str) -> np.ndarray:
    """Index map new_row -> old_row (old = plane order q*L + l) for the
    (8L)-row LHS pack under the given bitcast order; X8 is the axis-0
    concat [bitcast(x0), bitcast(x1)]."""
    idx = np.empty(8 * L, dtype=np.int64)
    for q in range(8):
        half = 0 if q < 4 else 4 * L
        b = q % 4
        for ll in range(L):
            if mode == "wordmajor":
                new = half + ll * 4 + b
            elif mode == "planemajor":
                new = half + b * L + ll
            else:
                raise ValueError(mode)
            idx[new] = q * L + ll
    return idx


def permute_lhs_cols_bytes(W8: np.ndarray, mode: str) -> np.ndarray:
    """Reorder LHS-table contraction columns ((K,) PL, 8L; col = q*L + c)
    to the bitcast byte order so X8 can be one XOR + bitcast per word.
    corr is a row sum over the x-side 128 offset — unchanged."""
    L = W8.shape[-1] // 8
    return np.ascontiguousarray(W8[..., lhs_byte_perm(L, mode)])


def _pack_planes_bitcast(g: GL, Xl, Xh, mode: str):
    """(L, N) u32 pair -> (8L, N) int8 in the device bitcast byte order:
    one XOR + width-changing bitcast per word. Pair only with
    permute_lhs_cols_bytes'd tables."""
    xp = g.xp
    c = xp.uint32(0x80808080)
    if xp is np:
        # emulate: row new of X8 = plane-order row perm[new]
        L = Xl.shape[0]
        planes = _pack_planes(g, Xl, Xh)          # plane order q*L + l
        return planes[lhs_byte_perm(L, mode)]
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    b0 = pltpu.bitcast(Xl ^ c, jnp.int8)
    b1 = pltpu.bitcast(Xh ^ c, jnp.int8)
    return jnp.concatenate([b0, b1], axis=0)


def use_bytecast() -> bool:
    """Byte-order RHS pack: the x-side limb split becomes one XOR +
    int8 bitcast per word (vs ~8 shift/mask/xor rounds) when the W
    tables' rows are pre-permuted to the bitcast's little-endian byte
    order. Opt-in (PRMERS_BYTECAST=1) until measured on device;
    "0"/"off"/"" mean off (so A/B combos can disable with =0)."""
    import os
    return os.environ.get("PRMERS_BYTECAST", "") not in ("", "0", "off")


def permute_rhs_rows_bytes(W8: np.ndarray) -> np.ndarray:
    """Reorder (K, 8L, 9L) RHS-table rows from plane order (q*L + l) to
    the bitcast byte order: x0's four bytes at l*4 + q (q < 4), then
    x1's at 4L + l*4 + (q - 4). corr is a column sum — unchanged."""
    K, rows, _ = W8.shape
    L = rows // 8
    idx = np.empty(rows, dtype=np.int64)
    for q in range(8):
        for ll in range(L):
            new = (ll * 4 + q) if q < 4 else (4 * L + ll * 4 + (q - 4))
            idx[new] = q * L + ll
    return np.ascontiguousarray(W8[:, idx, :])


def _pack_planes_rhs_bytes(g: GL, Xl, Xh):
    """(B, L) u32 pair -> (B, 8L) int8 in BITCAST byte order: one XOR
    (all four bytes at once) + reinterpret per word. Pair only with
    permute_rhs_rows_bytes'd tables."""
    xp = g.xp
    c = xp.uint32(0x80808080)
    if xp is np:
        b0 = np.ascontiguousarray(Xl ^ c).view(np.int8)
        b1 = np.ascontiguousarray(Xh ^ c).view(np.int8)
        return np.concatenate([b0, b1], axis=1)
    import jax
    import jax.numpy as jnp
    B = Xl.shape[0]
    b0 = jax.lax.bitcast_convert_type(Xl ^ c, jnp.int8).reshape(B, -1)
    b1 = jax.lax.bitcast_convert_type(Xh ^ c, jnp.int8).reshape(B, -1)
    return jnp.concatenate([b0, b1], axis=1)


def _combine_rhs(g: GL, L, D):
    """(B, 8L) int32 planes (lane-major) -> (lo, hi) u32 pairs (B, L),
    via the shared pair-merge scheme slicing planes along LANES."""
    xp = g.xp
    planes = [D[:, m * L:(m + 1) * L].astype(xp.uint32)
              for m in range(D.shape[1] // L)]
    return _merge_planes(g, planes)


def mxu_rhs_apply(g: GL, x0, x1, L: int, w8, corr,
                  dot=None, bytes_order: bool = False):
    """Lane-axis DFT of a (B, L) u32-pair batch via one (B, 8L) @ (8L, 8L)
    int8 matmul; exact mod-P lazy pair out. w8/corr are ONE variant slice
    from build_rhs_tables (rows byte-permuted when bytes_order)."""
    xp = g.xp
    pack = _pack_planes_rhs_bytes if bytes_order else _pack_planes_rhs
    X8 = pack(g, x0, x1)
    if xp is np:
        D = X8.astype(np.int32) @ w8.astype(np.int32)
    else:
        from jax import lax
        import jax.numpy as jnp
        D = lax.dot_general(X8, w8, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return _combine_rhs(g, L, D + corr)


def mxu_dft_apply_multi(g: GL, pairs, L: int, w8_slices, corr_slices):
    """Apply the LHS MXU DFT to SEVERAL (x0, x1) 2D operands (each
    (L, N)) with per-operand variant tables, emitting all packs, then all
    dots, then all combines: the independent dots become visible to the
    Mosaic scheduler at once, so the MXU work overlaps the VPU-heavy
    pair-merge combines (the per-operand-serial form runs them back to
    back). Returns a list of (y0, y1) pairs."""
    xp = g.xp
    lhs_mode = lhs_bitcast_mode()

    def pack(Xl, Xh):
        if lhs_mode:
            return _pack_planes_bitcast(g, Xl, Xh, lhs_mode)
        return _pack_planes(g, Xl, Xh)

    X8s = [pack(x0, x1) for (x0, x1) in pairs]
    if xp is np:
        Ds = [w8_slices[s].astype(np.int32) @ X8s[s].astype(np.int32)
              for s in range(len(pairs))]
    else:
        from jax import lax
        import jax.numpy as jnp
        Ds = [lax.dot_general(w8_slices[s], X8s[s],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
              for s in range(len(pairs))]
    return [_combine_2d(g, L, Ds[s] + corr_slices[s])
            for s in range(len(pairs))]


def mxu_dft_apply(g: GL, x0, x1, L: int, w8, corr,
                  grp: int = 8):
    """Transform along axis 0 of (L, ...batch) u32-pair arrays via the MXU.

    x values may be any u64 (lazy); output is the exact DFT mod P in lazy
    form, identical (mod P) to fourstep.dft_axis0.

    With the wide-lane layout the batch IS the lane extent (view (L, C)),
    so the whole transform is ONE int8 (9L, 8L) @ (8L, C) matmul feeding
    the pair-merge combine — no per-column loop. A trailing (MID, LN)
    batch (the legacy narrow layout) still loops one dot per mid column.
    """
    xp = g.xp
    is_np = xp is np
    rest = x0.shape[1:]
    B = 1
    for d in rest:
        B *= d
    LN = rest[-1] if rest else 1
    MID = B // LN
    lhs_mode = lhs_bitcast_mode()

    def pack(Xl, Xh):
        if lhs_mode:
            return _pack_planes_bitcast(g, Xl, Xh, lhs_mode)
        return _pack_planes(g, Xl, Xh)

    if is_np:
        D = w8.astype(np.int32) @ pack(
            x0.reshape(L, B), x1.reshape(L, B)).astype(np.int32)
        y0, y1 = _combine_2d(g, L, D + corr)
        return y0.reshape((L,) + rest), y1.reshape((L,) + rest)

    from jax import lax
    import jax.numpy as jnp

    def one_dot(Xl, Xh):
        X8 = pack(Xl, Xh)
        D = lax.dot_general(w8, X8, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        return _combine_2d(g, L, D + corr)

    if MID == 1 or len(rest) == 1:
        y0, y1 = one_dot(x0.reshape(L, B), x1.reshape(L, B))
        return y0.reshape((L,) + rest), y1.reshape((L,) + rest)

    # legacy narrow layout: lane-concat of sublane-offset slices is NOT
    # Mosaic-supported, so one dot per mid column
    xl = x0.reshape((L, MID, LN))
    xh = x1.reshape((L, MID, LN))
    outs0 = []
    outs1 = []
    for j in range(MID):
        y0, y1 = one_dot(xl[:, j, :], xh[:, j, :])
        outs0.append(y0.reshape(L, 1, LN))
        outs1.append(y1.reshape(L, 1, LN))
    y0 = xp.concatenate(outs0, axis=1)
    y1 = xp.concatenate(outs1, axis=1)
    return y0.reshape((L,) + rest), y1.reshape((L,) + rest)
