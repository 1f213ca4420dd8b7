"""Pallas TPU kernels for the four-step IBDWT squaring pipeline
(wide-lane layout).

Data arrays are 3D AX = (R1, R2, C): the digit at [r1, r2, c] is
x[(r1*R2 + r2)*C + c], and the WHOLE length-C axis is the lane extent
(C/128 lane tiles). Per squaring the passes are

  P1  r1-DFT   (one (9L,8L)@(8L,C) int8 MXU dot; IBDWT weight r-part and
      the T_R twiddle folded as per-r2 variant tables; wrap correction
      and block-carry injection elementwise)                [grid (R2,)]
  P2  r2-DFT   (one dot per r1; post mid*wca table)         [grid (R1,)]
  F2  fused C-transform: shift-twiddle DFT over the lane-TILE index
      (ca = c >> 7), then one lane-axis dot per output group with the
      omega_C twiddles and the lane-part weights folded into ca_count
      variant matrices; dyadic square (or multiplicand mul) at the
      center; mirrored inverse. No global transposes  [grid (R1/RC,)]
  P6  r2-iDFT  (pre mid_inv*iwca)                           [grid (R1,)]
  P7  r1-iDFT  (inverse weight r-part folded; wrap double; canonicalize)
  P8  carry (parallel grid over r1 blocks; wraparound carry deferred to
      the next iteration's P1 injection)

The round-1 narrow layout carried a (CB, G, LN) sublane payload whose
16-way strided slicing made a fused C-transform ~3x slower than the
passes it replaced; with C in lanes every small-DFT slice is a 128-lane
tile and every MXU dot runs with N = C. The reference reaches the same
arithmetic through fused radix dispatch tables on one GPU queue
(reference: include/marin/engine_gpu.h:1568-1630, kernels/marin.cl).
"""

from __future__ import annotations

import functools
import os

import numpy as np

from ... import jaxconf  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gl64 import GL
from . import fourstep as fsm
from . import mxu_dft as mxm
from .fourstep import FourStepPlan, FourStepTables

g = GL(jnp)

LANES = 128
G = 8              # retained for table-build signatures (no payload dim)
SUBBLK = 8         # sub-factor slice width for VPU-dft leading-axis passes
# v5e/v5p cores expose 128 MiB of VMEM; the flagship fused kernel's
# scoped stack peaks at ~105 MiB (measured: the 100 MiB default OOMed by
# 4.5 MiB at n=2^23 and degraded the whole pipeline), so the cap sits as
# close to the hardware as Mosaic allows. Env-overridable for smaller
# parts.
_VMEM_DEFAULT = 127 * 1024 * 1024


def _vmem_limit() -> int:
    v = os.environ.get("PRMERS_VMEM_LIMIT", "")
    if not v:
        return _VMEM_DEFAULT
    try:
        return int(v)
    except ValueError:
        import warnings
        warnings.warn(f"PRMERS_VMEM_LIMIT={v!r} is not an integer byte "
                      f"count; using the default {_VMEM_DEFAULT}")
        return _VMEM_DEFAULT


VMEM_LIMIT = _vmem_limit()


def _cparams(**kw):
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT, **kw)


def _interpret() -> bool:
    """Pallas interpret mode: kernels execute as jax ops (CPU mesh tests
    and the driver's multi-chip dryrun run the SAME kernel code without
    Mosaic)."""
    return bool(os.environ.get("PRMERS_PALLAS_INTERPRET"))


def _full(shape):
    """Whole-array VMEM spec with an explicit all-i32 index map (default
    maps emit i64 literals under jax_enable_x64, breaking Mosaic)."""
    nd = len(shape)
    return pl.BlockSpec(tuple(shape),
                        lambda *gs: tuple(gs[0] * 0 for _ in range(nd)),
                        memory_space=pltpu.VMEM)


def _mxspec(shape):
    """Spec for an MXU table input: 2D generic tables map whole; 3D
    twiddle-folded tables select the grid-dim-0 slice."""
    if len(shape) == 3:
        return pl.BlockSpec((1,) + tuple(shape[1:]),
                            lambda i: (i, i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    return _full(shape)


def _halve_mod_p(x0, x1, mask):
    return g.halve_where(x0, x1, mask)


def _double_mod_p(x0, x1, mask):
    return g.double_where(x0, x1, mask)


def _r2_tile(r2: int) -> int:
    """Sub-column tile width S for passes that tile the r2 dim: Pallas
    wants the block's second-to-last dim to be a multiple of 8 or the
    whole extent, and S MUST divide r2 — radix-5 splits produce r2 in
    {5, 10, 20} whose only legal choice is the whole extent (r2 = 10/20
    tiled at S=8 silently dropped sub-columns: grid = r2 // 8 truncated;
    found by the device GL smoke at n = 5*2^17 / 5*2^18)."""
    return 8 if r2 % 8 == 0 else r2


# ---------------------------------------------------------------------------
# The generic R-side pass kernel (P1 / P2 / P6 / P7)
# ---------------------------------------------------------------------------

def _pass_kernel(L: int, inverse: bool, has_pre: bool, has_post: bool,
                 cin_widths, has_mxu: bool, wcorr_n, canon: bool, *refs):
    """Tile = (L, S, C) [axis-0 pass over r1] or (1, L, C) [axis-1 pass
    over r2]; the kernel views the transform axis first: (L, S, C) or
    (L, C).

    cin_widths: None, or the static widths of the leading digits — then
    the first two refs are (1,1) SMEM scalars holding the wraparound
    carry, folded base-2^width into lanes 0..k-1 of the grid-0 tile
    (the reference's carry phase 2 riding the next forward kernel,
    kernels/marin.cl:2198).

    wcorr_n: None, or n — then two refs hold the (1, L, 1) grid-sliced
    er residues and the (1, C) ec residues; forward passes halve where
    er + ec >= n (weight-fold wrap), the canon pass doubles.
    """
    i = 0
    if cin_widths is not None:
        cin0_ref, cin1_ref = refs[i], refs[i + 1]
        i += 2
    x0_ref, x1_ref = refs[i], refs[i + 1]
    i += 2
    wc_refs = None
    if wcorr_n is not None:
        wc_refs = refs[i], refs[i + 1]
        i += 2
    mxu_refs = None
    if has_mxu:
        mxu_refs = refs[i], refs[i + 1]
        i += 2
    if has_pre:
        pre0_ref, pre1_ref = refs[i], refs[i + 1]
        i += 2
    if has_post:
        post0_ref, post1_ref = refs[i], refs[i + 1]
        i += 2
    o0_ref, o1_ref = refs[i], refs[i + 1]

    sh = x0_ref.shape
    if sh[0] == 1:                      # axis-1 pass: (1, L, C) -> (L, C)
        v = (L, sh[2])
        tb = (L, 1)
    else:                               # axis-0 pass: (L, S, C)
        v = (L, sh[1], sh[2])
        tb = (L, sh[1], 1)

    x0 = x0_ref[:].reshape(v)
    x1 = x1_ref[:].reshape(v)

    def _wcorr_mask():
        # er block is (L, S, 1) for axis-0 passes (r2-sliced like the
        # data); ec is (1, C) broadcast over rows
        er = wc_refs[0][:].reshape(v[:-1] + (1,))
        ec = wc_refs[1][:].reshape((1,) * (len(v) - 1) + (v[-1],))
        return jnp.broadcast_to((er + ec) >= jnp.uint32(wcorr_n), v)

    if wcorr_n is not None and not canon:
        x0, x1 = _halve_mod_p(x0, x1, _wcorr_mask())

    if cin_widths is not None:
        # digits are canonical (< 2^w) and the spread parts are < 2^w, so
        # the injection never carries out of the low 32-bit word
        lo = cin0_ref[0, 0]
        hi = cin1_ref[0, 0]
        k = len(cin_widths)
        q = 0
        vals = []
        for j, w in enumerate(cin_widths):
            if q == 0:
                part = lo
            elif q < 32:
                part = (lo >> jnp.uint32(q)) | (hi << jnp.uint32(32 - q))
            elif q == 32:
                part = hi
            else:
                part = hi >> jnp.uint32(q - 32)
            if j < k - 1:
                part = part & jnp.uint32((1 << w) - 1)
            vals.append(part)
            q += w
        on_first = (pl.program_id(0) == 0).astype(jnp.uint32)
        lane = lax.broadcasted_iota(jnp.int32, v, len(v) - 1)
        row = lax.broadcasted_iota(jnp.int32, v, 0)
        first = row == 0
        if len(v) == 3:
            sub = lax.broadcasted_iota(jnp.int32, v, 1)
            first = first & (sub == 0)
        add = jnp.zeros(v, jnp.uint32)
        for j, val in enumerate(vals):
            add = jnp.where(first & (lane == j), val * on_first, add)
        x0 = x0 + add  # cannot wrap the low word (sum < 2^(w+1) < 2^32)

    def tload(r0, r1):
        s = r0.shape
        if s[-1] == 1:                  # broadcast table (over lanes)
            return r0[:].reshape(tb), r1[:].reshape(tb)
        return r0[:].reshape(v), r1[:].reshape(v)

    if has_pre:
        p0, p1 = tload(pre0_ref, pre1_ref)
        x0, x1 = g.mul(x0, x1, p0, p1)

    if not has_mxu:
        x0, x1 = fsm.dft_axis0(g, x0, x1, L, inverse)
    else:
        w8 = mxu_refs[0]
        corr = mxu_refs[1]
        if len(w8.shape) == 3 and len(v) == 3:
            # axis-0 pass with per-r2 variant tables, S slices in-tile:
            # one big-N dot per sub-column against its own folded matrix,
            # batch-emitted (and stack-throttled) via _sdots_multi
            x0, x1 = _sdots_multi(x0, x1, L, v[1], v[2], w8, corr)
        elif len(w8.shape) == 3:
            # axis-1 pass: one grid-streamed variant (leading block 1)
            x0, x1 = mxm.mxu_dft_apply(g, x0, x1, L, w8[0], corr[0])
        else:
            x0, x1 = mxm.mxu_dft_apply(g, x0, x1, L, w8[:], corr[:])

    if has_post:
        p0, p1 = tload(post0_ref, post1_ref)
        x0, x1 = g.mul(x0, x1, p0, p1)

    if canon:
        if wcorr_n is not None:
            x0, x1 = _double_mod_p(x0, x1, _wcorr_mask())
        x0, x1 = g.canon(x0, x1)

    o0_ref[:] = x0.reshape(sh)
    o1_ref[:] = x1.reshape(sh)


# Largest (L x S x lane) element count one axis-0 tile may hold: the
# C = 8192 shapes' (64, 8, 8192) tile plus the dot intermediates exceed
# VMEM; the wrap/canon/dot phases are lane-independent, so C tiles.
# (The flagship (64, 8, 4096) = 2M tile stays un-tiled.)
AXIS0_BUDGET_EL = 1 << 22


def _axis0_pass(x0, x1, L, inverse, pre=None, post=None, cin=None,
                cin_widths=None, mxu=None, wcorr=None, canon=False):
    """Transform along dim 0 of the (R1, R2, C) array; dim 1 is tiled S
    sub-columns at a time (S = min(8, R2) — Pallas requires the block's
    second-to-last dim to be a multiple of 8 or the whole extent), and
    the lane axis is tiled when the block exceeds AXIS0_BUDGET_EL."""
    sh = x0.shape
    S = _r2_tile(sh[1])
    C = sh[2]
    CT = C
    while L * S * CT >= AXIS0_BUDGET_EL and CT % 256 == 0 and CT > 256:
        CT //= 2
    assert CT == C or cin is None, \
        "lane-tiled axis-0 pass cannot carry the injection strip"
    blk = (L, S, CT)
    if CT == C:
        # 1D grid exactly as before the lane tiling existed (identical
        # Mosaic codegen for the flagship family)
        grid = (sh[1] // S,)

        def im(i):
            return (i * 0, i, i * 0)

        def im_var(i):
            return (i, i * 0, i * 0)

        def im_er(i):
            return (i * 0, i, i * 0)

        def im_ec(i):
            return (i * 0, i * 0)

        def im_s(i):
            return (i * 0, i * 0)
    else:
        grid = (sh[1] // S, C // CT)

        def im(i, j):
            return (i * 0, i, j)

        def im_var(i, j):
            return (i, i * 0, i * 0)

        def im_er(i, j):
            return (i * 0, i, i * 0)

        def im_ec(i, j):
            return (i * 0, j)

        def im_s(i, j):
            return (i * 0, i * 0)

    def bspec(a):
        s = a.shape
        if s[-1] == 1:
            return pl.BlockSpec((L, S, 1), im_er,
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(blk, im, memory_space=pltpu.VMEM)

    xspec = pl.BlockSpec(blk, im, memory_space=pltpu.VMEM)
    smem11 = pl.BlockSpec((1, 1), im_s, memory_space=pltpu.SMEM)
    ins = []
    in_specs = []
    if cin is not None:
        ins += [cin[0], cin[1]]
        in_specs += [smem11, smem11]
    ins += [x0, x1]
    in_specs += [xspec, xspec]
    wcorr_n = None
    if wcorr is not None:
        er_t, ec_t, wcorr_n = wcorr      # er (R1, R2, 1); ec (1, C)
        ins += [er_t, ec_t]
        in_specs += [
            pl.BlockSpec((L, S, 1), im_er, memory_space=pltpu.VMEM),
            (_full(ec_t.shape) if CT == C else
             pl.BlockSpec((1, CT), im_ec, memory_space=pltpu.VMEM))]
    if mxu is not None:
        w8, corr = mxu
        ins += [w8, corr]
        if len(w8.shape) == 3:           # per-r2 variants: S-slice blocks
            in_specs += [
                pl.BlockSpec((S,) + tuple(w8.shape[1:]), im_var,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S,) + tuple(corr.shape[1:]), im_var,
                             memory_space=pltpu.VMEM)]
        else:
            in_specs += [_full(w8.shape), _full(corr.shape)]
    if pre is not None:
        ins += [pre[0], pre[1]]
        in_specs += [bspec(pre[0]), bspec(pre[1])]
    if post is not None:
        ins += [post[0], post[1]]
        in_specs += [bspec(post[0]), bspec(post[1])]
    kern = functools.partial(_pass_kernel, L, inverse,
                             pre is not None, post is not None,
                             cin_widths if cin is not None else None,
                             mxu is not None, wcorr_n, canon)
    r0, r1 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=(xspec, xspec),
        out_shape=(jax.ShapeDtypeStruct(sh, jnp.uint32),
                   jax.ShapeDtypeStruct(sh, jnp.uint32)),
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(*ins)
    return r0, r1


# Largest (L x lane) element count one axis-1 tile may hold: beyond it
# the lane axis is tiled (the r2-DFT is lane-independent, so slicing C
# is free). Keeps the dot output (9L, CT) i32 and its combine
# temporaries inside the VMEM stack at the big shapes (L2 = 128/256/320
# with C = 8192 would otherwise peak ~90+ MB on the dot output alone).
# Env-overridable so tests can exercise the tiled path at small shapes
# (read at trace time, not import time).


def _axis1_budget() -> int:
    return int(os.environ.get("PRMERS_AXIS1_BUDGET", 1 << 19))


def _axis1_pass(x0, x1, L, inverse, pre=None, post=None, mxu=None):
    """Transform along dim 1: tile (1, L, CT) over grid (R1, C // CT);
    CT == C (single lane tile) whenever L*C fits the tile budget."""
    sh = x0.shape
    C = sh[2]
    CT = C
    budget = _axis1_budget()
    while L * CT > budget and CT % 256 == 0 and CT > 256:
        CT //= 2
    blk = (1, L, CT)
    if CT == C:
        grid = (sh[0],)

        def im(i):
            return (i, i * 0, i * 0)

        def im0(i):
            return (i, i * 0, i * 0)

        def im_var(i):
            return (i, i * 0, i * 0)
    else:
        grid = (sh[0], C // CT)

        def im(i, j):
            return (i, i * 0, j)

        def im0(i, j):
            return (i, i * 0, j * 0)

        def im_var(i, j):
            return (i, i * 0, i * 0)

    def bspec(a):
        s = a.shape
        if s[-1] == 1:
            return pl.BlockSpec((1, L, 1), im0, memory_space=pltpu.VMEM)
        return pl.BlockSpec(blk, im, memory_space=pltpu.VMEM)

    def mxspec(shape):
        if len(shape) == 3:
            return pl.BlockSpec((1,) + tuple(shape[1:]), im_var,
                                memory_space=pltpu.VMEM)
        return _full(shape)

    xspec = pl.BlockSpec(blk, im, memory_space=pltpu.VMEM)
    ins = [x0, x1]
    in_specs = [xspec, xspec]
    if mxu is not None:
        w8, corr = mxu
        ins += [w8, corr]
        in_specs += [mxspec(w8.shape), mxspec(corr.shape)]
    if pre is not None:
        ins += [pre[0], pre[1]]
        in_specs += [bspec(pre[0]), bspec(pre[1])]
    if post is not None:
        ins += [post[0], post[1]]
        in_specs += [bspec(post[0]), bspec(post[1])]
    kern = functools.partial(_pass_kernel, L, inverse,
                             pre is not None, post is not None, None,
                             mxu is not None, None, False)
    r0, r1 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=(xspec, xspec),
        out_shape=(jax.ShapeDtypeStruct(sh, jnp.uint32),
                   jax.ShapeDtypeStruct(sh, jnp.uint32)),
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(*ins)
    return r0, r1


# ---------------------------------------------------------------------------
# P1 with in-kernel row-carry injection and P7 with the carry phase
# fused in (per-row lane ripple + per-row boundary carries): the carry
# kernel's full HBM round trip and the XLA injection copy both vanish.
# Carry state between iterations: (R1, R2, 128) u32 pairs with the value
# in lane 0 of each row (the 128-lane pad satisfies the Pallas block
# rule for the small outputs).
# ---------------------------------------------------------------------------

def _inject_rows_math(x0, x1, c0, c1, wt, cum, k: int, v):
    """Spread each row's incoming boundary carry (value in lane 0 of
    c0/c1, already rolled) base-2^width into the row's first k lanes and
    add to x0 (parts < 2^(w+1): cannot wrap the low word).

    The spread block is assembled on ONE 128-lane tile (k < 128 always:
    k lanes cover >= 64 bits) and spliced into x0 with a single
    lane-aligned concat — the k full-(v)-sized where/broadcast rounds of
    the round-2 form were ~8 VPU ops/el of pure masking."""
    kv = (v[0], v[1], min(128, v[2]))
    # the spread block must cover all k carry parts: widths >= 1 bit make
    # k <= 64 < 128 today, but a violation would silently drop carries
    assert k <= kv[2], f"carry spread k={k} exceeds lane tile {kv[2]}"
    lane = lax.broadcasted_iota(jnp.int32, kv, 2)
    add = jnp.zeros(kv, jnp.uint32)
    for j in range(k):
        cm = cum[:, :, j:j + 1]
        w = wt[:, :, j:j + 1]
        lt32 = cm < jnp.uint32(32)
        cm_lo = jnp.where(lt32, cm, jnp.uint32(0))
        cm_hi = jnp.where(lt32 | (cm >= jnp.uint32(64)), jnp.uint32(0),
                          cm - jnp.uint32(32))
        lo_part = (c0 >> cm_lo) | ((c1 << jnp.uint32(1))
                                   << (jnp.uint32(31) - cm_lo))
        hi_part = c1 >> cm_hi
        part = jnp.where(lt32, lo_part, hi_part)
        if j < k - 1:
            part = part & ((jnp.uint32(1) << w) - jnp.uint32(1))
        else:
            part = jnp.where(cm >= jnp.uint32(64), jnp.uint32(0), part)
        add = jnp.where(lane == j, jnp.broadcast_to(part, kv), add)
    if kv[2] == v[2]:
        return x0 + add, x1
    x0 = jnp.concatenate([x0[:, :, :kv[2]] + add, x0[:, :, kv[2]:]],
                         axis=2)
    return x0, x1


def _p1c_kernel(L: int, k: int, wcorr_n, *refs):
    """P1 with vectorized carry injection: every row (r1, r2) receives
    the previous row's boundary carry (pre-rolled outside), spread
    base-2^width into its first k lanes, then the weight-fold wrap halve
    and the per-r2-variant MXU dot."""
    (cin0_ref, cin1_ref, wt_ref, cum_ref, x0_ref, x1_ref,
     er_ref, ec_ref, w8_ref, corr_ref, o0_ref, o1_ref) = refs
    sh = x0_ref.shape                   # (L, S, C)
    v = (L, sh[1], sh[2])
    x0 = x0_ref[:].reshape(v)
    x1 = x1_ref[:].reshape(v)

    c0 = cin0_ref[:, :, 0:1]            # (L, S, 1)
    c1 = cin1_ref[:, :, 0:1]
    x0, x1 = _inject_rows_math(x0, x1, c0, c1, wt_ref[:], cum_ref[:],
                               k, v)

    er = er_ref[:].reshape(L, sh[1], 1)
    ec = ec_ref[:].reshape(1, 1, sh[2])
    mask = jnp.broadcast_to((er + ec) >= jnp.uint32(wcorr_n), v)
    x0, x1 = g.halve_where(x0, x1, mask)

    x0, x1 = _sdots_multi(x0, x1, L, sh[1], sh[2], w8_ref, corr_ref)
    o0_ref[:] = x0.reshape(sh)
    o1_ref[:] = x1.reshape(sh)


def _sdots_multi(x0, x1, L, S, C, w8_ref, corr_ref):
    """Per-r2-variant axis-0 dots over the S sub-columns, batch-emitted
    (all packs, all dots, all combines) so the MXU dots overlap the
    VPU-heavy combines. The batch is throttled so the live int32 dot
    outputs stay within ~24 MB of kernel stack: each D is (8L, C) i32,
    and emitting all 8 at C = 4096 blew Mosaic's scoped VMEM at
    n = 2^24."""
    d_bytes = 8 * L * C * 4
    bs = max(1, min(S, (24 << 20) // max(d_bytes, 1)))
    outs = []
    for lo in range(0, S, bs):
        hi = min(lo + bs, S)
        pairs = [(x0[:, s, :], x1[:, s, :]) for s in range(lo, hi)]
        outs += mxm.mxu_dft_apply_multi(
            g, pairs, L, [w8_ref[s] for s in range(lo, hi)],
            [corr_ref[s] for s in range(lo, hi)])
    if S == 1:
        return (outs[0][0].reshape(L, 1, C), outs[0][1].reshape(L, 1, C))
    x0 = jnp.concatenate([r0.reshape(L, 1, C) for (r0, _) in outs], axis=1)
    x1 = jnp.concatenate([r1.reshape(L, 1, C) for (_, r1) in outs], axis=1)
    return x0, x1


def _carry_phase_math(x0, x1, wd, rounds: int, v):
    """Digit/carry split + fixed lane-ripple rounds + residual tail; the
    per-row boundary carry accumulates into (.., .., 1) acc pairs (the
    flat digit order within a row IS the lane order).

    Digit masks are computed from the widths in-kernel: gl64 widths are
    always < 32 (asserted at table build), so mask_lo = 2^w - 1 and the
    high-word mask is zero — streaming two extra n-sized mask tables
    through the kernel OOMed VMEM at n = 2^24 ((64, 8, 4096) double-
    buffered windows)."""
    L, S = v[0], v[1]
    rem = jnp.uint32(31) - wd
    mk0 = (jnp.uint32(1) << wd) - jnp.uint32(1)

    def split(y0, y1):
        d0 = y0 & mk0
        d1 = y1 * jnp.uint32(0)          # width < 32: high digit word = 0
        c0 = (y0 >> wd) | ((y1 << jnp.uint32(1)) << rem)
        c1 = y1 >> wd
        return d0, d1, c0, c1

    d0, d1, c0, c1 = split(x0, x1)
    lane = lax.broadcasted_iota(jnp.int32, v, 2)

    def shift_lane(c0, c1):
        out0 = c0[:, :, -1:]            # (L, S, 1): leaves the row
        out1 = c1[:, :, -1:]
        A0 = pltpu.roll(c0, jnp.int32(1), axis=2)
        A1 = pltpu.roll(c1, jnp.int32(1), axis=2)
        z = jnp.uint32(0)
        return (jnp.where(lane > 0, A0, z), jnp.where(lane > 0, A1, z),
                out0, out1)

    acc0 = jnp.zeros((L, S, 1), jnp.uint32)
    acc1 = jnp.zeros((L, S, 1), jnp.uint32)
    for _ in range(rounds):
        c0, c1, o0c, o1c = shift_lane(c0, c1)
        s0, cc = g.addc(acc0, o0c)
        acc0, acc1 = s0, acc1 + o1c + cc
        y0, yc = g.addc(d0, c0)
        y1 = d1 + c1 + yc
        d0, d1, c0, c1 = split(y0, y1)
    # residual <= 2^(wmin-1): add unsplit (digit slack covers it)
    c0, c1, o0c, o1c = shift_lane(c0, c1)
    s0, cc = g.addc(acc0, o0c)
    acc0, acc1 = s0, acc1 + o1c + cc
    d0 = d0 + c0
    return d0, d1, acc0, acc1


def _p7c_kernel(L: int, rounds: int, with_a: bool, wcorr_n,
                sub2: bool, *refs):
    """P7 (r1-inverse dot + wrap double + canon) with the carry fused in:
    optional small-operand multiply, digit/carry split, a fixed number of
    lane-ripple rounds (the flat digit order within a row IS the lane
    order), the 0/residual tail added unsplit, and each row's boundary
    carry written to lane 0 of the (L, S, 128) carry-out block.

    sub2 folds the LL step's -2 into the carry phase as +(M_p - 2):
    its digits are all-ones (mask - 2 at global digit 0), computed
    in-kernel from the widths — no table, ~3 VPU ops/el — and the
    usual ripple normalizes (reference analog: the -2 variant of the
    carry-weight kernels, kernels/marin.cl:1696-2414). Without this,
    every LL iteration paid op_settle + op_linear (two full HBM digit
    passes) for the subtraction."""
    i = 0
    if with_a:
        a0_ref, a1_ref = refs[i], refs[i + 1]
        i += 2
    if sub2:
        s2_ref = refs[i]
        i += 1
    (x0_ref, x1_ref, er_ref, ec_ref, w8_ref, corr_ref,
     wd_ref, o0_ref, o1_ref, co0_ref, co1_ref) = refs[i:i + 11]
    sh = x0_ref.shape                   # (L, S, C)
    v = (L, sh[1], sh[2])
    x0 = x0_ref[:].reshape(v)
    x1 = x1_ref[:].reshape(v)

    x0, x1 = _sdots_multi(x0, x1, L, sh[1], sh[2], w8_ref, corr_ref)

    er = er_ref[:].reshape(L, sh[1], 1)
    ec = ec_ref[:].reshape(1, 1, sh[2])
    mask = jnp.broadcast_to((er + ec) >= jnp.uint32(wcorr_n), v)
    x0, x1 = g.double_where(x0, x1, mask)
    x0, x1 = g.canon(x0, x1)

    if with_a:
        a = a0_ref[0, 0]
        x0, x1 = g.mul_small(x0, x1, a)
        x0, x1 = g.canon(x0, x1)

    wdv = wd_ref[:].reshape(v)
    if sub2:
        mk = (jnp.uint32(1) << wdv) - jnp.uint32(1)
        first = pl.program_id(0) == 0
        if sub2 == 2:               # 2D grid (lane-tiled carry)
            first = first & (pl.program_id(1) == 0)
        z = (lax.broadcasted_iota(jnp.int32, v, 0) == 0)
        z = z & (lax.broadcasted_iota(jnp.int32, v, 1) == 0)
        z = z & (lax.broadcasted_iota(jnp.int32, v, 2) == 0)
        # the amount is an SMEM scalar: 2 on the (single-chip or
        # shard-0) caller, 0 on mesh shards that do not own digit 0
        add = jnp.where(z & first, mk - s2_ref[0, 0], mk)
        s0, cc = g.addc(x0, add)
        x0, x1 = s0, x1 + cc

    d0, d1, acc0, acc1 = _carry_phase_math(x0, x1, wdv, rounds, v)

    o0_ref[:] = d0.reshape(sh)
    o1_ref[:] = d1.reshape(sh)
    cv = (L, sh[1], 128)
    cl = lax.broadcasted_iota(jnp.int32, cv, 2)
    co0_ref[:] = jnp.where(cl == 0, jnp.broadcast_to(acc0, cv),
                           jnp.uint32(0))
    co1_ref[:] = jnp.where(cl == 0, jnp.broadcast_to(acc1, cv),
                           jnp.uint32(0))


def _carry_rounds(fp: FourStepPlan) -> int:
    wmin = int(fp.widths.min())
    rounds = 1
    bound = fp.max_word * 4
    while bound >> (rounds * wmin) > (1 << max(wmin - 1, 1)):
        rounds += 1
    return max(rounds, 2)


def cin_row_k(fp: FourStepPlan) -> int:
    """Spread parts per carry unit: smallest k whose leading-k digit
    widths cover >= 64 bits in EVERY unit (a unit is carry_ct(fp)
    consecutive digits)."""
    ct = carry_ct(fp)
    wmat = fp.widths.reshape(fp.n // ct, ct).astype(np.int64)
    k = 1
    while int(wmat[:, :k].sum(axis=1).min()) < 64:
        k += 1
    return k


def _row_cin_plan(fp: FourStepPlan):
    """Per-carry-unit spread tables: (k, wt, cum) u32. A carry unit is
    CT consecutive digits (T = carry_tiles(fp) units per row; T == 1 =
    the classic per-row form, tables (R1, R2, k)). For T > 1 each unit's
    k columns are PADDED to a full 128-lane tile ((R1, R2, T*128), unit
    t at lane offset t*128): Mosaic's block rule requires the kernels'
    last block dim to be 128-divisible or the whole axis, so a
    (L1, S, k) block over a T*k axis cannot lower on device."""
    C = fp.C
    ct = carry_ct(fp)
    T = C // ct
    k = cin_row_k(fp)
    wmat = fp.widths.reshape(fp.R * T, ct).astype(np.int64)
    wt = wmat[:, :k].astype(np.uint32)
    cum = np.zeros((fp.R * T, k), dtype=np.uint32)
    cum[:, 1:] = np.cumsum(wt[:, :-1], axis=1)
    R1, R2 = fp.rs.L1, fp.rs.L2
    if T == 1:
        return (k, wt.reshape(R1, R2, k), cum.reshape(R1, R2, k))
    wt_p = np.zeros((fp.R * T, 128), dtype=np.uint32)
    cum_p = np.zeros((fp.R * T, 128), dtype=np.uint32)
    wt_p[:, :k] = wt
    cum_p[:, :k] = cum
    return (k, wt_p.reshape(R1, R2, T * 128),
            cum_p.reshape(R1, R2, T * 128))


def p1_carry_pass(fp, t, x0, x1, cin0, cin1, tabs=None):
    """P1 with in-kernel injection of the pre-rolled row carries.

    tabs: optional explicit table operands {"wt", "cum", "w8", "corr",
    "er", "ec"} (shard-local slices in the mesh pipeline; the variant/row
    axes may be narrower than the plan's full extent)."""
    sh = x0.shape
    S = _r2_tile(sh[1])
    ct = carry_ct(fp)
    T = sh[2] // ct
    wt, cum = (tabs["wt"], tabs["cum"]) if tabs else t.cinrow
    # T > 1 tables are 128-lane padded per unit; k never comes from
    # their shape (cin_row_k is a pure function of the plan)
    k = int(wt.shape[-1]) if T == 1 else cin_row_k(fp)
    if tabs:
        w8, corr = tabs["w8"], tabs["corr"]
        er_t, ec_t = tabs["er"], tabs["ec"]
    else:
        w8, corr = _mx(t, "tr_fwd_w")
        er_t, ec_t = t.wcorr
    if T == 1:
        # 1D grid exactly as before carry lane tiling existed
        # (identical Mosaic codegen for the flagship family)
        grid = (sh[1] // S,)

        def im(i):
            return (i * 0, i, i * 0)

        def im_var(i):
            return (i, i * 0, i * 0)
        ecspec = _full(ec_t.shape)
    else:
        grid = (sh[1] // S, T)

        def im(i, j):
            return (i * 0, i, j)

        def im_var(i, j):
            return (i, i * 0, i * 0)
        ecspec = pl.BlockSpec((1, ct), lambda i, j: (i * 0, j),
                              memory_space=pltpu.VMEM)

    blk = (fp.rs.L1, S, ct)
    xspec = pl.BlockSpec(blk, im, memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((fp.rs.L1, S, 128), im, memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((fp.rs.L1, S, k if T == 1 else 128), im,
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((fp.rs.L1, S, 1),
                         (lambda i: (i * 0, i, i * 0)) if T == 1
                         else (lambda i, j: (i * 0, i, j * 0)),
                         memory_space=pltpu.VMEM)
    tabspec = pl.BlockSpec((S,) + tuple(w8.shape[1:]), im_var,
                           memory_space=pltpu.VMEM)
    tabspec_c = pl.BlockSpec((S,) + tuple(corr.shape[1:]), im_var,
                             memory_space=pltpu.VMEM)
    kern = functools.partial(_p1c_kernel, fp.rs.L1, k, fp.n)
    r0, r1 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[cspec, cspec, kspec, kspec, xspec, xspec,
                  vspec, ecspec, tabspec, tabspec_c],
        out_specs=(xspec, xspec),
        out_shape=(jax.ShapeDtypeStruct(sh, jnp.uint32),
                   jax.ShapeDtypeStruct(sh, jnp.uint32)),
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(cin0, cin1, wt, cum, x0, x1, er_t, ec_t, w8, corr)
    return r0, r1


def p7_carry_pass(fp, t, z0, z1, a, a_is_one: bool, tabs=None,
                  sub2=None):
    """P7 with the carry fused in; returns (d0, d1, co0, co1) where the
    carry pair is (R1, R2, 128) with values in lane 0 (R2 = the operand's
    local r2 extent).

    tabs: optional explicit table operands {"w8", "corr", "er", "ec",
    "widths"} (shard-local slices in the mesh pipeline)."""
    sh = z0.shape
    S = _r2_tile(sh[1])
    ct = carry_ct(fp)
    T = sh[2] // ct
    L = fp.rs.L1
    if T == 1:
        grid = (sh[1] // S,)

        def im(i):
            return (i * 0, i, i * 0)

        def im_var(i):
            return (i, i * 0, i * 0)

        def im_er(i):
            return (i * 0, i, i * 0)

        def im_s(i):
            return (i * 0, i * 0)
    else:
        grid = (sh[1] // S, T)

        def im(i, j):
            return (i * 0, i, j)

        def im_var(i, j):
            return (i, i * 0, i * 0)

        def im_er(i, j):
            return (i * 0, i, j * 0)

        def im_s(i, j):
            return (i * 0, i * 0)
    if tabs:
        w8, corr = tabs["w8"], tabs["corr"]
        er_t, ec_t = tabs["er"], tabs["ec"]
    else:
        w8, corr = _mx(t, "iw_inv")
        er_t, ec_t = t.wcorr
    ecspec = (_full(ec_t.shape) if T == 1 else
              pl.BlockSpec((1, ct), lambda i, j: (i * 0, j),
                           memory_space=pltpu.VMEM))
    blk = (L, S, ct)
    xspec = pl.BlockSpec(blk, im, memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, S, 128), im, memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((L, S, 1), im_er, memory_space=pltpu.VMEM)
    tabspec = pl.BlockSpec((S,) + tuple(w8.shape[1:]), im_var,
                           memory_space=pltpu.VMEM)
    tabspec_c = pl.BlockSpec((S,) + tuple(corr.shape[1:]), im_var,
                             memory_space=pltpu.VMEM)
    smem11 = pl.BlockSpec((1, 1), im_s, memory_space=pltpu.SMEM)
    with_a = not a_is_one
    use_sub2 = sub2 is not None and sub2 is not False
    assert not (use_sub2 and with_a), "LL sub2 never rides the x*a path"
    kern = functools.partial(_p7c_kernel, L, _carry_rounds(fp), with_a,
                             fp.n, (2 if T > 1 else 1) if use_sub2 else 0)
    wd = tabs["widths"] if tabs else t.widths32
    if use_sub2:
        s2 = (jnp.full((1, 1), 2, jnp.uint32) if sub2 is True else sub2)
    ins = ([a[0], a[1]] if with_a else []) + \
        ([s2] if use_sub2 else []) + \
        [z0, z1, er_t, ec_t, w8, corr, wd]
    in_specs = ([smem11, smem11] if with_a else []) + \
        ([smem11] if use_sub2 else []) + \
        [xspec, xspec, vspec, ecspec, tabspec, tabspec_c,
         xspec]
    R1, R2 = fp.rs.L1, sh[1]
    d0, d1, co0, co1 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=(xspec, xspec, cspec, cspec),
        out_shape=(jax.ShapeDtypeStruct(sh, jnp.uint32),
                   jax.ShapeDtypeStruct(sh, jnp.uint32),
                   jax.ShapeDtypeStruct((R1, R2, T * 128), jnp.uint32),
                   jax.ShapeDtypeStruct((R1, R2, T * 128), jnp.uint32)),
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(*ins)
    return d0, d1, co0, co1


def roll_row_carries(fp: FourStepPlan, co0, co1):
    """Pre-roll the (R1, R2, T*128) carry-unit block by one flat unit
    (digit order; the last unit wraps to unit 0 — the mod-M_p fold); a
    tiny XLA op. T == 1 is the classic per-row roll."""
    sh = co0.shape
    units = sh[0] * sh[1] * (sh[2] // 128)
    c0 = jnp.roll(co0.reshape(units, 128), 1, axis=0).reshape(sh)
    c1 = jnp.roll(co1.reshape(units, 128), 1, axis=0).reshape(sh)
    return c0, c1


def attach_cinrow(t: FourStepTables, device_put=None):
    """Build and attach the per-row carry-spread tables (row-carry
    pipeline)."""
    put = device_put if device_put is not None else (lambda a: a)
    _k, wt, cum = _row_cin_plan(t.fp)
    t.cinrow = (put(np.ascontiguousarray(wt)),
                put(np.ascontiguousarray(cum)))
    return t


def use_rowcarry(fp: FourStepPlan, t: FourStepTables) -> bool:
    """The row-carry pipeline needs the weight-folded MXU tables, the
    fused-C tables, and the cinrow spread tables. C = 8192 shapes ride
    it too since r5 (lane-tiled carry, carry_ct); use_xla_carry is the
    env-forced canonical-digit fallback."""
    return (t.cinrow is not None and _fused_ok(fp, t)
            and not use_xla_carry(fp)
            and not os.environ.get("PRMERS_NO_ROWCARRY"))


# ---------------------------------------------------------------------------
# Fused C-transform kernel (lane-tile DFT + per-slot lane-axis dots)
# ---------------------------------------------------------------------------

# Element budget for one fused-kernel tile (B x C): the kernel's live
# (B, C) u32-pair copies set the VMEM stack peak (measured ~105 MiB at
# B*C = 512K, n = 2^23). Shapes whose full-R2 tile would exceed it run
# P2/P6 as separate passes and tile r2 in the C kernel instead.
# Env-overridable so tests can exercise the split path at small shapes
# (read at trace time, not import time).


def _r2fold_budget() -> int:
    return int(os.environ.get("PRMERS_R2FOLD_BUDGET", 1 << 19))


def use_r2fold(fp: FourStepPlan) -> bool:
    """In-kernel P2/P6 (r2fold) needs the whole R2 extent in one tile;
    beyond the budget the pipeline drops to separate axis-1 passes."""
    return fp.rs.L2 * fp.C <= _r2fold_budget()


def _fc_split(fp: FourStepPlan) -> bool:
    """Forward/inverse C-transform as SEPARATE kernels when the combined
    wf8+wi8 variant tables exceed VMEM: at ca_count = 64 (C = 8192) the
    two table sets are 2 x 67 MB and the one-kernel form compiles to
    ~205 MB of VMEM (measured: the MM31 n = 5*2^25 stage-1 chain).
    Env-forceable so tests exercise the split at small shapes."""
    return fp.C // 128 > 32 or bool(os.environ.get("PRMERS_FC_SPLIT"))


def _carry_budget() -> int:
    return int(os.environ.get("PRMERS_CARRY_BUDGET", 1 << 21))


def carry_ct(fp: FourStepPlan) -> int:
    """Lane-tile extent of the carry-fused P1/P7 kernels. The flagship
    family (C <= 4096) keeps CT == C — one tile per (r1-block, r2-tile),
    identical Mosaic codegen to before lane tiling existed. C = 8192
    shapes (p ~ 500M-1G, MM31) halve CT until the (L1, S, CT) block is
    back at the flagship working set: the within-row carry ripple then
    stops at each lane-tile boundary and the boundary carry is DEFERRED
    to the next iteration exactly like the row boundary always was —
    carry units become 'CT consecutive digits' instead of 'a whole row'
    (same two-phase trick as the reference one level down,
    kernels/marin.cl:1696-2414; reference runs these shapes natively,
    engine_gpu.h:1623)."""
    S = _r2_tile(fp.rs.L2)
    ct = fp.C
    budget = _carry_budget()
    while fp.rs.L1 * S * ct > budget and ct % 256 == 0 and ct > 256:
        ct //= 2
    return ct


def carry_tiles(fp: FourStepPlan) -> int:
    """Carry lane tiles per row (1 = the classic whole-row ripple)."""
    return fp.C // carry_ct(fp)


def use_xla_carry(fp: FourStepPlan) -> bool:
    """Canonical-digit fallback (Pallas transforms + XLA carry_full,
    ~2 extra HBM sweeps/iter): env-forced, or shapes whose carry tile
    cannot be lane-tiled under the hard VMEM cap (no power-of-two C
    hits this; the guard covers degenerate plans only). C = 8192 ran
    through here before the lane-tiled carry existed (VERDICT r4
    missing #1)."""
    if os.environ.get("PRMERS_XLA_CARRY"):
        return True
    return fp.rs.L1 * _r2_tile(fp.rs.L2) * carry_ct(fp) > (1 << 22)

def _fused_c_kernel(ca_count: int, mode: str, r2cfg,
                    *refs):
    """r2cfg: None, or (L2, has_mx2, has_mx6) — then the r2 forward
    dot (P2, with the folded mid table) and the r2 inverse dot (P6, with
    mid_inv) run INSIDE this kernel: the tile already holds all of R2,
    so the two passes' HBM round trips fold away."""
    i = 0
    x0_ref, x1_ref = refs[i], refs[i + 1]
    i += 2
    if mode == "mul":
        u0_ref, u1_ref = refs[i], refs[i + 1]
        i += 2
    if r2cfg is not None:
        L2, has_mx2, has_mx6 = r2cfg
        if has_mx2:
            w2_ref, c2_ref = refs[i], refs[i + 1]
            i += 2
        mf0_ref, mf1_ref = refs[i], refs[i + 1]
        i += 2
        if mode != "fwd":
            if has_mx6:
                w6_ref, c6_ref = refs[i], refs[i + 1]
                i += 2
            else:
                tri0_ref, tri1_ref = refs[i], refs[i + 1]
                i += 2
            mi0_ref, mi1_ref = refs[i], refs[i + 1]
            i += 2
    wf8_ref, corrf_ref = refs[i], refs[i + 1]
    i += 2
    if mode != "fwd":
        wi8_ref, corri_ref = refs[i], refs[i + 1]
        i += 2
    wrapc_ref = refs[i]
    i += 1
    o0_ref, o1_ref = refs[i], refs[i + 1]

    sh = x0_ref.shape                   # (RC, R2, C)
    RC = sh[0]
    B = sh[0] * sh[1]
    C = sh[2]
    v = (B, C)
    x0 = x0_ref[:].reshape(v)
    x1 = x1_ref[:].reshape(v)

    if r2cfg is not None:
        # ---- P2 in-tile: r2-DFT per r1 row, then the mid*wca table ----
        v3 = (RC, sh[1], C)
        x0 = x0.reshape(v3)
        x1 = x1.reshape(v3)
        if has_mx2:
            # same generic table for every r1 row; batch-emitted dots
            outs = mxm.mxu_dft_apply_multi(
                g, [(x0[rc], x1[rc]) for rc in range(RC)], L2,
                [w2_ref[:]] * RC, [c2_ref[:]] * RC)
        else:
            outs = [fsm.dft_axis0(g, x0[rc], x1[rc], L2, False)
                    for rc in range(RC)]
        outs0 = [a0.reshape((1,) + a0.shape) for (a0, _) in outs]
        outs1 = [a1.reshape((1,) + a1.shape) for (_, a1) in outs]
        x0 = jnp.concatenate(outs0, axis=0) if RC > 1 else outs0[0]
        x1 = jnp.concatenate(outs1, axis=0) if RC > 1 else outs1[0]
        x0, x1 = g.mul(x0, x1, mf0_ref[:], mf1_ref[:])
        x0 = x0.reshape(v)
        x1 = x1.reshape(v)

    del wrapc_ref  # the 2^{-+1} wrap lives in the folded mid tables now
    x0, x1 = fsm.dft_lanes(g, x0, x1, ca_count, 128, False)

    pack = (mxm._pack_planes_rhs_bytes if mxm.use_bytecast()
            else mxm._pack_planes_rhs)

    def dots(y0, y1, w8_ref, corr_ref):
        # packs first, then dots, then combines: the independent dots are
        # visible to the scheduler at once, so MXU work overlaps the
        # VPU-heavy combines
        X8s = [pack(g, y0[:, j * 128:(j + 1) * 128],
                    y1[:, j * 128:(j + 1) * 128])
               for j in range(ca_count)]
        Ds = [lax.dot_general(X8s[j], w8_ref[j], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
              for j in range(ca_count)]
        outs0, outs1 = [], []
        for j in range(ca_count):
            r0, r1 = mxm._combine_rhs(g, 128, Ds[j] + corr_ref[j])
            outs0.append(r0)
            outs1.append(r1)
        return (jnp.concatenate(outs0, axis=1),
                jnp.concatenate(outs1, axis=1))

    x0, x1 = dots(x0, x1, wf8_ref, corrf_ref)
    if mode == "sqr":
        x0, x1 = g.sqr(x0, x1)
    elif mode == "mul":
        u0 = u0_ref[:].reshape(v)
        u1 = u1_ref[:].reshape(v)
        x0, x1 = g.mul(x0, x1, u0, u1)
    if mode != "fwd":
        x0, x1 = dots(x0, x1, wi8_ref, corri_ref)
        x0, x1 = fsm.dft_lanes(g, x0, x1, ca_count, 128, True)
        if r2cfg is not None:
            # ---- P6 in-tile: mid_inv*iwca, then the r2-inverse DFT ----
            v3 = (RC, sh[1], C)
            x0 = x0.reshape(v3)
            x1 = x1.reshape(v3)
            x0, x1 = g.mul(x0, x1, mi0_ref[:], mi1_ref[:])
            if has_mx6:
                # per-r1 variant tables (t_r_inv folded as row scales),
                # batch-emitted dots
                outs = mxm.mxu_dft_apply_multi(
                    g, [(x0[rc], x1[rc]) for rc in range(RC)], L2,
                    [w6_ref[rc] for rc in range(RC)],
                    [c6_ref[rc] for rc in range(RC)])
            else:
                outs = [fsm.dft_axis0(g, x0[rc], x1[rc], L2, True)
                        for rc in range(RC)]
            outs0 = [a0.reshape((1,) + a0.shape) for (a0, _) in outs]
            outs1 = [a1.reshape((1,) + a1.shape) for (_, a1) in outs]
            x0 = jnp.concatenate(outs0, axis=0) if RC > 1 else outs0[0]
            x1 = jnp.concatenate(outs1, axis=0) if RC > 1 else outs1[0]
            if not has_mx6:
                x0, x1 = g.mul(x0, x1, tri0_ref[:], tri1_ref[:])
    o0_ref[:] = x0.reshape(sh)
    o1_ref[:] = x1.reshape(sh)


def _fused_c_invh_kernel(ca_count: int, op: str, *refs):
    """Inverse half of the split C-transform: optional head op (the
    dyadic square / spectral multiply), the wi8 variant dots, and the
    inverse lane-tile DFT. Holds ONLY the inverse tables (ca_count = 64
    cannot fit both directions' 67 MB sets in one kernel)."""
    i = 0
    x0_ref, x1_ref = refs[i], refs[i + 1]
    i += 2
    if op == "mul":
        u0_ref, u1_ref = refs[i], refs[i + 1]
        i += 2
    wi8_ref, corri_ref = refs[i], refs[i + 1]
    i += 2
    o0_ref, o1_ref = refs[i], refs[i + 1]

    sh = x0_ref.shape
    B = sh[0] * sh[1]
    C = sh[2]
    v = (B, C)
    x0 = x0_ref[:].reshape(v)
    x1 = x1_ref[:].reshape(v)
    if op == "sqr":
        x0, x1 = g.sqr(x0, x1)
    elif op == "mul":
        x0, x1 = g.mul(x0, x1, u0_ref[:].reshape(v),
                       u1_ref[:].reshape(v))

    pack = (mxm._pack_planes_rhs_bytes if mxm.use_bytecast()
            else mxm._pack_planes_rhs)
    X8s = [pack(g, x0[:, j * 128:(j + 1) * 128],
                x1[:, j * 128:(j + 1) * 128])
           for j in range(ca_count)]
    Ds = [lax.dot_general(X8s[j], wi8_ref[j], (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
          for j in range(ca_count)]
    outs0, outs1 = [], []
    for j in range(ca_count):
        r0, r1 = mxm._combine_rhs(g, 128, Ds[j] + corri_ref[j])
        outs0.append(r0)
        outs1.append(r1)
    x0 = jnp.concatenate(outs0, axis=1)
    x1 = jnp.concatenate(outs1, axis=1)
    x0, x1 = fsm.dft_lanes(g, x0, x1, ca_count, 128, True)
    o0_ref[:] = x0.reshape(sh)
    o1_ref[:] = x1.reshape(sh)


def fused_c_pass(fp: FourStepPlan, t: FourStepTables, x0, x1, mode: str,
                 u=None, r2fold: bool = False):
    """Run the fused C kernel over the (R1, R2, C) array; grid tiles r1
    so each invocation transforms RC*R2 batch rows against the
    VMEM-resident variant tables. With r2fold the r2-DFT passes (P2 with
    the folded mid table, P6 with mid_inv) run inside the same kernel —
    the tile already holds all of R2, so their HBM round trips vanish."""
    (wf8, corrf, wi8, corri, wrapc, *_mids) = t.fused
    ca_count = wf8.shape[0]
    sh = x0.shape
    R2 = sh[1]
    C = sh[2]
    if mode.startswith("invh"):
        # inverse half of the split C-transform (see _fused_c_invh_kernel)
        assert not r2fold
        op = mode.split("_", 1)[1] if "_" in mode else ""
        budget = _r2fold_budget()
        if R2 * C > budget:
            S = R2
            for cand in range(R2, 0, -1):
                if R2 % cand == 0 and (cand % 8 == 0 or cand == R2) \
                        and cand * C <= budget:
                    S = cand
                    break
            grid = (sh[0], R2 // S)
            blk = (1, S, C)
            xspec = pl.BlockSpec(blk, lambda i, j: (i, j, i * 0),
                                 memory_space=pltpu.VMEM)
        else:
            RCh = max(1, min(sh[0], 128 // max(R2, 1),
                             budget // max(R2 * C, 1)))
            while sh[0] % RCh:
                RCh -= 1
            grid = (sh[0] // RCh,)
            blk = (RCh,) + tuple(sh[1:])
            xspec = pl.BlockSpec(blk, lambda i: (i, i * 0, i * 0),
                                 memory_space=pltpu.VMEM)
        ins = [x0, x1]
        in_specs = [xspec, xspec]
        if op == "mul":
            ins += [u[0], u[1]]
            in_specs += [xspec, xspec]
        ins += [wi8, corri]
        in_specs += [_full(wi8.shape), _full(corri.shape)]
        kern = functools.partial(_fused_c_invh_kernel, ca_count, op)
        r0, r1 = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=(xspec, xspec),
            out_shape=(jax.ShapeDtypeStruct(sh, jnp.uint32),
                       jax.ShapeDtypeStruct(sh, jnp.uint32)),
            compiler_params=_cparams(),
            interpret=_interpret(),
        )(*ins)
        return r0, r1
    # tile budget: the kernel's live (B, C) u32-pair copies dominate the
    # VMEM stack (measured ~105 MiB at B*C = 512K on the flagship), so
    # the batch extent is capped by element count, not just sublanes
    budget = _r2fold_budget()
    RC = max(1, min(sh[0], 128 // max(R2, 1),
                    budget // max(R2 * C, 1)))
    while sh[0] % RC:
        RC -= 1
    if not r2fold and R2 * C > budget:
        # r2 rows are independent batch rows for the C-transform: tile
        # them (the in-kernel P2/P6 variant instead needs all of R2 and
        # is not selected at these shapes — see use_r2fold)
        S = None
        for cand in range(R2, 0, -1):
            if R2 % cand == 0 and (cand % 8 == 0 or cand == R2) \
                    and cand * C <= budget:
                S = cand
                break
        if S is None:
            S = R2
        grid = (sh[0], R2 // S)
        blk = (1, S, C)
        xspec = pl.BlockSpec(blk, lambda i, j: (i, j, i * 0),
                             memory_space=pltpu.VMEM)
    else:
        grid = (sh[0] // RC,)
        blk = (RC,) + tuple(sh[1:])
        xspec = pl.BlockSpec(blk, lambda i: (i, i * 0, i * 0),
                             memory_space=pltpu.VMEM)
    ins = [x0, x1]
    in_specs = [xspec, xspec]
    if mode == "mul":
        ins += [u[0], u[1]]
        in_specs += [xspec, xspec]
    r2cfg = None
    if r2fold:
        L2 = fp.rs.L2
        mf0, mf1, mi0, mi1 = _mids
        g2 = _mx(t, (L2, False))
        mx6 = _mx(t, "tr_inv")
        assert (g2 is not None or (L2 & (L2 - 1) == 0
                                   and L2 <= 64)), \
            "radix-5 and >64 r2 factors require their MXU matrix"
        has_mx6 = mx6 is not None
        r2cfg = (L2, g2 is not None, has_mx6)
        if g2 is not None:
            ins += [g2[0], g2[1]]
            in_specs += [_full(g2[0].shape), _full(g2[1].shape)]
        ins += [mf0, mf1]
        in_specs += [xspec, xspec]
        if mode != "fwd":
            if has_mx6:
                w6, c6 = mx6
                ins += [w6, c6]
                in_specs += [
                    pl.BlockSpec((RC,) + tuple(w6.shape[1:]),
                                 lambda i: (i, i * 0, i * 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((RC,) + tuple(c6.shape[1:]),
                                 lambda i: (i, i * 0, i * 0),
                                 memory_space=pltpu.VMEM)]
            else:
                tri = t.t_r_inv
                ins += [tri[0], tri[1]]
                tspec = pl.BlockSpec((RC, R2, 1),
                                     lambda i: (i, i * 0, i * 0),
                                     memory_space=pltpu.VMEM)
                in_specs += [tspec, tspec]
            ins += [mi0, mi1]
            in_specs += [xspec, xspec]
    ins += [wf8, corrf]
    in_specs += [_full(wf8.shape), _full(corrf.shape)]
    if mode != "fwd":
        ins += [wi8, corri]
        in_specs += [_full(wi8.shape), _full(corri.shape)]
    ins += [wrapc]
    in_specs += [_full(wrapc.shape)]
    kern = functools.partial(_fused_c_kernel, ca_count, mode, r2cfg)
    r0, r1 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=(xspec, xspec),
        out_shape=(jax.ShapeDtypeStruct(sh, jnp.uint32),
                   jax.ShapeDtypeStruct(sh, jnp.uint32)),
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(*ins)
    return r0, r1


# ---------------------------------------------------------------------------
# Carry pass (P8): parallel grid over r1 blocks
# ---------------------------------------------------------------------------

def _k4_kernel(fp: FourStepPlan, rounds: int, with_a: bool, *refs):
    """Tile = (1, R2, C) digits viewed 2D (R2, C) so the flat digit order
    is row-major. Optionally multiplies by the small carry operand a
    (PRP-style x3 — statically skipped for the pure-squaring hot chain),
    splits digit/carry by the variable widths, and propagates carries
    along the digit order: the flat shift by one is a lane roll plus a
    row roll selected into lane 0. The grid is PARALLEL over r1 blocks:
    each block emits its boundary carry to co[r1]; the next iteration's
    P1 injection (or op_settle) folds the rolled carry vector — the
    reference's two-phase carry with phase 2 riding the next forward
    kernel (kernels/marin.cl:2198), the wrap included."""
    i = 0
    if with_a:
        a0_ref, a1_ref = refs[i], refs[i + 1]
        i += 2
    (y0_ref, y1_ref, wd_ref,
     o0_ref, o1_ref, co0_ref, co1_ref) = refs[i:i + 7]
    sh = y0_ref.shape
    v2 = (sh[1], sh[2])
    y0 = y0_ref[:].reshape(v2)
    y1 = y1_ref[:].reshape(v2)
    wd = wd_ref[:].reshape(v2)
    # masks derived in-kernel (widths < 32; see _carry_phase_math)
    mk0 = (jnp.uint32(1) << wd) - jnp.uint32(1)

    if with_a:
        a = a0_ref[0, 0]
        y0, y1 = g.mul_small(y0, y1, a)
        y0, y1 = g.canon(y0, y1)

    rem = jnp.uint32(31) - wd

    def split(y0, y1):
        d0 = y0 & mk0
        d1 = y1 * jnp.uint32(0)
        c0 = (y0 >> wd) | ((y1 << jnp.uint32(1)) << rem)
        c1 = y1 >> wd
        return d0, d1, c0, c1

    d0, d1, c0, c1 = split(y0, y1)

    l_ = lax.broadcasted_iota(jnp.int32, v2, 1)
    r_ = lax.broadcasted_iota(jnp.int32, v2, 0)

    def shift_one(c0, c1):
        out0 = c0[-1:, -1:].reshape(())
        out1 = c1[-1:, -1:].reshape(())

        def sh_(c):
            A = pltpu.roll(c, jnp.int32(1), axis=1)
            B = pltpu.roll(A, jnp.int32(1), axis=0)
            r = jnp.where(l_ > 0, A, B)
            return jnp.where((l_ == 0) & (r_ == 0), jnp.uint32(0), r)

        return sh_(c0), sh_(c1), out0, out1

    c0, c1, o0c, o1c = shift_one(c0, c1)
    s0, cc = g.addc(jnp.uint32(0), o0c)
    acc0, acc1 = s0, o1c + cc
    y0, yc = g.addc(d0, c0)
    y1 = d1 + c1 + yc
    d0, d1, c0, c1 = split(y0, y1)

    def more(state):
        d0, d1, c0, c1, a0_, a1_ = state
        c0, c1, o0c, o1c = shift_one(c0, c1)
        s0, cc = g.addc(a0_, o0c)
        a1_ = a1_ + o1c + cc
        y0, yc = g.addc(d0, c0)
        y1 = d1 + c1 + yc
        d0, d1, c0, c1 = split(y0, y1)
        return d0, d1, c0, c1, s0, a1_

    state = (d0, d1, c0, c1, acc0, acc1)
    for _ in range(rounds - 1):
        state = more(state)
    d0, d1, c0, c1, acc0, acc1 = state
    # after `rounds` rounds the remaining carries are 0/1 (saturation
    # ripple only): add them UNSPLIT — digits may reach 2^w, which the
    # convolution bound and the next injection both tolerate (round 1
    # ran a data-dependent while_loop with a full-tile reduce per check)
    c0, c1, o0c, o1c = shift_one(c0, c1)
    s0f, ccf = g.addc(acc0, o0c)
    acc0, acc1 = s0f, acc1 + o1c + ccf
    d0 = d0 + c0

    o0_ref[:] = d0.reshape(sh)
    o1_ref[:] = d1.reshape(sh)
    co0_ref[0, 0, 0] = acc0
    co1_ref[0, 0, 0] = acc1


def k4(fp: FourStepPlan, t: FourStepTables, y0, y1, a,
       a_is_one: bool = False):
    """a_is_one=True statically drops the small-operand multiply + canon
    (the PRP hot chain is pure squarings)."""
    sh = y0.shape
    R1 = sh[0]
    wmin = int(fp.widths.min())
    rounds = 1
    bound = fp.max_word * 4
    # split until the residual fits HALF the minimum digit width: the
    # final unsplit add then keeps digits under 2^(wmin+1), within the
    # convolution bound's slack
    while bound >> (rounds * wmin) > (1 << max(wmin - 1, 1)):
        rounds += 1
    with_a = not a_is_one
    kern = functools.partial(_k4_kernel, fp, max(rounds, 2), with_a)
    bs = pl.BlockSpec((1,) + sh[1:], lambda i: (i, i * 0, i * 0),
                      memory_space=pltpu.VMEM)
    smem11 = pl.BlockSpec((1, 1), lambda i: (i * 0, i * 0),
                          memory_space=pltpu.SMEM)
    co_spec = pl.BlockSpec((1, 1, 1), lambda i: (i, i * 0, i * 0),
                           memory_space=pltpu.SMEM)
    ins = ([a[0], a[1]] if with_a else []) + [y0, y1, t.widths32]
    in_specs = ([smem11, smem11] if with_a else []) + [bs] * 3
    d0, d1, co0, co1 = pl.pallas_call(
        kern,
        grid=(R1,),
        in_specs=in_specs,
        out_specs=(bs, bs, co_spec, co_spec),
        out_shape=(jax.ShapeDtypeStruct(sh, jnp.uint32),
                   jax.ShapeDtypeStruct(sh, jnp.uint32),
                   jax.ShapeDtypeStruct((R1, 1, 1), jnp.uint32),
                   jax.ShapeDtypeStruct((R1, 1, 1), jnp.uint32)),
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(*ins)
    return d0, d1, co0.reshape(R1, 1), co1.reshape(R1, 1)


# ---------------------------------------------------------------------------
# Full steps (XLA glue: block-carry injection between iterations)
# ---------------------------------------------------------------------------

def _mx(t: FourStepTables, key, ln: int = 128):
    """(w8, corr) tables for a string key or (L, inverse) pair; None when
    the tables are absent or MXU is disabled."""
    if not t.mxu or os.environ.get("PRMERS_NO_MXU"):
        return None
    if not isinstance(key, str):
        key = fsm.mxu_key(*key)
    if key not in t.mxu:
        return None
    return t.mxu[key]


def _cin_widths(fp: FourStepPlan) -> tuple[int, ...]:
    k, acc = 0, 0
    while acc < 64:
        acc += int(fp.widths[k])
        k += 1
    return tuple(int(w) for w in fp.widths[:k])


def _wfold_ok(fp, t) -> bool:
    """Weight folding must engage for P1 and P7 together: the folded
    tables exist (rs.L1 >= 32) and MXU is enabled."""
    if t.wcorr is None or os.environ.get("PRMERS_NO_MXU") or \
            os.environ.get("PRMERS_NO_WFOLD"):
        return False
    needed = ("tr_fwd_w", "iw_inv")
    return bool(t.mxu) and all(k in t.mxu for k in needed)


def _fused_ok(fp, t) -> bool:
    return (t.fused is not None and _wfold_ok(fp, t)
            and not os.environ.get("PRMERS_NO_FUSE"))


def _fused_mid_tabs(t):
    (*_a, mf0, mf1, mi0, mi1) = t.fused
    return (mf0, mf1), (mi0, mi1)


def _cin_plan(fp: FourStepPlan):
    """Static per-row spread tables for the block-carry injection:
    (k, wtab (R1, k) u64 widths, cum (R1, k) u64 bit offsets)."""
    R1 = fp.rs.L1
    bs = fp.n // R1
    wmat = fp.widths.reshape(R1, bs).astype(np.int64)
    k = 1
    while int(wmat[:, :k].sum(axis=1).min()) < 64:
        k += 1
    wtab = wmat[:, :k].astype(np.uint64)
    cum = np.zeros((R1, k), dtype=np.uint64)
    cum[:, 1:] = np.cumsum(wtab[:, :-1], axis=1)
    return k, wtab, cum


def inject_block_carries(fp: FourStepPlan, x0, x1, co0, co1):
    """Fold the per-block boundary carries (R1, 1) into the first digits
    of each r1 block, rolled by one (block b's carry enters block b+1;
    the last block wraps to block 0 — the mod-M_p fold). Spread
    base-2^width so no digit exceeds ~2^(w+1) (the convolution bound has
    the slack). A tiny strip update XLA fuses into the next kernel."""
    k, wtab, cum = _cin_plan(fp)
    cin = (co0[:, 0].astype(jnp.uint64) |
           (co1[:, 0].astype(jnp.uint64) << jnp.uint64(32)))
    cin = jnp.roll(cin, 1)                       # (R1,)
    wt = jnp.asarray(wtab)
    cm = jnp.asarray(cum)
    parts = (cin[:, None] >> cm) & ((jnp.uint64(1) << wt) - jnp.uint64(1))
    # last column takes the unmasked remainder; rows whose first k-1
    # widths already cover 64 bits keep 0 (shift >= 64 is undefined)
    covered = cm[:, -1:] >= jnp.uint64(64)
    safe_sh = jnp.where(covered, jnp.uint64(0), cm[:, -1:])
    last = jnp.where(covered, jnp.uint64(0), cin[:, None] >> safe_sh)
    parts = jnp.concatenate([parts[:, :-1], last], axis=1)  # (R1, k)
    # parts < 2^(w+1) fit the low word; digits are canonical so no wrap
    add_lo = parts.astype(jnp.uint32)
    x0 = x0.at[:, 0, :k].add(add_lo)
    return x0, x1


def _forward_r(fp, t, x0, x1, cin=None, wfold=False, mid_tab=None):
    # P1: the t_r twiddle — and with wfold the weight r-part — folds into
    # per-grid MXU tables; only the wrap correction stays elementwise
    mx1 = _mx(t, "tr_fwd_w" if wfold else "tr_fwd")
    x0, x1 = _axis0_pass(x0, x1, fp.rs.L1, False,
                         pre=None if wfold else t.w,
                         post=None if mx1 else t.t_r, cin=cin,
                         cin_widths=_cin_widths(fp) if cin else None,
                         mxu=mx1,
                         wcorr=(t.wcorr[0], t.wcorr[1], fp.n)
                         if wfold else None)
    mx2 = _mx(t, (fp.rs.L2, False))
    assert mx2 is not None or (fp.rs.L2 & (fp.rs.L2 - 1) == 0
                               and fp.rs.L2 <= 64), \
        "radix-5 and >64 r2 factors require their MXU matrix"
    x0, x1 = _axis1_pass(x0, x1, fp.rs.L2, False,
                         post=mid_tab if mid_tab is not None else t.mid,
                         mxu=mx2)
    return x0, x1


def _inverse_r(fp, t, z0, z1, wfold=False, mid_inv_tab=None):
    # P6: t_r_inv folds
    mx6 = _mx(t, "tr_inv") or _mx(t, (fp.rs.L2, True))
    assert mx6 is not None or (fp.rs.L2 & (fp.rs.L2 - 1) == 0
                               and fp.rs.L2 <= 64), \
        "radix-5 and >64 r2 factors require their MXU matrix"
    use_fold = mx6 is not None and _mx(t, "tr_inv") is not None
    z0, z1 = _axis1_pass(z0, z1, fp.rs.L2, True,
                         pre=(mid_inv_tab if mid_inv_tab is not None
                              else t.mid_inv),
                         post=None if use_fold else t.t_r_inv,
                         mxu=mx6)
    # P7: r1 inverse DFT + inverse weights (folded or explicit) + canon
    mx7 = _mx(t, "iw_inv" if wfold else (fp.rs.L1, True))
    z0, z1 = _axis0_pass(z0, z1, fp.rs.L1, True,
                         post=None if wfold else t.iw,
                         mxu=mx7,
                         wcorr=(t.wcorr[0], t.wcorr[1], fp.n)
                         if wfold else None,
                         canon=True)
    return z0, z1


def _p2_pass(fp, t, x0, x1):
    """P2 alone (r2-DFT + folded mid), for shapes whose R2*C exceeds the
    fused kernel's tile budget (n >= 2^26, 5*2^24/5*2^25)."""
    L2 = fp.rs.L2
    mf, _ = _fused_mid_tabs(t)
    mx2 = _mx(t, (L2, False))
    assert mx2 is not None or (L2 & (L2 - 1) == 0 and L2 <= 64), \
        "r2 factors > 64 need their MXU matrix (no shift twiddles)"
    return _axis1_pass(x0, x1, L2, False, post=mf, mxu=mx2)


def _p6_pass(fp, t, z0, z1):
    """P6 alone (folded mid_inv + r2-inverse DFT)."""
    L2 = fp.rs.L2
    _, mi = _fused_mid_tabs(t)
    mx6 = _mx(t, "tr_inv") or _mx(t, (L2, True))
    assert mx6 is not None or (L2 & (L2 - 1) == 0 and L2 <= 64), \
        "r2 factors > 64 need their MXU matrix (no shift twiddles)"
    use_fold = mx6 is not None and _mx(t, "tr_inv") is not None
    return _axis1_pass(z0, z1, L2, True, pre=mi,
                       post=None if use_fold else t.t_r_inv, mxu=mx6)


def _fused_mid(fp, t, x0, x1, mode, u=None):
    """The C-transform span: in-kernel P2/P6 when the tile budget allows
    (r2fold), separate axis-1 passes otherwise; at ca_count > 32 the
    forward and inverse halves are separate kernels (_fc_split) so each
    holds only its own 67 MB variant table set."""
    split = _fc_split(fp)
    if use_r2fold(fp) and not split:
        return fused_c_pass(fp, t, x0, x1, mode, u=u, r2fold=True)
    s0, s1 = _p2_pass(fp, t, x0, x1)
    if not split:
        s0, s1 = fused_c_pass(fp, t, s0, s1, mode, u=u, r2fold=False)
        if mode == "fwd":
            return s0, s1
    else:
        s0, s1 = fused_c_pass(fp, t, s0, s1, "fwd", r2fold=False)
        if mode == "fwd":
            return s0, s1
        s0, s1 = fused_c_pass(fp, t, s0, s1, "invh_" + mode, u=u,
                              r2fold=False)
    return _p6_pass(fp, t, s0, s1)


def _p1_pass(fp, t, x0, x1, cin=None, wfold=False):
    """P1 alone (the r1-dot); P2 lives inside the fused kernel now."""
    mx1 = _mx(t, "tr_fwd_w" if wfold else "tr_fwd")
    return _axis0_pass(x0, x1, fp.rs.L1, False,
                       pre=None if wfold else t.w,
                       post=None if mx1 else t.t_r, cin=cin,
                       cin_widths=_cin_widths(fp) if cin else None,
                       mxu=mx1,
                       wcorr=(t.wcorr[0], t.wcorr[1], fp.n)
                       if wfold else None)


def _p7_pass(fp, t, z0, z1, wfold=False):
    """P7 alone (the r1-inverse dot + inverse weights + canon)."""
    mx7 = _mx(t, "iw_inv" if wfold else (fp.rs.L1, True))
    return _axis0_pass(z0, z1, fp.rs.L1, True,
                       post=None if wfold else t.iw,
                       mxu=mx7,
                       wcorr=(t.wcorr[0], t.wcorr[1], fp.n)
                       if wfold else None,
                       canon=True)


def _xla_carry(fp: FourStepPlan, t: FourStepTables, z0, z1, a,
               a_is_one: bool):
    """Canonical carry as an XLA pass (ops/carry.carry_full) for shapes
    whose in-kernel carry phase does not fit VMEM (use_xla_carry). z is
    the canonicalized P7 output; returns normalized digit pairs."""
    from ...core.field import FieldOps
    from ...ops import carry as carry_ops
    F = FieldOps(jnp)
    sh = z0.shape
    n = fp.n
    y = (z0.astype(jnp.uint64) |
         (z1.astype(jnp.uint64) << jnp.uint64(32))).reshape(n)
    widths = t.widths32.reshape(n).astype(jnp.uint64)
    if a_is_one:
        av = 1
    else:
        av = (a[0][0, 0].astype(jnp.uint64) |
              (a[1][0, 0].astype(jnp.uint64) << jnp.uint64(32)))
    d = carry_ops.carry_full(F, y, widths, None, av, lax=lax)
    return ((d & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32).reshape(sh),
            (d >> jnp.uint64(32)).astype(jnp.uint32).reshape(sh))


def square_step(fp: FourStepPlan, t: FourStepTables, x0, x1,
                cin0, cin1, a, a_is_one: bool = False,
                sub2: bool = False):
    """One full (x^2 * a) iteration. With row-carry state (cin ndim 3,
    (R1, R2, 128)) it is THREE kernels: P1-with-injection, the big fused
    kernel (r2-dot + mid + whole C-transform + square + mirrors), and
    P7-with-carry. With block-carry state ((R1, 1)) it is the four-kernel
    pipeline (P1, fused-C, P7, carry) plus the XLA injection strip.
    Returns (d0, d1, cout0, cout1) with the carry pair in the same shape
    family as the input."""
    assert t.fused is not None, "pallas pipeline requires fused-C tables"
    if use_xla_carry(fp):
        assert not sub2, "sub2 fusion needs the row-carry pipeline"
        # canonical-digit iteration: Pallas transforms + XLA carry; the
        # deferred-carry state stays zero and passes through
        wf = _wfold_ok(fp, t)
        assert wf, "xla-carry hybrid requires the weight-folded tables"
        s0, s1 = _p1_pass(fp, t, x0, x1, wfold=wf)
        s0, s1 = _fused_mid(fp, t, s0, s1, "sqr")
        z0, z1 = _p7_pass(fp, t, s0, s1, wfold=wf)
        d0, d1 = _xla_carry(fp, t, z0, z1, a, a_is_one)
        return d0, d1, cin0, cin1
    if cin0.ndim == 3:
        r0, r1 = roll_row_carries(fp, cin0, cin1)
        s0, s1 = p1_carry_pass(fp, t, x0, x1, r0, r1)
        s0, s1 = _fused_mid(fp, t, s0, s1, "sqr")
        return p7_carry_pass(fp, t, s0, s1, a, a_is_one,
                             sub2=(sub2 or None))
    assert not sub2, "sub2 fusion needs the row-carry pipeline"
    wf = _wfold_ok(fp, t)
    x0, x1 = inject_block_carries(fp, x0, x1, cin0, cin1)
    s0, s1 = _p1_pass(fp, t, x0, x1, wfold=wf)
    s0, s1 = _fused_mid(fp, t, s0, s1, "sqr")
    z0, z1 = _p7_pass(fp, t, s0, s1, wfold=wf)
    return k4(fp, t, z0, z1, a, a_is_one)


def mul_step(fp: FourStepPlan, t: FourStepTables, x0, x1, u0, u1,
             cin0, cin1, a):
    """dst = dst * multiplicand(u) * a; u is a spectral pair in the
    (R1, R2, C) shell (fwd_step's output)."""
    assert t.fused is not None
    if use_xla_carry(fp):
        wf = _wfold_ok(fp, t)
        assert wf, "xla-carry hybrid requires the weight-folded tables"
        s0, s1 = _p1_pass(fp, t, x0, x1, wfold=wf)
        s0, s1 = _fused_mid(fp, t, s0, s1, "mul", u=(u0, u1))
        z0, z1 = _p7_pass(fp, t, s0, s1, wfold=wf)
        d0, d1 = _xla_carry(fp, t, z0, z1, a, False)
        return d0, d1, cin0, cin1
    if cin0.ndim == 3:
        r0, r1 = roll_row_carries(fp, cin0, cin1)
        s0, s1 = p1_carry_pass(fp, t, x0, x1, r0, r1)
        s0, s1 = _fused_mid(fp, t, s0, s1, "mul", u=(u0, u1))
        return p7_carry_pass(fp, t, s0, s1, a, False)
    wf = _wfold_ok(fp, t)
    x0, x1 = inject_block_carries(fp, x0, x1, cin0, cin1)
    s0, s1 = _p1_pass(fp, t, x0, x1, wfold=wf)
    s0, s1 = _fused_mid(fp, t, s0, s1, "mul", u=(u0, u1))
    z0, z1 = _p7_pass(fp, t, s0, s1, wfold=wf)
    return k4(fp, t, z0, z1, a)


def fwd_step(fp: FourStepPlan, t: FourStepTables, x0, x1, cin0, cin1):
    """Forward transform only (multiplicand preparation); spectral out
    in the (R1, R2, C) shell."""
    assert t.fused is not None
    if use_xla_carry(fp):
        wf = _wfold_ok(fp, t)
        s0, s1 = _p1_pass(fp, t, x0, x1, wfold=wf)
        return _fused_mid(fp, t, s0, s1, "fwd")
    if cin0.ndim == 3:
        r0, r1 = roll_row_carries(fp, cin0, cin1)
        s0, s1 = p1_carry_pass(fp, t, x0, x1, r0, r1)
        return _fused_mid(fp, t, s0, s1, "fwd")
    wf = _wfold_ok(fp, t)
    x0, x1 = inject_block_carries(fp, x0, x1, cin0, cin1)
    s0, s1 = _p1_pass(fp, t, x0, x1, wfold=wf)
    return _fused_mid(fp, t, s0, s1, "fwd")


# ---------------------------------------------------------------------------
# Whole-chain VMEM kernel (small/mid n): K squarings inside ONE kernel.
# Everything — data, carry rows, every table — stays VMEM-resident across
# iterations, so the per-iteration kernel dispatches and HBM round trips
# that dominate small transforms vanish. The reference's analog is the
# fused sqrK tail kernel looped from the host (kernels/marin.cl:1267);
# here the loop itself moves on-core because VMEM holds the whole state.
# ---------------------------------------------------------------------------

def _chain_kernel(fp: FourStepPlan, K: int, k: int, rounds: int,
                  ca_count: int, *refs):
    (kcnt_ref, a_ref, x0_ref, x1_ref, ci0_ref, ci1_ref,
     wt_ref, cum_ref, er_ref, ec_ref,
     w1_ref, c1p_ref, mf0_ref, mf1_ref, mi0_ref, mi1_ref,
     tri0_ref, tri1_ref,
     wf8_ref, corrf_ref, wi8_ref, corri_ref, wrapc_ref,
     w7_ref, c7p_ref, wd_ref,
     o0_ref, o1_ref, co0_ref, co1_ref) = refs
    L1, L2 = fp.rs.L1, fp.rs.L2
    sh = x0_ref.shape                    # (R1, R2, C)
    R1, R2, C = sh
    v = sh
    rows = R1 * R2

    wt = wt_ref[:]
    cum = cum_ref[:]
    er = er_ref[:].reshape(R1, R2, 1)
    ec = ec_ref[:].reshape(1, 1, C)
    wmask = jnp.broadcast_to((er + ec) >= jnp.uint32(fp.n), v)
    del wrapc_ref  # the C-transform 2^{-+1} wrap lives in the mid tables
    wd = wd_ref[:]
    tri0 = tri0_ref[:]
    tri1 = tri1_ref[:]

    pack = (mxm._pack_planes_rhs_bytes if mxm.use_bytecast()
            else mxm._pack_planes_rhs)

    def dots(y0, y1, w8_ref, corr_ref):
        X8s = [pack(g, y0[:, j * 128:(j + 1) * 128],
                    y1[:, j * 128:(j + 1) * 128])
               for j in range(ca_count)]
        Ds = [lax.dot_general(X8s[j], w8_ref[j], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
              for j in range(ca_count)]
        outs0, outs1 = [], []
        for j in range(ca_count):
            r0, r1 = mxm._combine_rhs(g, 128, Ds[j] + corr_ref[j])
            outs0.append(r0)
            outs1.append(r1)
        return (jnp.concatenate(outs0, axis=1),
                jnp.concatenate(outs1, axis=1))

    def sdots(y0, y1, w8_ref, corr_ref):
        # per-r2-variant axis-0 dots (P1/P7 folded tables), batch-emitted
        return _sdots_multi(y0, y1, L1, R2, C, w8_ref, corr_ref)

    def dft_mid(x0, x1, inverse):
        # length-L2 DIF/DIT along axis 1 via rank-2 slices; identical
        # orderings to fsm.dft_axis0 (same structure as fsm.dft_lanes)
        levels = fsm.shift_exponents(L2)
        if inverse:
            levels = levels[::-1]
        for m, exps in levels:
            Bf = L2 // (2 * m)
            outs0 = [None] * L2
            outs1 = [None] * L2
            for blk in range(Bf):
                for jj in range(m):
                    pa = blk * 2 * m + jj
                    pb = pa + m
                    a0, a1 = x0[:, pa, :], x1[:, pa, :]
                    b0, b1 = x0[:, pb, :], x1[:, pb, :]
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
                        if e:
                            outs0[pa], outs1[pa] = d0, d1
                            outs0[pb], outs1[pb] = s0, s1
                        else:
                            outs0[pa], outs1[pa] = s0, s1
                            outs0[pb], outs1[pb] = d0, d1
            x0 = jnp.stack(outs0, axis=1)
            x1 = jnp.stack(outs1, axis=1)
        return x0, x1

    def one(it, state):
        x0, x1, a0c, a1c = state
        # roll the row carries by one flat row (wrap = the mod-M_p fold)
        f0 = a0c.reshape(rows, 1)
        f1 = a1c.reshape(rows, 1)
        c0 = jnp.concatenate([f0[rows - 1:], f0[:rows - 1]], axis=0)
        c1 = jnp.concatenate([f1[rows - 1:], f1[:rows - 1]], axis=0)
        c0 = c0.reshape(R1, R2, 1)
        c1 = c1.reshape(R1, R2, 1)
        # P1: inject + weight-fold wrap halve + per-r2-variant dot
        x0, x1 = _inject_rows_math(x0, x1, c0, c1, wt, cum, k, v)
        x0, x1 = g.halve_where(x0, x1, wmask)
        x0, x1 = sdots(x0, x1, w1_ref, c1p_ref)
        # P2 (VPU shift butterflies) + folded mid table
        x0, x1 = dft_mid(x0, x1, False)
        x0, x1 = g.mul(x0, x1, mf0_ref[:], mf1_ref[:])
        # C transform + dyadic square + mirror
        y0 = x0.reshape(rows, C)
        y1 = x1.reshape(rows, C)
        y0, y1 = fsm.dft_lanes(g, y0, y1, ca_count, 128, False)
        y0, y1 = dots(y0, y1, wf8_ref, corrf_ref)
        y0, y1 = g.sqr(y0, y1)
        y0, y1 = dots(y0, y1, wi8_ref, corri_ref)
        y0, y1 = fsm.dft_lanes(g, y0, y1, ca_count, 128, True)
        x0 = y0.reshape(v)
        x1 = y1.reshape(v)
        # P6: mid_inv + r2-inverse butterflies + t_r_inv
        x0, x1 = g.mul(x0, x1, mi0_ref[:], mi1_ref[:])
        x0, x1 = dft_mid(x0, x1, True)
        x0, x1 = g.mul(x0, x1, tri0, tri1)
        # P7: per-r2-variant inverse dot + wrap double + canon + a
        x0, x1 = sdots(x0, x1, w7_ref, c7p_ref)
        x0, x1 = g.double_where(x0, x1, wmask)
        x0, x1 = g.canon(x0, x1)
        x0, x1 = g.mul_small(x0, x1, a_ref[it, 0])
        x0, x1 = g.canon(x0, x1)
        # carry phase
        return _carry_phase_math(x0, x1, wd, rounds, v)

    st0 = (x0_ref[:], x1_ref[:],
           ci0_ref[:, :, 0:1], ci1_ref[:, :, 0:1])
    # dynamic trip count (<= K, the a-buffer extent): ONE Mosaic compile
    # serves every chain length
    d0, d1, a0c, a1c = lax.fori_loop(0, kcnt_ref[0, 0], one, st0)
    o0_ref[:] = d0
    o1_ref[:] = d1
    cv = (R1, R2, 128)
    cl = lax.broadcasted_iota(jnp.int32, cv, 2)
    co0_ref[:] = jnp.where(cl == 0, jnp.broadcast_to(a0c, cv),
                           jnp.uint32(0))
    co1_ref[:] = jnp.where(cl == 0, jnp.broadcast_to(a1c, cv),
                           jnp.uint32(0))


def chain_ok(fp: FourStepPlan, t: FourStepTables) -> bool:
    """Whole-chain kernel eligibility: row-carry tables live, power-of-two
    r2 factor small enough to unroll, C a lane-tile multiple, and the
    whole working set within the VMEM budget (the PRMERS_VMEM_LIMIT
    override also gates eligibility, so lowering it below the default
    falls back to the per-pass pipeline instead of failing Mosaic)."""
    if os.environ.get("PRMERS_NO_CHAIN") or not use_rowcarry(fp, t):
        return False
    if carry_tiles(fp) != 1:
        return False    # the chain kernel assumes whole-row carry units
    L2 = fp.rs.L2
    if L2 & (L2 - 1) or L2 > 8:
        return False
    ca = fp.C // 128
    if fp.C % 128 or ca & (ca - 1) or ca > 8:
        return False
    # data (~10 live n-sized u32 temps) + mids/widths/masks + fused W8s
    est = 10 * 4 * fp.n + 7 * 4 * fp.n + 2 * ca * (8 * 128) * (8 * 128)
    return est < min(80 * 1024 * 1024, VMEM_LIMIT)


CHAIN_K = 512          # a-buffer extent; the trip count is dynamic


def square_chain(fp: FourStepPlan, t: FourStepTables, x0, x1,
                 cin0, cin1, a_vec, count=None):
    """len(a_vec) squarings (x^2 * a_k per step) in ONE kernel; carry
    state in/out is the row-carry (R1, R2, 128) block. The a buffer is
    padded to CHAIN_K and the trip count rides SMEM, so one compile
    serves every chain length <= CHAIN_K."""
    K = int(a_vec.shape[0])
    assert K <= CHAIN_K
    if count is None:
        count = jnp.int32(K)
    if K < CHAIN_K:
        a_vec = jnp.concatenate(
            [a_vec, jnp.ones((CHAIN_K - K,), a_vec.dtype)])
    sh = x0.shape
    R1, R2, C = sh
    wt, cum = t.cinrow
    k = int(wt.shape[-1])
    w1, c1p = t.mxu["tr_fwd_w"]
    w7, c7p = t.mxu["iw_inv"]
    er_t, ec_t = t.wcorr
    (wf8, corrf, wi8, corri, wrapc, mf0, mf1, mi0, mi1) = t.fused
    kern = functools.partial(_chain_kernel, fp, CHAIN_K, k,
                             _carry_rounds(fp), int(wf8.shape[0]))
    full = _full
    ins = [count.reshape(1, 1), a_vec.reshape(CHAIN_K, 1),
           x0, x1, cin0, cin1,
           wt, cum, er_t, ec_t, w1, c1p, mf0, mf1, mi0, mi1,
           t.t_r_inv[0], t.t_r_inv[1],
           wf8, corrf, wi8, corri, wrapc,
           w7, c7p, t.widths32]
    in_specs = [pl.BlockSpec((1, 1), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((CHAIN_K, 1), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.SMEM)] + \
        [full(a.shape) for a in ins[2:]]
    d0, d1, co0, co1 = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=in_specs,
        out_specs=(full(sh), full(sh),
                   full((R1, R2, 128)), full((R1, R2, 128))),
        out_shape=(jax.ShapeDtypeStruct(sh, jnp.uint32),
                   jax.ShapeDtypeStruct(sh, jnp.uint32),
                   jax.ShapeDtypeStruct((R1, R2, 128), jnp.uint32),
                   jax.ShapeDtypeStruct((R1, R2, 128), jnp.uint32)),
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(*ins)
    return d0, d1, co0, co1
