"""Pallas TPU kernels for the four-step IBDWT squaring pipeline.

Every transform stage is ONE generic pass kernel: an optional elementwise
pre-multiply, a DFT along the leading axis of a small VMEM tile, an
optional middle op (dyadic square / multiplicand multiply, plus the second
sub-factor's forward+inverse around it), and an optional post-multiply.
The four-step factors n = (R1*R2) x (C1*C2); per squaring the passes are

  P1  r1-DFT    pre=weights            post=T_R      [AX tiles (64,k,8,128)]
  P2  r2-DFT                           post=mid
  T   XLA transpose (R, C) -> (C, R)
  P3  c1-DFT                           post=T_C
  P4  c2-DFT + square + c2-iDFT        post=T_C^-1   [whole c2 axis in-tile]
  P5  c1-iDFT
  T'  XLA transpose back
  P6  r2-iDFT   pre=mid^-1             post=T_R^-1
  P7  r1-iDFT   post=inv-weights (x 1/n) + canonicalize
  P8  carry (sequential grid, wraparound carry deferred to next iteration)

Small tiles keep Mosaic register pressure low (a fused full-column design
spilled ~270 MB of VMEM at n = 2^23). The reference reaches the same
arithmetic through radix dispatch tables on one GPU queue
(reference: include/marin/engine_gpu.h:1568-1630, kernels/marin.cl).
"""

from __future__ import annotations

import functools

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
G = 8
SUBBLK = 8          # sub-factor slice width per tile in leading-axis passes
VMEM_LIMIT = 64 * 1024 * 1024


def _cparams(**kw):
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT, **kw)


def _full(shape):
    """Whole-array VMEM spec with an explicit all-i32 index map (default
    maps emit i64 literals under jax_enable_x64, breaking Mosaic). Works
    for 1- and 2-grid-dim pass kernels via *gs varargs."""
    nd = len(shape)
    return pl.BlockSpec(tuple(shape),
                        lambda *gs: tuple(gs[0] * 0 for _ in range(nd)),
                        memory_space=pltpu.VMEM)


def _mxspec(shape):
    """Spec for an MXU table input: 2D generic tables map whole; 3D
    twiddle-folded tables select the grid-dim-0 slice (one per-invocation
    (9L, 8L) variant)."""
    if len(shape) == 3:
        return pl.BlockSpec((1,) + tuple(shape[1:]),
                            lambda i, j: (i, j * 0, j * 0),
                            memory_space=pltpu.VMEM)
    return _full(shape)


# ---------------------------------------------------------------------------
# The generic pass kernel
# ---------------------------------------------------------------------------

def _halve_mod_p(x0, x1, mask):
    return g.halve_where(x0, x1, mask)


def _double_mod_p(x0, x1, mask):
    return g.double_where(x0, x1, mask)


def _pass_kernel(L: int, inverse: bool, mode: str, has_pre: bool,
                 has_post: bool, cin_widths, mxu_subs, wcorr_n, *refs):
    """Tile = (L, S, 1, G, LN) [leading-axis pass] or (1, L, 1, G, LN)
    [second-axis pass]; the wrapper always arranges the transform axis
    first and payload after, so the kernel sees (L, S, G, LN).

    mode: "plain" | "sqr" | "mul" | "fwd" | "mid_sqr" | "mid_mul" |
          "mid_fwd".  mid_* run fwd-DFT, the op, then inv-DFT (the whole
          sub-factor axis is in-tile); fwd/mid_fwd skip the inverse.

    cin_widths: None, or the static widths of the leading digits — then the
    first two refs are (1,1) SMEM scalars holding the wraparound carry,
    folded base-2^width into lanes 0..k-1 of the grid-(0,0) tile (this is
    the reference's carry phase 2 riding the next forward kernel,
    kernels/marin.cl:2198).
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
    if mxu_subs is not None:
        nm = 2 if mode.startswith("mid_") and mode != "mid_fwd" else 1
        mxu_refs = refs[i:i + 2 * nm]
        i += 2 * nm
    if mode in ("mul", "mid_mul"):
        u0_ref, u1_ref = refs[i], refs[i + 1]
        i += 2
    if has_pre:
        pre0_ref, pre1_ref = refs[i], refs[i + 1]
        i += 2
    if has_post:
        post0_ref, post1_ref = refs[i], refs[i + 1]
        i += 2
    o0_ref, o1_ref = refs[i], refs[i + 1]

    sh = x0_ref.shape
    # squeeze so the transform axis leads: axis-0 passes tile
    # (L, S, 1, G, LN) -> view (L, S, G, LN); axis-1 passes tile
    # (1, L, 1, G, LN) -> view (L, G, LN) (pure squeeze, no data movement).
    if sh[0] == 1:
        v = (L, sh[3], sh[4])
        tb = (L, 1, 1)
    else:
        v = (L, sh[1], sh[3], sh[4])
        tb = (L, sh[1], 1, 1)

    x0 = x0_ref[:].reshape(v)
    x1 = x1_ref[:].reshape(v)

    if wcorr_n is not None:
        # forward weight-fold wrap correction: halve where er + ec >= n
        er = wc_refs[0][:].reshape(L, 1, 1, 1)
        ec = wc_refs[1][:].reshape(1, 1, v[-2], v[-1])
        mask = (er + ec) >= jnp.uint32(wcorr_n)
        x0, x1 = _halve_mod_p(x0, x1, jnp.broadcast_to(mask, v))

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
        on_first = ((pl.program_id(0) == 0) &
                    (pl.program_id(1) == 0)).astype(jnp.uint32)
        lane = lax.broadcasted_iota(jnp.int32, v, len(v) - 1)
        row = lax.broadcasted_iota(jnp.int32, v, 0)
        sub = lax.broadcasted_iota(jnp.int32, v, 1)
        first = (row == 0) & (sub == 0)
        if len(v) == 4:
            g_ = lax.broadcasted_iota(jnp.int32, v, 2)
            first = first & (g_ == 0)
        add = jnp.zeros(v, jnp.uint32)
        for j, val in enumerate(vals):
            add = jnp.where(first & (lane == j), val * on_first, add)
        x0 = x0 + add  # cannot wrap the low word (sum < 2^(w+1) < 2^32)

    def tload(r0, r1):
        s = r0.shape
        if s[-1] == 1 and s[-2] == 1:   # broadcast table (L, S, 1, 1)
            return r0[:].reshape(tb), r1[:].reshape(tb)
        return r0[:].reshape(v), r1[:].reshape(v)

    if has_pre:
        p0, p1 = tload(pre0_ref, pre1_ref)
        x0, x1 = g.mul(x0, x1, p0, p1)

    def dft(x0, x1, inv, which):
        if mxu_subs is None:
            return fsm.dft_axis0(g, x0, x1, L, inv)
        w8 = mxu_refs[2 * which][:]
        corr = mxu_refs[2 * which + 1][:]
        if w8.ndim == 3:   # twiddle-folded per-grid variant (leading 1)
            w8 = w8.reshape(w8.shape[1:])
            corr = corr.reshape(corr.shape[1:])
        sub = mxu_subs[which]
        return mxm.mxu_dft_apply(g, x0, x1, L, w8, corr,
                                 jnp.uint32(sub[0]), jnp.uint32(sub[1]))

    if mode.startswith("mid_"):
        x0, x1 = dft(x0, x1, False, 0)
        if mode == "mid_sqr":
            x0, x1 = g.sqr(x0, x1)
        elif mode == "mid_mul":
            u0 = u0_ref[:].reshape(v)
            u1 = u1_ref[:].reshape(v)
            x0, x1 = g.mul(x0, x1, u0, u1)
        if mode != "mid_fwd":
            x0, x1 = dft(x0, x1, True, 1)
    else:
        x0, x1 = dft(x0, x1, inverse, 0)
        if mode == "sqr":
            x0, x1 = g.sqr(x0, x1)
        elif mode == "mul":
            u0 = u0_ref[:].reshape(v)
            u1 = u1_ref[:].reshape(v)
            x0, x1 = g.mul(x0, x1, u0, u1)

    if has_post:
        p0, p1 = tload(post0_ref, post1_ref)
        x0, x1 = g.mul(x0, x1, p0, p1)

    o0_ref[:] = x0.reshape(sh)
    o1_ref[:] = x1.reshape(sh)


def _post_canon_kernel(L: int, mxu_subs, wcorr_n, *refs):
    """P7: r1-iDFT + inverse weights + canonicalize (digit-domain out).

    With wcorr_n set, the inverse weights are FOLDED into the per-grid MXU
    tables (iwr * 1/n as row scales; iwc was folded into P5): only the
    single-wrap 2^k correction remains — a masked doubling."""
    i = 0
    x0_ref, x1_ref = refs[i], refs[i + 1]
    i += 2
    mxu_refs = None
    if mxu_subs is not None:
        mxu_refs = refs[i:i + 2]
        i += 2
    if wcorr_n is not None:
        er_ref, ec_ref = refs[i], refs[i + 1]
        i += 2
        o0_ref, o1_ref = refs[i:i + 2]
    else:
        iw0_ref, iw1_ref, o0_ref, o1_ref = refs[i:i + 4]
    sh = x0_ref.shape
    v = (L, sh[1], sh[3], sh[4])
    x0 = x0_ref[:].reshape(v)
    x1 = x1_ref[:].reshape(v)
    if mxu_subs is not None:
        w8 = mxu_refs[0][:]
        corr = mxu_refs[1][:]
        if w8.ndim == 3:
            w8 = w8.reshape(w8.shape[1:])
            corr = corr.reshape(corr.shape[1:])
        sub = mxu_subs[0]
        x0, x1 = mxm.mxu_dft_apply(g, x0, x1, L, w8, corr,
                                   jnp.uint32(sub[0]), jnp.uint32(sub[1]))
    else:
        x0, x1 = fsm.dft_axis0(g, x0, x1, L, True)
    if wcorr_n is not None:
        # inverse weight-fold wrap correction: double where er + ec >= n
        er = er_ref[:].reshape(L, 1, 1, 1)
        ec = ec_ref[:].reshape(1, 1, v[-2], v[-1])
        mask = (er + ec) >= jnp.uint32(wcorr_n)
        x0, x1 = _double_mod_p(x0, x1, jnp.broadcast_to(mask, v))
    else:
        i0 = iw0_ref[:].reshape(v)
        i1 = iw1_ref[:].reshape(v)
        x0, x1 = g.mul(x0, x1, i0, i1)
    x0, x1 = g.canon(x0, x1)
    o0_ref[:] = x0.reshape(sh)
    o1_ref[:] = x1.reshape(sh)


# ---------------------------------------------------------------------------
# Pass wrappers. Data arrays are 5D: AX = (R1, R2, CB, G, LN) in the digit
# domain (digit = ((r1*R2+r2)*C + cb*G*LN + s*LN + l)); AY = (C1, C2, RB,
# G, LN2) after the transpose. Leading-axis passes (axis 0) tile
# (L, SUBBLK, 1, G, LN) over grid (dim1/SUBBLK, dim2); second-axis passes
# tile (1, L, 1, G, LN) over grid (dim0, dim2) and transpose-free views
# put their axis first via jnp.swapaxes (an XLA relayout on small dims).
# ---------------------------------------------------------------------------

def _axis0_pass(x0, x1, L, inverse, mode, pre=None, post=None, u=None,
                cin=None, cin_widths=None, mxu=None, wcorr=None):
    """Transform along dim 0 of a 5D array; dims 1 and 2 go to the grid.

    mxu: None, or (tables, subs) where tables = ((w8, corr), ...) and
    subs = ((sub_lo, sub_hi), ...) per DFT application in the kernel."""
    sh = x0.shape
    S = 1 if mxu is not None else min(SUBBLK, sh[1])
    grid = (sh[1] // S, sh[2])
    blk = (L, S, 1, sh[3], sh[4])

    def im(i, j):
        return (i * 0, i, j, i * 0, i * 0)

    def bspec(a):
        s = a.shape
        if s[-1] == 1 and s[-2] == 1:
            return pl.BlockSpec((L, S, 1, 1, 1),
                                lambda i, j: (i * 0, i, j * 0, i * 0, i * 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(blk, im, memory_space=pltpu.VMEM)

    xspec = pl.BlockSpec(blk, im, memory_space=pltpu.VMEM)
    smem11 = pl.BlockSpec((1, 1), lambda i, j: (i * 0, i * 0),
                          memory_space=pltpu.SMEM)
    ins = []
    in_specs = []
    if cin is not None:
        ins += [cin[0], cin[1]]
        in_specs += [smem11, smem11]
    ins += [x0, x1]
    in_specs += [xspec, xspec]
    wcorr_n = None
    if wcorr is not None:
        er_t, ec_t, wcorr_n = wcorr
        ins += [er_t, ec_t]
        in_specs += [
            pl.BlockSpec((1,) + tuple(er_t.shape[1:]),
                         lambda i, j: (i, j * 0, j * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + tuple(ec_t.shape[1:]),
                         lambda i, j: (j, i * 0, i * 0, i * 0),
                         memory_space=pltpu.VMEM)]
    mxu_subs = None
    if mxu is not None:
        tables, mxu_subs = mxu
        for w8, corr in tables:
            ins += [w8, corr]
            in_specs += [_mxspec(w8.shape), _mxspec(corr.shape)]
    if mode in ("mul", "mid_mul"):
        ins += [u[0], u[1]]
        in_specs += [xspec, xspec]
    if pre is not None:
        ins += [pre[0], pre[1]]
        in_specs += [bspec(pre[0]), bspec(pre[1])]
    if post is not None:
        ins += [post[0], post[1]]
        in_specs += [bspec(post[0]), bspec(post[1])]
    kern = functools.partial(_pass_kernel, L, inverse, mode,
                             pre is not None, post is not None,
                             cin_widths if cin is not None else None,
                             mxu_subs, wcorr_n)
    r0, r1 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=(xspec, xspec),
        out_shape=(jax.ShapeDtypeStruct(sh, jnp.uint32),
                   jax.ShapeDtypeStruct(sh, jnp.uint32)),
        compiler_params=_cparams(),
    )(*ins)
    return r0, r1


def _axis1_pass(x0, x1, L, inverse, mode, pre=None, post=None, u=None,
                mxu=None):
    """Transform along dim 1: tile (1, L, 1, G, LN) over grid (dim0, dim2);
    the block is already transform-axis-major after squeezing the leading
    1 — no data movement."""
    sh = x0.shape
    grid = (sh[0], sh[2])
    blk = (1, L, 1, sh[3], sh[4])

    def im(i, j):
        return (i, i * 0, j, i * 0, i * 0)

    def bspec(a):
        s = a.shape
        if s[-1] == 1 and s[-2] == 1:
            return pl.BlockSpec((1, L, 1, 1, 1),
                                lambda i, j: (i, i * 0, j * 0, i * 0, i * 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(blk, im, memory_space=pltpu.VMEM)

    xspec = pl.BlockSpec(blk, im, memory_space=pltpu.VMEM)
    ins = [x0, x1]
    in_specs = [xspec, xspec]
    mxu_subs = None
    if mxu is not None:
        tables, mxu_subs = mxu
        for w8, corr in tables:
            ins += [w8, corr]
            in_specs += [_mxspec(w8.shape), _mxspec(corr.shape)]
    if mode in ("mul", "mid_mul"):
        ins += [u[0], u[1]]
        in_specs += [xspec, xspec]
    if pre is not None:
        ins += [pre[0], pre[1]]
        in_specs += [bspec(pre[0]), bspec(pre[1])]
    if post is not None:
        ins += [post[0], post[1]]
        in_specs += [bspec(post[0]), bspec(post[1])]
    kern = functools.partial(_pass_kernel, L, inverse, mode,
                             pre is not None, post is not None, None,
                             mxu_subs, None)
    r0, r1 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=(xspec, xspec),
        out_shape=(jax.ShapeDtypeStruct(sh, jnp.uint32),
                   jax.ShapeDtypeStruct(sh, jnp.uint32)),
        compiler_params=_cparams(),
    )(*ins)
    return r0, r1


# ---------------------------------------------------------------------------
# Fused C-transform kernel (replaces T, P3, P4, P5, T'): the whole length-C
# transform on the AX layout — shift-twiddle DFT over ca = (cb, s), then one
# lane-axis int8 MXU dot per output group with the inter-factor twiddles and
# the lane-part IBDWT weights folded into ca_count variant matrices (tables
# from fourstep.attach_fused_c_tables). No global transposes.
# ---------------------------------------------------------------------------

def _fused_c_kernel(ca_count: int, n: int, mode: str, sub_f, sub_i,
                    *refs):
    i = 0
    x0_ref, x1_ref = refs[i], refs[i + 1]
    i += 2
    if mode == "mul":
        u0_ref, u1_ref = refs[i], refs[i + 1]
        i += 2
    wf8_ref, corrf_ref = refs[i], refs[i + 1]
    i += 2
    if mode != "fwd":
        wi8_ref, corri_ref = refs[i], refs[i + 1]
        i += 2
    eca_ref, ecl_ref = refs[i], refs[i + 1]
    i += 2
    o0_ref, o1_ref = refs[i], refs[i + 1]

    sh = x0_ref.shape                       # (RC, R2, CB, G, LN)
    B = sh[0] * sh[1]
    v = (B, ca_count, 128)
    x0 = x0_ref[:].reshape(v)
    x1 = x1_ref[:].reshape(v)

    mask = (eca_ref[:].reshape(1, ca_count, 1)
            + ecl_ref[:].reshape(1, 1, 128)) >= jnp.uint32(n)
    mask = jnp.broadcast_to(mask, v)
    x0, x1 = g.halve_where(x0, x1, mask)
    x0, x1 = fsm.dft_axis1(g, x0, x1, ca_count, 1, False)

    def dots(y0, y1, w8_ref, corr_ref, sub):
        outs0, outs1 = [], []
        for j in range(ca_count):
            r0, r1 = mxm.mxu_rhs_apply(
                g, y0[:, j, :], y1[:, j, :], 128,
                w8_ref[j], corr_ref[j],
                jnp.uint32(sub[0]), jnp.uint32(sub[1]))
            outs0.append(r0.reshape(B, 1, 128))
            outs1.append(r1.reshape(B, 1, 128))
        return (jnp.concatenate(outs0, axis=1),
                jnp.concatenate(outs1, axis=1))

    x0, x1 = dots(x0, x1, wf8_ref, corrf_ref, sub_f)
    if mode == "sqr":
        x0, x1 = g.sqr(x0, x1)
    elif mode == "mul":
        u0 = u0_ref[:].reshape(v)
        u1 = u1_ref[:].reshape(v)
        x0, x1 = g.mul(x0, x1, u0, u1)
    if mode != "fwd":
        x0, x1 = dots(x0, x1, wi8_ref, corri_ref, sub_i)
        x0, x1 = fsm.dft_axis1(g, x0, x1, ca_count, 1, True)
        x0, x1 = g.double_where(x0, x1, mask)
    o0_ref[:] = x0.reshape(sh)
    o1_ref[:] = x1.reshape(sh)


def fused_c_pass(fp: FourStepPlan, t: FourStepTables, x0, x1, mode: str,
                 u=None):
    """Run the fused C kernel over the AX array; grid tiles r1 so each
    invocation transforms RC*R2 batch rows against the VMEM-resident
    variant tables."""
    (wf8, corrf, wi8, corri, eca, ecl, *_r) = t.fused
    ca_count = wf8.shape[0]
    sh = x0.shape
    R2 = sh[1]
    RC = max(1, min(sh[0], 128 // max(R2, 1)))
    while sh[0] % RC:
        RC -= 1
    grid = (sh[0] // RC,)
    blk = (RC,) + tuple(sh[1:])
    xspec = pl.BlockSpec(blk, lambda i: (i, i * 0, i * 0, i * 0, i * 0),
                         memory_space=pltpu.VMEM)
    ins = [x0, x1]
    in_specs = [xspec, xspec]
    if mode == "mul":
        ins += [u[0], u[1]]
        in_specs += [xspec, xspec]
    ins += [wf8, corrf]
    in_specs += [_full(wf8.shape), _full(corrf.shape)]
    if mode != "fwd":
        ins += [wi8, corri]
        in_specs += [_full(wi8.shape), _full(corri.shape)]
    ins += [eca, ecl]
    in_specs += [_full(eca.shape), _full(ecl.shape)]
    kern = functools.partial(_fused_c_kernel, ca_count, fp.n, mode,
                             t.mxu_sub("fc_fwd"), t.mxu_sub("fc_inv"))
    r0, r1 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=(xspec, xspec),
        out_shape=(jax.ShapeDtypeStruct(sh, jnp.uint32),
                   jax.ShapeDtypeStruct(sh, jnp.uint32)),
        compiler_params=_cparams(),
    )(*ins)
    return r0, r1


def _fused_ok(fp, t) -> bool:
    import os
    return (t.fused is not None and _wfold_ok(fp, t)
            and not os.environ.get("PRMERS_NO_FUSE"))


# ---------------------------------------------------------------------------
# Carry pass (P8): sequential grid over r1 blocks
# ---------------------------------------------------------------------------

def _k4_kernel(fp: FourStepPlan, rounds: int, with_a: bool, *refs):
    """Tile = (R2, CB, G, LN) digits in order (r2, cb, s, l), viewed 2D
    (rows, LN) so the flat digit order is row-major. Optionally multiplies
    by the small carry operand a (PRP-style x3 — statically skipped for
    the pure-squaring hot chain), splits digit/carry by the variable
    widths, and propagates carries along the digit order: the flat shift
    by one is a lane roll plus a row roll selected into lane 0 (2 rolls +
    2 selects vs the round-1 4-axis chain). The grid is PARALLEL over r1
    blocks: each block emits its boundary carry to co[r1]; the next
    iteration's P1 injection (or op_settle) folds the rolled carry vector
    — the reference's two-phase carry with phase 2 riding the next
    forward kernel (kernels/marin.cl:2198), the wrap included."""
    i = 0
    if with_a:
        a0_ref, a1_ref = refs[i], refs[i + 1]
        i += 2
    (y0_ref, y1_ref, wd_ref, mk0_ref, mk1_ref,
     o0_ref, o1_ref, co0_ref, co1_ref) = refs[i:i + 9]
    sh4 = y0_ref.shape[1:]
    v2 = (sh4[0] * sh4[1] * sh4[2], sh4[3])
    y0 = y0_ref[:].reshape(v2)
    y1 = y1_ref[:].reshape(v2)
    wd = wd_ref[:].reshape(v2)
    mk0 = mk0_ref[:].reshape(v2)
    mk1 = mk1_ref[:].reshape(v2)

    if with_a:
        a = a0_ref[0, 0]
        y0, y1 = g.mul_small(y0, y1, a)
        y0, y1 = g.canon(y0, y1)

    rem = jnp.uint32(31) - wd

    def split(y0, y1):
        d0 = y0 & mk0
        d1 = y1 & mk1
        c0 = (y0 >> wd) | ((y1 << jnp.uint32(1)) << rem)
        c1 = y1 >> wd
        return d0, d1, c0, c1

    d0, d1, c0, c1 = split(y0, y1)

    l_ = lax.broadcasted_iota(jnp.int32, v2, 1)
    r_ = lax.broadcasted_iota(jnp.int32, v2, 0)

    def shift_one(c0, c1, in0, in1):
        out0 = c0[-1:, -1:].reshape(())
        out1 = c1[-1:, -1:].reshape(())

        def sh(c, inject):
            A = pltpu.roll(c, jnp.int32(1), axis=1)
            B = pltpu.roll(A, jnp.int32(1), axis=0)
            r = jnp.where(l_ > 0, A, B)
            return jnp.where((l_ == 0) & (r_ == 0), inject, r)

        return sh(c0, in0), sh(c1, in1), out0, out1

    c0, c1, o0c, o1c = shift_one(c0, c1, jnp.uint32(0), jnp.uint32(0))
    s0, cc = g.addc(jnp.uint32(0), o0c)
    acc0, acc1 = s0, o1c + cc
    y0, yc = g.addc(d0, c0)
    y1 = d1 + c1 + yc
    d0, d1, c0, c1 = split(y0, y1)

    def more(state):
        d0, d1, c0, c1, a0_, a1_ = state
        c0, c1, o0c, o1c = shift_one(c0, c1, jnp.uint32(0), jnp.uint32(0))
        s0, cc = g.addc(a0_, o0c)
        a1_ = a1_ + o1c + cc
        y0, yc = g.addc(d0, c0)
        y1 = d1 + c1 + yc
        d0, d1, c0, c1 = split(y0, y1)
        return d0, d1, c0, c1, s0, a1_

    def pending(state):
        d0, d1, c0, c1, _, _ = state
        nz = jnp.where((c0 | c1) != jnp.uint32(0), jnp.int32(1),
                       jnp.int32(0))
        return jnp.max(nz) > 0

    state = (d0, d1, c0, c1, acc0, acc1)
    for _ in range(rounds - 1):
        state = more(state)
    state = lax.while_loop(pending, more, state)
    d0, d1, c0, c1, acc0, acc1 = state

    o0_ref[:] = d0.reshape(o0_ref.shape)
    o1_ref[:] = d1.reshape(o1_ref.shape)
    co0_ref[0, 0, 0] = acc0
    co1_ref[0, 0, 0] = acc1


def k4(fp: FourStepPlan, t: FourStepTables, y0, y1, a,
       a_is_one: bool = False):
    """a_is_one=True statically drops the small-operand multiply + canon
    (the PRP hot chain is pure squarings; carry alone is ~40 ops/el
    cheaper)."""
    sh = y0.shape
    R1 = sh[0]
    wmin = int(fp.widths.min())
    rounds = 1
    bound = fp.max_word * 4
    while bound >> (rounds * wmin) > 1:
        rounds += 1
    with_a = not a_is_one
    kern = functools.partial(_k4_kernel, fp, max(rounds, 2), with_a)
    bs = pl.BlockSpec((1,) + sh[1:],
                      lambda i: (i, i * 0, i * 0, i * 0, i * 0),
                      memory_space=pltpu.VMEM)
    smem11 = pl.BlockSpec((1, 1), lambda i: (i * 0, i * 0),
                          memory_space=pltpu.SMEM)
    # rank-3 (R1, 1, 1) carry outputs: the trailing (1, 1) equals the
    # array dims (Pallas requires the last two block dims divisible by
    # (8, 128) or equal); the leading grid dim is unconstrained
    co_spec = pl.BlockSpec((1, 1, 1), lambda i: (i, i * 0, i * 0),
                           memory_space=pltpu.SMEM)
    ins = ([a[0], a[1]] if with_a else []) + \
        [y0, y1, t.widths32, t.masks_lo, t.masks_hi]
    in_specs = ([smem11, smem11] if with_a else []) + [bs] * 5
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
    )(*ins)
    return d0, d1, co0.reshape(R1, 1), co1.reshape(R1, 1)


# ---------------------------------------------------------------------------
# Full steps (XLA glue: carry inject + transposes)
# ---------------------------------------------------------------------------

def inject_carry(fp: FourStepPlan, x0, x1, cin0, cin1):
    """Fold the wraparound carry into the low digits, spread base-2^width
    so no digit grows past ~2^(w+1) (digit0^2 must stay below the field
    modulus in the next convolution)."""
    cin = (cin0[0, 0].astype(jnp.uint64) |
           (cin1[0, 0].astype(jnp.uint64) << jnp.uint64(32)))
    widths = fp.widths
    k, acc = 0, 0
    while acc < 64:
        acc += int(widths[k])
        k += 1
    # one fused strip update per plane: digits 0..k-1 live at
    # [0, 0, 0, 0, 0:k] (k < 128 lanes)
    parts = []
    rem = cin
    for j in range(k):
        w = jnp.uint64(int(widths[j]))
        parts.append(rem & ((jnp.uint64(1) << w) - jnp.uint64(1))
                     if j < k - 1 else rem)
        rem = rem >> w
    part_vec = jnp.stack(parts)
    lo = x0[0, 0, 0, 0, 0:k].astype(jnp.uint64)
    hi = x1[0, 0, 0, 0, 0:k].astype(jnp.uint64)
    v = (lo | (hi << jnp.uint64(32))) + part_vec
    x0 = x0.at[0, 0, 0, 0, 0:k].set(
        (v & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))
    x1 = x1.at[0, 0, 0, 0, 0:k].set(
        (v >> jnp.uint64(32)).astype(jnp.uint32))
    return x0, x1


def _to_ay(fp: FourStepPlan, a):
    R, C = fp.R, fp.C
    C1, C2 = fp.cs.L1, fp.cs.L2
    RB = max(R // (G * LANES), 1)
    LN2 = R // (RB * G)
    return a.reshape(R, C).T.reshape(C1, C2, RB, G, LN2)


def _to_ax(fp: FourStepPlan, a):
    R, C = fp.R, fp.C
    R1, R2 = fp.rs.L1, fp.rs.L2
    CB = max(C // (G * LANES), 1)
    LN = C // (CB * G)
    return a.reshape(C, R).T.reshape(R1, R2, CB, G, LN)


def _mx(t: FourStepTables, *specs, ln: int = 128):
    """((w8, corr), ...), (subs, ...) for the given specs — each a string
    key ("tr_fwd", "g64f", ...) or an (L, inverse) pair — or None when the
    tables carry no MXU data, the lane dim is not a whole number of
    128-lane tiles (lane concat/slice would be misaligned), or it is
    disabled."""
    import os
    if not t.mxu or os.environ.get("PRMERS_NO_MXU") or ln % 128:
        return None
    tabs = []
    subs = []
    for spec in specs:
        key = spec if isinstance(spec, str) else fsm.mxu_key(*spec)
        if key not in t.mxu:
            return None
        tabs.append(t.mxu[key])
        subs.append(t.mxu_sub(key))
    return tuple(tabs), tuple(subs)


def _cin_widths(fp: FourStepPlan) -> tuple[int, ...]:
    k, acc = 0, 0
    while acc < 64:
        acc += int(fp.widths[k])
        k += 1
    return tuple(int(w) for w in fp.widths[:k])


def _wfold_ok(fp, t) -> bool:
    """Weight folding must engage for ALL of P1/P3/P5/P7 or none: the
    tables exist and both the AX and AY lane extents are whole tiles."""
    import os
    if t.wcorr is None or os.environ.get("PRMERS_NO_MXU") or \
            os.environ.get("PRMERS_NO_WFOLD"):
        return False
    needed = ("tr_fwd_w", "tc_fwd_w", "iwc_inv", "iw_inv")
    if not t.mxu or any(k not in t.mxu for k in needed):
        return False
    C, R = fp.C, fp.R
    CB = max(C // (G * LANES), 1)
    RB = max(R // (G * LANES), 1)
    return (C // (CB * G)) % 128 == 0 and (R // (RB * G)) % 128 == 0


def _forward_r(fp, t, x0, x1, cin=None, wfold=False, mid_tab=None):
    # P1: the t_r twiddle — and with wfold the weight r-part — folds into
    # per-grid MXU tables; only the wrap correction stays elementwise
    mx1 = _mx(t, "tr_fwd_w" if wfold else "tr_fwd", ln=x1.shape[-1])
    x0, x1 = _axis0_pass(x0, x1, fp.rs.L1, False, "plain",
                         pre=None if wfold else t.w,
                         post=None if mx1 else t.t_r, cin=cin,
                         cin_widths=_cin_widths(fp) if cin else None,
                         mxu=mx1,
                         wcorr=(t.wcorr[0], t.wcorr[1], fp.n)
                         if wfold else None)
    x0, x1 = _axis1_pass(x0, x1, fp.rs.L2, False, "plain",
                         post=mid_tab if mid_tab is not None else t.mid,
                         mxu=_mx(t, (fp.rs.L2, False), ln=x1.shape[-1]))
    return x0, x1


def _middle(fp, t, y0, y1, mode, u=None, wfold=False):
    # P3: t_c (and with wfold the weight c-part) folds; P4: t_c_inv folds
    mx3 = _mx(t, "tc_fwd_w" if wfold else "tc_fwd", ln=y1.shape[-1])
    y0, y1 = _axis0_pass(y0, y1, fp.cs.L1, False, "plain",
                         post=None if mx3 else t.t_c, mxu=mx3)
    if mode == "fwd":
        mx4 = _mx(t, (fp.cs.L2, False), ln=y1.shape[-1])
        post4 = None
    else:
        mx4 = _mx(t, (fp.cs.L2, False), "tc_inv", ln=y1.shape[-1])
        post4 = None if mx4 else t.t_c_inv
    y0, y1 = _axis1_pass(y0, y1, fp.cs.L2, False,
                         {"sqr": "mid_sqr", "mul": "mid_mul",
                          "fwd": "mid_fwd"}[mode],
                         post=post4, u=u, mxu=mx4)
    if mode != "fwd":
        # P5: with wfold the inverse-weight c-part rides these tables
        mx5 = _mx(t, "iwc_inv" if wfold else (fp.cs.L1, True),
                  ln=y1.shape[-1])
        y0, y1 = _axis0_pass(y0, y1, fp.cs.L1, True, "plain", mxu=mx5)
    return y0, y1


def _inverse_r(fp, t, z0, z1, wfold=False, mid_inv_tab=None):
    # P6: t_r_inv folds
    mx6 = _mx(t, "tr_inv", ln=z1.shape[-1])
    z0, z1 = _axis1_pass(z0, z1, fp.rs.L2, True, "plain",
                         pre=(mid_inv_tab if mid_inv_tab is not None
                              else t.mid_inv),
                         post=None if mx6 else t.t_r_inv,
                         mxu=mx6)
    # final pass: r1 inverse DFT + inverse weights + canon
    sh = z0.shape
    mxu = _mx(t, "iw_inv" if wfold else (fp.rs.L1, True), ln=sh[-1])
    iw = t.iw
    S = 1 if mxu is not None else min(SUBBLK, sh[1])
    grid = (sh[1] // S, sh[2])
    blk = (fp.rs.L1, S, 1, sh[3], sh[4])

    def im(i, j):
        return (i * 0, i, j, i * 0, i * 0)

    bspec = pl.BlockSpec(blk, im, memory_space=pltpu.VMEM)
    ins = [z0, z1]
    in_specs = [bspec, bspec]
    subs = None
    if mxu is not None:
        (tabs, subs) = mxu
        ins += [tabs[0][0], tabs[0][1]]
        in_specs += [_mxspec(tabs[0][0].shape), _mxspec(tabs[0][1].shape)]
    wcorr_n = None
    if wfold:
        wcorr_n = fp.n
        er_t, ec_t = t.wcorr
        ins += [er_t, ec_t]
        in_specs += [
            pl.BlockSpec((1,) + tuple(er_t.shape[1:]),
                         lambda i, j: (i, j * 0, j * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + tuple(ec_t.shape[1:]),
                         lambda i, j: (j, i * 0, i * 0, i * 0),
                         memory_space=pltpu.VMEM)]
    else:
        ins += [iw[0], iw[1]]
        in_specs += [bspec, bspec]
    kern = functools.partial(_post_canon_kernel, fp.rs.L1, subs, wcorr_n)
    r0, r1 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=(bspec, bspec),
        out_shape=(jax.ShapeDtypeStruct(sh, jnp.uint32),
                   jax.ShapeDtypeStruct(sh, jnp.uint32)),
        compiler_params=_cparams(),
    )(*ins)
    return r0, r1


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
    x0 = x0.at[:, 0, 0, 0, :k].add(add_lo)
    return x0, x1


def _fused_mid_tabs(t):
    (*_a, mf0, mf1, mi0, mi1) = t.fused
    return (mf0, mf1), (mi0, mi1)


def square_step(fp: FourStepPlan, t: FourStepTables, x0, x1,
                cin0, cin1, a, a_is_one: bool = False):
    """One full (x^2 * a) iteration. Returns (d0, d1, cout0, cout1);
    the carry pair is the per-block vector ((R1, 1) u32 x2)."""
    wf = _wfold_ok(fp, t)
    x0, x1 = inject_block_carries(fp, x0, x1, cin0, cin1)
    if _fused_ok(fp, t):
        mf, mi = _fused_mid_tabs(t)
        s0, s1 = _forward_r(fp, t, x0, x1, wfold=wf, mid_tab=mf)
        s0, s1 = fused_c_pass(fp, t, s0, s1, "sqr")
        z0, z1 = _inverse_r(fp, t, s0, s1, wfold=wf, mid_inv_tab=mi)
        return k4(fp, t, z0, z1, a, a_is_one)
    s0, s1 = _forward_r(fp, t, x0, x1, wfold=wf)
    y0 = _to_ay(fp, s0)
    y1 = _to_ay(fp, s1)
    y0, y1 = _middle(fp, t, y0, y1, "sqr", wfold=wf)
    z0 = _to_ax(fp, y0)
    z1 = _to_ax(fp, y1)
    z0, z1 = _inverse_r(fp, t, z0, z1, wfold=wf)
    return k4(fp, t, z0, z1, a, a_is_one)


def mul_step(fp: FourStepPlan, t: FourStepTables, x0, x1, u0, u1,
             cin0, cin1, a):
    """dst = dst * multiplicand(u) * a; u is a spectral pair in the
    layout fwd_step produces (AX-shaped under the fused path, AY else)."""
    wf = _wfold_ok(fp, t)
    x0, x1 = inject_block_carries(fp, x0, x1, cin0, cin1)
    if _fused_ok(fp, t):
        mf, mi = _fused_mid_tabs(t)
        s0, s1 = _forward_r(fp, t, x0, x1, wfold=wf, mid_tab=mf)
        s0, s1 = fused_c_pass(fp, t, s0, s1, "mul", u=(u0, u1))
        z0, z1 = _inverse_r(fp, t, s0, s1, wfold=wf, mid_inv_tab=mi)
        return k4(fp, t, z0, z1, a)
    s0, s1 = _forward_r(fp, t, x0, x1, wfold=wf)
    y0 = _to_ay(fp, s0)
    y1 = _to_ay(fp, s1)
    y0, y1 = _middle(fp, t, y0, y1, "mul", u=(u0, u1), wfold=wf)
    z0 = _to_ax(fp, y0)
    z1 = _to_ax(fp, y1)
    z0, z1 = _inverse_r(fp, t, z0, z1, wfold=wf)
    return k4(fp, t, z0, z1, a)


def fwd_step(fp: FourStepPlan, t: FourStepTables, x0, x1, cin0, cin1):
    """Forward transform only (multiplicand preparation); spectral out —
    AX-shaped under the fused path, AY-layout otherwise."""
    wf = _wfold_ok(fp, t)
    x0, x1 = inject_block_carries(fp, x0, x1, cin0, cin1)
    if _fused_ok(fp, t):
        mf, _mi = _fused_mid_tabs(t)
        s0, s1 = _forward_r(fp, t, x0, x1, wfold=wf, mid_tab=mf)
        return fused_c_pass(fp, t, s0, s1, "fwd")
    s0, s1 = _forward_r(fp, t, x0, x1, wfold=wf)
    y0 = _to_ay(fp, s0)
    y1 = _to_ay(fp, s1)
    return _middle(fp, t, y0, y1, "fwd", wfold=wf)
