"""Pallas TPU kernels for the four-step IBDWT squaring pipeline.

Pipeline per squaring (state = u32-pair digit arrays in AX layout):

  K1  (grid cb): carry-wrap inject + weights + forward R-column transform
      + mid twiddle                                   [AX -> AX spectral-R]
  T   XLA transpose (R, C) -> (C, R)                  [AX -> AY]
  K2  (grid rb): forward C transform + dyadic square (or multiplicand mul)
      + inverse C transform                           [AY -> AY]
  T'  XLA transpose back                              [AY -> AX]
  K3  (grid cb): inverse mid + inverse R transform + inverse weights
      (x 1/n folded) + canonicalize                   [-> exact conv digits]
  K4  (grid r1, sequential): two-phase carry with in-tile settle loop; the
      final wraparound carry is returned as a scalar and injected by the
      next iteration's K1 (2^p ≡ 1 mod M_p).

The reference's equivalent is the engine_gpu dispatch of forward/sqr/
backward/carry kernels (reference: include/marin/engine_gpu.h:1568-1630,
kernels/marin.cl:1696-2414); the decomposition here is re-designed for the
TPU tiling model (see fourstep.py docstring).
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
from .fourstep import FourStepPlan, FourStepTables

g = GL(jnp)

LANES = 128
G = 8
VMEM_LIMIT = 100 * 1024 * 1024


def _cparams(**kw):
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT, **kw)


# ---------------------------------------------------------------------------
# K1: weights + forward R transform + mid twiddle (+ carry wrap inject)
# ---------------------------------------------------------------------------

def _k1_kernel(fp: FourStepPlan, x0_ref, x1_ref,
               w0_ref, w1_ref, tr0_ref, tr1_ref, m0_ref, m1_ref,
               o0_ref, o1_ref):
    R1, R2 = fp.rs.L1, fp.rs.L2
    LN = x0_ref.shape[-1]
    sh = (R1, R2 * G, LN)
    x0 = x0_ref[:].reshape(sh)
    x1 = x1_ref[:].reshape(sh)
    w0 = w0_ref[:].reshape(sh)
    w1 = w1_ref[:].reshape(sh)
    x0, x1 = g.mul(x0, x1, w0, w1)
    x0, x1 = fsm.col_transform(g, x0, x1, fp.rs, tr0_ref[:], tr1_ref[:],
                               G, False)
    m0 = m0_ref[:].reshape(sh)
    m1 = m1_ref[:].reshape(sh)
    x0, x1 = g.mul(x0, x1, m0, m1)
    o0_ref[:] = x0.reshape(x0_ref.shape)
    o1_ref[:] = x1.reshape(x1_ref.shape)


# ---------------------------------------------------------------------------
# K2: forward C + square/mul + inverse C
# ---------------------------------------------------------------------------

def _k2_kernel(fp: FourStepPlan, mode: str, *refs):
    if mode == "mul":
        (y0_ref, y1_ref, u0_ref, u1_ref, tc0_ref, tc1_ref,
         tci0_ref, tci1_ref, o0_ref, o1_ref) = refs
    else:
        (y0_ref, y1_ref, tc0_ref, tc1_ref, tci0_ref, tci1_ref,
         o0_ref, o1_ref) = refs
    C1, C2 = fp.cs.L1, fp.cs.L2
    LN2 = y0_ref.shape[-1]
    sh = (C1, C2 * G, LN2)
    x0 = y0_ref[:].reshape(sh)
    x1 = y1_ref[:].reshape(sh)
    x0, x1 = fsm.col_transform(g, x0, x1, fp.cs, tc0_ref[:], tc1_ref[:],
                               G, False)
    if mode == "sqr":
        x0, x1 = g.sqr(x0, x1)
    elif mode == "mul":
        u0 = u0_ref[:].reshape(sh)
        u1 = u1_ref[:].reshape(sh)
        x0, x1 = g.mul(x0, x1, u0, u1)
    elif mode == "fwd":
        pass  # spectral output (multiplicand preparation)
    if mode != "fwd":
        x0, x1 = fsm.col_transform(g, x0, x1, fp.cs, tci0_ref[:],
                                   tci1_ref[:], G, True)
    o0_ref[:] = x0.reshape(y0_ref.shape)
    o1_ref[:] = x1.reshape(y1_ref.shape)


# ---------------------------------------------------------------------------
# K3: inverse mid + inverse R + inverse weights (+canon)
# ---------------------------------------------------------------------------

def _k3_kernel(fp: FourStepPlan, z0_ref, z1_ref, mi0_ref, mi1_ref,
               tri0_ref, tri1_ref, iw0_ref, iw1_ref, o0_ref, o1_ref):
    R1, R2 = fp.rs.L1, fp.rs.L2
    LN = z0_ref.shape[-1]
    sh = (R1, R2 * G, LN)
    x0 = z0_ref[:].reshape(sh)
    x1 = z1_ref[:].reshape(sh)
    m0 = mi0_ref[:].reshape(sh)
    m1 = mi1_ref[:].reshape(sh)
    x0, x1 = g.mul(x0, x1, m0, m1)
    x0, x1 = fsm.col_transform(g, x0, x1, fp.rs, tri0_ref[:], tri1_ref[:],
                               G, True)
    i0 = iw0_ref[:].reshape(sh)
    i1 = iw1_ref[:].reshape(sh)
    x0, x1 = g.mul(x0, x1, i0, i1)
    x0, x1 = g.canon(x0, x1)
    o0_ref[:] = x0.reshape(z0_ref.shape)
    o1_ref[:] = x1.reshape(z1_ref.shape)


# ---------------------------------------------------------------------------
# K4: carry normalization (sequential grid over r1 blocks)
# ---------------------------------------------------------------------------

def _k4_kernel(fp: FourStepPlan, rounds: int,
               a0_ref, a1_ref, y0_ref, y1_ref, wd_ref, mk0_ref, mk1_ref,
               o0_ref, o1_ref, co0_ref, co1_ref, carry0, carry1):
    """Tile = (R2, CB, G, LN) digits in order (r2, cb, s, l). Multiplies by
    the small scalar a (PRP x3 steps, reference 'mul by a' carry operand),
    splits digit/carry by variable widths, and propagates carries along the
    digit order with roll chains; the running inter-tile carry lives in
    SMEM scratch (grid executes sequentially on one core)."""
    xp = jnp
    sh4 = y0_ref.shape[1:]  # block has a leading 1 (r1 grid dim)
    y0 = y0_ref[:].reshape(sh4)
    y1 = y1_ref[:].reshape(sh4)
    wd = wd_ref[:].reshape(sh4)
    mk0 = mk0_ref[:].reshape(sh4)
    mk1 = mk1_ref[:].reshape(sh4)

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry0[0] = jnp.uint32(0)
        carry1[0] = jnp.uint32(0)

    # y * a (a < 2^32; exact since y < max_word << 2^57 and a small)
    a = a0_ref[0, 0]

    y0, y1 = g.mul_small(y0, y1, a)
    y0, y1 = g.canon(y0, y1)

    # split: d = y & mask, c = y >> width  (variable per-digit width)
    rem = jnp.uint32(31) - wd

    def split(y0, y1):
        d0 = y0 & mk0
        d1 = y1 & mk1
        c0 = (y0 >> wd) | (((y1 << jnp.uint32(1)) << rem) &
                           jnp.uint32(0xFFFFFFFF))
        c1 = y1 >> wd
        return d0, d1, c0, c1

    d0, d1, c0, c1 = split(y0, y1)

    def shift_one(c0, c1, in0, in1):
        """Shift carries to the next digit in (r2, cb, s, l) order; the
        carry leaving the tile's last digit is returned, and (in0,in1)
        enters at digit 0."""
        # extract the tile's last-digit carry before rolling (static
        # slices; scalar int indexing lowers to dynamic_slice in Mosaic)
        out0 = c0[-1:, -1:, -1:, -1:].reshape(())
        out1 = c1[-1:, -1:, -1:, -1:].reshape(())

        def sh(c, inject):
            A = pltpu.roll(c, jnp.int32(1), axis=3)          # from l-1
            B = pltpu.roll(A, jnp.int32(1), axis=2)          # from s-1,l=L-1
            Cc = pltpu.roll(B, jnp.int32(1), axis=1)         # from cb-1
            D = pltpu.roll(Cc, jnp.int32(1), axis=0)         # from r2-1
            l_ = lax.broadcasted_iota(jnp.int32, c.shape, 3)
            s_ = lax.broadcasted_iota(jnp.int32, c.shape, 2)
            b_ = lax.broadcasted_iota(jnp.int32, c.shape, 1)
            r_ = lax.broadcasted_iota(jnp.int32, c.shape, 0)
            x = jnp.where(l_ > 0, A,
                          jnp.where(s_ > 0, B,
                                    jnp.where(b_ > 0, Cc,
                                              jnp.where(r_ > 0, D, inject))))
            return x

        n0 = sh(c0, in0)
        n1 = sh(c1, in1)
        return n0, n1, out0, out1

    # round 1: inject inter-tile carry-in
    acc_out0 = jnp.uint32(0)
    acc_out1 = jnp.uint32(0)
    c0, c1, o0c, o1c = shift_one(c0, c1, carry0[0], carry1[0])
    # carry-out accumulates exactly (the out of round k adds to digit 0 of
    # the next tile after k-1 settle rounds there; we sum outs as a 64-bit
    # value since subsequent rounds' outs are the *carry of the carry*)
    s0, cc = g.addc(acc_out0, o0c)
    acc_out0 = s0
    acc_out1 = acc_out1 + o1c + cc
    y0, yc = g.addc(d0, c0)
    y1 = d1 + c1 + yc
    d0, d1, c0, c1 = split(y0, y1)

    def more_rounds(state):
        d0, d1, c0, c1, a0_, a1_ = state
        c0, c1, o0c, o1c = shift_one(c0, c1, jnp.uint32(0), jnp.uint32(0))
        s0, cc = g.addc(a0_, o0c)
        a1_ = a1_ + o1c + cc
        y0, yc = g.addc(d0, c0)
        y1 = d1 + c1 + yc
        d0, d1, c0, c1 = split(y0, y1)
        return d0, d1, c0, c1, s0, a1_

    def has_carry(state):
        d0, d1, c0, c1, _, _ = state
        # (jnp.any / unsigned reductions don't lower in Mosaic; use i32 max)
        nz = jnp.where((c0 | c1) != jnp.uint32(0), jnp.int32(1),
                       jnp.int32(0))
        return jnp.max(nz) > 0

    state = (d0, d1, c0, c1, acc_out0, acc_out1)
    for _ in range(rounds - 1):
        state = more_rounds(state)
    state = lax.while_loop(has_carry, more_rounds, state)
    d0, d1, c0, c1, acc_out0, acc_out1 = state

    o0_ref[:] = d0.reshape(o0_ref.shape)
    o1_ref[:] = d1.reshape(o1_ref.shape)
    carry0[0] = acc_out0
    carry1[0] = acc_out1
    # last grid step's value is the mod-M_p wraparound carry
    co0_ref[0, 0] = acc_out0
    co1_ref[0, 0] = acc_out1


# ---------------------------------------------------------------------------
# pallas_call wrappers (jitted pipeline)
# ---------------------------------------------------------------------------

def _blk(shape5, dims):
    """BlockSpec over the AX/AY 5D arrays blocking only the grid dim.

    Zeros in the index map are derived from the loop index so every value
    is i32 — literal python 0s trace as i64 under jax_enable_x64 and break
    Mosaic's func.return legalization."""
    R1, R2, CB, Gx, LN = shape5
    return pl.BlockSpec((R1, R2, 1, Gx, LN),
                        lambda i: (i * 0, i * 0, i, i * 0, i * 0),
                        memory_space=pltpu.VMEM)


def _full(shape):
    """Whole-array VMEM spec with an explicit all-i32 index map (default
    index maps emit i64 literals under jax_enable_x64 and break Mosaic)."""
    nd = len(shape)
    return pl.BlockSpec(tuple(shape),
                        lambda i: tuple(i * 0 for _ in range(nd)),
                        memory_space=pltpu.VMEM)


def inject_carry(fp: FourStepPlan, x0, x1, cin0, cin1):
    """Fold the wraparound carry back into the low digits (XLA glue).

    The carry is spread base-2^width over the first few digit positions so
    no digit grows beyond ~2^(w+1) — injecting it all into digit 0 would
    make digit0^2 exceed the field modulus in the next convolution.
    """
    cin = (cin0[0, 0].astype(jnp.uint64) |
           (cin1[0, 0].astype(jnp.uint64) << jnp.uint64(32)))
    widths = fp.widths
    # number of leading digits needed to absorb a 64-bit carry
    k, acc = 0, 0
    while acc < 64:
        acc += int(widths[k])
        k += 1
    sh = x0.shape
    LN = sh[4]
    rem = cin
    for j in range(k):
        w = jnp.uint64(int(widths[j]))
        part = jnp.where(jnp.uint64(j) < jnp.uint64(k - 1),
                         rem & ((jnp.uint64(1) << w) - jnp.uint64(1)), rem)
        rem = rem >> w
        # digit j lives at flat c-position j: (cb=0, s=j//LN, l=j%LN)
        s_, l_ = divmod(j, LN)
        lo = x0[0, 0, 0, s_, l_].astype(jnp.uint64)
        hi = x1[0, 0, 0, s_, l_].astype(jnp.uint64)
        v = (lo | (hi << jnp.uint64(32))) + part
        x0 = x0.at[0, 0, 0, s_, l_].set(
            (v & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))
        x1 = x1.at[0, 0, 0, s_, l_].set(
            (v >> jnp.uint64(32)).astype(jnp.uint32))
    return x0, x1


def k1(fp: FourStepPlan, t: FourStepTables, x0, x1):
    sh = x0.shape
    CB = sh[2]
    kern = functools.partial(_k1_kernel, fp)
    return pl.pallas_call(
        kern,
        grid=(CB,),
        in_specs=[
            _blk(sh, None), _blk(sh, None),       # x pair
            _blk(sh, None), _blk(sh, None),       # w pair
            _full(t.t_r[0].shape), _full(t.t_r[1].shape),
            _blk(sh, None), _blk(sh, None),       # mid pair
        ],
        out_specs=(_blk(sh, None), _blk(sh, None)),
        out_shape=(jax.ShapeDtypeStruct(sh, jnp.uint32),
                   jax.ShapeDtypeStruct(sh, jnp.uint32)),
        compiler_params=_cparams(),
    )(x0, x1, t.w[0], t.w[1], t.t_r[0], t.t_r[1],
      t.mid[0], t.mid[1])


def k2(fp: FourStepPlan, t: FourStepTables, y0, y1, mode: str,
       u0=None, u1=None):
    sh = y0.shape
    RB = sh[2]
    kern = functools.partial(_k2_kernel, fp, mode)
    ins = [y0, y1]
    in_specs = [_blk(sh, None), _blk(sh, None)]
    if mode == "mul":
        ins += [u0, u1]
        in_specs += [_blk(sh, None), _blk(sh, None)]
    ins += [t.t_c[0], t.t_c[1], t.t_c_inv[0], t.t_c_inv[1]]
    in_specs += [_full(t.t_c[0].shape), _full(t.t_c[1].shape),
                 _full(t.t_c_inv[0].shape), _full(t.t_c_inv[1].shape)]
    return pl.pallas_call(
        kern,
        grid=(RB,),
        in_specs=in_specs,
        out_specs=(_blk(sh, None), _blk(sh, None)),
        out_shape=(jax.ShapeDtypeStruct(sh, jnp.uint32),
                   jax.ShapeDtypeStruct(sh, jnp.uint32)),
        compiler_params=_cparams(),
    )(*ins)


def k3(fp: FourStepPlan, t: FourStepTables, z0, z1):
    sh = z0.shape
    CB = sh[2]
    kern = functools.partial(_k3_kernel, fp)
    return pl.pallas_call(
        kern,
        grid=(CB,),
        in_specs=[_blk(sh, None), _blk(sh, None),
                  _blk(sh, None), _blk(sh, None),
                  _full(t.t_r_inv[0].shape), _full(t.t_r_inv[1].shape),
                  _blk(sh, None), _blk(sh, None)],
        out_specs=(_blk(sh, None), _blk(sh, None)),
        out_shape=(jax.ShapeDtypeStruct(sh, jnp.uint32),
                   jax.ShapeDtypeStruct(sh, jnp.uint32)),
        compiler_params=_cparams(),
    )(z0, z1, t.mid_inv[0], t.mid_inv[1], t.t_r_inv[0], t.t_r_inv[1],
      t.iw[0], t.iw[1])


def k4(fp: FourStepPlan, t: FourStepTables, y0, y1, a):
    """Carry pass: grid over r1 (sequential); returns digits + wrap carry."""
    sh = y0.shape
    R1 = sh[0]
    # static pre-rounds until carries provably fit one digit, then while
    wmin = int(fp.widths.min())
    rounds = 1
    bound = fp.max_word * 4  # a fits 2 bits typically; exact loop follows
    while bound >> (rounds * wmin) > 1:
        rounds += 1
    kern = functools.partial(_k4_kernel, fp, max(rounds, 2))

    def rblk(i):
        return (i, i * 0, i * 0, i * 0, i * 0)

    bs = pl.BlockSpec((1,) + sh[1:], rblk, memory_space=pltpu.VMEM)
    smem11 = pl.BlockSpec((1, 1), lambda i: (i * 0, i * 0),
                          memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kern,
        grid=(R1,),
        in_specs=[smem11, smem11, bs, bs, bs, bs, bs],
        out_specs=(bs, bs, smem11, smem11),
        out_shape=(jax.ShapeDtypeStruct(sh, jnp.uint32),
                   jax.ShapeDtypeStruct(sh, jnp.uint32),
                   jax.ShapeDtypeStruct((1, 1), jnp.uint32),
                   jax.ShapeDtypeStruct((1, 1), jnp.uint32)),
        scratch_shapes=[pltpu.SMEM((1,), jnp.uint32),
                        pltpu.SMEM((1,), jnp.uint32)],
        compiler_params=_cparams(),
    )(a[0], a[1], y0, y1, t.widths32, t.masks_lo, t.masks_hi)


# ---------------------------------------------------------------------------
# Full squaring step (XLA glue: transposes between kernels)
# ---------------------------------------------------------------------------

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


def square_step(fp: FourStepPlan, t: FourStepTables, x0, x1,
                cin0, cin1, a):
    """One full (x^2 * a) iteration. Returns (d0, d1, cout0, cout1)."""
    x0, x1 = inject_carry(fp, x0, x1, cin0, cin1)
    s0, s1 = k1(fp, t, x0, x1)
    y0 = _to_ay(fp, s0)
    y1 = _to_ay(fp, s1)
    y0, y1 = k2(fp, t, y0, y1, "sqr")
    z0 = _to_ax(fp, y0)
    z1 = _to_ax(fp, y1)
    z0, z1 = k3(fp, t, z0, z1)
    return k4(fp, t, z0, z1, a)


def mul_step(fp: FourStepPlan, t: FourStepTables, x0, x1, u0, u1,
             cin0, cin1, a):
    """dst = dst * multiplicand(u) * a; u is an AY-layout spectral pair."""
    x0, x1 = inject_carry(fp, x0, x1, cin0, cin1)
    s0, s1 = k1(fp, t, x0, x1)
    y0 = _to_ay(fp, s0)
    y1 = _to_ay(fp, s1)
    y0, y1 = k2(fp, t, y0, y1, "mul", u0, u1)
    z0 = _to_ax(fp, y0)
    z1 = _to_ax(fp, y1)
    z0, z1 = k3(fp, t, z0, z1)
    return k4(fp, t, z0, z1, a)


def fwd_step(fp: FourStepPlan, t: FourStepTables, x0, x1, cin0, cin1):
    """Forward transform only (multiplicand preparation), AY spectral out."""
    x0, x1 = inject_carry(fp, x0, x1, cin0, cin1)
    s0, s1 = k1(fp, t, x0, x1)
    y0 = _to_ay(fp, s0)
    y1 = _to_ay(fp, s1)
    return k2(fp, t, y0, y1, "fwd")
