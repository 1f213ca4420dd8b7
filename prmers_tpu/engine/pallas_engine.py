"""Pallas-kernel engine — the fast TPU compute path of the Engine API.

Registers live as u32-pair 5D arrays in the kernel AX layout (see
ops/pallas/fourstep.py) plus a deferred (1,1) wraparound-carry pair: the
mod-M_p fold of each squaring is injected into the *next* op that consumes
the register, mirroring the reference's two-phase carry where phase 2 rides
the following kernel (reference: kernels/marin.cl:1696-2414).

Hot ops (square_mul / mul / set_multiplicand) run the fused Pallas pipeline;
sequences run under lax.scan so a whole Gerbicz block is one dispatch
(reference hot loop: src/modes/RunPrpOrLlMarin.cpp:295-458). Linear ops
(add/sub) are XLA elementwise + carry in the digit domain — off the hot
path for PRP/LL, adequate for P-1/ECM round 1.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np

from .. import jaxconf  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

from ..core.field import FieldOps
from ..core.plan import Plan, cached_plan
from ..ops import carry as carry_ops
from ..ops.pallas import fourstep as fsm
from ..ops.pallas import kernels as kn
from ..ops.pallas.fourstep import FourStepPlan, FourStepTables
from ..utils import digits as dg
from .api import Engine, Reg

F = FieldOps(jnp)

_TABLES_CACHE: dict = {}


def _get_tables(p: int, n: int):
    key = (p, n)
    if key not in _TABLES_CACHE:
        plan = cached_plan(p, n) if n else cached_plan(p)
        fp = FourStepPlan.from_plan(plan)
        # widths ride as a jit ARGUMENT: closed over, the n-sized array
        # becomes an HLO constant and the remote compiler rejects the
        # program at n = 5*2^25 (HTTP 413)
        t = jax.jit(lambda w: FourStepTables.build(
            fp, jnp, G=kn.G, lanes=kn.LANES, widths_arr=w))(
                fp.widths.astype(np.uint32))
        fsm.attach_mxu_tables(t, device_put=jax.device_put)
        import os
        if not os.environ.get("PRMERS_NO_FUSE"):
            fsm.attach_fused_c_tables(t, device_put=jax.device_put)
        kn.attach_cinrow(t, device_put=jax.device_put)
        if kn._fused_ok(fp, t):
            # every fused pipeline (row-carry, block-carry, xla-carry
            # hybrid) consumes only the FOLDED tables (weights inside
            # the P1/P7 MXU variants, mids as mf/mi copies): the
            # unfolded w/iw/mid/mid_inv pairs are dead weight — 5.4 GB
            # of HBM at MM31's n = 5*2^25, which alone OOMed the device
            # (found by the MM31 golden)
            t.w = t.iw = t.mid = t.mid_inv = None
        jax.block_until_ready([x for x in jax.tree_util.tree_leaves(t)
                               if x is not None])
        # widths ride as the u32 table copy (t.widths32); op_settle and
        # op_linear cast transiently and derive masks in-flight — the
        # resident u64 widths+masks pair alone was 2.7 GB at MM31's n
        _TABLES_CACHE[key] = (fp, t)
    return _TABLES_CACHE[key]


# ---------------------------------------------------------------------------
# jitted ops (tables passed as pytree args -> shared across instances)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0, donate_argnums=(2, 3))
def op_square_seq(fp: FourStepPlan, t: FourStepTables, x0, x1, c0, c1,
                  a_vec0):
    """Chain of squarings with per-step small multiplier (scanned)."""
    def body(state, a):
        x0, x1, c0, c1 = state
        ap = (a.reshape(1, 1), jnp.zeros((1, 1), jnp.uint32))
        d0, d1, o0, o1 = kn.square_step(fp, t, x0, x1, c0, c1, ap)
        return (d0, d1, o0, o1), None

    state, _ = lax.scan(body, (x0, x1, c0, c1), a_vec0)
    return state


@functools.partial(jax.jit, static_argnums=0, donate_argnums=(2, 3))
def op_square_seq_ones(fp: FourStepPlan, t: FourStepTables, x0, x1, c0, c1,
                      count):
    """Pure-squaring chain (a == 1 throughout): the carry kernel runs its
    statically multiplier-free variant (the PRP hot loop)."""
    one = (jnp.ones((1, 1), jnp.uint32), jnp.zeros((1, 1), jnp.uint32))

    def body(i, state):
        x0, x1, c0, c1 = state
        return kn.square_step(fp, t, x0, x1, c0, c1, one, a_is_one=True)

    return lax.fori_loop(0, count, body, (x0, x1, c0, c1))


@functools.partial(jax.jit, static_argnums=0, donate_argnums=(2, 3))
def op_square_sub2_seq(fp: FourStepPlan, t: FourStepTables, x0, x1, c0,
                       c1, count):
    """LL chain: x <- x^2 - 2 per step, the -2 FUSED into the carry
    kernel (kn._p7c_kernel sub2). Before this, every LL iteration paid
    op_settle + op_linear — two full HBM digit passes — on top of the
    3-kernel squaring (reference fuses it the same way,
    kernels/marin.cl:1696-2414)."""
    one = (jnp.ones((1, 1), jnp.uint32), jnp.zeros((1, 1), jnp.uint32))

    def body(i, state):
        return kn.square_step(fp, t, *state, one, a_is_one=True,
                              sub2=True)

    return lax.fori_loop(0, count, body, (x0, x1, c0, c1))


@functools.partial(jax.jit, static_argnums=0, donate_argnums=(2, 3))
def op_square_chain(fp: FourStepPlan, t: FourStepTables, x0, x1, c0, c1,
                    a_pad, count):
    """Whole chain in ONE kernel (small/mid n): data, carries, and every
    table stay VMEM-resident across the iterations. a_pad is the fixed
    CHAIN_K-long multiplier buffer; count is the dynamic trip count, so
    one compile serves every chain length."""
    return kn.square_chain(fp, t, x0, x1, c0, c1, a_pad, count)


@functools.partial(jax.jit, static_argnums=0, donate_argnums=(2, 3))
def op_square_one(fp: FourStepPlan, t: FourStepTables, x0, x1, c0, c1, a):
    ap = (a.reshape(1, 1), jnp.zeros((1, 1), jnp.uint32))
    return kn.square_step(fp, t, x0, x1, c0, c1, ap)


@functools.partial(jax.jit, static_argnums=0, donate_argnums=(2, 3))
def op_mul(fp: FourStepPlan, t: FourStepTables, x0, x1, u0, u1, c0, c1, a):
    ap = (a.reshape(1, 1), jnp.zeros((1, 1), jnp.uint32))
    return kn.mul_step(fp, t, x0, x1, u0, u1, c0, c1, ap)


@functools.partial(jax.jit, static_argnums=0)
def op_fwd(fp: FourStepPlan, t: FourStepTables, x0, x1, c0, c1):
    return kn.fwd_step(fp, t, x0, x1, c0, c1)


def _pairs_to_u64(x0, x1, n):
    return (x0.astype(jnp.uint64) |
            (x1.astype(jnp.uint64) << jnp.uint64(32))).reshape(n)


def _u64_to_pairs(y, shape5):
    return ((y & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32).reshape(shape5),
            (y >> jnp.uint64(32)).astype(jnp.uint32).reshape(shape5))


@functools.partial(jax.jit, static_argnums=0)
def op_settle(n: int, widths32, x0, x1, c0, c1):
    """Fold the pending boundary carries (rolled: block/row b's carry
    enters b+1, last wraps to 0) and renormalize (XLA). Carry state is
    either the per-r1-block vector ((R1, 1) pair) or the row-carry
    pipeline's per-row block ((R1, R2, 128) pair, value in lane 0)."""
    sh5 = x0.shape
    y = _pairs_to_u64(x0, x1, n)
    if c0.ndim == 3:
        # (R1, R2, T*128) carry units, value in lane 0 of each unit
        rows = c0.shape[0] * c0.shape[1] * (c0.shape[2] // 128)
        cin = (c0.reshape(rows, 128)[:, 0].astype(jnp.uint64) |
               (c1.reshape(rows, 128)[:, 0].astype(jnp.uint64)
                << jnp.uint64(32)))
    else:
        rows = c0.shape[0]
        cin = (c0[:, 0].astype(jnp.uint64) |
               (c1[:, 0].astype(jnp.uint64) << jnp.uint64(32)))
    cin = jnp.roll(cin, 1)
    starts = jnp.arange(rows, dtype=jnp.int32) * (n // rows)
    y = y.at[starts].add(cin)  # < P each: carry_full renormalizes
    d = carry_ops.carry_full(F, y, widths32.reshape(n), None, 1, lax=lax)
    return _u64_to_pairs(d, sh5)


@functools.partial(jax.jit, static_argnums=0)
def op_linear(n: int, widths32, x0, x1, y0, y1, coef_y, const_vec):
    """digits(x) + coef_y * digits_or_comp(y) + const_vec, renormalized.

    coef_y: +1 -> add, -1 -> add (masks - y) i.e. subtract (y settled).
    """
    sh5 = x0.shape
    widths = widths32.reshape(n).astype(jnp.uint64)
    masks = (jnp.uint64(1) << widths) - jnp.uint64(1)
    a = _pairs_to_u64(x0, x1, n)
    b = _pairs_to_u64(y0, y1, n)
    b = jnp.where(coef_y < 0, masks - b, b)
    zero = jnp.uint64(0)
    b = jnp.where(coef_y == 0, zero, b)
    y = a + b + const_vec
    d = carry_ops.carry_full(F, y, widths, masks, 1, lax=lax)
    return _u64_to_pairs(d, sh5)


class PallasEngine(Engine):
    """Engine backed by the fused Pallas four-step pipeline."""

    def __init__(self, p: int, reg_count: int, plan: Plan | None = None):
        super().__init__(p, reg_count)
        self.plan = plan if plan is not None else cached_plan(p)
        self.fp, self.t = _get_tables(p, self.plan.n)
        self.n = self.plan.n
        sh = self.t.widths32.shape   # the AX register shell (R1, R2, C)
        self._sh = sh
        z5 = lambda: jnp.zeros(sh, jnp.uint32)  # noqa: E731
        self._r1 = self.fp.rs.L1
        # row-carry pipeline when its tables are live: carry state is the
        # per-row (R1, R2, 128) block; else the per-r1-block (R1, 1)
        self._rc = kn.use_rowcarry(self.fp, self.t)
        self._csh = ((self._r1, self.fp.rs.L2,
                      kn.carry_tiles(self.fp) * 128) if self._rc
                     else (self._r1, 1))
        # whole-chain VMEM kernel for shapes whose working set fits on
        # core: one dispatch per _SEQ_CHUNK squarings, zero HBM round
        # trips between iterations
        self._chain = kn.chain_ok(self.fp, self.t)
        # per-register state: [x0, x1, c0, c1, is_spectral]
        self.regs = [[z5(), z5(), self._zc(), self._zc(), False]
                     for _ in range(reg_count)]
        self._delta_cache: dict[int, jax.Array] = {}
        self._zero = None     # lazy: an n-sized u64 is 1.34 GB at MM31

    # -- helpers ----------------------------------------------------------
    @property
    def _zero_const(self):
        if self._zero is None:
            self._zero = jnp.zeros((self.n,), jnp.uint64)
        return self._zero

    def _zc(self):
        return jnp.zeros(self._csh, jnp.uint32)

    def _settled(self, r: Reg):
        st = self.regs[r]
        assert not st[4], "spectral register used as digits"
        x0, x1 = op_settle(self.n, self.t.widths32,
                           st[0], st[1], st[2], st[3])
        self.regs[r] = [x0, x1, self._zc(), self._zc(), False]
        return x0, x1

    def get_size(self) -> int:
        return self.n

    @property
    def widths(self) -> np.ndarray:
        return self.plan.widths

    # -- core ops ---------------------------------------------------------
    def set(self, dst: Reg, a: int) -> None:
        self.set_int(dst, a)

    def copy(self, dst: Reg, src: Reg) -> None:
        # Materialize REAL buffer copies: the hot ops donate their x0/x1
        # operands (donate_argnums), and donation DELETES the input
        # buffers on TPU — an aliased register (shared arrays) would
        # dangle and every later use dies with a TPU InvalidArgument.
        # CPU ignores donation, so only device runs see the difference
        # (found by the M756839 device PRP at the first GL boundary).
        st = self.regs[src]
        self.regs[dst] = [jnp.copy(st[0]), jnp.copy(st[1]),
                          jnp.copy(st[2]), jnp.copy(st[3]), st[4]]

    def square_mul(self, src: Reg, a: int = 1) -> None:
        st = self.regs[src]
        if self._chain:
            # same compiled whole-chain kernel, trip count 1
            pad = np.ones(kn.CHAIN_K, dtype=np.uint32)
            pad[0] = a
            out = op_square_chain(self.fp, self.t, st[0], st[1], st[2],
                                  st[3], jnp.asarray(pad), jnp.int32(1))
        else:
            out = op_square_one(self.fp, self.t, st[0], st[1], st[2],
                                st[3], jnp.full((1,), np.uint32(a)))
        self.regs[src] = [out[0], out[1], out[2], out[3], False]

    _SEQ_CHUNK = 512

    def square_mul_seq(self, src: Reg, a_vec: Sequence[int]) -> None:
        a = np.asarray(a_vec, dtype=np.uint32)
        k = self._SEQ_CHUNK
        off = 0
        st = self.regs[src]
        state = (st[0], st[1], st[2], st[3])
        if self._chain:
            # whole-chain kernel, one compile for every length: the a
            # buffer is fixed CHAIN_K long, the trip count is dynamic
            kc = kn.CHAIN_K
            while off < len(a):
                step = min(kc, len(a) - off)
                pad = np.ones(kc, dtype=np.uint32)
                pad[:step] = a[off:off + step]
                state = op_square_chain(self.fp, self.t, *state,
                                        jnp.asarray(pad),
                                        jnp.int32(step))
                off += step
            self.regs[src] = [state[0], state[1], state[2], state[3],
                              False]
            return
        if (a == 1).all():
            # PRP hot chain: statically multiplier-free carry kernel
            while off < len(a):
                step = min(k, len(a) - off)
                state = op_square_seq_ones(self.fp, self.t, *state,
                                           jnp.int32(step))
                off += step
            self.regs[src] = [state[0], state[1], state[2], state[3],
                              False]
            return
        while len(a) - off >= k:
            state = op_square_seq(self.fp, self.t, *state,
                                  jnp.asarray(a[off:off + k]))
            off += k
        if len(a) - off > 0:
            state = op_square_seq(self.fp, self.t, *state,
                                  jnp.asarray(a[off:]))
        self.regs[src] = [state[0], state[1], state[2], state[3], False]

    def square_sub2_seq(self, src: Reg, count: int) -> None:
        if not self._rc:
            super().square_sub2_seq(src, count)   # settle+linear path
            return
        st = self.regs[src]
        state = (st[0], st[1], st[2], st[3])
        k = self._SEQ_CHUNK
        off = 0
        while off < count:
            step = min(k, count - off)
            state = op_square_sub2_seq(self.fp, self.t, *state,
                                       jnp.int32(step))
            off += step
        self.regs[src] = [state[0], state[1], state[2], state[3], False]

    def set_multiplicand(self, dst: Reg, src: Reg) -> None:
        st = self.regs[src]
        assert not st[4]
        u0, u1 = op_fwd(self.fp, self.t, st[0], st[1], st[2], st[3])
        self.regs[dst] = [u0, u1, self._zc(), self._zc(), True]

    def mul(self, dst: Reg, src: Reg, a: int = 1) -> None:
        st = self.regs[dst]
        u = self.regs[src]
        assert u[4], "mul src must hold a multiplicand"
        out = op_mul(self.fp, self.t, st[0], st[1], u[0], u[1],
                     st[2], st[3], jnp.full((1,), np.uint32(a)))
        self.regs[dst] = [out[0], out[1], out[2], out[3], False]

    def add(self, dst: Reg, src: Reg) -> None:
        x0, x1 = self._settled(dst)
        y0, y1 = self._settled(src)
        r0, r1 = op_linear(self.n, self.t.widths32, x0, x1, y0, y1,
                           jnp.int32(1), self._zero_const)
        self.regs[dst] = [r0, r1, self._zc(), self._zc(), False]

    def sub_reg(self, dst: Reg, src: Reg) -> None:
        x0, x1 = self._settled(dst)
        y0, y1 = self._settled(src)
        r0, r1 = op_linear(self.n, self.t.widths32, x0, x1, y0, y1,
                           jnp.int32(-1), self._zero_const)
        self.regs[dst] = [r0, r1, self._zc(), self._zc(), False]

    def _delta_vec(self, a: int) -> jax.Array:
        if a not in self._delta_cache:
            mp = (1 << self.p) - 1
            self._delta_cache[a] = jnp.asarray(
                dg.int_to_digits(a % mp, self.widths))
        return self._delta_cache[a]

    def sub(self, src: Reg, a: int) -> None:
        mp = (1 << self.p) - 1
        self.add_small(src, mp - (a % mp))

    def add_small(self, src: Reg, a: int) -> None:
        x0, x1 = self._settled(src)
        r0, r1 = op_linear(self.n, self.t.widths32, x0, x1, x0, x1,
                           jnp.int32(0), self._delta_vec(a))
        self.regs[src] = [r0, r1, self._zc(), self._zc(), False]

    def sync(self) -> None:
        # block_until_ready does not reliably wait through the axon tunnel;
        # a scalar device->host fetch does.
        for st in self.regs:
            st[0].block_until_ready()
        np.asarray(self.regs[0][2])

    # -- host exchange ----------------------------------------------------
    def get_digits(self, src: Reg) -> np.ndarray:
        x0, x1 = self._settled(src)
        lo = np.asarray(x0).reshape(self.n).astype(np.uint64)
        hi = np.asarray(x1).reshape(self.n).astype(np.uint64)
        return lo | (hi << np.uint64(32))

    def set_digits(self, dst: Reg, digits: np.ndarray) -> None:
        d = np.asarray(digits, dtype=np.uint64)
        lo = (d & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (d >> np.uint64(32)).astype(np.uint32)
        self.regs[dst] = [jnp.asarray(lo.reshape(self._sh)),
                          jnp.asarray(hi.reshape(self._sh)),
                          self._zc(), self._zc(), False]

    def get_raw(self, src: Reg) -> np.ndarray:
        """Raw register dump for checkpoints: settle digit regs; spectral
        regs are dumped verbatim (AY layout), tagged via get_raw_tagged."""
        st = self.regs[src]
        if st[4]:
            lo = np.asarray(st[0]).reshape(self.n).astype(np.uint64)
            hi = np.asarray(st[1]).reshape(self.n).astype(np.uint64)
            return lo | (hi << np.uint64(32))
        return self.get_digits(src)

    def get_raw_tagged(self, src: Reg) -> tuple[np.ndarray, bool]:
        return self.get_raw(src), bool(self.regs[src][4])

    def set_raw(self, dst: Reg, data: np.ndarray) -> None:
        self.set_digits(dst, data)

    def set_raw_tagged(self, dst: Reg, data: np.ndarray,
                       spectral: bool = False) -> None:
        if not spectral:
            self.set_digits(dst, data)
            return
        # restore a multiplicand: the dump is the AY-layout spectral pair
        d = np.asarray(data, dtype=np.uint64)
        ay_sh = self._ay_shape()
        lo = (d & np.uint64(0xFFFFFFFF)).astype(np.uint32).reshape(ay_sh)
        hi = (d >> np.uint64(32)).astype(np.uint32).reshape(ay_sh)
        self.regs[dst] = [jnp.asarray(lo), jnp.asarray(hi),
                          self._zc(), self._zc(), True]

    def _ay_shape(self) -> tuple[int, ...]:
        """Shape of a spectral (multiplicand) register: the AX shell
        itself under the wide-lane fused pipeline."""
        return self._sh
