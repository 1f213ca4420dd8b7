"""MeshPallasEngine — the production Engine on the mesh-Pallas hot path.

Round 3 validated the fused-kernel sharded pipeline (sharded_pallas.py)
but left it driver-facing only: `backend="sharded"` handed modes the
slow XLA u64 four-step (VERDICT r3 missing #1). This engine implements
the FULL Engine op surface (reference contract:
include/marin/engine.h:36-146) over the sharded Pallas kernels, so
PRP/LL/P-1/ECM run on the fast multi-chip path:

  * hot ops (square_mul / square_mul_seq / set_multiplicand / mul) run
    the row-carry 3-kernel pipeline per shard with 4 ICI all-to-alls +
    a ppermute carry ring per squaring; whole Gerbicz blocks scan
    inside ONE dispatch (build_pallas_sharded_seq);
  * linear ops (add / sub / sub_reg / add_small) settle the deferred
    row carries on-mesh and run a digit-domain carry ring — cold ops,
    once per GL block, never in the iteration loop;
  * host exchange gathers through parallel.dist (multi-host safe).

Registers hold the kernel AX layout (R1, R2, C) as u32 pairs, r1-sharded
over the `limb` mesh axis, plus the deferred per-row carry block
(R1, R2, 128) — the same state the single-chip PallasEngine carries,
sharded.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

from .. import jaxconf  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..engine.api import Engine, Reg
from ..utils import digits as dg
from . import dist
from .sharded import LIMB, make_mesh, shard_map
from .sharded_pallas import (PallasShardedTables, _build_rowcarry_step,
                             build_pallas_sharded_seq,
                             build_pallas_sharded_seq_ones,
                             build_pallas_sharded_seq_sub2)


def mesh_pallas_eligible(p: int, n_devices: int | None = None,
                         n: int | None = None) -> bool:
    """Cheap shape probe: would MeshPallasEngine construct for (p, mesh)?
    Mirrors PallasShardedTables' requirements without building tables."""
    from ..core.plan import cached_plan
    from ..ops.pallas.fourstep import FourStepPlan
    try:
        plan = cached_plan(p, n) if n else cached_plan(p)
        fp = FourStepPlan.from_plan(plan)
    except AssertionError:
        return False
    from ..ops.pallas import kernels as kn
    if kn.use_xla_carry(fp):
        return False    # env-forced canonical-digit fallback only:
        # C = 8192 rides the lane-tiled carry (kn.carry_ct) since r5
    s = n_devices if n_devices else len(jax.devices())
    if fp.rs.L1 % s or fp.rs.L2 % s:
        return False
    C, ca = fp.C, fp.C // 128
    if C % 128 or fp.rs.L1 < 32 or ca < 2 or ca & (ca - 1) or ca > 64:
        return False
    return True


# ---------------------------------------------------------------------------
# settle + linear ops over the mesh (cold path: once per GL block)
# ---------------------------------------------------------------------------

def _ring_carry(y, wid, msk, s, absorb: int = 1):
    """Digit-domain carry propagation on a flat local u64 digit vector,
    cyclic across the shard ring (the last-shard -> shard-0 wrap IS the
    mod-M_p fold). O(absorb + log n), NOT one digit per round: the
    naive shifted-add loop needs a round per digit of the longest
    saturated run — sub(x, small) adds the ALL-ONES digits of M_p - a,
    so a sparse x degenerated to n rounds of collectives (~n = 2^19
    ppermutes; this was most of MULTICHIP_r04's 19-minute stall, not
    compiles). Two phases instead:

      A. `absorb` shifted-add rounds shrink multi-bit carries to <= 1
         (each round divides the carry by 2^wmin; the caller sizes
         `absorb` from the largest injected value).
      B. carry-lookahead: one more shifted add, then generate/propagate
         prefix within the shard (associative_scan) and a cyclic
         (G, P) resolution across the s shards (all_gather + s-step
         fixpoint — the all-P cycle resolves to no-carry, preserving
         the all-ones representation of 0 == M_p mod M_p)."""
    perm = [(i, (i + 1) % s) for i in range(s)]

    def ring_shift(c):
        recv = lax.ppermute(c[-1:], LIMB, perm)
        return jnp.concatenate([recv, c[:-1]])

    d = y & msk
    c = y >> wid
    for _ in range(absorb):
        t = d + ring_shift(c)
        c = t >> wid
        d = t & msk
    # phase B: c is now <= 1 everywhere
    t = d + ring_shift(c)
    g = (t >> wid) != jnp.uint64(0)         # generates a carry
    p = (t & msk) == msk                    # propagates an incoming one

    def comb(a, b):                         # segment A then segment B
        g1, p1 = a
        g2, p2 = b
        return g2 | (p2 & g1), p1 & p2

    G, Pf = lax.associative_scan(comb, (g, p))
    gs = lax.all_gather(G[-1], LIMB)        # (s,) per-shard aggregates
    ps = lax.all_gather(Pf[-1], LIMB)
    k = jnp.roll(gs, 1)                     # carry-in per shard, cyclic
    for _ in range(s - 1):
        k = jnp.roll(gs, 1) | (jnp.roll(ps, 1) & jnp.roll(k, 1))
    k0 = k[lax.axis_index(LIMB)]
    kin = jnp.concatenate([k0[None], G[:-1] | (Pf[:-1] & k0)])
    return (t + kin.astype(jnp.uint64)) & msk


def _pairs_flat_u64(x0, x1):
    return (x0.astype(jnp.uint64) |
            (x1.astype(jnp.uint64) << jnp.uint64(32))).reshape(-1)


def _unpack_pairs(d, sh):
    return ((d & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32).reshape(sh),
            (d >> jnp.uint64(32)).astype(jnp.uint32).reshape(sh))


def build_mesh_settle(tb: PallasShardedTables):
    """jitted (x0, x1, c0, c1, wid, msk) -> canonical (x0, x1): fold the
    deferred per-row carries (rolled by one row; wrap = mod-M_p fold)
    and renormalize the digits — the mesh analog of
    pallas_engine.op_settle."""
    s = tb.s
    # injected unit-head values are < 2^64; each absorb round divides
    # the carry by 2^wmin, so this bound settles phase A to <= 1
    wmin = int(tb.plan.widths.min())
    absorb = -(-64 // wmin) + 1

    def local(x0, x1, c0, c1, wid, msk):
        sh = x0.shape
        units = c0.shape[0] * c0.shape[1] * (c0.shape[2] // 128)
        ct = (sh[0] * sh[1] * sh[2]) // units   # digits per carry unit
        cc0 = c0.reshape(units, 128)[:, 0]
        cc1 = c1.reshape(units, 128)[:, 0]
        perm = [(i, (i + 1) % s) for i in range(s)]
        prev0 = lax.ppermute(cc0[-1:], LIMB, perm)
        prev1 = lax.ppermute(cc1[-1:], LIMB, perm)
        cc0 = jnp.concatenate([prev0, cc0[:-1]])
        cc1 = jnp.concatenate([prev1, cc1[:-1]])
        cin = (cc0.astype(jnp.uint64) |
               (cc1.astype(jnp.uint64) << jnp.uint64(32)))
        y = _pairs_flat_u64(x0, x1).reshape(units, ct)
        y = y.at[:, 0].add(cin)
        d = _ring_carry(y.reshape(-1), wid, msk, s, absorb=absorb)
        return _unpack_pairs(d, sh)

    vec3 = P(LIMB, None, None)
    vec = P(LIMB)
    fn = shard_map(local, mesh=tb.mesh,
                   in_specs=(vec3, vec3, vec3, vec3, vec, vec),
                   out_specs=(vec3, vec3), check_rep=False)
    return jax.jit(fn)


def build_mesh_linear(tb: PallasShardedTables):
    """jitted (x0, x1, y0, y1, coef_y, const_vec, wid, msk) -> (x0, x1):
    digits(x) + coef_y * digits_or_complement(y) + const_vec with the
    carry ring; operands must be settled (canonical digits)."""
    s = tb.s

    def local(x0, x1, y0, y1, coef_y, const_vec, wid, msk):
        sh = x0.shape
        a = _pairs_flat_u64(x0, x1)
        b = _pairs_flat_u64(y0, y1)
        b = jnp.where(coef_y < 0, msk - b, b)
        b = jnp.where(coef_y == 0, jnp.uint64(0), b)
        # a + b + const <= 3*msk: one absorb round leaves carries <= 1
        d = _ring_carry(a + b + const_vec, wid, msk, s, absorb=1)
        return _unpack_pairs(d, sh)

    vec3 = P(LIMB, None, None)
    vec = P(LIMB)
    fn = shard_map(local, mesh=tb.mesh,
                   in_specs=(vec3, vec3, vec3, vec3, P(), vec, vec, vec),
                   out_specs=(vec3, vec3), check_rep=False)
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# The engine
# ---------------------------------------------------------------------------

class MeshPallasEngine(Engine):
    """Engine over the sharded Pallas row-carry pipeline (see module
    docstring). Per-register state: [x0, x1, c0, c1, spectral] — u32
    pairs in the AX (R1, R2, C) layout r1-sharded over the mesh, plus
    the deferred (R1, R2, 128) row-carry block (None for spectral
    registers, which hold the fused-shell transform verbatim)."""

    backend_name = "sharded-pallas"
    _SEQ_CHUNK = 256

    def __init__(self, p: int, reg_count: int, mesh: Mesh | None = None,
                 n: int | None = None,
                 tables: PallasShardedTables | None = None):
        super().__init__(p, reg_count)
        if jax.devices()[0].platform == "cpu":
            # off-TPU the same kernels execute in Pallas interpret mode
            os.environ.setdefault("PRMERS_PALLAS_INTERPRET", "1")
        self.mesh = mesh if mesh is not None else make_mesh()
        if tables is not None:
            # share a prebuilt table set (and its compiled-program
            # cache): e.g. the multichip dryrun's PallasShardedStep and
            # this engine run the same shape — one compile bill
            assert tables.plan.p == p and tables.mesh is self.mesh
            self.tables = tables
        else:
            self.tables = PallasShardedTables(p, self.mesh, n=n)
        if not self.tables.rowcarry:
            raise ValueError("MeshPallasEngine needs the row-carry "
                             "pipeline (PRMERS_NO_ROWCARRY is set)")
        tb = self.tables
        self.fp = tb.fp
        self.plan = tb.plan
        self.n = self.fp.n
        self.mp = (1 << p) - 1
        self.sh = (self.fp.rs.L1, self.fp.rs.L2, self.fp.C)
        from ..ops.pallas import kernels as kn
        self._csh = (self.fp.rs.L1, self.fp.rs.L2,
                     kn.carry_tiles(self.fp) * 128)
        self._vec3 = P(LIMB, None, None)

        # flat-digit tables for the settle/linear ring (r1-major AX order
        # IS digit order, so plan.widths shards digit-contiguously)
        w64 = self.plan.widths.astype(np.uint64)
        self._wid = dist.put_global(w64, self.mesh, P(LIMB))
        self._msk = dist.put_global((np.uint64(1) << w64) - np.uint64(1),
                                    self.mesh, P(LIMB))

        self._settle = tb.prog("settle", lambda: build_mesh_settle(tb))
        self._linear = tb.prog("linear", lambda: build_mesh_linear(tb))

        self.regs = [[self._z3(), self._z3(), self._zc(), self._zc(),
                      False] for _ in range(reg_count)]
        self._delta_cache: dict[int, jax.Array] = {}
        self._zero_const = dist.put_global(
            np.zeros((self.n,), np.uint64), self.mesh, P(LIMB))

    # -- helpers ----------------------------------------------------------
    def _z3(self):
        return dist.put_global(np.zeros(self.sh, np.uint32), self.mesh,
                               self._vec3)

    def _zc(self):
        return dist.put_global(np.zeros(self._csh, np.uint32), self.mesh,
                               self._vec3)

    def _a_pair(self, a: int):
        return (jnp.full((1, 1), np.uint32(a & 0xFFFFFFFF)),
                jnp.full((1, 1), np.uint32(a >> 32)))

    def _settled(self, r: Reg):
        st = self.regs[r]
        assert not st[4], "spectral register used as digits"
        x0, x1 = self._settle(st[0], st[1], st[2], st[3],
                              self._wid, self._msk)
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
        # real buffer copies: the seq ops donate their operands, and
        # donation deletes the inputs on TPU — aliased registers would
        # dangle (same hazard PallasEngine.copy documents)
        st = self.regs[src]
        self.regs[dst] = [jnp.copy(v) if v is not None else None
                          for v in st[:4]] + [st[4]]

    def square_mul(self, src: Reg, a: int = 1) -> None:
        st = self.regs[src]
        assert not st[4]
        tb = self.tables
        if a == 1:
            step = tb.prog(("step", False, "sqr"),
                           lambda: _build_rowcarry_step(tb))
            out = step(st[0], st[1], st[2], st[3], tb.args())
        else:
            step_a = tb.prog(("step", True, "sqr"),
                             lambda: _build_rowcarry_step(tb,
                                                          with_a=True))
            out = step_a(st[0], st[1], st[2], st[3],
                         *self._a_pair(a), tb.args())
        self.regs[src] = [out[0], out[1], out[2], out[3], False]

    def square_mul_seq(self, src: Reg, a_vec: Sequence[int]) -> None:
        a = np.asarray(a_vec, dtype=np.uint32)
        st = self.regs[src]
        assert not st[4]
        tb = self.tables
        if os.environ.get("PRMERS_MESH_SEQ_STEPWISE"):
            # per-step programs instead of the scanned chain: the
            # multichip dryrun sets this so short verification chains
            # reuse the already-compiled single-step program rather
            # than paying an extra interpret-mode compile for the
            # scan/fori wrapper (production never sets it; the scanned
            # chain is covered by test_mesh_engine)
            for ai in a.tolist():
                self.square_mul(src, int(ai))
            return
        state = (st[0], st[1], st[2], st[3])
        k = self._SEQ_CHUNK
        off = 0
        if (a == 1).all():
            seq_ones = tb.prog(
                "seq_ones", lambda: build_pallas_sharded_seq_ones(tb))
            while off < len(a):
                step = min(k, len(a) - off)
                state = seq_ones(*state, jnp.int32(step), tb.args())
                off += step
        else:
            seq = tb.prog("seq", lambda: build_pallas_sharded_seq(tb))
            while off < len(a):
                step = min(k, len(a) - off)
                a0s = a[off:off + step].reshape(-1, 1, 1)
                a1s = np.zeros_like(a0s)
                state = seq(*state, jnp.asarray(a0s),
                            jnp.asarray(a1s), tb.args())
                off += step
        self.regs[src] = [state[0], state[1], state[2], state[3], False]

    def square_sub2_seq(self, src: Reg, count: int) -> None:
        """LL chain on the mesh with the -2 fused into the carry kernel
        (per-shard amount scalar); falls back to square+sub under the
        dryrun's stepwise mode."""
        if os.environ.get("PRMERS_MESH_SEQ_STEPWISE"):
            super().square_sub2_seq(src, count)
            return
        st = self.regs[src]
        assert not st[4]
        tb = self.tables
        seq = tb.prog("seq_sub2",
                      lambda: build_pallas_sharded_seq_sub2(tb))
        state = (st[0], st[1], st[2], st[3])
        k = self._SEQ_CHUNK
        off = 0
        while off < count:
            step = min(k, count - off)
            state = seq(*state, jnp.int32(step), tb.args())
            off += step
        self.regs[src] = [state[0], state[1], state[2], state[3], False]

    def set_multiplicand(self, dst: Reg, src: Reg) -> None:
        st = self.regs[src]
        assert not st[4]
        tb = self.tables
        fwd = tb.prog(("step", False, "fwd"),
                      lambda: _build_rowcarry_step(tb, mode="fwd"))
        u0, u1 = fwd(st[0], st[1], st[2], st[3], tb.args())
        self.regs[dst] = [u0, u1, None, None, True]

    def mul(self, dst: Reg, src: Reg, a: int = 1) -> None:
        st = self.regs[dst]
        u = self.regs[src]
        assert u[4], "mul src must hold a multiplicand"
        assert not st[4]
        tb = self.tables
        mul = tb.prog(("step", True, "mul"),
                      lambda: _build_rowcarry_step(tb, mode="mul",
                                                   with_a=True))
        out = mul(st[0], st[1], st[2], st[3], u[0], u[1],
                  *self._a_pair(a), tb.args())
        self.regs[dst] = [out[0], out[1], out[2], out[3], False]

    # -- linear ops (settled digit domain, carry ring) --------------------
    def _delta_vec(self, a: int) -> jax.Array:
        if a not in self._delta_cache:
            d = dg.int_to_digits(a % self.mp, self.widths)
            self._delta_cache[a] = dist.put_global(
                np.asarray(d), self.mesh, P(LIMB))
        return self._delta_cache[a]

    def add(self, dst: Reg, src: Reg) -> None:
        x0, x1 = self._settled(dst)
        y0, y1 = self._settled(src)
        r0, r1 = self._linear(x0, x1, y0, y1, jnp.int32(1),
                              self._zero_const, self._wid, self._msk)
        self.regs[dst] = [r0, r1, self._zc(), self._zc(), False]

    def sub_reg(self, dst: Reg, src: Reg) -> None:
        x0, x1 = self._settled(dst)
        y0, y1 = self._settled(src)
        r0, r1 = self._linear(x0, x1, y0, y1, jnp.int32(-1),
                              self._zero_const, self._wid, self._msk)
        self.regs[dst] = [r0, r1, self._zc(), self._zc(), False]

    def sub(self, src: Reg, a: int) -> None:
        self.add_small(src, self.mp - (a % self.mp))

    def add_small(self, src: Reg, a: int) -> None:
        x0, x1 = self._settled(src)
        r0, r1 = self._linear(x0, x1, x0, x1, jnp.int32(0),
                              self._delta_vec(a), self._wid, self._msk)
        self.regs[src] = [r0, r1, self._zc(), self._zc(), False]

    def sync(self) -> None:
        for st in self.regs:
            st[0].block_until_ready()

    # -- host exchange ----------------------------------------------------
    def get_digits(self, src: Reg) -> np.ndarray:
        x0, x1 = self._settled(src)
        lo = dist.global_gather(x0).reshape(self.n).astype(np.uint64)
        hi = dist.global_gather(x1).reshape(self.n).astype(np.uint64)
        return lo | (hi << np.uint64(32))

    def set_digits(self, dst: Reg, digits: np.ndarray) -> None:
        d = np.asarray(digits, dtype=np.uint64)
        lo = (d & np.uint64(0xFFFFFFFF)).astype(np.uint32).reshape(self.sh)
        hi = (d >> np.uint64(32)).astype(np.uint32).reshape(self.sh)
        self.regs[dst] = [dist.put_global(lo, self.mesh, self._vec3),
                          dist.put_global(hi, self.mesh, self._vec3),
                          self._zc(), self._zc(), False]

    def get_raw(self, src: Reg) -> np.ndarray:
        st = self.regs[src]
        if st[4]:
            lo = dist.global_gather(st[0]).reshape(self.n)
            hi = dist.global_gather(st[1]).reshape(self.n)
            return (lo.astype(np.uint64) |
                    (hi.astype(np.uint64) << np.uint64(32)))
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
        d = np.asarray(data, dtype=np.uint64)
        lo = (d & np.uint64(0xFFFFFFFF)).astype(np.uint32).reshape(self.sh)
        hi = (d >> np.uint64(32)).astype(np.uint32).reshape(self.sh)
        self.regs[dst] = [dist.put_global(lo, self.mesh, self._vec3),
                          dist.put_global(hi, self.mesh, self._vec3),
                          None, None, True]
