"""JAX device engine — the TPU compute path of the Engine API.

Registers live as one (reg_count, n) u64 slab on device (the analog of the
reference's register slab, reference: include/marin/engine_gpu.h:36-269).
Every op is a module-level jitted donated-state function taking the NTT tables
as a pytree argument, so compilations are shared across engine instances with
the same plan shape. `square_mul_seq` runs whole blocks of squarings in one
dispatch via lax.scan — the TPU equivalent of the reference's enqueue-only hot
loop (reference: src/modes/RunPrpOrLlMarin.cpp:295-458).
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np

from .. import jaxconf  # noqa: F401  (must precede jax.numpy use)
import jax
import jax.numpy as jnp
from jax import lax

from ..core.field import FieldOps
from ..core.plan import Plan, cached_plan
from ..ops import carry as carry_ops
from ..ops import ntt
from .api import Engine, Reg

F = FieldOps(jnp)


# ---------------------------------------------------------------------------
# Module-level ops (jit-cached across engines by table structure/shapes)
# ---------------------------------------------------------------------------

def _carry(t, y, a):
    return carry_ops.carry_full(F, y, t.widths, t.masks, a, lax=lax)


def _square(t, x, a):
    s = ntt.forward(F, t, x)
    y = ntt.inverse(F, t, F.sqr(s))
    return _carry(t, y, a)


@functools.partial(jax.jit, donate_argnums=0)
def op_square_mul(regs, t, src, a):
    return regs.at[src].set(_square(t, regs[src], a))


@functools.partial(jax.jit, donate_argnums=0)
def op_square_mul_seq(regs, t, src, a_vec):
    def body(x, a):
        return _square(t, x, a), None
    x, _ = lax.scan(body, regs[src], a_vec)
    return regs.at[src].set(x)


@functools.partial(jax.jit, donate_argnums=0)
def op_square_sub2_seq(regs, t, src, count, delta):
    def body(i, x):
        x = _square(t, x, jnp.uint64(1))
        return _carry(t, x + delta, 1)
    x = lax.fori_loop(0, count, body, regs[src])
    return regs.at[src].set(x)


@functools.partial(jax.jit, donate_argnums=0)
def op_copy(regs, src_dst):
    dst, src = src_dst
    return regs.at[dst].set(regs[src])


@functools.partial(jax.jit, donate_argnums=0)
def op_set_multiplicand(regs, t, dst, src):
    m = ntt.forward(F, t, regs[src]).reshape(t.n)
    return regs.at[dst].set(m)


@functools.partial(jax.jit, donate_argnums=0)
def op_mul(regs, t, dst, src, a):
    x = ntt.forward(F, t, regs[dst])
    m = regs[src].reshape(t.C, t.R)
    y = ntt.inverse(F, t, F.mul(x, m))
    return regs.at[dst].set(_carry(t, y, a))


@functools.partial(jax.jit, donate_argnums=0)
def op_add(regs, t, dst, src):
    return regs.at[dst].set(_carry(t, regs[dst] + regs[src], 1))


@functools.partial(jax.jit, donate_argnums=0)
def op_sub_reg(regs, t, dst, src):
    comp = t.masks - regs[src]
    return regs.at[dst].set(_carry(t, regs[dst] + comp, 1))


@functools.partial(jax.jit, donate_argnums=0)
def op_add_vec(regs, t, dst, vec):
    return regs.at[dst].set(_carry(t, regs[dst] + vec, 1))


@functools.partial(jax.jit, donate_argnums=0)
def op_addsub(regs, t, sum_out, diff_out, a, b):
    s = _carry(t, regs[a] + regs[b], 1)
    d = _carry(t, regs[a] + (t.masks - regs[b]), 1)
    regs = regs.at[sum_out].set(s)
    return regs.at[diff_out].set(d)


@functools.partial(jax.jit, donate_argnums=0)
def op_set_row(regs, dst, row):
    return regs.at[dst].set(row)


_TABLES_CACHE: dict = {}


def _get_tables(plan: Plan, device) -> ntt.NttTables:
    """Build all transform tables on device in ONE jitted program (cached)."""
    key = (plan.p, plan.n, repr(device))
    if key not in _TABLES_CACHE:
        with jax.default_device(device):
            build = jax.jit(lambda: ntt.NttTables.from_plan(plan, jnp))
            t = build()
            jax.block_until_ready(jax.tree_util.tree_leaves(t))
        _TABLES_CACHE[key] = t
    return _TABLES_CACHE[key]


class JaxEngine(Engine):
    def __init__(self, p: int, reg_count: int, plan: Plan | None = None,
                 device=None):
        super().__init__(p, reg_count)
        self.plan = plan if plan is not None else cached_plan(p)
        self.device = device if device is not None else jax.devices()[0]
        put = functools.partial(jax.device_put, device=self.device)
        self.t = _get_tables(self.plan, self.device)
        n = self.plan.n
        self.regs = put(jnp.zeros((reg_count, n), dtype=jnp.uint64))
        self._sub_cache: dict[int, jax.Array] = {}

    def get_size(self) -> int:
        return self.plan.n

    @property
    def widths(self) -> np.ndarray:
        return self.plan.widths

    @staticmethod
    def _i32(v):
        return jnp.int32(v)

    @staticmethod
    def _u64(v):
        return jnp.uint64(v)

    def set(self, dst: Reg, a: int) -> None:
        self.set_int(dst, a)

    def copy(self, dst: Reg, src: Reg) -> None:
        self.regs = op_copy(self.regs, (self._i32(dst), self._i32(src)))

    def square_mul(self, src: Reg, a: int = 1) -> None:
        self.regs = op_square_mul(self.regs, self.t, self._i32(src),
                                  self._u64(a))

    _SEQ_CHUNK = 256

    def square_mul_seq(self, src: Reg, a_vec: Sequence[int]) -> None:
        a = np.asarray(a_vec, dtype=np.uint64)
        k = self._SEQ_CHUNK
        off = 0
        while len(a) - off >= k:
            self.regs = op_square_mul_seq(
                self.regs, self.t, self._i32(src), jnp.asarray(a[off:off + k]))
            off += k
        rem = len(a) - off
        if rem > 0:
            # single variable-length tail dispatch (scan over the remainder)
            self.regs = op_square_mul_seq(
                self.regs, self.t, self._i32(src), jnp.asarray(a[off:]))

    def square_sub2_seq(self, src: Reg, count: int) -> None:
        if count <= 0:
            return
        self.regs = op_square_sub2_seq(
            self.regs, self.t, self._i32(src), jnp.int64(count),
            self._delta_vec(2))

    def set_multiplicand(self, dst: Reg, src: Reg) -> None:
        self.regs = op_set_multiplicand(
            self.regs, self.t, self._i32(dst), self._i32(src))

    def mul(self, dst: Reg, src: Reg, a: int = 1) -> None:
        self.regs = op_mul(self.regs, self.t, self._i32(dst), self._i32(src),
                           self._u64(a))

    def add(self, dst: Reg, src: Reg) -> None:
        self.regs = op_add(self.regs, self.t, self._i32(dst), self._i32(src))

    def sub_reg(self, dst: Reg, src: Reg) -> None:
        self.regs = op_sub_reg(self.regs, self.t, self._i32(dst),
                               self._i32(src))

    def addsub(self, sum_out: Reg, diff_out: Reg, a: Reg, b: Reg) -> None:
        self.regs = op_addsub(self.regs, self.t, self._i32(sum_out),
                              self._i32(diff_out), self._i32(a), self._i32(b))

    def _delta_vec(self, a: int) -> jax.Array:
        """Digits of (M_p - a) as a device vector (cached per a)."""
        if a not in self._sub_cache:
            from ..utils import digits as dg
            mp = (1 << self.p) - 1
            self._sub_cache[a] = jax.device_put(
                jnp.asarray(dg.int_to_digits((mp - a) % mp, self.widths)),
                self.device)
        return self._sub_cache[a]

    def sub(self, src: Reg, a: int) -> None:
        self.regs = op_add_vec(self.regs, self.t, self._i32(src),
                               self._delta_vec(a))

    def add_small(self, src: Reg, a: int) -> None:
        from ..utils import digits as dg
        vec = jnp.asarray(dg.int_to_digits(a, self.widths))
        self.regs = op_add_vec(self.regs, self.t, self._i32(src), vec)

    def sync(self) -> None:
        self.regs.block_until_ready()
        # force completion through remote-device tunnels (block_until_ready
        # alone can return early there)
        np.asarray(self.regs[0, 0:1])

    # -- host exchange ---------------------------------------------------
    def get_digits(self, src: Reg) -> np.ndarray:
        return np.asarray(self.regs[src])

    def set_digits(self, dst: Reg, digits: np.ndarray) -> None:
        row = jnp.asarray(np.asarray(digits, dtype=np.uint64))
        self.regs = op_set_row(self.regs, self._i32(dst), row)

    def get_raw(self, src: Reg) -> np.ndarray:
        return np.asarray(self.regs[src])

    def set_raw(self, dst: Reg, data: np.ndarray) -> None:
        self.set_digits(dst, data)
