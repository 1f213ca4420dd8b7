"""Mesh sharding for the NTT compute path.

The reference is single-GPU (reference: SURVEY.md §2.6 — no distributed
backend); multi-chip scaling is a new, TPU-first layer: registers are sharded
along the limb axis of a jax.sharding.Mesh, the four-step NTT's column passes
stay shard-local, and the matrix transpose between passes becomes an ICI
all-to-all inserted by GSPMD. Gerbicz/residue reductions ride psum.

Round-1 implementation: GSPMD auto-partitioning of the single-chip op graph
via NamedSharding constraints (explicit shard_map kernels land with the
Pallas path).
"""

from __future__ import annotations

import functools

from .. import jaxconf  # noqa: F401
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.plan import Plan, cached_plan
from ..ops import ntt
from ..engine import jax_engine as je

LIMB_AXIS = "limb"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(devices, (LIMB_AXIS,))


def regs_sharding(mesh: Mesh) -> NamedSharding:
    """Registers (reg_count, n): shard the limb (digit) axis."""
    return NamedSharding(mesh, P(None, LIMB_AXIS))


def vec_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(LIMB_AXIS))


def shard_tables(t: ntt.NttTables, mesh: Mesh) -> ntt.NttTables:
    """Place n-sized tables limb-sharded, small stage tables replicated."""
    vs = vec_sharding(mesh)
    rep = NamedSharding(mesh, P())

    def put_vec(a):
        return jax.device_put(a, vs)

    def put_rep(a):
        return jax.device_put(a, rep)

    return ntt.NttTables(
        p=t.p, n=t.n, R=t.R, C=t.C,
        stages_r=[ntt.StageT(s.radix, put_rep(s.tw), put_rep(s.tw_inv))
                  for s in t.stages_r],
        stages_c=[ntt.StageT(s.radix, put_rep(s.tw), put_rep(s.tw_inv))
                  for s in t.stages_c],
        mid_t1=put_rep(t.mid_t1), mid_t2=put_rep(t.mid_t2),
        mid_t1_inv=put_rep(t.mid_t1_inv), mid_t2_inv=put_rep(t.mid_t2_inv),
        mid_tile=t.mid_tile,
        weights=put_vec(t.weights),
        inv_weights_n=put_vec(t.inv_weights_n),
        widths=put_vec(t.widths),
        masks=put_vec(t.masks),
        carry_rounds=t.carry_rounds,
    )


class ShardedSquareStepGSPMD:
    """One PRP squaring step jitted over a device mesh — GSPMD
    auto-partitioned variant (kept for comparison; the explicit shard_map
    path in parallel/sharded.py is the primary one)."""

    def __init__(self, p: int, reg_count: int, mesh: Mesh):
        self.plan = cached_plan(p)
        self.mesh = mesh
        with jax.default_device(mesh.devices.flat[0]):
            t = jax.jit(lambda: ntt.NttTables.from_plan(self.plan, jnp))()
        self.t = shard_tables(t, mesh)
        rs = regs_sharding(mesh)
        self.regs = jax.device_put(
            jnp.zeros((reg_count, self.plan.n), dtype=jnp.uint64), rs)
        self._step = jax.jit(
            je.op_square_mul.__wrapped__,  # unjitted op
            donate_argnums=0,
            in_shardings=(rs, None, None, None),
            out_shardings=rs,
        )

    def step(self, src: int = 0, a: int = 1):
        self.regs = self._step(self.regs, self.t, jnp.int32(src),
                               jnp.uint64(a))
        return self.regs


# primary explicit-collectives implementation
from .sharded import ShardedSquareStep  # noqa: E402,F401
