"""Field-economics microbench: measured per-element rates of the two
arithmetic paths' core ops on the device VPU.

Measures (in-kernel rep slope, Pallas VMEM):
  * gl64 mulmod / sqr on u32 pairs            (the Goldilocks path)
  * GF(M31^2) complex mul / sqr on u32        (fft3161 M31 plane)
  * GF(M61^2) complex mul / sqr on u32 pairs  (fft3161 M61 plane)

The fft3161 rows are per transform WORD (one M31 + one M61 complex op);
one fft3161 word carries ~2x the payload bits of a gl64 word, so the
break-even line is fft3161_word_cost <= 2 * gl64_word_cost. PERF.md
("Rejected by op-count analysis") predicts fft3161 loses on TPU because
32x32 products decompose into four 16-bit multiplies either way and the
Solinas reduction is already near-free; this tool turns that analysis
into a measurement. Run on CPU it validates shapes only.
"""
import sys
import time

sys.path.insert(0, ".")
from prmers_tpu import jaxconf  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from prmers_tpu.ops.pallas.gl64 import GL
from prmers_tpu.ops.pallas import mers

_CPU = jax.devices()[0].platform == "cpu"
REPS = 2 if _CPU else 64          # CPU = interpret-mode shape check only
SHAPE = (8, 128) if _CPU else (256, 1024)


def timeit(fn, *args, iters=5, warm=2):
    for _ in range(warm):
        r = fn(*args)
    jax.block_until_ready(r)
    # tiny host fetch: block_until_ready is unreliable through the tunnel
    np.asarray(jax.tree_util.tree_leaves(r)[0][0:1, 0:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    np.asarray(jax.tree_util.tree_leaves(r)[0][0:1, 0:1])
    return (time.perf_counter() - t0) / iters


def bench_kernel(name, n_in, body, n_el=None):
    """Rep-loop `body` (taking/returning an n_in-tuple of u32 arrays)
    inside one Pallas kernel; report ns/element."""

    def kern(*refs):
        ins = tuple(r[:] for r in refs[:n_in])
        outs = refs[n_in:]

        def step(i, ins):
            return body(*ins)

        res = lax.fori_loop(0, REPS, step, ins)
        for o, r in zip(outs, res):
            o[:] = r

    rng = np.random.default_rng(7)
    xs = tuple(jnp.asarray(
        rng.integers(0, 1 << 30, SHAPE, dtype=np.uint32))
        for _ in range(n_in))
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    fn = jax.jit(lambda *a: pl.pallas_call(
        kern,
        out_shape=tuple(jax.ShapeDtypeStruct(SHAPE, jnp.uint32)
                        for _ in range(n_in)),
        in_specs=[spec] * n_in,
        out_specs=tuple(spec for _ in range(n_in)),
        interpret=jax.devices()[0].platform == "cpu",
    )(*a))
    dt = timeit(fn, *xs) / REPS
    el = n_el or (SHAPE[0] * SHAPE[1])
    print(f"{name:42s} {dt*1e6:9.3f} us/rep  {dt/el*1e9:8.3f} ns/el")
    return dt / el


g = GL(jnp)
m31 = mers.M31C(jnp)
m61 = mers.M61C(jnp)

gl_mul = bench_kernel("gl64 mulmod (pair)", 4,
                      lambda a0, a1, b0, b1:
                      g.mul(a0, a1, b0, b1) + (b0, b1))
gl_sqr = bench_kernel("gl64 sqr (pair)", 2,
                      lambda a0, a1: g.sqr(a0, a1))
m31_mul = bench_kernel("M31^2 complex mul", 4,
                       lambda ar, ai, br, bi:
                       m31.mul(ar, ai, br, bi) + (br, bi))
m31_sqr = bench_kernel("M31^2 complex sqr", 2,
                       lambda ar, ai: m31.sqr(ar, ai))
m61_mul = bench_kernel("M61^2 complex mul", 8,
                       lambda *a: m61.mul(*a) + a[4:])
m61_sqr = bench_kernel("M61^2 complex sqr", 4,
                       lambda *a: m61.sqr(*a))

w3161_mul = m31_mul + m61_mul
w3161_sqr = m31_sqr + m61_sqr
print()
print(f"fft3161 word mul = {w3161_mul*1e9:7.3f} ns  "
      f"vs 2x gl64 mul = {2*gl_mul*1e9:7.3f} ns  "
      f"ratio {w3161_mul/(2*gl_mul):5.2f}")
print(f"fft3161 word sqr = {w3161_sqr*1e9:7.3f} ns  "
      f"vs 2x gl64 sqr = {2*gl_sqr*1e9:7.3f} ns  "
      f"ratio {w3161_sqr/(2*gl_sqr):5.2f}")
print("(ratio > 1.0: the Goldilocks path wins per payload bit)")
