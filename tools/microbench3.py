"""Microbench v3: DCE-proof MXU matmul rates + in-VMEM VPU rates via Pallas."""
import sys
import time

sys.path.insert(0, ".")
from prmers_tpu import jaxconf  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=5, warm=2):
    for _ in range(warm):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


key = jax.random.PRNGKey(0)
K = 16

# --- int8 matmul with serial dependency (cast output back to int8) --------
for (M, Kd, B) in ((128, 128, 65536), (512, 512, 16384), (256, 256, 32768)):
    w8 = jax.random.randint(key, (M, Kd), -128, 127, dtype=jnp.int8)
    x8 = jax.random.randint(key, (Kd, B), -128, 127, dtype=jnp.int8)

    @jax.jit
    def run(w, x):
        def step(i, x):
            r = lax.dot_general(w, x, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            # serial dependency: mangle result back to int8 input shape
            return (r & 127).astype(jnp.int8)[:Kd, :]
        return lax.fori_loop(0, K, step, x)
    dt = timeit(run, w8, x8) / K
    print(f"int8 mm {M}x{Kd}x{B} (serial)       {dt*1e3:9.4f} ms "
          f"{2*M*Kd*B/dt/1e12:8.2f} Top/s")

# --- bf16 matmul serial ----------------------------------------------------
for (M, Kd, B) in ((128, 128, 65536), (512, 512, 16384)):
    wb = jax.random.normal(key, (M, Kd), dtype=jnp.bfloat16)
    xb = jax.random.normal(key, (Kd, B), dtype=jnp.bfloat16)

    @jax.jit
    def runb(w, x):
        def step(i, x):
            r = lax.dot_general(w, x, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            return r.astype(jnp.bfloat16)[:Kd, :] * jnp.bfloat16(1e-3)
        return lax.fori_loop(0, K, step, x)
    dt = timeit(runb, wb, xb) / K
    print(f"bf16 mm {M}x{Kd}x{B} (serial)       {dt*1e3:9.4f} ms "
          f"{2*M*Kd*B/dt/1e12:8.2f} Tflop/s")

# --- in-VMEM VPU int32 multiply rate (Pallas) -------------------------------
REPS = 256


def vpu_kernel(x_ref, o_ref):
    x = x_ref[:]
    y = x

    def body(i, y):
        return y * x + jnp.int32(1)

    y = lax.fori_loop(0, REPS, body, y)
    o_ref[:] = y


x = jax.random.randint(key, (512, 1024), 0, 1 << 30, dtype=jnp.int32)
vk = jax.jit(lambda x: pl.pallas_call(
    vpu_kernel,
    out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x))
dt = timeit(vk, x)
ops = x.size * REPS * 2  # mul + add
print(f"Pallas VMEM int32 mul+add x{REPS}      {dt*1e3:9.4f} ms "
      f"{ops/dt/1e12:8.2f} Top/s")


# --- in-VMEM u32-pair goldilocks mulmod rate (Pallas, 16-bit decomposition)
def mulmod_kernel(alo_ref, ahi_ref, blo_ref, bhi_ref, olo_ref, ohi_ref):
    alo, ahi = alo_ref[:], ahi_ref[:]
    blo, bhi = blo_ref[:], bhi_ref[:]

    def mul32_wide(a, b):
        a0 = a & jnp.uint32(0xFFFF)
        a1 = a >> jnp.uint32(16)
        b0 = b & jnp.uint32(0xFFFF)
        b1 = b >> jnp.uint32(16)
        p00 = a0 * b0
        p01 = a0 * b1
        p10 = a1 * b0
        p11 = a1 * b1
        mid = (p00 >> jnp.uint32(16)) + (p01 & jnp.uint32(0xFFFF)) + \
              (p10 & jnp.uint32(0xFFFF))
        lo = (p00 & jnp.uint32(0xFFFF)) | (mid << jnp.uint32(16))
        hi = p11 + (p01 >> jnp.uint32(16)) + (p10 >> jnp.uint32(16)) + \
             (mid >> jnp.uint32(16))
        return lo, hi

    def addc(a, b):
        s = a + b
        return s, (s < a).astype(jnp.uint32)

    def mulmod(alo, ahi, blo, bhi):
        ll_lo, ll_hi = mul32_wide(alo, blo)
        lh_lo, lh_hi = mul32_wide(alo, bhi)
        hl_lo, hl_hi = mul32_wide(ahi, blo)
        hh_lo, hh_hi = mul32_wide(ahi, bhi)
        r1, c1 = addc(ll_hi, lh_lo)
        r1, c1b = addc(r1, hl_lo)
        c1 = c1 + c1b
        r2, c2 = addc(lh_hi, hl_hi)
        r2, c2b = addc(r2, hh_lo)
        r2, c2c = addc(r2, c1)
        c2 = c2 + c2b + c2c
        r3 = hh_hi + c2
        t0 = jnp.uint32(0) - r2
        t1 = r2 - (r2 != 0).astype(jnp.uint32)
        s0, ca = addc(ll_lo, t0)
        s1, cb = addc(r1, t1 + ca)
        s0, cc = addc(s0, cb * jnp.uint32(0xFFFFFFFF))
        s1 = s1 + cc
        u0 = s0 - r3
        bor = (s0 < r3).astype(jnp.uint32)
        u1 = s1 - bor
        return u0, u1

    x0, x1 = alo, ahi

    def body(i, c):
        x0, x1 = c
        return mulmod(x0, x1, blo, bhi)

    x0, x1 = lax.fori_loop(0, REPS, body, (x0, x1))
    olo_ref[:] = x0
    ohi_ref[:] = x1


sh = (512, 1024)
args = [jax.random.randint(key, sh, 0, 1 << 31, dtype=jnp.int32).astype(jnp.uint32)
        for _ in range(4)]
mk = jax.jit(lambda a, b, c, d: pl.pallas_call(
    mulmod_kernel,
    out_shape=(jax.ShapeDtypeStruct(sh, jnp.uint32),
               jax.ShapeDtypeStruct(sh, jnp.uint32)),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
    out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
               pl.BlockSpec(memory_space=pltpu.VMEM)),
)(a, b, c, d))
dt = timeit(mk, *args)
n_mulmods = sh[0] * sh[1] * REPS
print(f"Pallas VMEM u64 goldilocks mulmod     {dt*1e3:9.4f} ms "
      f"{n_mulmods/dt/1e9:8.2f} Gmulmod/s")
