"""Probe round 2: slicing/concat primitives for the 2D MXU DFT formulation."""
import sys
sys.path.insert(0, ".")
import numpy as np
from prmers_tpu import jaxconf  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_case(name, kern, ins, out_shape):
    try:
        r = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in ins],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape,
        )(*ins)
        jax.block_until_ready(r)
        print(f"{name}: OK")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"{name}: FAIL {msg}")
        return False


# g) lane concat 8x(512,128) -> (512,1024)
xs = jnp.ones((512, 128), jnp.int8)
def k_g(x_ref, o_ref):
    o_ref[:] = jnp.concatenate([x_ref[:]] * 8, axis=1)
try_case("g lane-concat 8x(512,128)->(512,1024)", k_g, [xs],
         jax.ShapeDtypeStruct((512, 1024), jnp.int8))

# h) row slice at 64 of (576,1024)
xr = jnp.ones((576, 1024), jnp.int32)
def k_h(x_ref, o_ref):
    o_ref[:] = x_ref[64:128, :]
try_case("h row-slice [64:128] of (576,1024)", k_h, [xr],
         jax.ShapeDtypeStruct((64, 1024), jnp.int32))

# i) lane slice at 128
def k_i(x_ref, o_ref):
    o_ref[:] = x_ref[:, 128:256]
try_case("i lane-slice [:,128:256] of (576,1024)", k_i, [xr],
         jax.ShapeDtypeStruct((576, 128), jnp.int32))

# j) scalar middle index of 3D
x3 = jnp.ones((64, 64, 128), jnp.uint32)
def k_j(x_ref, o_ref):
    acc = x_ref[:, 0, :]
    for j in range(1, 8):
        acc = acc + x_ref[:, j, :]
    o_ref[:] = acc
try_case("j scalar mid-index x[:,j,:] of (64,64,128)", k_j, [x3],
         jax.ShapeDtypeStruct((64, 128), jnp.uint32))

# k) per-slice store o[:, j, :] = v
def k_k(x_ref, o_ref):
    for j in range(8):
        o_ref[:, j, :] = x_ref[:, j, :] + jnp.uint32(1)
try_case("k per-slice store o[:,j,:] (64,8,128)", k_k,
         [jnp.ones((64, 8, 128), jnp.uint32)],
         jax.ShapeDtypeStruct((64, 8, 128), jnp.uint32))

# l) expand (64,128)->(64,1,128)
def k_l(x_ref, o_ref):
    o_ref[:] = x_ref[:, 0, :].reshape(64, 1, 128)
try_case("l expand (64,128)->(64,1,128)", k_l, [x3],
         jax.ShapeDtypeStruct((64, 1, 128), jnp.uint32))

# m) the full intended shape chain: (64,S*G,128) u32 pair -> planes
#    concat axis0 -> (512, S*G, 128)?? NO: stay per-j 2D. Instead probe
#    merged lane-concat over mid dim: build (512,1024) from x3 slices.
def k_m(x_ref, o_ref):
    cols = [x_ref[:, j, :] for j in range(8)]
    two_d = jnp.concatenate(cols, axis=1)          # (64, 1024)
    planes = jnp.concatenate([two_d] * 8, axis=0)  # (512, 1024)
    o_ref[:] = planes
try_case("m slices->lane-concat->(512,1024)", k_m,
         [jnp.ones((64, 8, 128), jnp.int8)],
         jax.ShapeDtypeStruct((512, 1024), jnp.int8))

# n) int8 dot with M=576 rows but K=512, N=1024, then row slices summed
w = jnp.ones((576, 512), jnp.int8)
xb = jnp.ones((512, 1024), jnp.int8)
def k_n(w_ref, x_ref, o_ref):
    d = lax.dot_general(w_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    acc = d[0:64, :]
    for m in range(1, 9):
        acc = acc + d[64 * m:64 * (m + 1), :]
    o_ref[:] = acc
try_case("n dot+9 row-slice combine", k_n, [w, xb],
         jax.ShapeDtypeStruct((64, 1024), jnp.int32))
