"""Probe which reshape/dot shapes Mosaic supports in-kernel (MXU DFT design)."""
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
        msg = str(e).split("\n")[0][:140]
        print(f"{name}: FAIL {msg}")
        return False


x4 = jnp.ones((64, 8, 8, 128), jnp.int32)

# a) merge middle dims, lanes unchanged
def k_a(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(64, 64, 128)
try_case("a merge-mid (64,8,8,128)->(64,64,128)", k_a, [x4],
         jax.ShapeDtypeStruct((64, 64, 128), jnp.int32))

# b) 3D dot_general contracting leading dim of rhs
w = jnp.ones((576, 512), jnp.int8)
x3 = jnp.ones((512, 64, 128), jnp.int8)
def k_b(w_ref, x_ref, o_ref):
    o_ref[:] = lax.dot_general(w_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
try_case("b 3D dot (576,512)@(512,64,128)", k_b, [w, x3],
         jax.ShapeDtypeStruct((576, 64, 128), jnp.int32))

# c) concat along leading implicit dim
x3a = jnp.ones((64, 64, 128), jnp.int8)
def k_c(x_ref, o_ref):
    xs = [x_ref[:] for _ in range(8)]
    o_ref[:] = jnp.concatenate(xs, axis=0)
try_case("c concat axis0 8x(64,64,128)", k_c, [x3a],
         jax.ShapeDtypeStruct((512, 64, 128), jnp.int32).update(dtype=jnp.int8))

# d) leading split (576,64,128)->(9,64,64,128)
x576 = jnp.ones((576, 64, 128), jnp.int32)
def k_d(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(9, 64, 64, 128)
try_case("d split-lead (576,64,128)->(9,64,64,128)", k_d, [x576],
         jax.ShapeDtypeStruct((9, 64, 64, 128), jnp.int32))

# e) 2D big matmul for reference
xb = jnp.ones((512, 1024), jnp.int8)
def k_e(w_ref, x_ref, o_ref):
    o_ref[:] = lax.dot_general(w_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
try_case("e 2D dot (576,512)@(512,1024)", k_e, [w, xb],
         jax.ShapeDtypeStruct((576, 1024), jnp.int32))

# f) bitcast u32->(4x)i8 via bitcast_convert_type adding minor dim
xu = jnp.ones((64, 64, 128), jnp.uint32)
def k_f(x_ref, o_ref):
    b = lax.bitcast_convert_type(x_ref[:].astype(jnp.uint8), jnp.int8)
    o_ref[:] = b
try_case("f u8->i8 bitcast (64,64,128)", k_f, [xu],
         jax.ShapeDtypeStruct((64, 64, 128), jnp.int8))
