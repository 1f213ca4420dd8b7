"""Device probe: sublane ordering of pltpu.bitcast u32 -> int8.

The LHS MXU pack needs the four bytes of each u32 on SUBLANES. If
Mosaic's width-changing bitcast emits them at a fixed permutation of
(l, b) -> sublane, the ~24-op shift/mask pack collapses to one XOR +
bitcast and the W-table rows absorb the permutation (like
permute_rhs_rows_bytes does for the lane-axis pack).

Run on the TPU: python tools/probe_bitcast.py
"""

import numpy as np

from prmers_tpu import jaxconf  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kern(x_ref, o_ref):
    o_ref[:] = pltpu.bitcast(x_ref[:], jnp.int8)


def main():
    L, C = 8, 128
    # word value encodes (sublane, byte): byte b of word l = l*4 + b
    x = np.zeros((L, C), dtype=np.uint32)
    for l in range(L):
        v = 0
        for b in range(4):
            v |= (l * 4 + b) << (8 * b)
        x[l, :] = v
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((4 * L, C), jnp.int8),
    )(jnp.asarray(x))
    o = np.asarray(out)[:, 0]
    print("sublane -> (word*4+byte):", o.tolist())
    # candidate orders
    interleave = [l * 4 + b for l in range(L) for b in range(4)]
    plane = [l * 4 + b for b in range(4) for l in range(L)]
    if o.tolist() == interleave:
        print("ORDER: interleaved (word-major: l*4+b at sublane 4l+b)")
    elif o.tolist() == plane:
        print("ORDER: plane-major (byte-major: l*4+b at sublane b*L+l)")
    else:
        print("ORDER: other (see raw list)")


if __name__ == "__main__":
    main()
