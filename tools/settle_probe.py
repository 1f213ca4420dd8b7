"""Device probe: carry_full duration vs input shape (random vs
saturated-run digits). Confirms/refutes the data-dependent while_loop as
the dense-value worker-crash cause at n = 2^25.

Usage: python tools/settle_probe.py [case ...]
Cases: random | allones | allones_small_n
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prmers_tpu import jaxconf  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from prmers_tpu.core.field import FieldOps
from prmers_tpu.ops import carry as carry_ops

F = FieldOps(jnp)


@jax.jit
def settle(y, widths):
    return carry_ops.carry_full(F, y, widths, None, 1, lax=jax.lax)


def run(name, n, y, widths):
    y = jnp.asarray(y)
    w = jnp.asarray(widths)
    t0 = time.time()
    d = settle(y, w)
    d.block_until_ready()
    print(f"{name}: n=2^{n.bit_length()-1} first={int(d[0])} "
          f"{time.time() - t0:.2f}s", flush=True)


def main():
    cases = sys.argv[1:] or ["random", "allones_small_n", "allones"]
    rng = np.random.default_rng(0)
    for case in cases:
        if case == "random":
            n = 1 << 25
            widths = np.full(n, 16, np.uint8)
            widths[::3] = 17
            y = rng.integers(0, 1 << 62, n, dtype=np.uint64)
            run(case, n, y, widths)
        elif case == "allones_small_n":
            n = 1 << 20
            widths = np.full(n, 16, np.uint8)
            masks = (1 << widths.astype(np.uint64)) - 1
            y = masks.copy()
            y[0] += 1          # one carry at digit 0 -> full-ring ripple
            run(case, n, y, widths)
        elif case == "allones":
            n = 1 << 25
            widths = np.full(n, 16, np.uint8)
            masks = (1 << widths.astype(np.uint64)) - 1
            y = masks.copy()
            y[0] += 1
            run(case, n, y, widths)


if __name__ == "__main__":
    main()
