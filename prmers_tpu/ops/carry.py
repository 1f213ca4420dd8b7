"""Carry propagation over variable-width IBDWT digits.

The convolution output digits y_j are exact integers < P; normalization emits
the low width[j] bits of (y_j * a + carry_in) and forwards the rest. The carry
out of the last digit wraps to digit 0 (2^p == 1 mod M_p), which performs the
mod-M_p fold (reference behavior: kernels/marin.cl:1696-2414 two-phase
carry-weight kernels; here reformulated as vectorized carry-injection rounds —
each round shifts the carry array by one digit — followed by an exact fixup
loop, which is the TPU-friendly equivalent of workgroup-scan + block wrap).

Constraint: the small multiplier a must satisfy a < 2^16 so all intermediates
fit u64 (every call site uses a in {1, 3, ...small}).
"""

from __future__ import annotations

from ..core.field import FieldOps


def split(F: FieldOps, y, widths, masks):
    return y >> widths, y & masks


def carry_full(F: FieldOps, y, widths, masks, a, lax=None):
    """Exact normalization of digit vector y (values < P), optional small
    mul a: returns digits d with d[j] < 2^width[j] and value ==
    (sum y_j 2^(q_j)) * a mod M_p. `a` may be a python int or a traced
    u64 scalar. masks may be None (compact-table mode): derived
    transiently from widths, which may then be a narrow dtype (u8) to
    save HBM at huge n."""
    xp = F.xp
    if masks is None:
        widths = widths.astype(xp.uint64)
        masks = (xp.uint64(1) << widths) - xp.uint64(1)
    c, d = split(F, y, widths, masks)
    # fold in the small multiplier before propagation (adc_mul decomposition:
    # d*a < 2^(w+16), c*a < 2^(63-w+16) both fit u64 for a < 2^16)
    is_one = isinstance(a, int) and a == 1
    if not is_one:
        a64 = xp.uint64(a) if isinstance(a, int) else a
        t = d * a64
        c = c * a64 + (t >> widths)
        d = t & masks

    def inject(c, d):
        c = xp.roll(c, 1)
        t = d + c
        return t >> widths, t & masks

    if lax is None:
        # numpy host path
        import numpy as np
        while bool((c != 0).any()):
            c, d = inject(c, d)
        return d
    else:
        def cond(state):
            c, d = state
            return xp.any(c != xp.uint64(0))

        def body(state):
            return inject(*state)

        # one guaranteed round, then loop until all carries settle
        c, d = inject(c, d)
        c, d = lax.while_loop(cond, body, (c, d))
        return d
