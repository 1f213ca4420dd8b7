"""PallasEngine register semantics in interpret mode on CPU.

Regression coverage for the donation-aliasing bug found by the M756839
device PRP: the hot ops donate their x0/x1 operands (donate_argnums),
and on TPU donation DELETES the input buffers — so `copy` must
materialize real copies, never alias arrays between registers. CPU
ignores donation (the crash is TPU-only), so the test asserts buffer
distinctness directly plus the Gerbicz-block op-sequence values.
"""

import numpy as np
import pytest

from prmers_tpu.core.plan import build_plan


N = 1 << 15                    # smallest fused-eligible shape
P_EXP = int(N * 16.5) | 1
MP = (1 << P_EXP) - 1


@pytest.fixture(scope="module")
def eng():
    import os
    os.environ["PRMERS_PALLAS_INTERPRET"] = "1"
    from prmers_tpu.engine.pallas_engine import PallasEngine
    plan = build_plan(P_EXP, n=N)
    e = PallasEngine(P_EXP, 8, plan=plan)
    yield e
    del os.environ["PRMERS_PALLAS_INTERPRET"]


def _bufs(e, r):
    return [e.regs[r][i].unsafe_buffer_pointer() for i in range(4)]


def test_copy_never_aliases(eng):
    eng.set(0, 3)
    eng.copy(3, 0)
    assert not set(_bufs(eng, 3)) & set(_bufs(eng, 0)), \
        "copy must materialize new buffers (donated ops delete inputs)"


@pytest.mark.heavy
def test_gerbicz_block_sequence(eng):
    """The exact op mix of a PRP Gerbicz block boundary: squaring chain
    on R0, copy R1 -> R3, set_multiplicand, mul, replay chain on R3 —
    with the donated-buffer ops interleaved, both registers must stay
    exact (reference flow: src/modes/RunPrpOrLlMarin.cpp:339-430)."""
    B = 24
    eng.set(0, 3)
    eng.set(1, 3)
    eng.square_mul_seq(0, [1] * B)
    eng.copy(3, 1)                       # R3 aliases R1 unless copied
    eng.set_multiplicand(2, 0)
    eng.mul(1, 2)                        # donates R1's buffers
    eng.square_mul_seq(3, [1] * (B - 1))  # must not touch deleted buffers
    eng.square_mul(3, 3)
    assert eng.get_int(3) % MP == pow(3, (1 << B) + 1, MP)
    assert eng.get_int(1) % MP == 3 * pow(3, 1 << B, MP) % MP
    # saved-state copies survive further squaring of the source
    eng.copy(4, 0)
    eng.square_mul(0, 1)
    assert eng.get_int(4) % MP == pow(3, 1 << B, MP)
    assert eng.get_int(0) % MP == pow(3, 1 << (B + 1), MP)
