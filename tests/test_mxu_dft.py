"""MXU limb-matmul DFT: numpy-path bit-exactness against dft_axis0.

The jnp/Pallas path runs the identical algebra (shared _pack_planes /
_combine_2d); on-device validation is tools/test_pallas_step.py.
"""
import numpy as np
import pytest

from prmers_tpu.ops.pallas.gl64 import GL, to_pairs, from_pairs
from prmers_tpu.ops.pallas import fourstep as fsm
from prmers_tpu.ops.pallas.mxu_dft import (
    N_WPLANES, build_mxu_tables, dft_matrix, mxu_dft_apply,
    _balanced_limbs, lhs_bitcast_mode, permute_lhs_cols_bytes)
from prmers_tpu.core.field import P


@pytest.mark.parametrize("L", [32, 64])
@pytest.mark.parametrize("inverse", [False, True])
def test_mxu_dft_matches_dft_axis0(L, inverse):
    g = GL(np)
    rng = np.random.default_rng(11 + L + inverse)
    w8, corr = build_mxu_tables(L, inverse)
    if lhs_bitcast_mode():
        # mirror attach_mxu_tables: contraction cols in bitcast order
        w8 = permute_lhs_cols_bytes(w8, lhs_bitcast_mode())
    x = rng.integers(0, 1 << 64, size=(L, 2, 128), dtype=np.uint64)
    x0, x1 = to_pairs(x)
    y0, y1 = mxu_dft_apply(g, x0, x1, L, w8, corr)
    c0, c1 = g.canon(y0, y1)
    r0, r1 = fsm.dft_axis0(g, x0, x1, L, inverse)
    rc0, rc1 = g.canon(r0, r1)
    assert np.array_equal(from_pairs(c0, c1), from_pairs(rc0, rc1))


@pytest.mark.parametrize("L", [16, 64])
@pytest.mark.parametrize("inverse", [False, True])
def test_closed_form_dif_matrix_matches_network(L, inverse):
    """dft_matrix's closed-form DIF-ordered construction (the only form
    available for L > 64, where no shift-twiddle family exists) must
    reproduce the butterfly network's map exactly at L <= 64."""
    g = GL(np)
    eye = np.eye(L, dtype=np.uint64)
    x0, x1 = to_pairs(eye)
    y0, y1 = fsm.dft_axis0(g, x0, x1, L, inverse)
    c0, c1 = g.canon(y0, y1)
    Mref = from_pairs(c0, c1)
    freq = fsm.dif_freq_of_pos(L)
    w = fsm.root_554(L)
    if inverse:
        from prmers_tpu.core import field as fld
        w = fld.inv(w)
    M = np.empty((L, L), dtype=np.uint64)
    for k in range(L):
        if not inverse:
            M[k] = [pow(w, int(freq[k]) * j, P) for j in range(L)]
        else:
            M[k] = [pow(w, k * int(freq[j]), P) for j in range(L)]
    assert np.array_equal(M, Mref)


def test_balanced_limbs_exact():
    """8-plane signed decomposition: reconstruction == v or v - P
    (both ≡ v mod P); inputs are canonical residues [0, P)."""
    rng = np.random.default_rng(5)
    for v in [0, 1, P - 1, P // 2, P // 2 + 1,
              *(rng.integers(0, 1 << 64, size=50, dtype=np.uint64) % P)]:
        d = _balanced_limbs(int(v))
        assert len(d) == N_WPLANES
        assert all(-128 <= x <= 127 for x in d)
        got = sum(x << (8 * i) for i, x in enumerate(d))
        assert got in (int(v), int(v) - P)


def test_dft_matrix_is_linear_map():
    g = GL(np)
    L = 32
    M = dft_matrix(L, False)
    rng = np.random.default_rng(9)
    x = rng.integers(0, P, size=(L, 4), dtype=np.uint64)
    x0, x1 = to_pairs(x)
    y0, y1 = fsm.dft_axis0(g, x0, x1, L, False)
    c0, c1 = g.canon(y0, y1)
    got = from_pairs(c0, c1)
    want = np.zeros_like(got)
    for r in range(L):
        acc = np.zeros(x.shape[1], dtype=object)
        for c in range(L):
            acc = acc + int(M[r, c]) * x[c].astype(object)
        want[r] = (acc % P).astype(np.uint64)
    assert np.array_equal(got, want)
