import numpy as np
import pytest

from prmers_tpu.core import field
from prmers_tpu.core.field import P, FieldOps


def test_scalar_roots():
    assert pow(field.ROOT_TWO_BASE, (P - 1) // field.ROOT_TWO_ORDER, P) == 2
    r = field.root_nth(8)
    assert pow(r, 8, P) == 1 and pow(r, 4, P) != 1
    r2 = field.root_two_nth(64)
    assert pow(r2, 64, P) == 2


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(1234)


def _rand_field(rng, k):
    return (rng.integers(0, P, size=k, dtype=np.uint64)).astype(np.uint64)


@pytest.mark.parametrize("xp_name", ["numpy", "jax"])
def test_vector_ops_match_ints(xp_name, rng):
    if xp_name == "jax":
        import jax.numpy as xp
    else:
        xp = np
    F = FieldOps(xp)
    k = 257
    a = _rand_field(rng, k)
    b = _rand_field(rng, k)
    ax, bx = xp.asarray(a), xp.asarray(b)
    got_add = np.asarray(F.add(ax, bx), dtype=np.uint64)
    got_sub = np.asarray(F.sub(ax, bx), dtype=np.uint64)
    got_mul = np.asarray(F.mul(ax, bx), dtype=np.uint64)
    for i in range(k):
        ai, bi = int(a[i]), int(b[i])
        assert int(got_add[i]) == (ai + bi) % P
        assert int(got_sub[i]) == (ai - bi) % P
        assert int(got_mul[i]) == (ai * bi) % P


def test_edge_values():
    F = FieldOps(np)
    edges = np.array([0, 1, P - 1, P - 2, (1 << 64) - 1 if False else P - 1,
                      0xFFFFFFFF, 1 << 32, (1 << 63)], dtype=np.uint64)
    for a in edges:
        for b in edges:
            got = int(F.mul(np.array([a]), np.array([b]))[0])
            assert got == (int(a) * int(b)) % P, (a, b)


def test_powers():
    F = FieldOps(np)
    base = 123456789
    ps = F.powers(base, 50)
    for i in range(50):
        assert int(ps[i]) == pow(base, i, P)


def test_pow_const():
    F = FieldOps(np)
    a = np.array([3, 5, 7], dtype=np.uint64)
    got = F.pow_const(a, 1000003)
    for i in range(3):
        assert int(got[i]) == pow(int(a[i]), 1000003, P)
