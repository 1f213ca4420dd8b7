"""Host big-int layer: the libgmp ctypes binding and its fallbacks."""
import math
import random

from prmers_tpu.utils import gmp


def test_small_agreement():
    rng = random.Random(7)
    for _ in range(200):
        a = rng.getrandbits(192)
        b = rng.getrandbits(192)
        m = rng.getrandbits(192) | 1
        assert gmp.mul(a, b) == a * b
        assert gmp.mod(a, m) == a % m
        assert gmp.mulmod(a, b, m) == (a * b) % m
        assert gmp.sqrmod(a, m) == (a * a) % m
        assert gmp.gcd(a, b) == math.gcd(a, b)
        assert gmp.powmod(a, b % 4096, m) == pow(a, b % 4096, m)


def test_invert():
    m = (1 << 127) - 1  # prime
    for a in (2, 3, 9, 12345, m - 2):
        inv = gmp.invert(a, m)
        assert a * inv % m == 1
    try:
        gmp.invert(6, 9)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_zero_and_identity():
    assert gmp.mul(0, 12345) == 0
    assert gmp.mod(0, 7) == 0
    assert gmp.gcd(0, 42) == 42
    assert gmp.powmod(5, 0, 97) == 1


def test_mersenne_scale_roundtrip():
    # big enough to catch import/export bugs, small enough to verify in pure
    # python (~0.2s)
    p = 86243
    mp_ = (1 << p) - 1
    rng = random.Random(3)
    v = rng.getrandbits(p) % mp_
    assert gmp.mulmod(v, v, mp_) == (v * v) % mp_
    assert gmp.gcd(v - 1, mp_) == math.gcd(v - 1, mp_)
    assert gmp.mersenne_mod(v * v, p) == (v * v) % mp_
