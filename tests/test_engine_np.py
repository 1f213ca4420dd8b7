import random

import numpy as np
import pytest

from prmers_tpu.engine.np_engine import NumpyEngine


@pytest.mark.parametrize("p", [127, 521, 1279])
def test_square_mul_matches_python(p):
    eng = NumpyEngine(p, 3)
    mp = (1 << p) - 1
    rnd = random.Random(p)
    v = rnd.randrange(1, mp)
    eng.set_int(0, v)
    assert eng.get_int(0) == v
    for a in [1, 3, 1, 5]:
        eng.square_mul(0, a)
        v = v * v * a % mp
        assert eng.get_int(0) == v


def test_mul_add_sub(p=521):
    eng = NumpyEngine(p, 5)
    mp = (1 << p) - 1
    rnd = random.Random(42)
    x, y = rnd.randrange(mp), rnd.randrange(mp)
    eng.set_int(0, x)
    eng.set_int(1, y)
    # mul via multiplicand
    eng.set_multiplicand(2, 1)
    eng.mul(0, 2, 3)
    x = x * y * 3 % mp
    assert eng.get_int(0) == x
    # add
    eng.add(0, 1)
    x = (x + y) % mp
    assert eng.get_int(0) == x
    # sub_reg
    eng.sub_reg(0, 1)
    x = (x - y) % mp
    assert eng.get_int(0) == x
    # sub small
    eng.sub(0, 2)
    x = (x - 2) % mp
    assert eng.get_int(0) == x
    # addsub
    eng.set_int(3, x)
    eng.set_int(4, y)
    eng.addsub(1, 2, 3, 4)
    assert eng.get_int(1) == (x + y) % mp
    assert eng.get_int(2) == (x - y) % mp


def test_pow(p=127):
    eng = NumpyEngine(p, 3)
    mp = (1 << p) - 1
    eng.set_int(1, 12345)
    eng.pow(0, 1, 1000)
    assert eng.get_int(0) == pow(12345, 1000, mp)


def test_ll_m127():
    # Lucas-Lehmer: M127 is prime
    p = 127
    eng = NumpyEngine(p, 1)
    eng.set(0, 4)
    for _ in range(p - 2):
        eng.square_mul(0)
        eng.sub(0, 2)
    assert eng.get_int(0) == 0 or eng.digit_equal_to_mp(0)
    assert eng.digit_equal_to(0, 0) or eng.digit_equal_to_mp(0)


def test_prp_small_prime():
    # PRP: 3^(2^p) mod M_p == 9 for prime M_p (p=521)
    p = 521
    eng = NumpyEngine(p, 1)
    eng.set(0, 3)
    for _ in range(p):
        eng.square_mul(0)
    assert eng.digit_equal_to(0, 9)


def test_checkpoint_roundtrip(p=127):
    eng = NumpyEngine(p, 2)
    eng.set_int(0, 123456789)
    eng.set_int(1, 987654321)
    data = eng.get_checkpoint()
    eng2 = NumpyEngine(p, 2)
    eng2.set_checkpoint(data)
    assert eng2.get_int(0) == 123456789
    assert eng2.get_int(1) == 987654321
