import numpy as np
import pytest

from prmers_tpu.core import field, plan
from prmers_tpu.core.field import P


def test_transform_sizes():
    # anchors from the reference (README.md:869-878, ibdwt.h:17-43 semantics)
    assert plan.transform_size(136279841) == 1 << 23
    assert plan.transform_size(2147483647) == 5 << 25
    assert plan.transform_size(127) == 8
    assert plan.transform_size(11213) == 512
    assert plan.transform_size(100003) == 4096
    assert plan.transform_size(9941) == 512
    assert plan.transform_size(57885161) == 1 << 22


def test_widths_and_weights():
    from prmers_tpu.ops import ntt

    p = 11213
    n = plan.transform_size(p)
    pl = plan.build_plan(p)
    assert pl.n == n
    w = pl.widths
    assert int(w.sum()) == p
    base = p // n
    assert set(np.unique(w)) <= {base, base + 1}
    # weights: weight[j] = nr2^((n - p*j % n) % n); check a few directly
    t = ntt.NttTables.from_plan(pl, np)
    nr2 = field.root_two_nth(n)
    for j in [0, 1, 2, n // 2, n - 1]:
        r = (p * j) % n
        expect = pow(nr2, (n - r) % n, P) if r != 0 else 1
        assert int(t.weights[j]) == expect
        assert (int(t.weights[j]) * int(t.inv_weights_n[j]) * n) % P == 1


def test_freq_of_pos_matches_bruteforce_dft():
    # verify the DIF output-order formula against a brute-force DFT
    from prmers_tpu.core.field import FieldOps
    from prmers_tpu.ops import ntt

    F = FieldOps(np)
    for R in [16, 32, 40, 8, 20]:
        stages = plan._stages(R)
        st = [ntt.StageT(s.radix, s.tw, s.tw_inv) for s in stages]
        rng = np.random.default_rng(R)
        x = rng.integers(0, P, size=(R, 1), dtype=np.uint64)
        got = ntt.col_fwd(F, x, st)[:, 0]
        w = field.root_nth(R)
        expect_by_freq = []
        for f in range(R):
            s = 0
            for j in range(R):
                s = (s + int(x[j, 0]) * pow(w, f * j, P)) % P
            expect_by_freq.append(s)
        freq = plan.freq_of_pos(R)
        for pos in range(R):
            assert int(got[pos]) == expect_by_freq[freq[pos]], (R, pos)


def test_col_roundtrip():
    from prmers_tpu.core.field import FieldOps
    from prmers_tpu.ops import ntt

    F = FieldOps(np)
    for R in [8, 16, 20, 64, 40]:
        stages = plan._stages(R)
        st = [ntt.StageT(s.radix, s.tw, s.tw_inv) for s in stages]
        rng = np.random.default_rng(R + 1)
        x = rng.integers(0, P, size=(R, 3), dtype=np.uint64)
        y = ntt.col_inv(F, ntt.col_fwd(F, x, st), st)
        inv_r = field.inv(R)
        got = F.mul_scalar(y, inv_r)
        assert (np.asarray(got) == x).all()
