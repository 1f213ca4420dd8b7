"""Host-side (numpy) tests of the Pallas kernel math: gl64 u32-pair field
ops and the four-step pipeline reference implementation. These validate the
exact arithmetic the TPU kernels run, without needing a TPU (the kernels
share the same namespace-generic code)."""

import numpy as np
import pytest

from prmers_tpu.core import field
from prmers_tpu.core.plan import build_plan
from prmers_tpu.ops.pallas import fourstep as fs
from prmers_tpu.ops.pallas.gl64 import GL, from_pairs, to_pairs
from prmers_tpu.utils import digits as dg

P = field.P
g = GL(np)
rng = np.random.default_rng(42)


def _rand_pairs(n):
    a = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    return a, to_pairs(a)


def _check(got_pair, want_obj):
    got = from_pairs(*got_pair).astype(object)
    assert (got < (1 << 64)).all()
    assert ((got - want_obj) % P == 0).all()


class TestGL64:
    def test_add_sub_mul_sqr(self):
        a, (a0, a1) = _rand_pairs(512)
        b, (b0, b1) = _rand_pairs(512)
        ao, bo = a.astype(object), b.astype(object)
        _check(g.add(a0, a1, b0, b1), ao + bo)
        _check(g.sub(a0, a1, b0, b1), ao - bo)
        _check(g.mul(a0, a1, b0, b1), ao * bo)
        _check(g.sqr(a0, a1), ao * ao)
        _check(g.mul_small(a0, a1, np.uint32(3)), ao * 3)
        _check(g.neg(a0, a1), -ao)

    def test_shiftmul_static(self):
        a, (a0, a1) = _rand_pairs(256)
        ao = a.astype(object)
        for e in (0, 1, 7, 31, 32, 48, 63, 64, 72, 95):
            _check(g.shiftmul(a0, a1, e), ao * (1 << e))

    def test_shiftmul_vector(self):
        a, (a0, a1) = _rand_pairs(256)
        e = rng.integers(0, 96, 256).astype(np.uint32)
        want = np.array([int(x) << int(k) for x, k in zip(a, e)],
                        dtype=object)
        _check(g.shiftmul(a0, a1, e), want)

    def test_canon(self):
        a, (a0, a1) = _rand_pairs(256)
        c0, c1 = g.canon(a0, a1)
        got = from_pairs(c0, c1)
        assert (got.astype(object) == (a.astype(object) % P)).all() or \
            ((got.astype(object) - a.astype(object)) % P == 0).all()
        assert (got.astype(object) < P).all()


class TestFourStep:
    def test_dif_freq_map(self):
        f = fs.dif_freq_of_pos(8)
        assert list(f) == [0, 4, 2, 6, 1, 5, 3, 7]

    def test_root_family(self):
        # omega_m for m | 192 must be the power of two the kernels shift by
        assert fs.root_554(192) == 2
        assert fs.root_554(64) == pow(2, 3, P)
        assert fs.root_554(32) == pow(2, 6, P)

    @pytest.mark.parametrize("n,seed", [(4096, 1), (8192, 2)])
    def test_square_ref_value(self, n, seed):
        p = int(n * 16.5) | 1
        plan = build_plan(p, n=n)
        fp = fs.FourStepPlan.from_plan(plan)
        t = fs.FourStepTables.build(fp, np, G=1, lanes=128)
        r = np.random.default_rng(seed)
        mp = (1 << p) - 1
        v = int.from_bytes(r.bytes(p // 8), "little") % mp
        y = fs.square_ref(t, dg.int_to_digits(v, plan.widths))
        assert int(y.max()) < fp.max_word
        q = np.concatenate(
            [[0], np.cumsum(plan.widths.astype(np.int64))])[:n]
        val = sum(int(x) << int(qq) for x, qq in zip(y, q)) % mp
        assert val == (v * v) % mp


class TestFusedC:
    """The transpose-free fused C-transform (fourstep.attach_fused_c_tables
    + fused_c_ref) must reproduce the original pipeline's convolution
    digits exactly."""

    def test_rhs_tables_exact(self):
        # one lane-axis int8 dot == exact matmul mod P, random matrices
        from prmers_tpu.ops.pallas.mxu_dft import (build_rhs_tables,
                                                   mxu_rhs_apply)
        L, B = 128, 32
        r = np.random.default_rng(5)
        Ms = r.integers(0, 1 << 64, (2, L, L), dtype=np.uint64)
        w8, corr = build_rhs_tables(Ms)
        x = r.integers(0, 1 << 64, (B, L), dtype=np.uint64)
        x0, x1 = to_pairs(x)
        for v in range(2):
            y0, y1 = mxu_rhs_apply(g, x0, x1, L, w8[v], corr[v])
            got = from_pairs(y0, y1).astype(object)
            # out[b, k] = sum_l x[b, l] * M[l, k] -> x @ M
            want = (x.astype(object) @ Ms[v].astype(object)) % P
            assert ((got - want) % P == 0).all()

    @staticmethod
    def _rtrans_matrix(t, inverse):
        fp = t.fp
        rs = fp.rs
        R = fp.R
        eye = np.eye(R, dtype=np.uint64)
        x0, x1 = to_pairs(eye)
        x0 = x0.reshape(rs.L1, rs.L2, R)
        x1 = x1.reshape(rs.L1, rs.L2, R)
        tw = t.t_r_inv if inverse else t.t_r
        tw0 = np.asarray(tw[0]).reshape(rs.L1, rs.L2, 1)
        tw1 = np.asarray(tw[1]).reshape(rs.L1, rs.L2, 1)
        y0, y1 = fs.col_transform(g, x0, x1, rs, tw0, tw1, 1, inverse)
        y0, y1 = g.canon(y0.reshape(R, R), y1.reshape(R, R))
        return from_pairs(y0, y1)

    @pytest.mark.parametrize("n,seed", [
        (32768, 3),
        # smoke budget: biggest fused-square shape rides the heavy tier
        pytest.param(65536, 4, marks=pytest.mark.heavy)])
    def test_fused_square_matches_square_ref(self, n, seed):
        p = int(n * 16.5) | 1
        plan = build_plan(p, n=n)
        fp = fs.FourStepPlan.from_plan(plan)
        t = fs.FourStepTables.build(fp, np, G=1, lanes=128)
        fs.attach_fused_c_tables(t)
        assert t.fused is not None
        r = np.random.default_rng(seed)
        mp = (1 << p) - 1
        v = int.from_bytes(r.bytes(p // 8), "little") % mp
        digits = dg.int_to_digits(v, plan.widths)
        want = fs.square_ref(t, digits).astype(object)

        R, C = fp.R, fp.C
        pn = p % n
        nr2 = field.root_two_nth(n)
        nr2i = field.inv(nr2)
        inv2 = field.inv(2)
        er = np.array([(-pn * rr * C) % n for rr in range(R)])
        ec = np.array([(-pn * c) % n for c in range(C)])
        wr = np.array([pow(nr2, int(e), P) for e in er], dtype=object)
        iwr = np.array([pow(nr2i, int(e), P) * field.inv(n) % P
                        for e in er], dtype=object)
        wrap = (er[:, None] + ec[None, :]) >= n
        wtab = np.where(wrap, wr[:, None] * inv2 % P, wr[:, None])
        iwtab = np.where(wrap, iwr[:, None] * 2 % P, iwr[:, None])

        MRf = self._rtrans_matrix(t, False).astype(object)
        MRi = self._rtrans_matrix(t, True).astype(object)
        (_wf8, _cf, _wi8, _ci, _wrapc,
         mf0, mf1, mi0, mi1) = t.fused
        mid_f = from_pairs(np.asarray(mf0).reshape(fp.rs.L1, fp.rs.L2, -1),
                           np.asarray(mf1).reshape(fp.rs.L1, fp.rs.L2, -1)
                           ).reshape(R, C).astype(object)
        mid_i = from_pairs(np.asarray(mi0).reshape(fp.rs.L1, fp.rs.L2, -1),
                           np.asarray(mi1).reshape(fp.rs.L1, fp.rs.L2, -1)
                           ).reshape(R, C).astype(object)

        x = digits.astype(object).reshape(R, C)
        xw = x * wtab % P
        S = (MRf @ xw) % P
        Sm = S * mid_f % P
        s0, s1 = to_pairs(Sm.astype(np.uint64))
        f0, f1 = fs.fused_c_ref(t, s0, s1, "sqr")
        Fv = from_pairs(*g.canon(f0, f1)).astype(object)
        Fm = Fv * mid_i % P
        V = (MRi @ Fm) % P
        out = V * iwtab % P
        got = out.reshape(n)
        assert ((got - want) % P == 0).all()
        assert (want % P == want).all()

    @pytest.mark.heavy  # smoke budget: mul center covered at small n
    @pytest.mark.parametrize("n", [32768])
    def test_fused_mul_path(self, n):
        """fwd (multiplicand) + mul center must equal squaring when
        multiplying a value by itself."""
        p = int(n * 16.5) | 1
        plan = build_plan(p, n=n)
        fp = fs.FourStepPlan.from_plan(plan)
        t = fs.FourStepTables.build(fp, np, G=1, lanes=128)
        fs.attach_fused_c_tables(t)
        r = np.random.default_rng(9)
        x = r.integers(0, 1 << 64, (fp.R, fp.C), dtype=np.uint64)
        x0, x1 = to_pairs(x)
        sq0, sq1 = fs.fused_c_ref(t, x0, x1, "sqr")
        u0, u1 = fs.fused_c_ref(t, x0, x1, "fwd")
        m0, m1 = fs.fused_c_ref(t, x0, x1, "mul", u0, u1)
        a = from_pairs(*g.canon(sq0, sq1))
        b = from_pairs(*g.canon(m0, m1))
        assert (a == b).all()


class TestRadix5:
    """5-smooth transforms (n = 5*2^k): the radix-5 factor rides rs.L2
    as a natural-order MXU matrix (reference radix-5 stages:
    kernels/marin.cl:946-1236, ibdwt.h:17-43)."""

    def test_split_shapes(self):
        sp = fs.make_split(1280)
        assert (sp.L1, sp.L2) == (64, 20)
        sp = fs.make_split(20480)
        assert (sp.L1, sp.L2) == (64, 320)
        sp = fs.make_split(320)
        assert (sp.L1, sp.L2) == (64, 5)

    def test_dft_matrix_radix5_inverse(self):
        from prmers_tpu.ops.pallas.mxu_dft import dft_matrix
        for L in (5, 20):
            M = dft_matrix(L, False).astype(object)
            Mi = dft_matrix(L, True).astype(object)
            prod = (Mi @ M) % P
            Linv = pow(L, P - 2, P)
            want = (np.eye(L, dtype=object) * L) % P
            assert (prod == want).all()

    @pytest.mark.heavy
    def test_square_ref_5smooth(self):
        n = 327680                       # 5 * 2^16 -> R = 320 = 64 * 5
        p = int(n * 16.5) | 1
        plan = build_plan(p, n=n)
        fp = fs.FourStepPlan.from_plan(plan)
        assert fp.R == 320 and (fp.rs.L1, fp.rs.L2) == (64, 5)
        t = fs.FourStepTables.build(fp, np, G=1, lanes=128)
        r = np.random.default_rng(7)
        mp = (1 << p) - 1
        v = int.from_bytes(r.bytes(p // 8), "little") % mp
        y = fs.square_ref(t, dg.int_to_digits(v, plan.widths))
        q = np.concatenate(
            [[0], np.cumsum(plan.widths.astype(np.int64))])[:n]
        val = sum(int(x) << int(qq) for x, qq in zip(y, q)) % mp
        assert val == (v * v) % mp

    @pytest.mark.heavy
    def test_fused_c_still_exact_5smooth(self):
        """The fused C tables are independent of the radix-5 R factor;
        fwd+mul must equal sqr on a 5-smooth plan."""
        n = 327680
        p = int(n * 16.5) | 1
        plan = build_plan(p, n=n)
        fp = fs.FourStepPlan.from_plan(plan)
        t = fs.FourStepTables.build(fp, np, G=1, lanes=128)
        fs.attach_fused_c_tables(t)
        assert t.fused is not None
        r = np.random.default_rng(8)
        x = r.integers(0, 1 << 64, (fp.R, fp.C), dtype=np.uint64)
        x0, x1 = to_pairs(x)
        sq0, sq1 = fs.fused_c_ref(t, x0, x1, "sqr")
        u0, u1 = fs.fused_c_ref(t, x0, x1, "fwd")
        m0, m1 = fs.fused_c_ref(t, x0, x1, "mul", u0, u1)
        a = from_pairs(*g.canon(sq0, sq1))
        b = from_pairs(*g.canon(m0, m1))
        assert (a == b).all()
