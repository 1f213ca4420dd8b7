"""ECM on twisted Edwards curves (a = -1, extended coordinates) — the
default ECM path, mirroring the reference's register-level Edwards driver
(reference: src/modes/RunEcmTwistedEdwards.cpp:834 — 51-register extended
twisted-Edwards program, unified add :2694-2772, doubling :2869+, periodic
invariant check via -ecm_check_interval, prepared multiplicands cached in
registers :1859-1863).

Curve construction: deterministic (x0, y0) from the per-curve seed and
d = (y0^2 - x0^2 - 1) / (x0^2 y0^2) mod N — every (x0, y0) lies on exactly
one a=-1 curve, and the construction needs no square root mod the
composite N. (The reference's torsion-8/16 parametrizations buy a better
smoothness constant; the generic construction is functionally complete —
torsion families are a planned refinement.)

Formulas (extended coordinates (X:Y:Z:T), T = XY/Z, a = -1; the ed25519
sign-correct forms of HWCD 2008):

  dbl:  A=X^2 B=Y^2 C=2Z^2 H=A+B E=H-(X+Y)^2 G=A-B F=C+G
        X3=E*F Y3=G*H T3=E*H Z3=F*G
  add (second operand cached as the prepared quad
       (Y2-X2, Y2+X2, 2d*T2, 2*Z2), all in multiplicand form):
        A=(Y1-X1)*q0 B=(Y1+X1)*q1 C=T1*q2 D=Z1*q3
        E=B-A H=B+A F=D-C G=D+C -> X3=E*F Y3=G*H T3=E*H Z3=F*G

Stage 1: [k]P by left-to-right double-and-add, k = prod p^floor(log_p B1);
a factor q divides gcd(X, N) iff the curve order mod q divides k
(identity = (0, 1)). Stage 2: BSGS over primes in (B1, B2] using
y-coordinate cross-products (y(-P) = y(P) on Edwards, so the +-j wheel
works exactly like Montgomery x-coordinates).
"""

from __future__ import annotations

import math
import time

from ..engine.api import Engine
from ..engine.factory import create_engine
from ..io.options import Options
from ..utils import gmp
from ..utils import primes as pr
from .ecm import EcmResult, _FactorFound, _inv_or_factor, splitmix64

# register map --------------------------------------------------------------
EX, EY, EZ, ET = 0, 1, 2, 3                  # current point
BQ0, BQ1, BQ2, BQ3 = 4, 5, 6, 7              # prepared base quad
R2D = 8                                      # multiplicand: 2d
RDM = 9                                      # multiplicand: d  (invariant)
TA, TB, TC, TD, TE, TG, TH = 10, 11, 12, 13, 14, 15, 16
M_E, M_G = 17, 18                            # multiplicand scratch
RACC = 19
GX, GY, GZ, GT = 20, 21, 22, 23              # giant point (stage 2)
PD0, PD1, PD2, PD3 = 24, 25, 26, 27          # prepared step quad
SX, SY, SZ, ST = 28, 29, 30, 31              # saved point scratch
ED_BASE_REGS = 32


def edwards_curve(seed: int, n: int) -> tuple[int, int, int]:
    """(x0, y0, d) with -x0^2 + y0^2 = 1 + d x0^2 y0^2 (mod n)."""
    x0 = 2 + splitmix64(seed) % (1 << 48)
    y0 = 3 + splitmix64(seed ^ 0xE0E0) % (1 << 48)
    num = (y0 * y0 - x0 * x0 - 1) % n
    den = (x0 * x0 % n) * (y0 * y0 % n) % n
    d = gmp.mulmod(num, _inv_or_factor(den, n), n)
    if d == 0 or (d + 1) % n == 0:   # singular / a == d degeneracies
        raise _FactorFound(0)
    return x0, y0, d


class EdOps:
    """Extended twisted-Edwards point ops over engine registers."""

    def __init__(self, eng: Engine, n: int, d: int):
        self.e = eng
        self.n = n
        self.d = d
        eng.set_int(TA, (2 * d) % n)
        eng.set_multiplicand(R2D, TA)
        eng.set_int(TA, d)
        eng.set_multiplicand(RDM, TA)

    # -- point load/store -------------------------------------------------
    def set_affine(self, x0: int, y0: int):
        e = self.e
        n = self.n
        e.set_int(EX, x0 % n)
        e.set_int(EY, y0 % n)
        e.set(EZ, 1)
        e.set_int(ET, x0 * y0 % n)

    def prep_quad_host(self, q0: int, x0: int, y0: int):
        """Prepared quad of an affine host point into regs q0..q0+3."""
        e = self.e
        n = self.n
        e.set_int(TA, (y0 - x0) % n)
        e.set_multiplicand(q0, TA)
        e.set_int(TA, (y0 + x0) % n)
        e.set_multiplicand(q0 + 1, TA)
        e.set_int(TA, 2 * self.d % n * (x0 * y0 % n) % n)
        e.set_multiplicand(q0 + 2, TA)
        e.set(TA, 2)
        e.set_multiplicand(q0 + 3, TA)

    def prep_quad_reg(self, q0: int, px: int, py: int, pz: int, pt: int):
        """Prepared quad of a register point (clobbers TA/TB)."""
        e = self.e
        e.copy(TA, py)
        e.sub_reg(TA, px)
        e.set_multiplicand(q0, TA)
        e.copy(TA, py)
        e.add(TA, px)
        e.set_multiplicand(q0 + 1, TA)
        e.copy(TA, pt)
        e.mul(TA, R2D)
        e.set_multiplicand(q0 + 2, TA)
        e.copy(TA, pz)
        e.copy(TB, pz)
        e.add(TA, TB)
        e.set_multiplicand(q0 + 3, TA)

    # -- group ops ---------------------------------------------------------
    def dbl(self):
        """(EX:EY:EZ:ET) = 2 * (EX:EY:EZ:ET)."""
        e = self.e
        e.copy(TA, EX)
        e.square_mul(TA)                 # A = X^2
        e.copy(TB, EY)
        e.square_mul(TB)                 # B = Y^2
        e.copy(TC, EZ)
        e.square_mul(TC)
        e.copy(TD, TC)
        e.add(TC, TD)                    # C = 2 Z^2
        e.copy(TE, EX)
        e.add(TE, EY)
        e.square_mul(TE)                 # (X+Y)^2
        e.copy(TH, TA)
        e.add(TH, TB)                    # H = A + B
        e.copy(TG, TA)
        e.sub_reg(TG, TB)                # G = A - B
        e.copy(TA, TH)
        e.sub_reg(TA, TE)                # E = H - (X+Y)^2
        e.copy(TB, TC)
        e.add(TB, TG)                    # F = C + G
        e.set_multiplicand(M_E, TA)
        e.set_multiplicand(M_G, TG)
        e.copy(EX, TB)
        e.mul(EX, M_E)                   # X3 = E*F
        e.copy(ET, TH)
        e.mul(ET, M_E)                   # T3 = E*H
        e.copy(EY, TH)
        e.mul(EY, M_G)                   # Y3 = G*H
        e.copy(EZ, TB)
        e.mul(EZ, M_G)                   # Z3 = F*G

    def add_quad(self, q0: int):
        """(EX:EY:EZ:ET) += point whose prepared quad is at q0..q0+3."""
        e = self.e
        e.copy(TA, EY)
        e.sub_reg(TA, EX)
        e.mul(TA, q0)                    # A = (Y1-X1)(Y2-X2)
        e.copy(TB, EY)
        e.add(TB, EX)
        e.mul(TB, q0 + 1)                # B = (Y1+X1)(Y2+X2)
        e.copy(TC, ET)
        e.mul(TC, q0 + 2)                # C = T1 * 2d T2
        e.copy(TD, EZ)
        e.mul(TD, q0 + 3)                # D = Z1 * 2 Z2
        e.addsub(TH, TE, TB, TA)         # H = B+A, E = B-A
        e.addsub(TG, TB, TD, TC)         # G = D+C, F = B-... (TB = D-C)
        e.set_multiplicand(M_E, TE)
        e.set_multiplicand(M_G, TG)
        e.copy(EX, TB)
        e.mul(EX, M_E)                   # X3 = E*F
        e.copy(ET, TH)
        e.mul(ET, M_E)                   # T3 = E*H
        e.copy(EY, TH)
        e.mul(EY, M_G)                   # Y3 = G*H
        e.copy(EZ, TB)
        e.mul(EZ, M_G)                   # Z3 = F*G

    def scalar_mul_quad(self, k: int, q0: int):
        """Current point = [k] * (point of quad q0), where the current
        point ALREADY holds that point (left-to-right binary)."""
        for i in range(k.bit_length() - 2, -1, -1):
            self.dbl()
            if (k >> i) & 1:
                self.add_quad(q0)

    # -- checks -------------------------------------------------------------
    def invariant_ok(self) -> bool:
        """-X^2 + Y^2 == Z^2 + d T^2 (projective curve equation)."""
        e = self.e
        e.copy(TA, EY)
        e.square_mul(TA)
        e.copy(TB, EX)
        e.square_mul(TB)
        e.sub_reg(TA, TB)
        e.copy(TB, EZ)
        e.square_mul(TB)
        e.copy(TC, ET)
        e.square_mul(TC)
        e.mul(TC, RDM)
        e.add(TB, TC)
        return e.is_equal(TA, TB)

    def save(self):
        e = self.e
        for d_, s in ((SX, EX), (SY, EY), (SZ, EZ), (ST, ET)):
            e.copy(d_, s)

    def restore(self):
        e = self.e
        for d_, s in ((EX, SX), (EY, SY), (EZ, SZ), (ET, ST)):
            e.copy(d_, s)


def _stage1(ops: EdOps, x0: int, y0: int, b1: int, check_every: int,
            log) -> None:
    ops.set_affine(x0, y0)
    ops.prep_quad_host(BQ0, x0, y0)
    k = pr.build_e(b1)
    since = 0
    ops.save()
    for i in range(k.bit_length() - 2, -1, -1):
        ops.dbl()
        if (k >> i) & 1:
            ops.add_quad(BQ0)
        since += 1
        if check_every and since >= check_every:
            if not ops.invariant_ok():
                log("ECM: invariant check FAILED — replaying window")
                ops.restore()
                raise _GlRetry(i)
            ops.save()
            since = 0
    if check_every and not ops.invariant_ok():
        log("ECM: final invariant check FAILED")
        raise _GlRetry(-1)


class _GlRetry(RuntimeError):
    def __init__(self, bit: int):
        self.bit = bit


def _stage1_backtrack(ops: EdOps, n: int, x0: int, y0: int, b1: int) -> int:
    """gcd(X, N) == N: every factor's order divides k. Replay the prime
    powers one at a time from the base point, gcd after each — the first
    prime power past a single factor's order isolates it (reference: the
    Montgomery driver's equivalent salvage, RunEcm.cpp g==N path)."""
    e = ops.e
    ops.set_affine(x0, y0)
    for pw in pr.prime_powers_upto(b1):
        ops.prep_quad_reg(PD0, EX, EY, EZ, ET)
        ops.scalar_mul_quad(pw, PD0)
        g = gmp.gcd(e.get_int(EX) % n, n)
        if 1 < g < n:
            return g
        if g == n:
            return 0  # one prime power jumped past all factors at once
    return 0


def _stage2(ops: EdOps, opts: Options, n: int, log) -> int:
    """BSGS with y-coordinate cross-products; returns the accumulator."""
    e = ops.e
    b1, b2 = opts.b1, opts.b2
    from .ecm import _stage2_D
    D = _stage2_D(opts)
    baby_js = [j for j in range(1, D // 2 + 1) if math.gcd(j, D) == 1]
    slots = {}
    BY0 = ED_BASE_REGS

    # Q = stage-1 point; walk [j]Q for odd j via repeated += [2]Q
    ops.prep_quad_reg(PD0, EX, EY, EZ, ET)    # quad(Q)
    ops.save()                                # save Q
    ops.dbl()                                 # current = [2]Q
    ops.prep_quad_reg(BQ0, EX, EY, EZ, ET)    # quad([2]Q) reuses base slot
    ops.restore()                             # current = [1]Q
    j = 1
    idx = 0
    for jj in baby_js:
        while j < jj:
            # [2]Q steps when possible; a single [1]Q step covers the odd
            # parity change that even baby residues of an odd D require
            if jj - j >= 2:
                ops.add_quad(BQ0)
                j += 2
            else:
                ops.add_quad(PD0)
                j += 1
        sy, sz = BY0 + 2 * idx, BY0 + 2 * idx + 1
        e.copy(sy, EY)
        e.copy(sz, EZ)
        slots[jj] = (sy, sz)
        idx += 1

    # giants: G = [m0 D]Q, step [D]Q
    ops.restore()
    ops.scalar_mul_quad(D, PD0)               # current = [D]Q
    ops.prep_quad_reg(PD0, EX, EY, EZ, ET)    # quad([D]Q)
    m0 = max((b1 + D // 2) // D, 1)
    if m0 > 1:
        ops.scalar_mul_quad(m0, PD0)          # [m0 D]Q from [D]Q
    e.copy(GX, EX)
    e.copy(GY, EY)
    e.copy(GZ, EZ)
    e.copy(GT, ET)

    e.set(RACC, 1)
    mcur = m0
    count = 0
    for block in pr.segmented_primes(b1 + 1, b2 + 1):
        for q in block.tolist():
            if math.gcd(q, D) != 1:
                continue
            mq = (q + D // 2) // D
            while mcur < mq:
                e.copy(EX, GX)
                e.copy(EY, GY)
                e.copy(EZ, GZ)
                e.copy(ET, GT)
                ops.add_quad(PD0)
                e.copy(GX, EX)
                e.copy(GY, EY)
                e.copy(GZ, EZ)
                e.copy(GT, ET)
                mcur += 1
            jj = abs(q - mcur * D)
            if jj == 0:
                continue
            sy, sz = slots[jj]
            # cross = Y_G * Z_j - Y_j * Z_G   (y(-P) = y(P))
            e.copy(TA, sz)
            e.set_multiplicand(M_E, TA)
            e.copy(TB, GY)
            e.mul(TB, M_E)
            e.copy(TA, sy)
            e.set_multiplicand(M_E, TA)
            e.copy(TC, GZ)
            e.mul(TC, M_E)
            e.sub_reg(TB, TC)
            e.set_multiplicand(M_E, TB)
            e.mul(RACC, M_E)
            count += 1
    log(f"ECM-Edwards stage 2: {count} primes in ({b1}, {b2}]")
    return e.get_int(RACC)


def run_ecm_edwards(opts: Options, log=print) -> EcmResult:
    """K curves of twisted-Edwards ECM on M_p with deterministic seeds."""
    p = opts.exponent
    n = (1 << p) - 1
    t0 = time.monotonic()
    K = max(opts.curves, 1)
    from .ecm import _stage2_D
    D = _stage2_D(opts)
    n_babies = len([j for j in range(1, D // 2 + 1) if math.gcd(j, D) == 1])
    regs = ED_BASE_REGS + 2 * n_babies + 2
    eng = create_engine(p, regs, backend=opts.backend,
                        arith=opts.arith, workload="ecm")
    seed0 = opts.curve_seed or 0x5EED
    check_every = getattr(opts, "ecm_check_interval", 0) or 0
    result = EcmResult(p=p, b1=opts.b1, b2=opts.b2, curves=K)
    for c in range(K):
        seed = splitmix64(seed0 + c)
        try:
            x0, y0, d = edwards_curve(seed, n)
        except _FactorFound as f:
            if f.f:
                result.factor, result.stage = f.f, 0
                result.factor_sigma, result.factor_curve = seed, c
                break
            continue
        ops = EdOps(eng, n, d)
        try:
            _stage1(ops, x0, y0, opts.b1, check_every, log)
        except _GlRetry:
            log(f"ECM-Edwards curve {c}: hardware invariant error, "
                "restarting curve")
            continue
        g = gmp.gcd(eng.get_int(EX) % n, n)
        hit_all = g == n
        if hit_all:
            log(f"ECM-Edwards curve {c}: gcd == N, backtracking stage 1")
            g = _stage1_backtrack(ops, n, x0, y0, opts.b1)
        if 1 < g < n:
            result.factor, result.stage = g, 1
            result.factor_sigma, result.factor_curve = seed, c
            log(f"ECM-Edwards curve {c} stage 1 factor {g}")
            break
        if hit_all:
            continue  # [k]P vanished mod every factor; stage 2 is moot
        if opts.b2 > opts.b1:
            acc = _stage2(ops, opts, n, log)
            g = gmp.gcd(acc % n, n)
            if 1 < g < n:
                result.factor, result.stage = g, 2
                result.factor_sigma, result.factor_curve = seed, c
                log(f"ECM-Edwards curve {c} stage 2 factor {g}")
                break
        log(f"ECM-Edwards curve {c}: no factor")
    result.elapsed = time.monotonic() - t0
    return result
