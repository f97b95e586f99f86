"""Host-side (Python-int) algebra for BLS12-377: Fq tower, curves, pairing.

This is the *verification / setup / test-vector* path of the framework — the
analog of the reference running the (small) verifier locally on plain
arkworks types (ref: mpc-snarks/src/proof.rs:141 verifies the revealed proof
locally).  The prover hot loops never run here; they use the device field in
`algebra/field.py` + `ops/`.

Everything is implemented over plain Python ints (arbitrary precision), with
the extension tower
    Fq2  = Fq [u]/(u^2 + 5)
    Fq6  = Fq2[v]/(v^3 - u)
    Fq12 = Fq6[w]/(w^2 - v)
and the ate pairing computed with a Miller loop over the untwisted G2 point
in E(Fq12) (untwist: (x,y) -> (x*w^2, y*w^3), using w^6 = u).
"""

from __future__ import annotations

import functools

from . import bls12_377 as C

Q = C.Q_MOD
R = C.R_MOD


# ---------------------------------------------------------------------------
# Fq2 as pairs, Fq6 as triples of pairs, Fq12 as pairs of triples of pairs.
# Represented as nested tuples of ints; all functions are module-level for
# speed (no per-element object overhead in the Miller loop).
# ---------------------------------------------------------------------------

NR = C.FQ2_NONRESIDUE  # -5 mod q


def fq2(c0=0, c1=0):
    return (c0 % Q, c1 % Q)


FQ2_ZERO = (0, 0)
FQ2_ONE = (1, 0)


def fq2_add(a, b):
    return ((a[0] + b[0]) % Q, (a[1] + b[1]) % Q)


def fq2_sub(a, b):
    return ((a[0] - b[0]) % Q, (a[1] - b[1]) % Q)


def fq2_neg(a):
    return ((-a[0]) % Q, (-a[1]) % Q)


def fq2_mul(a, b):
    # (a0 + a1 u)(b0 + b1 u) = a0 b0 + NR a1 b1 + (a0 b1 + a1 b0) u
    t0 = a[0] * b[0]
    t1 = a[1] * b[1]
    return ((t0 + NR * t1) % Q, (a[0] * b[1] + a[1] * b[0]) % Q)


def fq2_mul_scalar(a, s):
    return (a[0] * s % Q, a[1] * s % Q)


def fq2_sqr(a):
    return fq2_mul(a, a)


def fq2_inv(a):
    # 1/(a0 + a1 u) = (a0 - a1 u) / (a0^2 - NR a1^2)
    norm = (a[0] * a[0] - NR * a[1] * a[1]) % Q
    inorm = pow(norm, Q - 2, Q)
    return (a[0] * inorm % Q, (-a[1]) * inorm % Q)


def fq2_conj(a):
    return (a[0], (-a[1]) % Q)


def fq2_pow(a, e):
    r = FQ2_ONE
    base = a
    while e:
        if e & 1:
            r = fq2_mul(r, base)
        base = fq2_sqr(base)
        e >>= 1
    return r


# Fq6 = Fq2[v]/(v^3 - u): elements (c0, c1, c2) of Fq2; v^3 = u = (0,1).
FQ6_ZERO = (FQ2_ZERO, FQ2_ZERO, FQ2_ZERO)
FQ6_ONE = (FQ2_ONE, FQ2_ZERO, FQ2_ZERO)
_V3 = (0, 1)  # v^3 = u in Fq2


def _fq2_mul_by_v3(a):
    # multiply Fq2 element by u: (a0 + a1 u) u = NR a1 + a0 u
    return (NR * a[1] % Q, a[0])


def fq6_add(a, b):
    return tuple(fq2_add(x, y) for x, y in zip(a, b))


def fq6_sub(a, b):
    return tuple(fq2_sub(x, y) for x, y in zip(a, b))


def fq6_neg(a):
    return tuple(fq2_neg(x) for x in a)


def fq6_mul(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    t0 = fq2_mul(a0, b0)
    t1 = fq2_mul(a1, b1)
    t2 = fq2_mul(a2, b2)
    c0 = fq2_add(t0, _fq2_mul_by_v3(fq2_sub(fq2_mul(fq2_add(a1, a2), fq2_add(b1, b2)), fq2_add(t1, t2))))
    c1 = fq2_add(fq2_sub(fq2_mul(fq2_add(a0, a1), fq2_add(b0, b1)), fq2_add(t0, t1)), _fq2_mul_by_v3(t2))
    c2 = fq2_add(fq2_sub(fq2_mul(fq2_add(a0, a2), fq2_add(b0, b2)), fq2_add(t0, t2)), t1)
    return (c0, c1, c2)


def fq6_sqr(a):
    return fq6_mul(a, a)


def fq6_mul_by_v(a):
    # (c0, c1, c2) * v = (u*c2, c0, c1)
    return (_fq2_mul_by_v3(a[2]), a[0], a[1])


def fq6_inv(a):
    a0, a1, a2 = a
    t0 = fq2_sub(fq2_sqr(a0), _fq2_mul_by_v3(fq2_mul(a1, a2)))
    t1 = fq2_sub(_fq2_mul_by_v3(fq2_sqr(a2)), fq2_mul(a0, a1))
    t2 = fq2_sub(fq2_sqr(a1), fq2_mul(a0, a2))
    # norm = a0 t0 + u (a2 t1 + a1 t2)
    norm = fq2_add(fq2_mul(a0, t0), _fq2_mul_by_v3(fq2_add(fq2_mul(a2, t1), fq2_mul(a1, t2))))
    inorm = fq2_inv(norm)
    return (fq2_mul(t0, inorm), fq2_mul(t1, inorm), fq2_mul(t2, inorm))


# Fq12 = Fq6[w]/(w^2 - v): elements (c0, c1) of Fq6.
FQ12_ONE = (FQ6_ONE, FQ6_ZERO)
FQ12_ZERO = (FQ6_ZERO, FQ6_ZERO)


def fq12_add(a, b):
    return (fq6_add(a[0], b[0]), fq6_add(a[1], b[1]))


def fq12_sub(a, b):
    return (fq6_sub(a[0], b[0]), fq6_sub(a[1], b[1]))


def fq12_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    t0 = fq6_mul(a0, b0)
    t1 = fq6_mul(a1, b1)
    c0 = fq6_add(t0, fq6_mul_by_v(t1))
    c1 = fq6_sub(fq6_sub(fq6_mul(fq6_add(a0, a1), fq6_add(b0, b1)), t0), t1)
    return (c0, c1)


def fq12_sqr(a):
    return fq12_mul(a, a)


def fq12_conj(a):
    """Conjugate over Fq6 (the q^6 Frobenius): (c0, -c1)."""
    return (a[0], fq6_neg(a[1]))


def fq12_inv(a):
    a0, a1 = a
    norm = fq6_sub(fq6_sqr(a0), fq6_mul_by_v(fq6_sqr(a1)))
    inorm = fq6_inv(norm)
    return (fq6_mul(a0, inorm), fq6_neg(fq6_mul(a1, inorm)))


def fq12_pow(a, e):
    if e < 0:
        return fq12_pow(fq12_inv(a), -e)
    r = FQ12_ONE
    base = a
    while e:
        if e & 1:
            r = fq12_mul(r, base)
        base = fq12_sqr(base)
        e >>= 1
    return r


# Frobenius on Fq12: x -> x^q, computed coefficient-wise:
#   (a + b u)^q = a + b u^q = a - b u   (u^q = -u since q odd, u^2 = NR)
#   v^q = v^(q) -> v * (v^3)^((q-1)/3) = v * u^((q-1)/3)
# We precompute gamma_i = u^(i*(q-1)/6) as Fq2 elements via w^q = w * w^(q-1),
# w^(q-1) = (w^6)^((q-1)/6) = u^((q-1)/6).
@functools.lru_cache(maxsize=None)
def _frob_gammas():
    # u^((q-1)/6) lives in Fq2: u^k for k = (q-1)/6. u^2 = NR in Fq, so
    # u^k = NR^(k//2) * u^(k%2).
    k = (Q - 1) // 6
    base = pow(NR, k // 2, Q)
    if k % 2 == 0:
        g1 = (base, 0)
    else:
        g1 = (0, base)
    gammas = [FQ2_ONE]
    for _ in range(1, 12):
        gammas.append(fq2_mul(gammas[-1], g1))
    return gammas


def fq12_frobenius(a):
    """x -> x^q on Fq12 represented as ((c00,c01,c02),(c10,c11,c12)) with
    c_ij in Fq2 and x = sum_{i,j} c_ij v^j w^i (w^2=v, v^3=u)."""
    g = _frob_gammas()
    (c00, c01, c02), (c10, c11, c12) = a
    # coefficient of v^j w^i picks up gamma(2j + i) after conjugating the Fq2 part
    n00 = fq2_mul(fq2_conj(c00), g[0])
    n01 = fq2_mul(fq2_conj(c01), g[2])
    n02 = fq2_mul(fq2_conj(c02), g[4])
    n10 = fq2_mul(fq2_conj(c10), g[1])
    n11 = fq2_mul(fq2_conj(c11), g[3])
    n12 = fq2_mul(fq2_conj(c12), g[5])
    return ((n00, n01, n02), (n10, n11, n12))


# ---------------------------------------------------------------------------
# Curves (host, affine coordinates with None = infinity)
# ---------------------------------------------------------------------------


class CurveOps:
    """Generic short-Weierstrass affine ops, parameterized over a field
    given as a dict of function pointers (works for Fq ints and Fq2 tuples)."""

    def __init__(self, add, sub, mul, sqr, inv, neg, zero, one, a, b,
                 order=None):
        self.fadd, self.fsub, self.fmul = add, sub, mul
        self.fsqr, self.finv, self.fneg = sqr, inv, neg
        self.zero, self.one, self.a, self.b = zero, one, a, b
        # scalar group order (defaults to BLS12-377 r; BN254 passes its own)
        self.order = R if order is None else order

    def is_on_curve(self, P):
        if P is None:
            return True
        x, y = P
        lhs = self.fsqr(y)
        rhs = self.fadd(self.fadd(self.fmul(self.fsqr(x), x), self.fmul_a(x)), self.b)
        return lhs == rhs

    def fmul_a(self, x):
        if self.a == self.zero:
            return self.zero
        return self.fmul(self.a, x)

    def add(self, P, Q):
        if P is None:
            return Q
        if Q is None:
            return P
        x1, y1 = P
        x2, y2 = Q
        if x1 == x2:
            if y1 == y2:
                return self.double(P)
            return None
        lam = self.fmul(self.fsub(y2, y1), self.finv(self.fsub(x2, x1)))
        x3 = self.fsub(self.fsub(self.fsqr(lam), x1), x2)
        y3 = self.fsub(self.fmul(lam, self.fsub(x1, x3)), y1)
        return (x3, y3)

    def double(self, P):
        if P is None:
            return None
        x1, y1 = P
        if y1 == self.zero:
            return None
        three_x2 = self.fmul_scalar(self.fsqr(x1), 3)
        num = self.fadd(three_x2, self.a) if self.a != self.zero else three_x2
        lam = self.fmul(num, self.finv(self.fmul_scalar(y1, 2)))
        x3 = self.fsub(self.fsqr(lam), self.fmul_scalar(x1, 2))
        y3 = self.fsub(self.fmul(lam, self.fsub(x1, x3)), y1)
        return (x3, y3)

    def fmul_scalar(self, x, s):
        acc = self.zero
        for _ in range(s):
            acc = self.fadd(acc, x)
        return acc

    def neg(self, P):
        if P is None:
            return None
        return (P[0], self.fneg(P[1]))

    def scalar_mul(self, P, k):
        k %= self.order
        acc = None
        add = self.add
        while k:
            if k & 1:
                acc = add(acc, P)
            P = self.double(P)
            k >>= 1
        return acc


def _fq_ops():
    return CurveOps(
        add=lambda a, b: (a + b) % Q,
        sub=lambda a, b: (a - b) % Q,
        mul=lambda a, b: a * b % Q,
        sqr=lambda a: a * a % Q,
        inv=lambda a: pow(a, Q - 2, Q),
        neg=lambda a: (-a) % Q,
        zero=0,
        one=1,
        a=C.G1_A,
        b=C.G1_B,
    )


def _fq2_ops():
    b2 = (C.G2_B_C0, C.G2_B_C1)
    return CurveOps(
        add=fq2_add, sub=fq2_sub, mul=fq2_mul, sqr=fq2_sqr, inv=fq2_inv,
        neg=fq2_neg, zero=FQ2_ZERO, one=FQ2_ONE, a=FQ2_ZERO, b=b2,
    )


G1 = _fq_ops()
G2 = _fq2_ops()

G1_GEN = (C.G1_GEN_X, C.G1_GEN_Y)
G2_GEN = ((C.G2_GEN_X_C0, C.G2_GEN_X_C1), (C.G2_GEN_Y_C0, C.G2_GEN_Y_C1))


# ---------------------------------------------------------------------------
# Pairing: ate pairing over the untwisted G2 in E(Fq12).
# ---------------------------------------------------------------------------

# w^2 and w^3 as Fq12 elements (sparse): w^2 = v -> c0 coefficient v^1;
# w^3 = v*w -> c1 coefficient v^1.
_W2 = ((FQ2_ZERO, FQ2_ONE, FQ2_ZERO), FQ6_ZERO)
_W3 = (FQ6_ZERO, (FQ2_ZERO, FQ2_ONE, FQ2_ZERO))


def _fq2_to_fq12(a):
    return ((a, FQ2_ZERO, FQ2_ZERO), FQ6_ZERO)


def _fq_to_fq12(a):
    return (((a % Q, 0), FQ2_ZERO, FQ2_ZERO), FQ6_ZERO)


def untwist(Qpt):
    """Map a G2 (twist-curve) affine point into E(Fq12):
    (x, y) -> (x * w^2, y * w^3).  Uses w^6 = u (D-type twist)."""
    if Qpt is None:
        return None
    x, y = Qpt
    return (
        fq12_mul(_fq2_to_fq12(x), _W2),
        fq12_mul(_fq2_to_fq12(y), _W3),
    )


def _fq12_curve_ops():
    return CurveOps(
        add=fq12_add, sub=fq12_sub, mul=fq12_mul, sqr=fq12_sqr,
        inv=fq12_inv, neg=lambda a: fq12_sub(FQ12_ZERO, a),
        zero=FQ12_ZERO, one=FQ12_ONE, a=FQ12_ZERO, b=_fq_to_fq12(C.G1_B),
    )


E12 = _fq12_curve_ops()


def _line(Tp, Qp, P12):
    """Evaluate the line through T and Q (points of E(Fq12)) at P (embedded
    in Fq12); returns an Fq12 value.  Handles T==Q (tangent) and vertical."""
    x1, y1 = Tp
    x2, y2 = Qp
    xp, yp = P12
    if x1 == x2 and y1 == y2:
        # tangent
        num = fq12_mul(_fq_to_fq12(3), fq12_sqr(x1))
        den = fq12_mul(_fq_to_fq12(2), y1)
    elif x1 == x2:
        # vertical: x - x1 evaluated at P
        return fq12_sub(xp, x1)
    else:
        num = fq12_sub(y2, y1)
        den = fq12_sub(x2, x1)
    lam = fq12_mul(num, fq12_inv(den))
    # y_p - y1 - lam (x_p - x1)
    return fq12_sub(fq12_sub(yp, y1), fq12_mul(lam, fq12_sub(xp, x1)))


def miller_loop(P, Qpt):
    """f_{x,Q}(P) for the ate pairing: loop over bits of BLS_X, doubling T
    starting at the untwisted Q, evaluating lines at P in G1."""
    if P is None or Qpt is None:
        return FQ12_ONE
    Q12 = untwist(Qpt)
    P12 = (_fq_to_fq12(P[0]), _fq_to_fq12(P[1]))
    T = Q12
    f = FQ12_ONE
    x = C.BLS_X
    for bit in bin(x)[3:]:  # skip leading 1
        f = fq12_mul(fq12_sqr(f), _line(T, T, P12))
        T = E12.double(T)
        if bit == "1":
            f = fq12_mul(f, _line(T, Q12, P12))
            T = E12.add(T, Q12)
    return f


def final_exponentiation(f):
    """f^((q^12-1)/r): easy part (q^6-1)(q^2+1), then the hard part
    (q^4 - q^2 + 1)/r by plain square-and-multiply."""
    # easy part
    f = fq12_mul(fq12_conj(f), fq12_inv(f))           # f^(q^6 - 1)
    f = fq12_mul(fq12_frobenius(fq12_frobenius(f)), f)  # f^(q^2 + 1)
    # hard part
    hard = (Q**4 - Q**2 + 1) // R
    return fq12_pow(f, hard)


def pairing(P, Qpt):
    """The (reduced) ate pairing e: G1 x G2 -> GT (Fq12)."""
    return final_exponentiation(miller_loop(P, Qpt))


def multi_pairing(pairs):
    """Product of pairings: prod e(P_i, Q_i), sharing the final exponentiation
    (the analog of PairingEngine::product_of_pairings).  Dispatches to the
    native C++ library (native/pairing.cpp) when built; pure-Python
    fallback otherwise."""
    from . import native

    if native.available():
        r = native.multi_pairing(list(pairs))
        if r is not None:
            return r
    f = FQ12_ONE
    for P, Qpt in pairs:
        f = fq12_mul(f, miller_loop(P, Qpt))
    return final_exponentiation(f)
