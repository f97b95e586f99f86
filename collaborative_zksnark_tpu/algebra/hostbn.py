"""Host-side (Python-int) algebra for BN254: Fq tower, curves, optimal-ate
pairing.  The BN sibling of `hostfield.py` (BLS12-377) with the same API
surface (G1/G2 CurveOps, G1_GEN/G2_GEN, pairing/multi_pairing, FQ12_ONE),
so curve-generic code can select either module via `algebra/params.py`.

Tower (ref curves/bn254/src/fields/):
    Fq2  = Fq [u]/(u^2 + 1)          (nonresidue -1, fq2.rs:13)
    Fq6  = Fq2[v]/(v^3 - (9 + u))    (nonresidue u+9, fq6.rs:14)
    Fq12 = Fq6[w]/(w^2 - v)

Pairing: optimal ate with Miller loop count 6x+2 (ref curves/bn254/src/
curves/mod.rs:19-24; ark_ec::models::bn::Bn pairing engine).  As in
`hostfield.py`, G2 points are untwisted into E(Fq12) so line evaluation is
generic; the two BN correction steps use the q-power Frobenius, which on
untwisted coordinates is just x -> x^q in Fq12.  Frobenius and the final-
exponentiation hard part are computed by plain exponentiation — this is
the small verifier/test-vector path, not a hot loop.
"""

from __future__ import annotations

from . import bn254 as C
from .hostfield import CurveOps

Q = C.Q_MOD
R = C.R_MOD

# ---------------------------------------------------------------------------
# Fq2 = Fq[u]/(u^2 + 1): pairs of ints
# ---------------------------------------------------------------------------


def fq2(c0=0, c1=0):
    return (c0 % Q, c1 % Q)


def fq2_add(a, b):
    return ((a[0] + b[0]) % Q, (a[1] + b[1]) % Q)


def fq2_sub(a, b):
    return ((a[0] - b[0]) % Q, (a[1] - b[1]) % Q)


def fq2_neg(a):
    return ((-a[0]) % Q, (-a[1]) % Q)


def fq2_mul(a, b):
    # (a0 + a1 u)(b0 + b1 u), u^2 = -1
    t0 = a[0] * b[0]
    t1 = a[1] * b[1]
    return ((t0 - t1) % Q, (a[0] * b[1] + a[1] * b[0]) % Q)


def fq2_sqr(a):
    return fq2_mul(a, a)


def fq2_inv(a):
    n = (a[0] * a[0] + a[1] * a[1]) % Q  # norm for u^2 = -1
    ninv = pow(n, Q - 2, Q)
    return (a[0] * ninv % Q, (-a[1]) * ninv % Q)


FQ2_ZERO = (0, 0)
FQ2_ONE = (1, 0)
XI = (C.FQ6_NONRESIDUE_C0, C.FQ6_NONRESIDUE_C1)  # 9 + u


def _mul_by_xi(a):
    return fq2_mul(a, XI)


# ---------------------------------------------------------------------------
# Fq6 = Fq2[v]/(v^3 - xi): triples of pairs
# ---------------------------------------------------------------------------


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
    c0 = fq2_add(t0, _mul_by_xi(fq2_sub(fq2_mul(fq2_add(a1, a2), fq2_add(b1, b2)), fq2_add(t1, t2))))
    c1 = fq2_add(fq2_sub(fq2_mul(fq2_add(a0, a1), fq2_add(b0, b1)), fq2_add(t0, t1)), _mul_by_xi(t2))
    c2 = fq2_add(fq2_sub(fq2_mul(fq2_add(a0, a2), fq2_add(b0, b2)), fq2_add(t0, t2)), t1)
    return (c0, c1, c2)


def fq6_sqr(a):
    return fq6_mul(a, a)


def fq6_mul_by_v(a):
    return (_mul_by_xi(a[2]), a[0], a[1])


def fq6_inv(a):
    a0, a1, a2 = a
    c0 = fq2_sub(fq2_sqr(a0), _mul_by_xi(fq2_mul(a1, a2)))
    c1 = fq2_sub(_mul_by_xi(fq2_sqr(a2)), fq2_mul(a0, a1))
    c2 = fq2_sub(fq2_sqr(a1), fq2_mul(a0, a2))
    t = fq2_add(_mul_by_xi(fq2_add(fq2_mul(a2, c1), fq2_mul(a1, c2))), fq2_mul(a0, c0))
    tinv = fq2_inv(t)
    return (fq2_mul(c0, tinv), fq2_mul(c1, tinv), fq2_mul(c2, tinv))


FQ6_ZERO = (FQ2_ZERO, FQ2_ZERO, FQ2_ZERO)
FQ6_ONE = (FQ2_ONE, FQ2_ZERO, FQ2_ZERO)

# ---------------------------------------------------------------------------
# Fq12 = Fq6[w]/(w^2 - v): pairs of triples of pairs
# ---------------------------------------------------------------------------


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
    return (a[0], fq6_neg(a[1]))


def fq12_inv(a):
    a0, a1 = a
    t = fq6_sub(fq6_sqr(a0), fq6_mul_by_v(fq6_sqr(a1)))
    tinv = fq6_inv(t)
    return (fq6_mul(a0, tinv), fq6_neg(fq6_mul(a1, tinv)))


def fq12_pow(a, e):
    r = FQ12_ONE
    base = a
    while e:
        if e & 1:
            r = fq12_mul(r, base)
        base = fq12_sqr(base)
        e >>= 1
    return r


def fq12_frobenius(a):
    """q-power Frobenius by plain exponentiation (host path; not hot)."""
    return fq12_pow(a, Q)


FQ12_ZERO = (FQ6_ZERO, FQ6_ZERO)
FQ12_ONE = (FQ6_ONE, FQ6_ZERO)

# ---------------------------------------------------------------------------
# Curves
# ---------------------------------------------------------------------------


def _fq_ops():
    return CurveOps(
        add=lambda a, b: (a + b) % Q, sub=lambda a, b: (a - b) % Q,
        mul=lambda a, b: a * b % Q, sqr=lambda a: a * a % Q,
        inv=lambda a: pow(a, Q - 2, Q), neg=lambda a: (-a) % Q,
        zero=0, one=1, a=C.G1_A, b=C.G1_B, order=R,
    )


def _fq2_ops():
    return CurveOps(
        add=fq2_add, sub=fq2_sub, mul=fq2_mul, sqr=fq2_sqr, inv=fq2_inv,
        neg=fq2_neg, zero=FQ2_ZERO, one=FQ2_ONE,
        a=FQ2_ZERO, b=(C.G2_B_C0, C.G2_B_C1), order=R,
    )


G1 = _fq_ops()
G2 = _fq2_ops()

G1_GEN = (C.G1_GEN_X, C.G1_GEN_Y)
G2_GEN = ((C.G2_GEN_X_C0, C.G2_GEN_X_C1), (C.G2_GEN_Y_C0, C.G2_GEN_Y_C1))

# ---------------------------------------------------------------------------
# Optimal-ate pairing
# ---------------------------------------------------------------------------

_W = (FQ6_ZERO, FQ6_ONE)                    # w
_W2 = fq12_mul(_W, _W)                      # w^2
_W3 = fq12_mul(_W2, _W)                     # w^3


def _fq2_to_fq12(a):
    return ((a, FQ2_ZERO, FQ2_ZERO), FQ6_ZERO)


def _fq_to_fq12(a):
    return (((a % Q, 0), FQ2_ZERO, FQ2_ZERO), FQ6_ZERO)


def untwist(Qpt):
    """Map a G2 (twist-curve) affine point into E(Fq12):
    (x, y) -> (x * w^2, y * w^3), using w^6 = xi (D-type twist)."""
    if Qpt is None:
        return None
    x, y = Qpt
    return (fq12_mul(_fq2_to_fq12(x), _W2), fq12_mul(_fq2_to_fq12(y), _W3))


def _fq12_curve_ops():
    return CurveOps(
        add=fq12_add, sub=fq12_sub, mul=fq12_mul, sqr=fq12_sqr,
        inv=fq12_inv, neg=lambda a: fq12_sub(FQ12_ZERO, a),
        zero=FQ12_ZERO, one=FQ12_ONE, a=FQ12_ZERO, b=_fq_to_fq12(C.G1_B),
        order=R,
    )


E12 = _fq12_curve_ops()


def _line(Tp, Qp, P12):
    """Line through T and Q of E(Fq12), evaluated at P12 (same as
    hostfield._line but over this module's Fq12)."""
    x1, y1 = Tp
    x2, y2 = Qp
    xp, yp = P12
    if x1 == x2 and y1 == y2:
        num = fq12_mul(_fq_to_fq12(3), fq12_sqr(x1))
        den = fq12_mul(_fq_to_fq12(2), y1)
    elif x1 == x2:
        return fq12_sub(xp, x1)
    else:
        num = fq12_sub(y2, y1)
        den = fq12_sub(x2, x1)
    lam = fq12_mul(num, fq12_inv(den))
    return fq12_sub(fq12_sub(yp, y1), fq12_mul(lam, fq12_sub(xp, x1)))


def _frob_pt(T):
    """q-power Frobenius endomorphism on E(Fq12): coordinate-wise ^q."""
    return (fq12_frobenius(T[0]), fq12_frobenius(T[1]))


def miller_loop(P, Qpt):
    """f_{6x+2,Q}(P) with the two BN correction lines at pi(Q), -pi^2(Q)
    (ref ark_ec bn::Bn::miller_loop; loop count mod.rs:19-24)."""
    if P is None or Qpt is None:
        return FQ12_ONE
    Q12 = untwist(Qpt)
    P12 = (_fq_to_fq12(P[0]), _fq_to_fq12(P[1]))
    T = Q12
    f = FQ12_ONE
    for bit in bin(C.ATE_LOOP)[3:]:  # skip leading 1
        f = fq12_mul(fq12_sqr(f), _line(T, T, P12))
        T = E12.double(T)
        if bit == "1":
            f = fq12_mul(f, _line(T, Q12, P12))
            T = E12.add(T, Q12)
    # correction steps
    Q1 = _frob_pt(Q12)
    _q2 = _frob_pt(Q1)
    Q2 = (_q2[0], fq12_sub(FQ12_ZERO, _q2[1]))  # -pi^2(Q)
    f = fq12_mul(f, _line(T, Q1, P12))
    T = E12.add(T, Q1)
    f = fq12_mul(f, _line(T, Q2, P12))
    return f


def final_exponentiation(f):
    """f^((q^12-1)/r): easy part (q^6-1)(q^2+1), then the hard part
    (q^4 - q^2 + 1)/r by plain square-and-multiply."""
    f = fq12_mul(fq12_conj(f), fq12_inv(f))                  # f^(q^6 - 1)
    f = fq12_mul(fq12_pow(f, Q * Q), f)                      # f^(q^2 + 1)
    hard = (Q**4 - Q**2 + 1) // R
    return fq12_pow(f, hard)


def pairing(P, Qpt):
    """The (reduced) optimal-ate pairing e: G1 x G2 -> GT (Fq12)."""
    return final_exponentiation(miller_loop(P, Qpt))


def multi_pairing(pairs):
    """prod e(P_i, Q_i) with one shared final exponentiation."""
    f = FQ12_ONE
    for P, Qpt in pairs:
        f = fq12_mul(f, miller_loop(P, Qpt))
    return final_exponentiation(f)
