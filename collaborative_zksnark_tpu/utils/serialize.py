"""Canonical (de)serialization — the analog of the reference's forked
ark-serialize (`CanonicalSerialize`/`CanonicalDeserialize`; SURVEY.md §2.2
algebra/serialize row).

Encodings (little-endian, arkworks-compatible sizes):
  Fr: 32 bytes.  Fq: 48 bytes.  Fq2: 96 bytes (c0 || c1).
  G1/G2 affine compressed: x (48/96 bytes) with flag bits in the TOP byte
    (bit7 = y is the lexicographically larger root, bit6 = infinity) —
    the arkworks short-Weierstrass compressed flag convention.
  G1/G2 affine uncompressed: x || y with the infinity flag on y's top byte.

Round-trips are exact; deserialization validates curve membership.
"""

from __future__ import annotations

from ..algebra import bls12_377 as C
from ..algebra import hostfield as H

Q = C.Q_MOD
R = C.R_MOD

FR_BYTES = 32
FQ_BYTES = 48

_FLAG_NEG = 1 << 7   # y = larger root
_FLAG_INF = 1 << 6


def fr_to_bytes(x: int) -> bytes:
    return (x % R).to_bytes(FR_BYTES, "little")


def fr_from_bytes(b: bytes) -> int:
    assert len(b) == FR_BYTES
    v = int.from_bytes(b, "little")
    assert v < R, "non-canonical Fr"
    return v


def fq_to_bytes(x: int, flags: int = 0) -> bytes:
    raw = bytearray((x % Q).to_bytes(FQ_BYTES, "little"))
    raw[-1] |= flags
    return bytes(raw)


def fq_from_bytes(b: bytes, with_flags: bool = False):
    assert len(b) == FQ_BYTES
    raw = bytearray(b)
    flags = raw[-1] & (_FLAG_NEG | _FLAG_INF)
    raw[-1] &= ~(_FLAG_NEG | _FLAG_INF) & 0xFF
    v = int.from_bytes(bytes(raw), "little")
    assert v < Q, "non-canonical Fq"
    return (v, flags) if with_flags else v


def fq2_to_bytes(x, flags: int = 0) -> bytes:
    c0, c1 = x
    return fq_to_bytes(c0) + fq_to_bytes(c1, flags)


def fq2_from_bytes(b: bytes, with_flags: bool = False):
    c0 = fq_from_bytes(b[:FQ_BYTES])
    c1, flags = fq_from_bytes(b[FQ_BYTES:], with_flags=True)
    return ((c0, c1), flags) if with_flags else (c0, c1)


def _is_larger(y: int) -> bool:
    return y > Q - y  # lexicographic: y > -y


def _fq2_is_larger(y) -> bool:
    y0, y1 = y
    n0, n1 = (Q - y0) % Q, (Q - y1) % Q
    return (y1, y0) > (n1, n0)


def g1_compress(pt) -> bytes:
    """pt: affine (x, y) or None (identity)."""
    if pt is None:
        return fq_to_bytes(0, _FLAG_INF)
    x, y = pt
    return fq_to_bytes(x, _FLAG_NEG if _is_larger(y) else 0)


def _fq_sqrt(a: int):
    """Tonelli-Shanks in Fq (q = 1 mod 4; 2-adicity 46)."""
    a %= Q
    if a == 0:
        return 0
    if pow(a, (Q - 1) // 2, Q) != 1:
        return None
    # write q - 1 = t * 2^s
    s = 0
    t = Q - 1
    while t % 2 == 0:
        t //= 2
        s += 1
    z = 2
    while pow(z, (Q - 1) // 2, Q) == 1:
        z += 1
    m = s
    c = pow(z, t, Q)
    u = pow(a, t, Q)
    r = pow(a, (t + 1) // 2, Q)
    while u != 1:
        i = 0
        v = u
        while v != 1:
            v = v * v % Q
            i += 1
        b = pow(c, 1 << (m - i - 1), Q)
        m = i
        c = b * b % Q
        u = u * c % Q
        r = r * b % Q
    return r


def g1_decompress(b: bytes):
    x, flags = fq_from_bytes(b, with_flags=True)
    if flags & _FLAG_INF:
        return None
    y2 = (x * x % Q * x + 1) % Q  # b = 1 for BLS12-377 G1
    y = _fq_sqrt(y2)
    assert y is not None, "not on curve"
    if _is_larger(y) != bool(flags & _FLAG_NEG):
        y = (Q - y) % Q
    return (x, y)


def g1_uncompressed(pt) -> bytes:
    if pt is None:
        return fq_to_bytes(0) + fq_to_bytes(0, _FLAG_INF)
    x, y = pt
    return fq_to_bytes(x) + fq_to_bytes(y)


def g1_from_uncompressed(b: bytes):
    x = fq_from_bytes(b[:FQ_BYTES])
    y, flags = fq_from_bytes(b[FQ_BYTES:], with_flags=True)
    if flags & _FLAG_INF:
        return None
    assert (y * y - (x * x % Q * x + 1)) % Q == 0, "not on curve"
    return (x, y)


def g2_compress(pt) -> bytes:
    if pt is None:
        return fq2_to_bytes((0, 0), _FLAG_INF)
    x, y = pt
    return fq2_to_bytes(x, _FLAG_NEG if _fq2_is_larger(y) else 0)


def g2_decompress(b: bytes):
    x, flags = fq2_from_bytes(b, with_flags=True)
    if flags & _FLAG_INF:
        return None
    # y^2 = x^3 + b2 (the twist's b, from the hostfield curve constants)
    x3 = H.fq2_mul(H.fq2_mul(x, x), x)
    y2 = H.fq2_add(x3, H.G2.b)
    y = _fq2_sqrt(y2)
    assert y is not None, "not on curve"
    if _fq2_is_larger(y) != bool(flags & _FLAG_NEG):
        y = H.fq2_neg(y)
    return (x, y)


def _fq2_sqrt(a):
    """Square root in Fq2 via the norm/trace (complex) method: for
    a = a0 + a1 u with u^2 = -5, find c with c^2 = a using
    n = sqrt(a0^2 + 5 a1^2) and c0 = sqrt((a0 + n)/2)."""
    a0, a1 = a[0] % Q, a[1] % Q
    if a1 == 0:
        c0 = _fq_sqrt(a0)
        if c0 is not None:
            return (c0, 0)
        # a0 is a non-residue: sqrt is purely imaginary, (c1 u)^2 = -5 c1^2
        c1sq = a0 * pow(Q - 5, Q - 2, Q) % Q
        c1 = _fq_sqrt(c1sq)
        return None if c1 is None else (0, c1)
    norm = (a0 * a0 + 5 * a1 * a1) % Q
    n = _fq_sqrt(norm)
    if n is None:
        return None
    inv2 = pow(2, Q - 2, Q)
    for sign in (1, Q - 1):
        nn = n * sign % Q
        c0 = _fq_sqrt((a0 + nn) % Q * inv2 % Q)
        if c0 is None or c0 == 0:
            continue
        c1 = a1 * pow(2 * c0 % Q, Q - 2, Q) % Q
        cand = (c0, c1)
        if H.fq2_mul(cand, cand) == (a0, a1):
            return cand
    return None


def g2_uncompressed(pt) -> bytes:
    if pt is None:
        return fq2_to_bytes((0, 0)) + fq2_to_bytes((0, 0), _FLAG_INF)
    x, y = pt
    return fq2_to_bytes(x) + fq2_to_bytes(y)


def g2_from_uncompressed(b: bytes):
    x = fq2_from_bytes(b[: 2 * FQ_BYTES])
    y, flags = fq2_from_bytes(b[2 * FQ_BYTES :], with_flags=True)
    if flags & _FLAG_INF:
        return None
    return (x, y)
