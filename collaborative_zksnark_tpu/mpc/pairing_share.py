"""Pairings over SHARED points + GT (Fq12) multiplicative shares.

The analog of the reference's MpcPairingEngine shared-pairing path and its
multiplicative extension-field shares:

  * `GtShare` — a multiplicative share of an Fq12 (GT) element: the value is
    the PRODUCT of per-party factors (ref share/add.rs:406-496
    MulFieldShare: reveal = broadcast + product, scale = king-only,
    mul/div/inv local).  The SPDZ variant carries a second multiplicative
    MAC factor with product x^alpha — MAC-in-exponent ("Pragmatic MPC"
    6.6.2; ref share/spdz.rs:459-541 SpdzMulFieldShare: reveal opens x,
    then atomic-broadcasts d_i = x^{alpha_i} / mac_i and checks
    prod d_i == 1).
  * `pairing_shared` — e(a, b) for SHARED a in G1, b in G2 via a pairing
    Beaver triple (ref wire/pairing.rs:194-230):
        (x, y, z)  with  z a GT mult-share of e(x, y)
        xa = reveal(a + x);  yb = reveal(b + y)          (2 openings)
        e(a, b) = z * e(xa, yb) / e(xa, y) / e(x, yb)
    where e(xa, y) is computed WITHOUT interaction: each party pairs the
    public xa with its OWN additive share y_i, and bilinearity makes the
    per-party factors a GT mult-share (prod_i e(xa, y_i) = e(xa, sum y_i)).

Design notes (TPU framing): pairings are host-scalar operations (native
C++ pairing when built) — they happen O(1) times per proof at reveal
boundaries, never in device hot loops, so GT shares live host-side as
per-party Fq12 factors.  Triples are dealt by the dummy source (identity
points + GT one), mirroring the reference's DummyPairingTripleSource
(ref wire/pairing.rs:85-108) benchmarking stance.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

from ..algebra import hostapi as H
from ..ops import curve as cv

FQ12_BYTES = 12 * 48  # 12 Fq coordinates, 48 bytes each


@dataclasses.dataclass
class GtShare:
    """Multiplicative GT share (host-side): one Fq12 factor per party;
    optional multiplicative MAC factors (SPDZ).  When `degree` is set the
    share is Shamir-in-the-exponent (GSZ, ref gsz20/mod.rs:1460-1653
    mul_field::MulFieldShare): party i holds g^{f(w^i)} for a degree-`degree`
    polynomial f, and reveal is an exponent-iFFT with a degree check."""

    vals: List[tuple]
    macs: Optional[List[tuple]] = None
    degree: Optional[int] = None

    @property
    def n(self) -> int:
        return len(self.vals)


def _is_spdz(scheme) -> bool:
    return scheme.name == "spdz"


def _is_gsz(scheme) -> bool:
    return scheme.name == "gsz"


def _alpha_exps(scheme) -> List[int]:
    """The per-party MAC key shares alpha_i.  The repo's SPDZ key is the
    reference's stub (alpha = 1, king holds it — spdz.rs:30-37)."""
    n = scheme.net.n_parties()
    return [1 if i == 0 else 0 for i in range(n)]


def gt_from_public(scheme, f) -> GtShare:
    """Public Fq12 -> mult-share: king holds f, others hold 1
    (ref add.rs:417-421 from_public); SPDZ MACs: mac_i = f^{alpha_i}
    (ref spdz.rs:480-486).  GSZ: every party holds f — the constant
    polynomial in the exponent, degree tagged t (ref gsz20/mod.rs:1551-1557
    from_public)."""
    n = scheme.net.n_parties()
    if _is_gsz(scheme):
        return GtShare([f] * n, None, degree=scheme.t)
    vals = [f if i == 0 else H.FQ12_ONE for i in range(n)]
    macs = None
    if _is_spdz(scheme):
        macs = [H.fq12_pow(f, a) if a else H.FQ12_ONE for a in _alpha_exps(scheme)]
    return GtShare(vals, macs)


def _merge_degree(a: GtShare, b: GtShare) -> Optional[int]:
    if a.degree is None and b.degree is None:
        return None
    return max(d for d in (a.degree, b.degree) if d is not None)


def gt_mul(a: GtShare, b: GtShare) -> GtShare:
    """Local multiplicative mul (ref add.rs:455-460).  GSZ: exponents add,
    so the exponent-polynomial degree does NOT grow (ref gsz20/mod.rs:
    1593-1600 mul is local for MulFieldShare)."""
    vals = [H.fq12_mul(x, y) for x, y in zip(a.vals, b.vals)]
    macs = None
    if a.macs is not None:
        macs = [H.fq12_mul(x, y) for x, y in zip(a.macs, b.macs)]
    return GtShare(vals, macs, degree=_merge_degree(a, b))


def gt_inv(a: GtShare) -> GtShare:
    """Local inversion (ref add.rs:472-476)."""
    vals = [H.fq12_inv(x) for x in a.vals]
    macs = [H.fq12_inv(x) for x in a.macs] if a.macs is not None else None
    return GtShare(vals, macs, degree=a.degree)


def gt_div(a: GtShare, b: GtShare) -> GtShare:
    return gt_mul(a, gt_inv(b))


def gt_scale_pub(scheme, a: GtShare, f) -> GtShare:
    """Multiply by a PUBLIC Fq12: king-only on the value (ref add.rs:444-449
    MulFieldShare::scale); SPDZ MACs each multiply by f^{alpha_i}
    (ref spdz.rs:501-507).  GSZ: constant-poly addition in the exponent —
    EVERY party multiplies by f (ref gsz20/mod.rs:1563-1570 shift)."""
    if a.degree is not None:
        return GtShare([H.fq12_mul(v, f) for v in a.vals], None, degree=a.degree)
    vals = [H.fq12_mul(v, f) if i == 0 else v for i, v in enumerate(a.vals)]
    macs = None
    if a.macs is not None:
        macs = [
            H.fq12_mul(m, H.fq12_pow(f, alpha)) if alpha else m
            for m, alpha in zip(a.macs, _alpha_exps(scheme))
        ]
    return GtShare(vals, macs)


def _gt_reveal_gsz(scheme, a: GtShare):
    """Exponent-Shamir open (ref gsz20/mod.rs:1492-1533 open): broadcast
    shares, interpolate the exponent polynomial via V^-1 applied IN THE
    EXPONENT (c_j = prod_i x_i^{Vinv[j][i]}), require coefficients above
    `degree` to be one (degree check -> abort on cheat), return c_0 = g^f(0).

    Assumes the shares lie in the order-r GT subgroup (true for every
    pairing output); the coefficient identities are mod-r statements."""
    from .gsz import _party_vandermonde_int

    n = a.n
    _, Vinv = _party_vandermonde_int(n)
    coeffs = [H.FQ12_ONE] * n
    rows = [0] + list(range(a.degree + 1, n))  # value + checked coeffs
    for j in rows:
        c = H.FQ12_ONE
        for i in range(n):
            c = H.fq12_mul(c, H.fq12_pow(a.vals[i], Vinv[j][i]))
        coeffs[j] = c
    ok = all(coeffs[j] == H.FQ12_ONE for j in range(a.degree + 1, n))
    scheme.ctx.push_check("gsz_gt_degree", ok)
    return coeffs[0]


def gt_reveal(scheme, a: GtShare):
    """Broadcast + product (ref add.rs:414-416); SPDZ: then atomic-broadcast
    d_i = x^{alpha_i} / mac_i and require prod d_i == 1 (ref
    spdz.rs:468-478).  GSZ: exponent interpolation + degree check
    (ref gsz20/mod.rs:1492-1533).  Traffic is accounted on the net stats."""
    stats = scheme.net.stats
    stats.broadcasts += 1
    stats.bytes_sent += FQ12_BYTES * (a.n - 1)
    stats.bytes_recv += FQ12_BYTES * (a.n - 1)
    if a.degree is not None:
        return _gt_reveal_gsz(scheme, a)
    x = H.FQ12_ONE
    for v in a.vals:
        x = H.fq12_mul(x, v)
    if a.macs is not None:
        stats.broadcasts += 2  # commit + open
        stats.bytes_sent += (FQ12_BYTES + 32) * (a.n - 1)
        stats.bytes_recv += (FQ12_BYTES + 32) * (a.n - 1)
        prod = H.FQ12_ONE
        for mac, alpha in zip(a.macs, _alpha_exps(scheme)):
            d = H.fq12_mul(
                H.fq12_pow(x, alpha) if alpha else H.FQ12_ONE, H.fq12_inv(mac)
            )
            prod = H.fq12_mul(prod, d)
        scheme.ctx.push_check("spdz_gt_mac", prod == H.FQ12_ONE)
    return x


# ---------------------------------------------------------------------------
# Shared x shared pairing (ref wire/pairing.rs:194-230)
# ---------------------------------------------------------------------------

def _party_share_points(scheme, sh, fld):
    """Per-party host points of a stacked single-point group share.
    Returns (value_points, mac_points|None)."""
    to_host = cv.g1_to_host if fld is cv.FQ_OPS else cv.g2_to_host
    if _is_spdz(scheme):
        return to_host(sh.pt), to_host(sh.mac)
    return to_host(sh), None


def _g_reveal_host(scheme, sh, fld):
    pt = scheme.g_reveal(fld, sh)
    to_host = cv.g1_to_host if fld is cv.FQ_OPS else cv.g2_to_host
    return to_host(cv.JacPoint(pt.x[None], pt.y[None], pt.z[None]))[0]


def _pair_against_public(scheme, pts, macs, pub, g1_side: bool) -> GtShare:
    """GT mult-share from pairing each party's share point against a public
    point: vals_i = e(share_i, pub) (or e(pub, share_i)).  SPDZ MACs pair
    the MAC points (sum alpha*P) the same way, giving prod = e(...)^alpha —
    MAC-in-exponent carried through the pairing's bilinearity."""
    pair = (lambda s: H.pairing(s, pub)) if g1_side else (lambda s: H.pairing(pub, s))
    vals = [pair(p) for p in pts]
    gmacs = [pair(p) for p in macs] if macs is not None else None
    deg = scheme.t if _is_gsz(scheme) else None
    return GtShare(vals, gmacs, degree=deg)


def pairing_triple(scheme):
    """Dummy pairing Beaver triple: x = share of G1 identity, y = share of
    G2 identity, z = GT mult-share of 1 = e(0, 0) (ref wire/pairing.rs:
    85-108 DummyPairingTripleSource — same 'insecure preprocessing'
    benchmarking stance as the field/group dummy sources)."""
    from .additive import AdditiveScheme

    x = scheme.g_from_public(cv.FQ_OPS, AdditiveScheme._identity_point(cv.FQ_OPS))
    y = scheme.g_from_public(cv.FQ2_OPS, AdditiveScheme._identity_point(cv.FQ2_OPS))
    z = gt_from_public(scheme, H.FQ12_ONE)
    return x, y, z


def pairing_shared(scheme, a_sh, b_sh) -> GtShare:
    """e(a, b) for shared a (G1), b (G2) -> GT mult-share
    (ref wire/pairing.rs:194-230):
        z / e(xa, y) / e(x, yb) * e(xa, yb)
    with xa = reveal(a + x), yb = reveal(b + y)."""
    x_sh, y_sh, z = pairing_triple(scheme)
    xa_sh = scheme.g_add(cv.FQ_OPS, a_sh, x_sh)
    yb_sh = scheme.g_add(cv.FQ2_OPS, b_sh, y_sh)
    xa = _g_reveal_host(scheme, xa_sh, cv.FQ_OPS)
    yb = _g_reveal_host(scheme, yb_sh, cv.FQ2_OPS)

    xayb = H.pairing(xa, yb)  # public

    y_pts, y_macs = _party_share_points(scheme, y_sh, cv.FQ2_OPS)
    x_pts, x_macs = _party_share_points(scheme, x_sh, cv.FQ_OPS)
    xay = _pair_against_public(scheme, y_pts, y_macs, xa, g1_side=False)
    xyb = _pair_against_public(scheme, x_pts, x_macs, yb, g1_side=True)

    out = gt_div(gt_div(z, xay), xyb)
    return gt_scale_pub(scheme, out, xayb)


def pairing_public_shared(scheme, a_pub_host, b_sh) -> GtShare:
    """e(a, b) for PUBLIC a (host G1 affine), shared b: interaction-free
    (each party pairs a with its own share; ref wire/pairing.rs semantics
    for the public x shared case)."""
    b_pts, b_macs = _party_share_points(scheme, b_sh, cv.FQ2_OPS)
    return _pair_against_public(scheme, b_pts, b_macs, a_pub_host, g1_side=False)
