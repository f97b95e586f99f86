"""Pairing over shares + GT multiplicative shares (hbc + spdz).

Mirrors the reference's PairingDh / PairingProd / PairingDiv client
computations (ref mpc-snarks/src/client.rs:503-575) and the MulFieldShare /
SpdzMulFieldShare semantics (ref share/add.rs:406-496, spdz.rs:459-541),
including the MAC-in-exponent abort on a tampered GT factor.
"""

import pytest

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.algebra import hostfield as H
from collaborative_zksnark_tpu.mpc import pairing_share as pgs
from collaborative_zksnark_tpu.mpc import wire
from collaborative_zksnark_tpu.mpc.context import MpcContext
from collaborative_zksnark_tpu.ops import curve as cv
from collaborative_zksnark_tpu.parallel.net import StackedNet

P = C.R_MOD


def _gen_points():
    g1 = cv.g1_from_host([H.G1_GEN])
    g2 = cv.g2_from_host([H.G2_GEN])
    return (
        cv.JacPoint(g1.x[0], g1.y[0], g1.z[0]),
        cv.JacPoint(g2.x[0], g2.y[0], g2.z[0]),
    )


def _scalar_share(sch, v):
    arr = sch.king_share(F.FR.to_device([v]))
    return sch.lin_map(lambda t: t[..., 0, :], arr)


def _shared_muls(sch, a, b):
    g1, g2 = _gen_points()
    A_sh = sch.g_from_scalar_mul(cv.FQ_OPS, g1, _scalar_share(sch, a))
    B_sh = sch.g_from_scalar_mul(cv.FQ2_OPS, g2, _scalar_share(sch, b))
    return A_sh, B_sh


_PARTIES = {"hbc": 2, "spdz": 2, "gsz": 3}


@pytest.mark.parametrize("alg", ["hbc", "spdz", "gsz"])
def test_pairing_dh(alg):
    """e(a*G1, b*G2) over shares == host pairing (PairingDh)."""
    ctx = MpcContext(StackedNet(_PARTIES[alg]), seed=3)
    sch = wire.make_scheme(alg, ctx)
    a, b = 1234567, 7654321
    A_sh, B_sh = _shared_muls(sch, a, b)
    gt = pgs.pairing_shared(sch, A_sh, B_sh)
    got = pgs.gt_reveal(sch, gt)
    ctx.assert_checks()
    want = H.pairing(
        H.G1.scalar_mul(H.G1_GEN, a), H.G2.scalar_mul(H.G2_GEN, b)
    )
    assert got == want


@pytest.mark.parametrize("alg", ["hbc", "spdz", "gsz"])
def test_pairing_prod_div(alg):
    """e((a+b)G1, (c+d)G2) == prod of the four cross pairings, and the
    division variant (PairingProd / PairingDiv, client.rs:520-575)."""
    ctx = MpcContext(StackedNet(_PARTIES[alg]), seed=5)
    sch = wire.make_scheme(alg, ctx)
    a, b, c, d = 11, 22, 33, 44
    gts = {}
    for x in (a, b):
        for y in (c, d):
            A_sh, B_sh = _shared_muls(sch, x, y)
            gts[(x, y)] = pgs.pairing_shared(sch, A_sh, B_sh)
    # product identity
    A_sh, B_sh = _shared_muls(sch, (a + b) % P, (c + d) % P)
    lhs = pgs.pairing_shared(sch, A_sh, B_sh)
    rhs = pgs.gt_mul(
        pgs.gt_mul(gts[(a, c)], gts[(b, c)]),
        pgs.gt_mul(gts[(a, d)], gts[(b, d)]),
    )
    assert pgs.gt_reveal(sch, lhs) == pgs.gt_reveal(sch, rhs)
    # division identity: e((a-b)G1, (c-d)G2) = ac / bc / ad * bd
    A_sh, B_sh = _shared_muls(sch, (a - b) % P, (c - d) % P)
    lhs2 = pgs.pairing_shared(sch, A_sh, B_sh)
    rhs2 = pgs.gt_mul(
        pgs.gt_div(pgs.gt_div(gts[(a, c)], gts[(b, c)]), gts[(a, d)]),
        gts[(b, d)],
    )
    assert pgs.gt_reveal(sch, lhs2) == pgs.gt_reveal(sch, rhs2)
    ctx.assert_checks()


def test_spdz_gt_mac_abort():
    """A party multiplying a bogus factor into its GT MAC must abort
    (ref spdz.rs:468-478 assert prod == 1)."""
    ctx = MpcContext(StackedNet(2), seed=3)
    sch = wire.make_scheme("spdz", ctx)
    f = H.pairing(H.G1_GEN, H.G2_GEN)
    g = pgs.gt_from_public(sch, f)
    g.macs[1] = H.fq12_mul(g.macs[1], f)
    pgs.gt_reveal(sch, g)
    assert not ctx.checks_ok()


def test_spdz_gt_value_tamper_abort():
    """Tampering the VALUE factor (not the MAC) must also abort."""
    ctx = MpcContext(StackedNet(2), seed=3)
    sch = wire.make_scheme("spdz", ctx)
    f = H.pairing(H.G1_GEN, H.G2_GEN)
    g = pgs.gt_from_public(sch, f)
    g.vals[1] = H.fq12_mul(g.vals[1], f)
    pgs.gt_reveal(sch, g)
    assert not ctx.checks_ok()


def test_gsz_gt_degree_abort():
    """GSZ exponent-Shamir shares off the degree-t polynomial must fail the
    exponent degree check at open (ref gsz20/mod.rs:1492-1533)."""
    ctx = MpcContext(StackedNet(3), seed=3)
    sch = wire.make_scheme("gsz", ctx)
    a, b = 97, 31
    A_sh, B_sh = _shared_muls(sch, a, b)
    gt = pgs.pairing_shared(sch, A_sh, B_sh)
    gt.vals[2] = H.fq12_mul(gt.vals[2], H.pairing(H.G1_GEN, H.G2_GEN))
    pgs.gt_reveal(sch, gt)
    assert not ctx.checks_ok()


def test_mul_field_group_laws():
    """MulFieldGroup: Fq12* as an additive Group (ref group.rs:21-188) —
    group laws + scalar action distributivity."""
    from collaborative_zksnark_tpu.mpc.mul_group import MulFieldGroup

    g = MulFieldGroup(H.pairing(H.G1_GEN, H.G2_GEN))
    h = MulFieldGroup(H.pairing(H.G1.scalar_mul(H.G1_GEN, 3), H.G2_GEN))
    assert g.add(MulFieldGroup.zero()).val == g.val
    assert g.add(g.neg()).is_zero()
    assert g.add(h).val == h.add(g).val
    assert g.double().val == g.scale(2).val
    # (a+b)*k == a*k + b*k
    assert g.add(h).scale(5).val == g.scale(5).add(h.scale(5)).val
    # e(G1,G2)^3 == e(3*G1, G2)
    assert g.scale(3).val == h.val
