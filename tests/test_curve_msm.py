"""Curve ops + MSM vs. host (Python-int) ground truth.

Mirror of the reference's MSM/group tests (mpc-snarks client `groupops`,
`msm` computations, ref mpc-snarks/src/client.rs) against arkworks-style
scalar-mul ground truth.
"""

import numpy as np
import pytest

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import hostfield as H
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.ops import curve as cv
from collaborative_zksnark_tpu.ops import msm as msm_mod

R = C.R_MOD


def _host_g1_points(rng, n):
    pts = []
    for _ in range(n):
        k = int.from_bytes(rng.bytes(40), "little") % R
        pts.append(H.G1.scalar_mul(H.G1_GEN, k))
    return pts


def test_point_add_double_matches_host():
    rng = np.random.default_rng(10)
    pts = _host_g1_points(rng, 8)
    pts[3] = None  # identity in the batch
    qts = _host_g1_points(rng, 8)
    qts[5] = None
    qts[2] = pts[2]            # doubling case
    qts[6] = H.G1.neg(pts[6])  # inverse case
    P = cv.g1_from_host(pts)
    Q = cv.g1_from_host(qts)
    import jax

    s = jax.jit(lambda P, Q: cv.point_add(cv.FQ_OPS, P, Q))(P, Q)
    got = cv.g1_to_host(s)
    for i in range(8):
        assert got[i] == H.G1.add(pts[i], qts[i]), i
    d = jax.jit(lambda P: cv.point_double(cv.FQ_OPS, P))(P)
    gotd = cv.g1_to_host(d)
    for i in range(8):
        assert gotd[i] == H.G1.double(pts[i]), i


def test_g2_point_ops():
    rng = np.random.default_rng(11)
    k1 = int.from_bytes(rng.bytes(40), "little") % R
    k2 = int.from_bytes(rng.bytes(40), "little") % R
    p1 = H.G2.scalar_mul(H.G2_GEN, k1)
    p2 = H.G2.scalar_mul(H.G2_GEN, k2)
    P = cv.g2_from_host([p1, p1, None])
    Q = cv.g2_from_host([p2, p1, p2])
    import jax

    s = jax.jit(lambda P, Q: cv.point_add(cv.FQ2_OPS, P, Q))(P, Q)
    got = cv.g2_to_host(s)
    assert got[0] == H.G2.add(p1, p2)
    assert got[1] == H.G2.add(p1, p1)
    assert got[2] == p2


@pytest.mark.parametrize("n,impl", [(8, "bitserial"), (64, "pippenger4"), (100, "pippenger8")])
def test_msm_matches_host(n, impl):
    rng = np.random.default_rng(12)
    pts = _host_g1_points(rng, n)
    pts[1] = None
    ks = [int.from_bytes(rng.bytes(40), "little") % R for _ in range(n)]
    ks[0] = 0
    ks[2] = 1
    P = cv.g1_from_host(pts)
    sc = F.FR.to_device(ks)
    if impl == "bitserial":
        res = msm_mod.msm_bitserial(cv.FQ_OPS, P, sc)
    elif impl == "pippenger4":
        res = msm_mod.msm_pippenger(cv.FQ_OPS, P, sc, c=4)
    else:
        res = msm_mod.msm_pippenger(cv.FQ_OPS, P, sc, c=8)
    got = cv.g1_to_host(cv.JacPoint(res.x[None], res.y[None], res.z[None]))[0]
    expect = None
    for k, pt in zip(ks, pts):
        expect = H.G1.add(expect, H.G1.scalar_mul(pt, k))
    assert got == expect


def test_msm_skewed_digits():
    # adversarial digit distribution: all scalars equal, plus many zeros
    rng = np.random.default_rng(13)
    n = 48
    pts = _host_g1_points(rng, n)
    k = int.from_bytes(rng.bytes(40), "little") % R
    ks = [k] * (n // 2) + [0] * (n - n // 2)
    P = cv.g1_from_host(pts)
    sc = F.FR.to_device(ks)
    res = msm_mod.msm_pippenger(cv.FQ_OPS, P, sc, c=4)
    got = cv.g1_to_host(cv.JacPoint(res.x[None], res.y[None], res.z[None]))[0]
    expect = None
    for kk, pt in zip(ks, pts):
        expect = H.G1.add(expect, H.G1.scalar_mul(pt, kk))
    assert got == expect


def test_fixed_base_msm():
    rng = np.random.default_rng(14)
    n = 10
    ks = [int.from_bytes(rng.bytes(40), "little") % R for _ in range(n)]
    ks[0] = 0
    sc = F.FR.to_device(ks)
    res = msm_mod.fixed_base_msm(cv.FQ_OPS, H.G1, H.G1_GEN, sc, c=8)
    got = cv.g1_to_host(res)
    for i, k in enumerate(ks):
        assert got[i] == H.G1.scalar_mul(H.G1_GEN, k), i


def test_fixed_base_msm_g2():
    rng = np.random.default_rng(15)
    ks = [int.from_bytes(rng.bytes(40), "little") % R for _ in range(4)]
    sc = F.FR.to_device(ks)
    res = msm_mod.fixed_base_msm(cv.FQ2_OPS, H.G2, H.G2_GEN, sc, c=8)
    got = cv.g2_to_host(res)
    for i, k in enumerate(ks):
        assert got[i] == H.G2.scalar_mul(H.G2_GEN, k), i


def test_fixed_base_msm_ints_native():
    """Host int scalars -> the native fixed-base kernel (when built):
    affine-normalized outputs, identity for 0, edge scalars r-1 / 1."""
    rng = np.random.default_rng(16)
    ks = [0, 1, 2, R - 1] + [
        int.from_bytes(rng.bytes(40), "little") % R for _ in range(8)
    ]
    res = msm_mod.fixed_base_msm_ints(cv.FQ_OPS, H.G1, H.G1_GEN, ks)
    got = cv.g1_to_host(res)
    for i, k in enumerate(ks):
        assert got[i] == H.G1.scalar_mul(H.G1_GEN, k), i
    res2 = msm_mod.fixed_base_msm_ints(cv.FQ2_OPS, H.G2, H.G2_GEN, ks[:6])
    got2 = cv.g2_to_host(res2)
    for i, k in enumerate(ks[:6]):
        assert got2[i] == H.G2.scalar_mul(H.G2_GEN, k), i


def test_proj_complete_add_matches_host():
    """Complete projective add (RCB16 alg 7, the MSM hot-loop formula):
    general adds, doubling via add(P,P), identity absorb, inverse pairs.
    Ref group law: ec/src/models/short_weierstrass_jacobian.rs."""
    rng = np.random.default_rng(21)
    pts = _host_g1_points(rng, 8)
    P = cv.g1_from_host(pts)
    Pp = cv.jac_to_proj(cv.FQ_OPS, P)
    A = cv.JacPoint(Pp.x[:4], Pp.y[:4], Pp.z[:4])
    B = cv.JacPoint(Pp.x[4:], Pp.y[4:], Pp.z[4:])
    got = cv.g1_to_host(cv.proj_to_jac(cv.FQ_OPS, cv.point_add_proj(cv.FQ_OPS, A, B)))
    for i in range(4):
        assert got[i] == H.G1.add(pts[i], pts[4 + i]), i
    got = cv.g1_to_host(cv.proj_to_jac(cv.FQ_OPS, cv.point_add_proj(cv.FQ_OPS, A, A)))
    for i in range(4):
        assert got[i] == H.G1.double(pts[i]), i
    O = cv.proj_zero(cv.FQ_OPS, A)
    got = cv.g1_to_host(cv.proj_to_jac(cv.FQ_OPS, cv.point_add_proj(cv.FQ_OPS, A, O)))
    for i in range(4):
        assert got[i] == pts[i], i
    # P + (-P) -> identity (z == 0 after conversion back to Jacobian)
    s = cv.proj_to_jac(
        cv.FQ_OPS, cv.point_add_proj(cv.FQ_OPS, A, cv.point_neg(cv.FQ_OPS, A))
    )
    assert np.asarray(F.is_zero(F.FQ, s.z)).all()


def test_proj_pippenger_matches_jacobian():
    rng = np.random.default_rng(22)
    n = 32
    pts = _host_g1_points(rng, n)
    P = cv.g1_from_host(pts)
    sc = F.rand(F.FR, np.random.default_rng(23), (n,))
    r_jac = msm_mod.msm_pippenger(cv.FQ_OPS, P, sc, c=5, proj=False)
    r_prj = msm_mod.msm_pippenger(cv.FQ_OPS, P, sc, c=5, proj=True)
    a = cv.g1_to_host(cv.JacPoint(r_jac.x[None], r_jac.y[None], r_jac.z[None]))[0]
    b = cv.g1_to_host(cv.JacPoint(r_prj.x[None], r_prj.y[None], r_prj.z[None]))[0]
    assert a == b
