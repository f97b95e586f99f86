"""BN254 device bindings: field specs + G1/G2 curve ops over the generic
limb machinery (`algebra/field.py`, `ops/curve.py`, `ops/msm.py`).

The compute layers are spec-parameterized; this module only instantiates
them with the BN254 constants (`algebra/bn254.py`) and provides the
host<->device point conversions.  MSM runs the branchless-Jacobian path
(the complete-projective + Pallas plane fast paths are BLS-G1-specialized;
see ops/curve.py:328, ops/msm.py plane gate).

refs: curves/bn254/src/fields/{fr,fq,fq2}.rs, curves/bn254/src/curves/.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..algebra import bn254 as C
from ..algebra import field as F
from ..algebra.field import FieldSpec
from . import curve as cv

# 254-bit moduli in 16 base-2^16 limbs (2 spare bits: 2p < R = 2^256)
FR_BN = FieldSpec.make("bn254_fr", C.R_MOD, 16)
FQ_BN = FieldSpec.make("bn254_fq", C.Q_MOD, 16)


class DevFqBN(cv.DevFq):
    spec = FQ_BN
    scalar_spec = FR_BN
    scalar_bits = C.FR_BITS

    @staticmethod
    def from_host(points):
        return g1_from_host(points)


class DevFq2BN(cv.DevFq2):
    """Fq2 = Fq[u]/(u^2 + 1) (nonresidue -1, ref fq2.rs:13)."""

    spec = FQ_BN
    NR = -1
    scalar_spec = FR_BN
    scalar_bits = C.FR_BITS

    @staticmethod
    def from_host(points):
        return g2_from_host(points)


FQ_OPS_BN = DevFqBN()
FQ2_OPS_BN = DevFq2BN()


def g1_from_host(points) -> cv.JacPoint:
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(1), ys.append(1), zs.append(0)
        else:
            xs.append(pt[0]), ys.append(pt[1]), zs.append(1)
    return cv.JacPoint(FQ_BN.to_device(xs), FQ_BN.to_device(ys), FQ_BN.to_device(zs))


def g1_to_host(P: cv.JacPoint):
    q = FQ_BN.p
    xs = FQ_BN.to_host(P.x).reshape(-1)
    ys = FQ_BN.to_host(P.y).reshape(-1)
    zs = FQ_BN.to_host(P.z).reshape(-1)
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
            continue
        zinv = pow(int(z), q - 2, q)
        zi2 = zinv * zinv % q
        out.append((int(x) * zi2 % q, int(y) * zi2 * zinv % q))
    return out


def g2_from_host(points) -> cv.JacPoint:
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append((1, 0)), ys.append((1, 0)), zs.append((0, 0))
        else:
            xs.append(pt[0]), ys.append(pt[1]), zs.append((1, 0))
    return cv.JacPoint(
        FQ2_OPS_BN.to_device(xs), FQ2_OPS_BN.to_device(ys), FQ2_OPS_BN.to_device(zs)
    )


def g2_to_host(P: cv.JacPoint):
    from ..algebra import hostbn as B

    xs = FQ2_OPS_BN.to_host(P.x)
    ys = FQ2_OPS_BN.to_host(P.y)
    zs = FQ2_OPS_BN.to_host(P.z)
    out = []
    for x, y, z in zip(xs, ys, zs):
        z = tuple(int(v) for v in z)
        if z == (0, 0):
            out.append(None)
            continue
        zinv = B.fq2_inv(z)
        zi2 = B.fq2_mul(zinv, zinv)
        zi3 = B.fq2_mul(zi2, zinv)
        out.append((
            B.fq2_mul(tuple(int(v) for v in x), zi2),
            B.fq2_mul(tuple(int(v) for v in y), zi3),
        ))
    return out
