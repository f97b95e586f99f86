"""Device (JAX) elliptic-curve ops: branchless Jacobian arithmetic over
Fq and Fq2 limb vectors.

TPU-native re-design of the reference's curve layer
(ref: algebra/ec/src/models/short_weierstrass_jacobian.rs — SW Jacobian
add/double; ec/src/lib.rs:300-315 scalar_mul / multi_scalar_mul hooks).

Key differences from the CPU design:
  * points are *batches*: (X, Y, Z) limb arrays of shape (..., L) (G1) or
    (..., 2, L) (G2 over Fq2), identity encoded as Z == 0;
  * add/double are branch-free — the exceptional cases (identity operands,
    P == Q, P == -Q) are computed alongside and merged with vector selects,
    so the ops map onto the VPU with no data-dependent control flow;
  * the curve code is generic over a small "device field" interface, so G1
    (Fq) and G2 (Fq2 = Fq[u]/(u^2+5)) share one implementation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra import params as C
from ..algebra import field as F
from ..algebra.field import FQ, FR


class DevFq:
    """Device field interface over base-field limb arrays (..., L)."""

    spec = FQ

    def add(self, a, b):
        return F.add(self.spec, a, b)

    def sub(self, a, b):
        return F.sub(self.spec, a, b)

    def mul(self, a, b):
        return F.mul(self.spec, a, b)

    def sqr(self, a):
        return F.sqr(self.spec, a)

    def neg(self, a):
        return F.neg(self.spec, a)

    def is_zero(self, a):
        return F.is_zero(self.spec, a)

    def select(self, mask, a, b):
        return jnp.where(jnp.asarray(mask)[..., None], a, b)

    def zeros_like(self, a):
        return jnp.zeros_like(a)

    def one_like(self, a):
        return jnp.broadcast_to(jnp.asarray(self.spec.one_mont), a.shape).astype(
            jnp.uint32
        )

    def double(self, a):
        return F.add(self.spec, a, a)

    def mul_small(self, a, k):
        return F.mul_small(self.spec, a, k)

    def mul_many(self, pairs):
        """Independent products computed as ONE stacked multiplication —
        the jaxpr/HLO footprint of a single mul regardless of len(pairs)."""
        a = jnp.stack([p[0] for p in pairs])
        b = jnp.stack([p[1] for p in pairs])
        r = self.mul(a, b)
        return [r[i] for i in range(len(pairs))]

    # host conversions: elements are ints
    def to_device(self, xs):
        return self.spec.to_device(xs)

    def to_host(self, arr):
        return self.spec.to_host(arr)


class DevFq2:
    """Fq2 = Fq[u]/(u^2 - NR) over stacked limb arrays (..., 2, L).
    NR is the active curve's quadratic nonresidue (BLS12-377: -5, ref
    curves/bls12_377/src/fields/fq2.rs:13; BN254: -1, bn254 fq2.rs:13)."""

    spec = FQ
    NR = C.FQ2_NONRESIDUE - C.Q_MOD  # as a small negative int

    def add(self, a, b):
        return F.add(self.spec, a, b)

    def sub(self, a, b):
        return F.sub(self.spec, a, b)

    def neg(self, a):
        return F.neg(self.spec, a)

    def mul(self, a, b):
        s = self.spec
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        # Karatsuba with the three base-field products stacked into one op
        sa = jnp.stack([a0, a1, F.add(s, a0, a1)])
        sb = jnp.stack([b0, b1, F.add(s, b0, b1)])
        t = F.mul(s, sa, sb)
        t0, t1, t01 = t[0], t[1], t[2]
        c1 = F.sub(s, t01, F.add(s, t0, t1))
        # c0 = t0 + NR t1 (NR negative and small)
        nrt1 = t1 if self.NR == -1 else F.mul_small(s, t1, -self.NR)
        c0 = F.sub(s, t0, nrt1)
        return jnp.stack([c0, c1], axis=-2)

    def mul_many(self, pairs):
        a = jnp.stack([p[0] for p in pairs])
        b = jnp.stack([p[1] for p in pairs])
        r = self.mul(a, b)
        return [r[i] for i in range(len(pairs))]

    def sqr(self, a):
        return self.mul(a, a)

    def is_zero(self, a):
        # field-aware: lazy reduction stores values in [0, 2p), so a zero
        # may be represented by the digits of p — check both components
        # through the base field's zero test.
        return F.is_zero(self.spec, a[..., 0, :]) & F.is_zero(self.spec, a[..., 1, :])

    def select(self, mask, a, b):
        return jnp.where(jnp.asarray(mask)[..., None, None], a, b)

    def zeros_like(self, a):
        return jnp.zeros_like(a)

    def one_like(self, a):
        one = jnp.broadcast_to(jnp.asarray(self.spec.one_mont), a[..., 0, :].shape)
        return jnp.stack([one, jnp.zeros_like(one)], axis=-2).astype(jnp.uint32)

    def double(self, a):
        return F.add(self.spec, a, a)

    def mul_small(self, a, k):
        return F.mul_small(self.spec, a, k)

    # host conversions: elements are (c0, c1) int pairs
    def to_device(self, xs):
        flat = []
        for c0, c1 in xs:
            flat.append(c0)
            flat.append(c1)
        arr = self.spec.to_device(flat)
        return arr.reshape((len(xs), 2, self.spec.L))

    def to_host(self, arr):
        vals = self.spec.to_host(arr)
        flat = vals.reshape(-1, 2)
        return [(int(c[0]), int(c[1])) for c in flat]


FQ_OPS = DevFq()
FQ2_OPS = DevFq2()


class JacPoint(NamedTuple):
    """Batched Jacobian point; identity <=> z == 0 (all limbs)."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


def zero_point(fld, shape_like: JacPoint) -> JacPoint:
    one = fld.one_like(shape_like.x)
    zero = fld.zeros_like(shape_like.x)
    return JacPoint(one, one, zero)


def _is_concrete(*arrs) -> bool:
    return not any(isinstance(a, jax.core.Tracer) for a in arrs)


@functools.lru_cache(maxsize=None)
def _point_op_kernel(fld, name: str):
    """Shape-cached jitted point op for EAGER call sites (single adds in
    commitment assembly, reveal paths, ...).  An eager point_add otherwise
    dispatches ~10^2 primitives one by one — each unique shape paying an
    XLA mini-compile — which made KZG commits seconds-slow on CPU."""
    impl = {"add": _point_add_impl, "double": _point_double_impl}[name]
    return jax.jit(functools.partial(impl, fld))


def point_double(fld, P: JacPoint) -> JacPoint:
    if _is_concrete(P.x, P.y, P.z):
        return _point_op_kernel(fld, "double")(P)
    return _point_double_impl(fld, P)


def _point_double_impl(fld, P: JacPoint) -> JacPoint:
    """2P for a=0 curves (dbl-2009-l).  Identity maps to identity (Z=0 stays
    0).  Independent field products are stacked into batched muls (4 mul ops
    total) to keep the HLO graph small — scans/loops trace this many times.
    On TPU, G1 doubles route to the fused Pallas kernel."""
    if fld is FQ_OPS and F._pallas_ok():
        from . import pallas_curve

        x, y, z = pallas_curve.point_double_g1((P.x, P.y, P.z))
        return JacPoint(x, y, z)
    A, Bv, YZ = fld.mul_many([(P.x, P.x), (P.y, P.y), (P.y, P.z)])
    xb = fld.add(P.x, Bv)
    Cv, t = fld.mul_many([(Bv, Bv), (xb, xb)])
    D = fld.double(fld.sub(t, fld.add(A, Cv)))
    E = fld.add(fld.double(A), A)  # 3A
    Fv = fld.mul(E, E)
    X3 = fld.sub(Fv, fld.double(D))
    Y3 = fld.sub(fld.mul(E, fld.sub(D, X3)), fld.mul_small(Cv, 8))
    Z3 = fld.double(YZ)
    return JacPoint(X3, Y3, Z3)


def point_add(fld, P: JacPoint, Q: JacPoint) -> JacPoint:
    if _is_concrete(P.x, P.y, P.z, Q.x, Q.y, Q.z):
        return _point_op_kernel(fld, "add")(P, Q)
    return _point_add_impl(fld, P, Q)


def _point_add_impl(fld, P: JacPoint, Q: JacPoint) -> JacPoint:
    """General branchless add: handles identity operands, doubling, and
    inverse pairs via vector selects (no control flow).  The Jacobian add
    and the doubling path are evaluated together with their independent
    products stacked into 5 batched muls.
    On TPU, G1 adds route to the fused Pallas kernel (ONE launch)."""
    if fld is FQ_OPS and F._pallas_ok():
        from . import pallas_curve

        x, y, z = pallas_curve.point_add_g1((P.x, P.y, P.z), (Q.x, Q.y, Q.z))
        return JacPoint(x, y, z)
    # G1
    Z1Z1, Z2Z2, A, Bv, YZ = fld.mul_many(
        [(P.z, P.z), (Q.z, Q.z), (P.x, P.x), (P.y, P.y), (P.y, P.z)]
    )
    xb = fld.add(P.x, Bv)
    # G2
    U1, U2, t1, t2, Cv, tD = fld.mul_many(
        [(P.x, Z2Z2), (Q.x, Z1Z1), (Q.z, Z2Z2), (P.z, Z1Z1), (Bv, Bv), (xb, xb)]
    )
    H = fld.sub(U2, U1)
    E = fld.add(fld.double(A), A)
    D = fld.double(fld.sub(tD, fld.add(A, Cv)))
    # G3
    S1, S2, HH, Z1Z2, Fv = fld.mul_many(
        [(P.y, t1), (Q.y, t2), (H, H), (P.z, Q.z), (E, E)]
    )
    r = fld.sub(S2, S1)
    Xd = fld.sub(Fv, fld.double(D))
    # G4
    HHH, V, r2, Z3, Yd1 = fld.mul_many(
        [(H, HH), (U1, HH), (r, r), (Z1Z2, H), (E, fld.sub(D, Xd))]
    )
    X3 = fld.sub(fld.sub(r2, HHH), fld.double(V))
    Yd = fld.sub(Yd1, fld.mul_small(Cv, 8))
    Zd = fld.double(YZ)
    # G5
    Y3a, Y3b = fld.mul_many([(r, fld.sub(V, X3)), (S1, HHH)])
    Y3 = fld.sub(Y3a, Y3b)

    added = JacPoint(X3, Y3, Z3)
    doubled = JacPoint(Xd, Yd, Zd)

    p1_inf = fld.is_zero(P.z)
    p2_inf = fld.is_zero(Q.z)
    eq_x = fld.is_zero(H)
    eq_y = fld.is_zero(r)

    zero = zero_point(fld, P)
    sel = fld.select
    out = added
    out = JacPoint(*(sel(eq_x & eq_y, d, o) for d, o in zip(doubled, out)))
    out = JacPoint(*(sel(eq_x & ~eq_y, z, o) for z, o in zip(zero, out)))
    out = JacPoint(*(sel(p1_inf, q, o) for q, o in zip(Q, out)))
    out = JacPoint(*(sel(p2_inf & ~p1_inf, p, o) for p, o in zip(P, out)))
    return out


def point_neg(fld, P: JacPoint) -> JacPoint:
    return JacPoint(P.x, fld.neg(P.y), P.z)


# ---------------------------------------------------------------------------
# Homogeneous-projective points with COMPLETE addition (a=0, b=1 — G1).
#
# The MSM hot loops (prefix scans over sorted points) use these instead of
# the branchless Jacobian add: Renes-Costello-Batina 2016 Algorithm 7 is
# valid for ALL inputs in the odd-order subgroup — identity, doubling, and
# inverse pairs included — at 12 muls with no zero-tests or selects (the
# Jacobian kernel evaluates both add and double paths: ~25 muls + 4 tests).
# Identity = (0, 1, 0).  Same JacPoint container; semantics differ.
# ---------------------------------------------------------------------------

def proj_zero(fld, shape_like: JacPoint) -> JacPoint:
    one = fld.one_like(shape_like.x)
    zero = fld.zeros_like(shape_like.x)
    return JacPoint(zero, one, zero)


def jac_to_proj(fld, P: JacPoint) -> JacPoint:
    """Jacobian (X, Y, Z) -> projective (X Z, Y, Z^3); identity (Z=0),
    whatever its X/Y, maps to (0, 1, 0) explicitly."""
    Z2 = fld.mul(P.z, P.z)
    Xp = fld.mul(P.x, P.z)
    Zp = fld.mul(Z2, P.z)
    O = proj_zero(fld, P)
    inf = fld.is_zero(P.z)
    sel = fld.select
    return JacPoint(sel(inf, O.x, Xp), sel(inf, O.y, P.y), sel(inf, O.z, Zp))


def proj_to_jac(fld, P: JacPoint) -> JacPoint:
    """Projective (X, Y, Z) -> Jacobian (X Z, Y Z^2, Z).  The projective
    identity (0, y, 0) lands on Z=0 (Jacobian identity) automatically."""
    Z2 = fld.mul(P.z, P.z)
    return JacPoint(fld.mul(P.x, P.z), fld.mul(P.y, Z2), P.z)


def point_add_proj(fld, P: JacPoint, Q: JacPoint) -> JacPoint:
    """Complete projective add (RCB16 alg 7, a=0, b3=3b).  G1 only."""
    assert fld is FQ_OPS, "complete projective formulas are G1-only (a=0)"
    b3 = 3 * C.G1_B
    # the fused Pallas kernel hard-codes the BLS12-377 b3=3 constants
    if F._pallas_ok() and b3 == 3:
        from . import pallas_curve

        x, y, z = pallas_curve.point_add_proj_g1(
            (P.x, P.y, P.z), (Q.x, Q.y, Q.z)
        )
        return JacPoint(x, y, z)
    t0, t1, t2, a3, a4, a5 = fld.mul_many(
        [
            (P.x, Q.x),
            (P.y, Q.y),
            (P.z, Q.z),
            (fld.add(P.x, P.y), fld.add(Q.x, Q.y)),
            (fld.add(P.y, P.z), fld.add(Q.y, Q.z)),
            (fld.add(P.x, P.z), fld.add(Q.x, Q.z)),
        ]
    )
    t3 = fld.sub(fld.sub(a3, t0), t1)           # X1Y2 + X2Y1
    t4 = fld.sub(fld.sub(a4, t1), t2)           # Y1Z2 + Y2Z1
    t5 = fld.sub(fld.sub(a5, t0), t2)           # X1Z2 + X2Z1
    m = fld.mul_small(t0, 3)
    w = fld.mul_small(t2, b3)                   # b3 Z1Z2
    s = fld.add(t1, w)
    d = fld.sub(t1, w)
    v = fld.mul_small(t5, b3)                   # b3 (X1Z2+X2Z1)
    x1, x2, y1, y2, z1, z2 = fld.mul_many(
        [(t3, d), (t4, v), (d, s), (m, v), (t4, s), (t3, m)]
    )
    return JacPoint(
        fld.sub(x1, x2), fld.add(y1, y2), fld.add(z1, z2)
    )


def point_select(fld, mask, P: JacPoint, Q: JacPoint) -> JacPoint:
    return JacPoint(*(fld.select(mask, a, b) for a, b in zip(P, Q)))


def _shift_points(P: JacPoint, s) -> JacPoint:
    """Shift a point batch right by a (possibly traced) offset s along axis
    0, filling with the identity (all-zero coords => Z=0)."""
    n = P.x.shape[0]

    def sh(a):
        pad = jnp.zeros_like(a)
        big = jnp.concatenate([pad, a], axis=0)
        return jax.lax.dynamic_slice_in_dim(big, n - s, n, axis=0)

    return JacPoint(sh(P.x), sh(P.y), sh(P.z))


def reduce_points(fld, P: JacPoint) -> JacPoint:
    """Sum of a batch of points along axis 0, as a single scalar point.

    Hillis-Steele shift-add with a fori_loop over the log2(N) levels: only
    ONE point_add site is traced, keeping the HLO graph small enough to use
    inside scans and loops.  (N log N work; the work-efficient variant lives
    in the Pallas path.)
    """
    n = P.x.shape[0]
    levels = max(1, (n - 1).bit_length())

    def body(d, Q):
        s = jnp.left_shift(1, d)
        return point_add(fld, Q, _shift_points(Q, s))

    Q = jax.lax.fori_loop(0, levels, body, P)
    return JacPoint(Q.x[n - 1], Q.y[n - 1], Q.z[n - 1])


def tree_reduce(fld, P: JacPoint) -> JacPoint:
    """Sum a batch of points along axis 0 by pairwise halving (log2 N
    batched adds — the vector-machine analog of a sequential accumulation)."""
    n = P.x.shape[0]
    # pad to a power of two with identities
    m = 1
    while m < n:
        m <<= 1
    if m != n:
        pad = zero_point(fld, JacPoint(P.x[:1], P.y[:1], P.z[:1]))
        padder = lambda a, pz: jnp.concatenate(
            [a, jnp.broadcast_to(pz, (m - n,) + a.shape[1:])], axis=0
        )
        P = JacPoint(
            padder(P.x, pad.x), padder(P.y, pad.y), padder(P.z, pad.z)
        )
    while m > 1:
        h = m // 2
        P = point_add(
            fld,
            JacPoint(P.x[:h], P.y[:h], P.z[:h]),
            JacPoint(P.x[h : 2 * h], P.y[h : 2 * h], P.z[h : 2 * h]),
        )
        m = h
    return P


# ---------------------------------------------------------------------------
# Host <-> device conversions
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _scale_const_kernel(fld):
    """Batched point x single Montgomery scalar -> batched scaled points
    (double-and-add over 253 bits; one traced double+add site)."""
    from ..algebra.field import FR

    def f(P: JacPoint, k_mont):
        sc = F.from_mont(FR, k_mont[None])[0]
        acc = zero_point(fld, P)
        nbits = 253

        def body(i, acc):
            acc = point_double(fld, acc)
            t = nbits - 1 - i
            limb = jax.lax.dynamic_index_in_dim(sc, t // F.LIMB_BITS, keepdims=False)
            bit = (limb >> (t % F.LIMB_BITS).astype(jnp.uint32)) & 1
            cand = point_add(fld, acc, P)
            return point_select(fld, bit == 1, cand, acc)

        return jax.lax.fori_loop(0, nbits, body, acc)

    return jax.jit(f)


def point_scale_const(fld, P: JacPoint, k_mont):
    return _scale_const_kernel(fld)(P, k_mont)


@functools.lru_cache(maxsize=None)
def _scale_batch_kernel(fld):
    """Per-element scalar mul: points (N, ...) x scalars (N, L) ->
    (N, ...) scaled points (double-and-add, one traced site)."""
    from ..algebra.field import FR

    def f(P: JacPoint, k_mont):
        sc = F.from_mont(FR, k_mont)          # (N, L) standard form
        acc = zero_point(fld, P)
        nbits = 253

        def body(i, acc):
            acc = point_double(fld, acc)
            t = nbits - 1 - i
            limb = jax.lax.dynamic_index_in_dim(
                sc, t // F.LIMB_BITS, axis=1, keepdims=False
            )
            bit = (limb >> (t % F.LIMB_BITS).astype(jnp.uint32)) & 1
            cand = point_add(fld, acc, P)
            return point_select(fld, bit == 1, cand, acc)

        return jax.lax.fori_loop(0, nbits, body, acc)

    return jax.jit(f)


def point_scale_batch(fld, P: JacPoint, scalars_mont):
    """[k_i * P_i] for batched points and per-element Montgomery scalars
    (the GroupShare::scale_pub_group semantics, ref share/add.rs:256-260)."""
    return _scale_batch_kernel(fld)(P, scalars_mont)


def g1_from_host(points) -> JacPoint:
    """List of affine (x, y) int pairs or None -> batched Jacobian point."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(1)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            zs.append(1)
    return JacPoint(FQ.to_device(xs), FQ.to_device(ys), FQ.to_device(zs))


def g1_to_host(P: JacPoint):
    """Batched Jacobian -> list of affine (x, y) ints or None (host math)."""
    q = FQ.p
    xs = FQ.to_host(P.x).reshape(-1)
    ys = FQ.to_host(P.y).reshape(-1)
    zs = FQ.to_host(P.z).reshape(-1)
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
            continue
        zinv = pow(int(z), q - 2, q)
        zi2 = zinv * zinv % q
        out.append((int(x) * zi2 % q, int(y) * zi2 * zinv % q))
    return out


def g2_from_host(points) -> JacPoint:
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append((1, 0))
            ys.append((1, 0))
            zs.append((0, 0))
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            zs.append((1, 0))
    return JacPoint(
        FQ2_OPS.to_device(xs), FQ2_OPS.to_device(ys), FQ2_OPS.to_device(zs)
    )


def g2_to_host(P: JacPoint):
    from ..algebra import hostapi as H

    xs = FQ2_OPS.to_host(P.x)
    ys = FQ2_OPS.to_host(P.y)
    zs = FQ2_OPS.to_host(P.z)
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == (0, 0):
            out.append(None)
            continue
        zinv = H.fq2_inv(z)
        zi2 = H.fq2_mul(zinv, zinv)
        out.append(
            (H.fq2_mul(x, zi2), H.fq2_mul(y, H.fq2_mul(zi2, zinv)))
        )
    return out
