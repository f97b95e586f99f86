"""Additive secret sharing, honest-but-curious (ref: share/add.rs).

Field element x is split as x = sum_i sh_i; linear ops are share-local,
`shift` (add public) is king-only (ref add.rs:141-146), reveal is a
broadcast + sum (ref add.rs:85-87).  Group elements are shared additively in
the group; reveal broadcasts point shares and point-adds them.

Nonlinear ops run Beaver protocols batched per call — ONE collective round
per batch (the reference's batching discipline, share/field.rs:97-127).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra import params as C
from ..algebra import field as F
from ..algebra.field import FR
from ..ops import curve as cv
from ..ops import msm as msm_mod
from . import beaver
from .context import MpcContext


def _fold_field(g):
    """(P, ..., L) -> (..., L) field sum (log2 P batched adds)."""
    p = g.shape[0]
    while p > 1:
        half = p // 2
        lo = g[:half]
        hi = g[half : 2 * half]
        s = F.add(FR, lo, hi)
        if p % 2:
            s = s.at[0].set(F.add(FR, s[0], g[-1]))
        g = s
        p = half
    return g[0]


def _fold_points(fld, g: cv.JacPoint) -> cv.JacPoint:
    p = g.x.shape[0]
    while p > 1:
        half = p // 2
        lo = cv.JacPoint(g.x[:half], g.y[:half], g.z[:half])
        hi = cv.JacPoint(g.x[half : 2 * half], g.y[half : 2 * half], g.z[half : 2 * half])
        s = cv.point_add(fld, lo, hi)
        if p % 2:
            last = cv.JacPoint(g.x[-1], g.y[-1], g.z[-1])
            s0 = cv.point_add(fld, cv.JacPoint(s.x[0], s.y[0], s.z[0]), last)
            s = cv.JacPoint(
                s.x.at[0].set(s0.x), s.y.at[0].set(s0.y), s.z.at[0].set(s0.z)
            )
        g = s
        p = half
    return cv.JacPoint(g.x[0], g.y[0], g.z[0])


class AdditiveScheme:
    name = "hbc"

    def __init__(self, ctx: MpcContext):
        self.ctx = ctx
        self.net = ctx.net
        self.field_source = beaver.DummyFieldTripleSource(self)
        self.group_source = beaver.DummyGroupTripleSource(self)

    # ---------------- field shares ----------------
    def ones_public(self, shape):
        one = jnp.asarray(FR.one_mont)
        return jnp.broadcast_to(one, tuple(shape) + (FR.L,)).astype(jnp.uint32)

    def zeros_like_share(self, pub_shape):
        return jnp.zeros(tuple(pub_shape) + (FR.L,), jnp.uint32)

    def from_public(self, pub):
        """Public value -> share where the king holds the value
        (ref add.rs:88-92)."""
        stacked = self.net.stack_public(pub)
        return self.net.where_king(stacked, jnp.zeros_like(stacked))

    def king_share(self, pub):
        """King splits a value it knows into uniformly random shares and
        scatters them (ref add.rs:99-117 king_share_batch)."""
        n = self.net.n_parties()
        rand = self.ctx.rand_fr((n - 1,) + tuple(pub.shape[:-1]))
        total = _fold_field(rand) if n > 1 else None
        king_row = F.sub(FR, pub, total) if total is not None else pub
        full = jnp.concatenate([king_row[None], rand], axis=0)
        return self.net.scatter_from_king(full)

    def reveal(self, sh):
        """Broadcast + sum (ref add.rs:85-87)."""
        g = self.net.all_gather(sh)
        val = _fold_field(g)
        if self.ctx.debug:
            self.ctx.push_check("check_eq", self.net.check_eq(val))
        return val

    # linear (local)
    def add(self, a, b):
        return F.add(FR, a, b)

    def sub(self, a, b):
        return F.sub(FR, a, b)

    def neg(self, a):
        return F.neg(FR, a)

    def scale(self, sh, pub):
        """share * public (local, ref share/field.rs:60-64)."""
        return F.mul(FR, sh, pub)

    def shift(self, sh, pub):
        """share + public: king-only (ref add.rs:141-146)."""
        stacked = self.net.stack_public(pub)
        delta = self.net.where_king(stacked, jnp.zeros_like(stacked))
        return F.add(FR, sh, delta)

    # nonlinear (Beaver; ONE batched reveal round for d,e)
    def mul(self, x, y):
        a, b, c = self.field_source.triple(self._pub_shape(x))
        d_e = self.reveal(
            jnp.stack([self.sub(x, a), self.sub(y, b)], axis=-2)
        )
        d = d_e[..., 0, :]
        e = d_e[..., 1, :]
        z = self.add(c, self.add(self.scale(a, e), self.scale(b, d)))
        z = self.shift(z, F.mul(FR, d, e))
        return z

    def _pub_shape(self, sh):
        # public shape of a share (strip party axis in stacked mode)
        lead = 1 if self._has_party_axis() else 0
        return sh.shape[lead:-1]

    def _has_party_axis(self):
        from ..parallel.net import StackedNet

        return isinstance(self.net, StackedNet)

    def inv(self, x):
        """Via inverse pair: x^{-1} = r * (x r)^{-1} (ref share/field.rs:
        129-148)."""
        r, rinv = self.field_source.inv_pair(self._pub_shape(x))
        m = self.reveal(self.mul(x, r))
        minv = F.batch_inv(FR, m) if m.ndim > 1 else F.inv(FR, m)
        return self.scale(rinv, minv)

    def div(self, x, y):
        return self.mul(x, self.inv(y))

    def partial_products(self, xs):
        """Masked prefix-product protocol (ref share/field.rs:163-182):
        prefix_k = x_0 * ... * x_k as shares, via inverse-pair masking, ONE
        batched opening, public prefix scan, unmask.  xs: share (..., N, L)
        (party axis first in stacked mode)."""
        npts = self._pub_shape(xs)[0]
        r, s = self.field_source.inv_pair((npts + 1,))
        # r_0 must be public 1 for unmasking; dummy pairs already are shares
        # of 1, and index alignment: m_i = r_i * x_i * s_{i+1}
        r_lead = r[..., :npts, :]
        s_next = s[..., 1:, :]
        u = self.mul(xs, r_lead)
        m = self.reveal(self.mul(u, s_next))  # public (N, L)
        # public inclusive prefix products
        pref = jax.lax.associative_scan(lambda a, b: F.mul(FR, a, b), m, axis=0)
        # unmask: P_k = pref_k * r_{k+1}  (r_0 == 1 by construction)
        return self.scale(r[..., 1:, :], pref)

    # ---------------- wire-layer helpers ----------------
    def lin_map(self, fn, sh):
        """Apply a LOCAL linear array function to a share (the reason FFTs
        and matvecs are communication-free on shares, SURVEY.md §1 trick 1)."""
        return fn(sh)

    def g_msm(self, fld, query: cv.JacPoint, scalars_sh):
        """MSM of public bases by shared scalars: local per-party Pippenger
        on the scalar shares (ref wire/pairing.rs:746-800)."""
        from ..ops import msm as msm_mod

        if self._has_party_axis():
            n = self.net.n_parties()
            outs = [msm_mod.msm(fld, query, scalars_sh[i]) for i in range(n)]
            return cv.JacPoint(
                jnp.stack([o.x for o in outs]),
                jnp.stack([o.y for o in outs]),
                jnp.stack([o.z for o in outs]),
            )
        return msm_mod.msm(fld, query, scalars_sh)

    def g_from_scalar_mul(self, fld, P_pub: cv.JacPoint, k_sh):
        """public point x shared scalar -> shared point (local per party)."""
        if self._has_party_axis():
            n = self.net.n_parties()
            outs = [cv.point_scale_const(fld, P_pub, k_sh[i]) for i in range(n)]
            return cv.JacPoint(
                jnp.stack([o.x for o in outs]),
                jnp.stack([o.y for o in outs]),
                jnp.stack([o.z for o in outs]),
            )
        return cv.point_scale_const(fld, P_pub, k_sh)

    # ---------------- group shares ----------------
    @staticmethod
    def _identity_point(fld) -> cv.JacPoint:
        if fld is cv.FQ_OPS:
            pts = cv.g1_from_host([None])
        else:
            pts = cv.g2_from_host([None])
        return cv.JacPoint(pts.x[0], pts.y[0], pts.z[0])

    def g_zero(self, fld):
        pt = self._identity_point(fld)
        stack = self.net.stack_public
        return cv.JacPoint(stack(pt.x), stack(pt.y), stack(pt.z))

    def g_from_public(self, fld, P_pub: cv.JacPoint):
        """King holds the point, others hold identity."""
        zero = cv.zero_point(fld, P_pub)
        st = lambda a, z: self.net.where_king(
            self.net.stack_public(a), self.net.stack_public(z)
        )
        return cv.JacPoint(
            st(P_pub.x, zero.x), st(P_pub.y, zero.y), st(P_pub.z, zero.z)
        )

    def g_reveal(self, fld, sh: cv.JacPoint) -> cv.JacPoint:
        gx = self.net.all_gather(sh.x)
        gy = self.net.all_gather(sh.y)
        gz = self.net.all_gather(sh.z)
        return _fold_points(fld, cv.JacPoint(gx, gy, gz))

    def g_add(self, fld, a, b):
        return cv.point_add(fld, a, b)

    def g_neg(self, fld, a):
        return cv.point_neg(fld, a)

    def g_shift(self, fld, sh: cv.JacPoint, P_pub: cv.JacPoint):
        """share + public point: king-only."""
        shifted = cv.point_add(fld, sh, self._bcast_pt(P_pub, sh))
        mask = self._king_mask(fld, sh)
        sel = lambda a, b: fld.select(mask, a, b)
        return cv.JacPoint(
            sel(shifted.x, sh.x), sel(shifted.y, sh.y), sel(shifted.z, sh.z)
        )

    def _king_mask(self, fld, sh: cv.JacPoint):
        """Boolean 'is king' mask, shaped to broadcast over the share's
        batch dims (fld.select appends the coordinate dims itself)."""
        coord_dims = 1 if fld is cv.FQ_OPS else 2
        if self._has_party_axis():
            batch = sh.z.ndim - 1 - coord_dims
            return self.net.is_king(batch)
        return self.net.is_king(0)

    def _bcast_pt(self, P_pub: cv.JacPoint, like: cv.JacPoint):
        st = self.net.stack_public
        return cv.JacPoint(st(P_pub.x), st(P_pub.y), st(P_pub.z))

    def g_scale_pub_point(self, fld, P_pub_batch: cv.JacPoint, k_sh):
        """public points x shared scalars -> shared points: LOCAL batched
        scalar mul on each party's scalar shares (ref share/add.rs:256-260
        scale_pub_group)."""
        if self._has_party_axis():
            n = self.net.n_parties()
            outs = [
                cv.point_scale_batch(fld, P_pub_batch, k_sh[i]) for i in range(n)
            ]
            return cv.JacPoint(
                jnp.stack([o.x for o in outs]),
                jnp.stack([o.y for o in outs]),
                jnp.stack([o.z for o in outs]),
            )
        return cv.point_scale_batch(fld, P_pub_batch, k_sh)

    def g_scale_shared(self, fld, P_sh: cv.JacPoint, k_sh):
        """shared point x shared scalar via a group Beaver triple
        (ref share/group.rs:70-109)."""
        a, B, Cp = self.group_source.triple(fld)
        d = self.reveal(self.sub(k_sh, a))              # public scalar
        E = self.g_reveal(fld, self._g_sub(fld, P_sh, B))  # public point
        # k*P = C + d*B + a*E + d*E ; last term public -> king shift
        dB = self._g_scale_public_scalar(fld, B, d)
        aE = self._g_scale_share_scalar_public_point(fld, E, a)
        dE_pub = self._scalar_mul_pub(fld, E, d)
        z = self.g_add(fld, Cp, self.g_add(fld, dB, aE))
        return self.g_shift(fld, z, dE_pub)

    def _g_sub(self, fld, A, B):
        return cv.point_add(fld, A, cv.point_neg(fld, B))

    def _g_scale_public_scalar(self, fld, P_sh: cv.JacPoint, d_pub):
        """public scalar x shared point (local per-party scalar mul)."""
        from ..snark.groth16 import _scalar_mul_kernel

        n = self.net.n_parties() if self._has_party_axis() else 1
        if self._has_party_axis():
            outs = [
                _scalar_mul_kernel(fld)(
                    cv.JacPoint(P_sh.x[i], P_sh.y[i], P_sh.z[i]), d_pub
                )
                for i in range(n)
            ]
            return cv.JacPoint(
                jnp.stack([o.x for o in outs]),
                jnp.stack([o.y for o in outs]),
                jnp.stack([o.z for o in outs]),
            )
        return _scalar_mul_kernel(fld)(P_sh, d_pub)

    def _g_scale_share_scalar_public_point(self, fld, P_pub: cv.JacPoint, a_sh):
        """shared scalar x public point (local scalar mul on the share)."""
        from ..snark.groth16 import _scalar_mul_kernel

        if self._has_party_axis():
            n = self.net.n_parties()
            outs = [
                _scalar_mul_kernel(fld)(P_pub, a_sh[i]) for i in range(n)
            ]
            return cv.JacPoint(
                jnp.stack([o.x for o in outs]),
                jnp.stack([o.y for o in outs]),
                jnp.stack([o.z for o in outs]),
            )
        return _scalar_mul_kernel(fld)(P_pub, a_sh)

    def _scalar_mul_pub(self, fld, P_pub: cv.JacPoint, d_pub):
        from ..snark.groth16 import _scalar_mul_kernel

        return _scalar_mul_kernel(fld)(P_pub, d_pub)
