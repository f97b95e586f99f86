"""LocalScheme: the degenerate 1-party 'scheme' — shares ARE public values.

Lets the SNARK provers (Plonk, Marlin, KZG openings) be written ONCE against
the scheme interface and run both locally and under MPC — the analog of the
reference running the same generic prover code over plain fields and
MpcField wire types (SURVEY.md §1 trick 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..algebra import field as F
from ..algebra.field import FR
from ..ops import curve as cv
from ..ops import msm as msm_mod
from .context import MpcContext
from ..parallel.net import StackedNet


class LocalScheme:
    name = "local"

    def __init__(self, ctx: MpcContext = None):
        self.ctx = ctx or MpcContext(StackedNet(1))
        self.net = self.ctx.net

    # field
    def ones_public(self, shape):
        one = jnp.asarray(FR.one_mont)
        return jnp.broadcast_to(one, tuple(shape) + (FR.L,)).astype(jnp.uint32)

    def from_public(self, pub):
        return pub

    def king_share(self, pub):
        return pub

    def reveal(self, sh):
        return sh

    def add(self, a, b):
        return F.add(FR, a, b)

    def sub(self, a, b):
        return F.sub(FR, a, b)

    def neg(self, a):
        return F.neg(FR, a)

    def scale(self, sh, pub):
        return F.mul(FR, sh, pub)

    def shift(self, sh, pub):
        return F.add(FR, sh, pub)

    def mul(self, x, y):
        return F.mul(FR, x, y)

    def inv(self, x):
        return F.batch_inv(FR, x) if x.ndim > 1 else F.inv(FR, x)

    def div(self, x, y):
        return F.mul(FR, x, self.inv(y))

    def partial_products(self, xs):
        return jax.lax.associative_scan(
            lambda a, b: F.mul(FR, a, b), xs, axis=-2
        )

    def lin_map(self, fn, sh):
        return fn(sh)

    # group
    def g_zero(self, fld):
        from .additive import AdditiveScheme

        return AdditiveScheme._identity_point(fld)

    def g_from_public(self, fld, P_pub):
        return P_pub

    def g_reveal(self, fld, sh):
        return sh

    def g_add(self, fld, a, b):
        return cv.point_add(fld, a, b)

    def g_neg(self, fld, a):
        return cv.point_neg(fld, a)

    def g_shift(self, fld, sh, P_pub):
        return cv.point_add(fld, sh, P_pub)

    def g_msm(self, fld, query, scalars):
        return msm_mod.msm(fld, query, scalars)

    def g_from_scalar_mul(self, fld, P_pub, k):
        return cv.point_scale_const(fld, P_pub, k)

    def g_scale_shared(self, fld, P_sh, k):
        return cv.point_scale_const(fld, P_sh, k)

    def _stacked(self):
        return False
