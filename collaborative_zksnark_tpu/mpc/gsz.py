"""GSZ20 shares: degree-tracked Shamir over a party-indexed FFT domain,
honest-majority with malicious-security checks (ref: share/gsz20/mod.rs,
after Goyal-Song ia.cr/2020/134).

Party i's share of x is f(omega^i) for a random polynomial f of degree
t = (n-1)/2 with f(0) = x — the share vector IS an evaluation-domain
encoding, so opening is an iFFT over the party axis + a degree check +
evaluation at 0 (ref gsz20/mod.rs:434-459), which on this backend is a tiny
batched NTT with the party axis leading.

Multiplication is the king-based degree reduction (ref :536-554): multiply
shares locally (degree 2t), gather to the king, king reconstructs (degree
check at 2t) and deals a fresh degree-t sharing.  As in the reference, the
`rand`/`double_rand` masking randomness is STUBBED ("can be pre-processed",
ref :383-410) — here as zeros; the king dealing is otherwise faithful.

Every multiplication queues its (x, y, z) triple; before any reveal the
queue is drained by a random-linear-combination product check opened at
degree 2t (the deferred-verification slot of the reference's
hadamard_check -> ip_check pipeline, ref :599-787; the recursive ip_compress
refinement is future work — the check here still catches any inconsistent
triple against the opened polynomial).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra import bls12_377 as C
from ..algebra import field as F
from ..algebra.field import FR
from ..ops import curve as cv
from ..ops import ntt
from .additive import _fold_points
from .context import MpcContext

P = C.R_MOD


@functools.lru_cache(maxsize=None)
def _party_domain(n: int):
    if n & (n - 1) == 0:
        return ntt.get_radix2_domain(n)
    assert n == 3, "GSZ party counts: powers of two, or 3"
    return ntt.get_mixed_domain(n)


@functools.lru_cache(maxsize=None)
def _party_vandermonde(n: int):
    """(V, V^-1) for the party domain as Montgomery device constants.

    Party domains are tiny (n <= ~32), so the share-polynomial transforms
    are explicit matrix products — a handful of batched field ops instead of
    the full NTT machinery (compile-light, works for any n with an n-th
    root of unity)."""
    dom = _party_domain(n)
    pts = dom.elements()
    V = [[pow(w, j, P) for j in range(n)] for w in pts]
    # invert mod P (Gauss-Jordan over Python ints)
    A = [row[:] + [1 if i == j else 0 for j in range(n)] for i, row in enumerate(V)]
    for col in range(n):
        piv = next(r for r in range(col, n) if A[r][col] % P != 0)
        A[col], A[piv] = A[piv], A[col]
        inv = pow(A[col][col], P - 2, P)
        A[col] = [v * inv % P for v in A[col]]
        for r in range(n):
            if r != col and A[r][col] % P:
                f = A[r][col]
                A[r] = [(v - f * w) % P for v, w in zip(A[r], A[col])]
    Vinv = [row[n:] for row in A]
    to_dev = lambda M: FR.to_device([v for row in M for v in row]).reshape(
        (n, n, FR.L)
    )
    return to_dev(V), to_dev(Vinv)


def _party_matmul(M_dev, x):
    """(n, n, L) public matrix x (n, ..., L) rows -> (n, ..., L):
    out[i] = sum_j M[i, j] * x[j] (batched scale + log-fold)."""
    n = x.shape[0]
    extra = x.ndim - 2
    Mb = M_dev.reshape((n, n) + (1,) * extra + (FR.L,))
    prods = F.mul(FR, Mb, x[None])          # (n, n, ..., L)
    return F.fold_sum(FR, prods, axis=1)


@functools.lru_cache(maxsize=None)
def _lagrange_at_zero(n: int) -> List[int]:
    """lambda_i with sum lambda_i f(w^i) = f(0) for deg(f) <= n-1."""
    dom = _party_domain(n)
    pts = dom.elements()
    lams = []
    for i in range(n):
        num, den = 1, 1
        for j in range(n):
            if j == i:
                continue
            num = num * pts[j] % P
            den = den * (pts[j] - pts[i]) % P
    # den inverse
        lams.append(num * pow(den, P - 2, P) % P)
    return lams


class GszScheme:
    name = "gsz"

    def __init__(self, ctx: MpcContext):
        self.ctx = ctx
        self.net = ctx.net
        n = self.net.n_parties()
        self.t = (n - 1) // 2
        self.dom = _party_domain(n)
        self.triple_queue: List[Tuple] = []
        self.group_triple_queue: List[Tuple] = []

    # ---------------- helpers ----------------
    def _share_poly(self, pub, degree, randomize=True):
        """Deal a degree-`degree` sharing of pub (king-side math):
        coefficients [pub, r_1..r_degree, 0...] -> FFT over the party axis."""
        n = self.net.n_parties()
        shape = pub.shape[:-1]
        coeffs = [pub[None]]
        if randomize and degree > 0:
            coeffs.append(self.ctx.rand_fr((degree,) + tuple(shape)))
        pad = n - 1 - (degree if randomize else 0)
        if pad > 0:
            coeffs.append(
                jnp.zeros((pad,) + tuple(shape) + (FR.L,), jnp.uint32)
            )
        cvec = jnp.concatenate(coeffs, axis=0)  # (n, ..., L)
        V, _ = _party_vandermonde(n)
        return _party_matmul(V, cvec)

    def _open_raw(self, sh, degree):
        """gather -> iFFT over party axis -> (value=f(0)=c0, degree_ok)."""
        g = self.net.all_gather(sh)
        _, Vinv = _party_vandermonde(self.net.n_parties())
        coeffs = _party_matmul(Vinv, g)
        value = coeffs[0]
        if degree + 1 < self.net.n_parties():
            ok = jnp.all(F.is_zero(FR, coeffs[degree + 1 :]))
        else:
            ok = jnp.asarray(True)
        return value, ok

    # ---------------- field shares ----------------
    def ones_public(self, shape):
        one = jnp.asarray(FR.one_mont)
        return jnp.broadcast_to(one, tuple(shape) + (FR.L,)).astype(jnp.uint32)

    def from_public(self, pub):
        """Constant (degree-0) sharing: every share equals the value."""
        return self.net.stack_public(pub)

    def king_share(self, pub):
        full = self._share_poly(pub, self.t)
        return self.net.scatter_from_king(full)

    def reveal(self, sh):
        self.run_deferred_checks()
        val, ok = self._open_raw(sh, self.t)
        self.ctx.push_check("gsz_degree", ok)
        return val

    def add(self, a, b):
        return F.add(FR, a, b)

    def sub(self, a, b):
        return F.sub(FR, a, b)

    def neg(self, a):
        return F.neg(FR, a)

    def scale(self, sh, pub):
        return F.mul(FR, sh, pub)

    def shift(self, sh, pub):
        """Shamir shift: ADD the constant to every share (constant poly) —
        unlike the additive scheme's king-only rule."""
        return F.add(FR, sh, self.net.stack_public(pub))

    def mul(self, x, y, queue_check=True):
        """Local product (degree 2t) + king degree-reduction
        (ref gsz20/mod.rs:536-554); masking randomness stubbed like the
        reference's rand/double_rand."""
        z2 = F.mul(FR, x, y)
        z = self._degree_reduce(z2)
        if queue_check:
            self.triple_queue.append((x, y, z))
        return z

    def _degree_reduce(self, sh_2t):
        g = self.net.gather_to_king(sh_2t)
        _, Vinv = _party_vandermonde(self.net.n_parties())
        coeffs = _party_matmul(Vinv, g)
        value = coeffs[0]
        if 2 * self.t + 1 < self.net.n_parties():
            ok = jnp.all(F.is_zero(FR, coeffs[2 * self.t + 1 :]))
        else:
            ok = jnp.asarray(True)
        self.ctx.push_check("gsz_king_degree", ok)
        fresh = self._share_poly(value, self.t)
        return self.net.scatter_from_king(fresh)

    def _pub_shape(self, sh):
        lead = 1 if self._stacked() else 0
        return sh.shape[lead:-1]

    def inv(self, x):
        """r * (x r)^{-1} with r stubbed to 1 (rand stub, ref :383-410)."""
        one = self.from_public(self.ones_public(self._pub_shape(x)))
        m = self.reveal(self.mul(x, one))
        minv = F.batch_inv(FR, m) if m.ndim > 1 else F.inv(FR, m)
        return self.scale(one, minv)

    def div(self, x, y):
        return self.mul(x, self.inv(y))

    def _stacked(self):
        from ..parallel.net import StackedNet

        return isinstance(self.net, StackedNet)

    def partial_products(self, xs):
        """Prefix products in log2(N) batched GSZ multiplication rounds
        (Hillis-Steele over the element axis; each round is ONE king
        exchange — the GSZ analog of the masked prefix-product protocol)."""
        n = self._pub_shape(xs)[0]
        axis = 1 if self._stacked() else 0
        one = self.from_public(self.ones_public((n,)))
        idx = jnp.arange(n)
        cond_shape = (1, n, 1) if self._stacked() else (n, 1)
        acc = xs
        shiftv = 1
        while shiftv < n:
            rolled = jnp.roll(acc, shiftv, axis=axis)
            keep = (idx >= shiftv).reshape(cond_shape)
            rolled = jnp.where(keep, rolled, one)
            acc = self.mul(acc, rolled)
            shiftv <<= 1
        return acc

    def run_deferred_checks(self):
        """Drain the multiplication-triple queue with an RLC product check
        opened at degree 2t (deferred verification slot; ref :412-431)."""
        if not self.triple_queue:
            return
        queue, self.triple_queue = self.triple_queue, []
        lam = self.ctx.rand_fr(())  # public coin (ref :529-531)
        acc = None
        cur = jnp.asarray(FR.one_mont)
        for (x, y, z) in queue:
            prod = F.mul(FR, x, y)  # degree 2t, local
            diff = F.sub(FR, prod, z)  # degree-2t sharing of 0 if honest
            term = F.mul(FR, diff, cur[(None,) * (diff.ndim - 1)])
            # fold any batch dims down to one element per party
            while term.ndim > 2:
                term = _sum_axis1(term)
            acc = term if acc is None else F.add(FR, acc, term)
            cur = F.mul(FR, cur, lam)
        val, deg_ok = self._open_raw(acc, 2 * self.t)
        self.ctx.push_check("gsz_product_check_degree", deg_ok)
        self.ctx.push_check("gsz_product_check_zero", F.is_zero(FR, val))

    # ---------------- wire-layer helpers ----------------
    def lin_map(self, fn, sh):
        return fn(sh)

    def g_msm(self, fld, query: cv.JacPoint, scalars_sh):
        from ..ops import msm as msm_mod

        if self._stacked():
            n = self.net.n_parties()
            outs = [msm_mod.msm(fld, query, scalars_sh[i]) for i in range(n)]
            return cv.JacPoint(
                jnp.stack([o.x for o in outs]),
                jnp.stack([o.y for o in outs]),
                jnp.stack([o.z for o in outs]),
            )
        return msm_mod.msm(fld, query, scalars_sh)

    def g_from_scalar_mul(self, fld, P_pub: cv.JacPoint, k_sh):
        if self._stacked():
            n = self.net.n_parties()
            outs = [cv.point_scale_const(fld, P_pub, k_sh[i]) for i in range(n)]
            return cv.JacPoint(
                jnp.stack([o.x for o in outs]),
                jnp.stack([o.y for o in outs]),
                jnp.stack([o.z for o in outs]),
            )
        return cv.point_scale_const(fld, P_pub, k_sh)

    # ---------------- group shares ----------------
    def g_zero(self, fld):
        from .additive import AdditiveScheme

        pt = AdditiveScheme._identity_point(fld)
        stack = self.net.stack_public
        return cv.JacPoint(stack(pt.x), stack(pt.y), stack(pt.z))

    def g_from_public(self, fld, P_pub: cv.JacPoint):
        stack = self.net.stack_public
        return cv.JacPoint(stack(P_pub.x), stack(P_pub.y), stack(P_pub.z))

    def _g_interp_at_zero(self, fld, gathered: cv.JacPoint) -> cv.JacPoint:
        """sum lambda_i * P_i over the party axis."""
        n = self.net.n_parties()
        lams = _lagrange_at_zero(n)
        Rint = 1 << (F.LIMB_BITS * FR.L)
        parts = []
        for i in range(n):
            lam_mont = jnp.asarray(
                F.ints_to_limbs([lams[i] * Rint % P], FR.L)[0]
            )
            Pi = cv.JacPoint(gathered.x[i], gathered.y[i], gathered.z[i])
            parts.append(cv.point_scale_const(fld, Pi, lam_mont))
        stacked = cv.JacPoint(
            jnp.stack([p.x for p in parts]),
            jnp.stack([p.y for p in parts]),
            jnp.stack([p.z for p in parts]),
        )
        return _fold_points(fld, stacked)

    def g_reveal(self, fld, sh: cv.JacPoint) -> cv.JacPoint:
        self.run_deferred_checks()
        g = cv.JacPoint(
            self.net.all_gather(sh.x),
            self.net.all_gather(sh.y),
            self.net.all_gather(sh.z),
        )
        return self._g_interp_at_zero(fld, g)

    def g_add(self, fld, a, b):
        return cv.point_add(fld, a, b)

    def g_neg(self, fld, a):
        return cv.point_neg(fld, a)

    def g_shift(self, fld, sh: cv.JacPoint, P_pub: cv.JacPoint):
        """Constant-poly shift: every party adds the public point."""
        stack = self.net.stack_public
        pubs = cv.JacPoint(stack(P_pub.x), stack(P_pub.y), stack(P_pub.z))
        return cv.point_add(fld, sh, pubs)

    def g_scale_shared(self, fld, P_sh: cv.JacPoint, k_sh):
        """shared point x shared scalar: local scale (degree 2t) + king
        group degree-reduction (ref gsz20 group module :819-1374)."""
        n = self.net.n_parties()
        # local k_i * P_i per party
        if self._stacked():
            parts = [
                cv.point_scale_const(
                    fld,
                    cv.JacPoint(P_sh.x[i], P_sh.y[i], P_sh.z[i]),
                    k_sh[i],
                )
                for i in range(n)
            ]
            z2 = cv.JacPoint(
                jnp.stack([p.x for p in parts]),
                jnp.stack([p.y for p in parts]),
                jnp.stack([p.z for p in parts]),
            )
        else:
            z2 = cv.point_scale_const(fld, P_sh, k_sh)
        # king reduction: interpolate value at 0 from all n points (deg 2t)
        g = cv.JacPoint(
            self.net.gather_to_king(z2.x),
            self.net.gather_to_king(z2.y),
            self.net.gather_to_king(z2.z),
        )
        value = self._g_interp_at_zero(fld, g)
        # fresh deg-t sharing with stubbed randomness -> constant sharing
        fresh = self.g_from_public(fld, value)
        return cv.JacPoint(
            self.net.scatter_from_king(fresh.x),
            self.net.scatter_from_king(fresh.y),
            self.net.scatter_from_king(fresh.z),
        )


def _sum_axis1(term):
    """Field-sum over axis 1 of (P, N, L) -> (P, L)."""
    k = term.shape[1]
    while k > 1:
        half = k // 2
        s = F.add(FR, term[:, :half], term[:, half : 2 * half])
        if k % 2:
            s = s.at[:, 0].set(F.add(FR, s[:, 0], term[:, -1]))
        term = s
        k = half
    return term[:, 0]
