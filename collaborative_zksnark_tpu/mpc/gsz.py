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
queue is drained by the hadamard_check -> ip_check pipeline (ref :599-787):
the triples fold into one inner product by random linear combination and
`_ip_check` compresses it recursively (halving via interpolated line/
parabola polynomials, blinded base case) until a constant-size relation is
opened and checked at degree 2t.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra import params as C
from ..algebra import field as F
from ..algebra.field import FR
from ..ops import curve as cv
from ..ops import ntt
from .additive import _fold_points
from .context import MpcContext

P = C.R_MOD


@functools.lru_cache(maxsize=None)
def _party_points(n: int) -> list:
    """Shamir evaluation points for the party domain.  Powers of two (and
    3) use roots of unity; ANY other count falls back to the points 1..n —
    all party-domain transforms are explicit Vandermonde matrix products
    (_party_vandermonde), so arbitrary distinct nonzero points work."""
    if n & (n - 1) == 0:
        return ntt.get_radix2_domain(n).elements()
    if n == 3:
        return ntt.get_mixed_domain(n).elements()
    return list(range(1, n + 1))


@functools.lru_cache(maxsize=None)
def _party_vandermonde_int(n: int):
    """(V, V^-1) for the party domain as host Python-int matrices."""
    pts = _party_points(n)
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
    return V, Vinv


@functools.lru_cache(maxsize=None)
def _party_vandermonde(n: int):
    """(V, V^-1) for the party domain as Montgomery device constants.

    Party domains are tiny (n <= ~32), so the share-polynomial transforms
    are explicit matrix products — a handful of batched field ops instead of
    the full NTT machinery (compile-light, works for any n with an n-th
    root of unity)."""
    V, Vinv = _party_vandermonde_int(n)
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
def _gen_point(fld) -> cv.JacPoint:
    """Device generator point for the given coordinate field (scalar shape)."""
    from ..algebra import hostapi as H

    if fld is cv.FQ_OPS:
        p = cv.g1_from_host([H.G1_GEN])
    else:
        p = cv.g2_from_host([H.G2_GEN])
    return cv.JacPoint(p.x[0], p.y[0], p.z[0])


def _g_scale_each(fld, pts: cv.JacPoint, sc):
    """[k_i * P_i] with element-axis-leading points; G2 coords carry an
    extra (2,) axis the flat batch kernel's masks don't broadcast over, so
    it goes through a vmap of the scalar kernel."""
    if pts.x.ndim == sc.ndim:
        return cv.point_scale_batch(fld, pts, sc)
    return jax.vmap(lambda p, k: cv.point_scale_const(fld, p, k))(pts, sc)


def _g_scale_each_nd(fld, pts: cv.JacPoint, sc):
    """k * P with arbitrary leading point-batch axes; sc broadcasts against
    the batch shape (public or per-element scalars, Montgomery form)."""
    tail = 2 if fld is cv.FQ2_OPS else 1
    batch = pts.x.shape[: pts.x.ndim - tail]
    scb = jnp.broadcast_to(sc, batch + (FR.L,)).astype(jnp.uint32)
    flat = lambda a: a.reshape((-1,) + a.shape[len(batch) :])
    out = _g_scale_each(
        fld,
        cv.JacPoint(flat(pts.x), flat(pts.y), flat(pts.z)),
        scb.reshape(-1, FR.L),
    )
    unflat = lambda a: a.reshape(batch + a.shape[1:])
    return cv.JacPoint(unflat(out.x), unflat(out.y), unflat(out.z))


def _g_points_eq(fld, A: cv.JacPoint, B: cv.JacPoint):
    """Jacobian equality: cross-multiplied coordinate comparison
    (x1 z2^2 == x2 z1^2 and y1 z2^3 == y2 z1^3), identity-aware."""
    z2a = fld.sqr(A.z)
    z2b = fld.sqr(B.z)
    x_eq = fld.is_zero(fld.sub(fld.mul(A.x, z2b), fld.mul(B.x, z2a)))
    y_eq = fld.is_zero(
        fld.sub(
            fld.mul(A.y, fld.mul(z2b, B.z)), fld.mul(B.y, fld.mul(z2a, A.z))
        )
    )
    ai = fld.is_zero(A.z)
    bi = fld.is_zero(B.z)
    return jnp.where(ai | bi, ai & bi, x_eq & y_eq)


@functools.lru_cache(maxsize=None)
def _lagrange_at_zero(n: int) -> List[int]:
    """lambda_i with sum lambda_i f(w^i) = f(0) for deg(f) <= n-1."""
    pts = _party_points(n)
    lams = []
    for i in range(n):
        num, den = 1, 1
        for j in range(n):
            if j == i:
                continue
            num = num * pts[j] % P
            den = den * (pts[j] - pts[i]) % P
        lams.append(num * pow(den, P - 2, P) % P)
    return lams


class GszScheme:
    name = "gsz"

    def __init__(self, ctx: MpcContext):
        self.ctx = ctx
        self.net = ctx.net
        n = self.net.n_parties()
        self.t = (n - 1) // 2
        self.triple_queue: List[Tuple] = []
        self.group_triple_queue: List[Tuple] = []
        from . import beaver

        self.field_source = beaver.DummyFieldTripleSource(self)

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
        self.run_group_checks()
        val, ok = self._open_raw(sh, self.t)
        self.ctx.push_check("gsz_degree", ok)
        if self.ctx.debug:
            self.ctx.push_check("check_eq", self.net.check_eq(val))
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
        """Masked prefix-product protocol (ref share/field.rs:163-182, the
        default FieldShare::partial_products the reference's GSZ also uses):
        inverse-pair masking, ONE batched opening, public prefix scan,
        unmask.  O(1) king rounds regardless of N (replaces the round-1
        log-round Hillis-Steele)."""
        npts = self._pub_shape(xs)[0]
        r, s = self.field_source.inv_pair((npts + 1,))
        r_lead = r[..., :npts, :]
        s_next = s[..., 1:, :]
        u = self.mul(xs, r_lead)
        m = self.reveal(self.mul(u, s_next))
        pref = jax.lax.associative_scan(
            lambda a, b: F.mul(FR, a, b), m, axis=0
        )
        return self.scale(r[..., 1:, :], pref)

    # ------------------------------------------------------------------
    # Deferred verification: hadamard -> ip_check -> recursive ip_compress
    # (Goyal-Song; ref gsz20/mod.rs:599-787 Protocols 12-15)
    # ------------------------------------------------------------------

    def _coin(self) -> jnp.ndarray:
        """Public coin: all parties derive the same value
        (ref gsz20/mod.rs:526-531) — drawn from the PubUniformRand stream."""
        return self.ctx.pub_rand_fr(())

    def _elem_axis(self):
        return 1 if self._stacked() else 0

    def _ip_compute(self, xs, ys):
        """<xs, ys> as a share: elementwise king-mult (unqueued) + local
        fold (ref gsz20/mod.rs:790-800 ip_compute)."""
        prods = self.mul(xs, ys, queue_check=False)
        if self._stacked():
            return _sum_axis1(prods)
        return F.fold_sum(FR, prods, axis=0)

    def _flatten_queue(self, queue):
        """Concat every queued (x, y, z) triple into flat element vectors
        along the share element axis."""
        ax = self._elem_axis()

        def flat(a):
            if self._stacked():
                return a.reshape((a.shape[0], -1, FR.L))
            return a.reshape((-1, FR.L))

        xs = jnp.concatenate([flat(x) for (x, _, _) in queue], axis=ax)
        ys = jnp.concatenate([flat(y) for (_, y, _) in queue], axis=ax)
        zs = jnp.concatenate([flat(z) for (_, _, z) in queue], axis=ax)
        return xs, ys, zs

    def _take(self, arr, lo, hi):
        if self._stacked():
            return arr[:, lo:hi]
        return arr[lo:hi]

    def _ip_check(self, xs, ys, ip):
        """Recursively compress <xs, ys> ?= ip to a single blinded product
        check (ref gsz20/mod.rs:738-787 Protocols 14+15).  The halving loop
        has a FIXED trip count given the (static) queue length."""
        n = xs.shape[self._elem_axis()]
        while n > 1:
            if n % 2 == 1:
                pad = [(0, 0)] * xs.ndim
                pad[self._elem_axis()] = (0, 1)
                xs = jnp.pad(xs, pad)
                ys = jnp.pad(ys, pad)
                n += 1
            h = n // 2
            xl, xr = self._take(xs, 0, h), self._take(xs, h, n)
            yl, yr = self._take(ys, 0, h), self._take(ys, h, n)
            ip_l = self._ip_compute(xl, yl)
            ip_r = F.sub(FR, ip, ip_l)
            # lines through (1, l) and (2, r): m = r - l; value at 3 = r + m
            xm = F.sub(FR, xr, xl)
            ym = F.sub(FR, yr, yl)
            x3 = F.add(FR, xr, xm)
            y3 = F.add(FR, yr, ym)
            ip3 = self._ip_compute(x3, y3)
            lam = self._coin()
            # evaluate lines at lam: l + (lam - 1) * m
            one = jnp.asarray(FR.one_mont)
            lam_m1 = F.sub(FR, lam, one)
            xs = F.add(FR, xl, F.mul(FR, xm, lam_m1[(None,) * (xm.ndim - 1)]))
            ys = F.add(FR, yl, F.mul(FR, ym, lam_m1[(None,) * (ym.ndim - 1)]))
            # parabola through (1, ip_l), (2, ip_r), (3, ip3) at lam
            # (ref gsz20/mod.rs:716-733 lagrange basis on 1,2,3)
            ip = self._parabola_at(ip_l, ip_r, ip3, lam)
            n = h
        # blinded 1-element base case (ref :775-786)
        xr_sh = self.king_share(self.ctx.rand_fr(()))
        yr_sh = self.king_share(self.ctx.rand_fr(()))
        x1 = self._squeeze_elem(xs)
        y1 = self._squeeze_elem(ys)
        ip_r = self.mul(xr_sh, yr_sh, queue_check=False)
        x_blind = self.mul(x1, xr_sh, queue_check=False)
        y_blind = self.mul(y1, yr_sh, queue_check=False)
        ip_blind = self.mul(ip, ip_r, queue_check=False)
        xv, okx = self._open_raw(x_blind, self.t)
        yv, oky = self._open_raw(y_blind, self.t)
        zv, okz = self._open_raw(ip_blind, self.t)
        self.ctx.push_check("gsz_ip_degree", okx & oky & okz)
        self.ctx.push_check(
            "gsz_ip_product", F.eq(FR, F.mul(FR, xv, yv), zv)
        )

    def _squeeze_elem(self, arr):
        if self._stacked():
            return arr[:, 0]
        return arr[0]

    def _parabola_at(self, ip1, ip2, ip3, lam):
        """Lagrange basis on {1,2,3} evaluated at lam (public), applied to
        the three ip shares (local linear combination)."""
        one = jnp.asarray(FR.one_mont)
        two = F.add(FR, one, one)
        three = F.add(FR, two, one)
        l1 = F.sub(FR, lam, one)
        l2 = F.sub(FR, lam, two)
        l3 = F.sub(FR, lam, three)
        inv2 = jnp.asarray(
            F.ints_to_limbs(
                [pow(2, P - 2, P) * ((1 << (F.LIMB_BITS * FR.L)) % P) % P], FR.L
            )[0]
        )
        f1 = F.mul(FR, F.mul(FR, l2, l3), inv2)
        f2 = F.neg(FR, F.mul(FR, l1, l3))
        f3 = F.mul(FR, F.mul(FR, l1, l2), inv2)
        bc = lambda c, a: F.mul(FR, a, c[(None,) * (a.ndim - 1)])
        return F.add(
            FR, F.add(FR, bc(f1, ip1), bc(f2, ip2)), bc(f3, ip3)
        )

    def run_deferred_checks(self):
        """Drain the multiplication-triple queue: RLC the hadamard triples
        into one inner-product claim, then run the recursive ip check
        (ref gsz20/mod.rs:412-431 + 599-614 hadamard_check)."""
        if not self.triple_queue:
            return
        queue, self.triple_queue = self.triple_queue, []
        xs, ys, zs = self._flatten_queue(queue)
        r = self._coin()
        m = xs.shape[self._elem_axis()]
        # powers r^0 .. r^(m-1) via an inclusive scan over broadcast r
        rb = jnp.broadcast_to(r, (m,) + r.shape).astype(jnp.uint32)
        one = jnp.broadcast_to(jnp.asarray(FR.one_mont), r.shape).astype(jnp.uint32)
        rb = rb.at[0].set(one)
        rpow = jax.lax.associative_scan(lambda a, b: F.mul(FR, a, b), rb, axis=0)
        xs = self.scale(xs, rpow)
        rzs = self.scale(zs, rpow)
        ip = (
            _sum_axis1(rzs) if self._stacked() else F.fold_sum(FR, rzs, axis=0)
        )
        self._ip_check(xs, ys, ip)

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

    def _g_poly_coeffs(self, fld, gathered: cv.JacPoint) -> cv.JacPoint:
        """Interpolate the share polynomial's GROUP coefficients:
        C_j = sum_i Vinv[j, i] * P_i (the group analog of the opening iFFT,
        ref gsz20/mod.rs:1049-1080 open_degree_vec)."""
        n = self.net.n_parties()
        _, Vinv_int = _party_vandermonde_int(n)
        Rint = 1 << (F.LIMB_BITS * FR.L)
        rows = []
        for j in range(n):
            parts = []
            for i in range(n):
                lam = jnp.asarray(
                    F.ints_to_limbs([Vinv_int[j][i] * Rint % P], FR.L)[0]
                )
                Pi = cv.JacPoint(gathered.x[i], gathered.y[i], gathered.z[i])
                parts.append(cv.point_scale_const(fld, Pi, lam))
            stacked = cv.JacPoint(
                jnp.stack([p.x for p in parts]),
                jnp.stack([p.y for p in parts]),
                jnp.stack([p.z for p in parts]),
            )
            rows.append(_fold_points(fld, stacked))
        return cv.JacPoint(
            jnp.stack([r.x for r in rows]),
            jnp.stack([r.y for r in rows]),
            jnp.stack([r.z for r in rows]),
        )

    def _g_open_raw(self, fld, gathered: cv.JacPoint, degree: int):
        """(value, degree_ok): value = C_0, tail coefficients past `degree`
        must be the identity (ref open_degree_vec assert, :1071-1079)."""
        n = self.net.n_parties()
        if degree + 1 >= n:
            return self._g_interp_at_zero(fld, gathered), jnp.asarray(True)
        coeffs = self._g_poly_coeffs(fld, gathered)
        value = cv.JacPoint(coeffs.x[0], coeffs.y[0], coeffs.z[0])
        tail_z = coeffs.z[degree + 1 :]
        from ..algebra.field import FQ

        ok = jnp.all(F.is_zero(FQ, tail_z))
        return value, ok

    def _g_share_poly(self, fld, value: cv.JacPoint, degree: int) -> cv.JacPoint:
        """Deal a fresh degree-`degree` randomized GROUP sharing of a scalar
        point (king-side math): blinding polynomial s(X) with s(0) = 0 in
        the scalar field, share_i = value + s(pt_i) * G.  (The reference
        leaves this unrandomized — 'TODO: randomize', gsz20/mod.rs:1100 —
        dealing vec![output; n]; this is the completed version.)"""
        n = self.net.n_parties()
        coeffs = jnp.concatenate(
            [
                jnp.zeros((1, FR.L), jnp.uint32),
                self.ctx.rand_fr((degree,)),
                jnp.zeros((n - 1 - degree, FR.L), jnp.uint32),
            ],
            axis=0,
        )
        V, _ = _party_vandermonde(n)
        s = _party_matmul(V, coeffs)  # (n, L) blinding scalars, s(0) = 0
        G = _gen_point(fld)
        Gb = cv.JacPoint(
            jnp.broadcast_to(G.x, (n,) + G.x.shape).astype(jnp.uint32),
            jnp.broadcast_to(G.y, (n,) + G.y.shape).astype(jnp.uint32),
            jnp.broadcast_to(G.z, (n,) + G.z.shape).astype(jnp.uint32),
        )
        sG = _g_scale_each(fld, Gb, s)
        vb = cv.JacPoint(
            jnp.broadcast_to(value.x, (n,) + value.x.shape).astype(jnp.uint32),
            jnp.broadcast_to(value.y, (n,) + value.y.shape).astype(jnp.uint32),
            jnp.broadcast_to(value.z, (n,) + value.z.shape).astype(jnp.uint32),
        )
        return cv.point_add(fld, vb, sG)

    def g_reveal(self, fld, sh: cv.JacPoint) -> cv.JacPoint:
        self.run_deferred_checks()
        self.run_group_checks()
        g = cv.JacPoint(
            self.net.all_gather(sh.x),
            self.net.all_gather(sh.y),
            self.net.all_gather(sh.z),
        )
        value, ok = self._g_open_raw(fld, g, self.t)
        self.ctx.push_check("gsz_g_degree", ok)
        return value

    def g_add(self, fld, a, b):
        return cv.point_add(fld, a, b)

    def g_neg(self, fld, a):
        return cv.point_neg(fld, a)

    def g_shift(self, fld, sh: cv.JacPoint, P_pub: cv.JacPoint):
        """Constant-poly shift: every party adds the public point."""
        stack = self.net.stack_public
        pubs = cv.JacPoint(stack(P_pub.x), stack(P_pub.y), stack(P_pub.z))
        return cv.point_add(fld, sh, pubs)

    def g_scale_shared(self, fld, P_sh: cv.JacPoint, k_sh, queue_check=True):
        """shared point x shared scalar: local scale (degree 2t) + king
        group degree-reduction; the (k, P, z) triple is QUEUED for the
        deferred group product check drained before any group open
        (ref gsz20 group mult :1112-1135 + GszGroupTriple queueing)."""
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
        z = self._g_degree_reduce(fld, z2)
        if queue_check:
            self.group_triple_queue.append((fld, k_sh, P_sh, z))
        return z

    def _g_degree_reduce(self, fld, z2: cv.JacPoint) -> cv.JacPoint:
        """King group degree-reduction: interpolate the degree-2t value at
        0, deal a fresh RANDOMIZED degree-t sharing (ref king_compute
        :1090-1110, with the randomization TODO completed)."""
        g = cv.JacPoint(
            self.net.gather_to_king(z2.x),
            self.net.gather_to_king(z2.y),
            self.net.gather_to_king(z2.z),
        )
        value = self._g_interp_at_zero(fld, g)
        fresh = self._g_share_poly(fld, value, self.t)
        return cv.JacPoint(
            self.net.scatter_from_king(fresh.x),
            self.net.scatter_from_king(fresh.y),
            self.net.scatter_from_king(fresh.z),
        )

    # ------------------------------------------------------------------
    # Deferred GROUP product verification (ref gsz20/mod.rs:1136-1374:
    # GszGroupTriple queue -> hadamard_check -> group ip_check with field
    # lines on xs, group lines on ys, recursive compression, blinded base)
    # ------------------------------------------------------------------

    def _g_stack_elems(self, pts_list):
        ax = self._elem_axis()
        return cv.JacPoint(
            jnp.stack([p.x for p in pts_list], axis=ax),
            jnp.stack([p.y for p in pts_list], axis=ax),
            jnp.stack([p.z for p in pts_list], axis=ax),
        )

    def _g_take(self, pts: cv.JacPoint, lo, hi):
        ax = self._elem_axis()
        sl = (slice(None),) * ax + (slice(lo, hi),)
        return cv.JacPoint(pts.x[sl], pts.y[sl], pts.z[sl])

    def _g_elem(self, pts: cv.JacPoint, i):
        ax = self._elem_axis()
        sl = (slice(None),) * ax + (i,)
        return cv.JacPoint(pts.x[sl], pts.y[sl], pts.z[sl])

    def _g_ip_compute(self, fld, xs, ys: cv.JacPoint) -> cv.JacPoint:
        """<xs, ys> = sum_i x_i * Y_i as a group share: local per-party
        scale+fold (degree 2t) + king reduction, unqueued
        (ref group ip_compute :1137-1160)."""
        if self._stacked():
            n = self.net.n_parties()
            parts = []
            for p in range(n):
                sc = _g_scale_each(
                    fld, cv.JacPoint(ys.x[p], ys.y[p], ys.z[p]), xs[p]
                )
                parts.append(_fold_points(fld, sc))
            z2 = cv.JacPoint(
                jnp.stack([p.x for p in parts]),
                jnp.stack([p.y for p in parts]),
                jnp.stack([p.z for p in parts]),
            )
        else:
            sc = _g_scale_each(fld, ys, xs)
            z2 = _fold_points(fld, sc)
        return self._g_degree_reduce(fld, z2)

    def _g_ip_check(self, fld, xs, ys: cv.JacPoint, ip: cv.JacPoint):
        """Group ip check: recursive halving (field lines on xs, group
        lines on ys, parabola on ip via public-coin Lagrange), blinded
        single-element base case (ref :1280-1333)."""
        ax = self._elem_axis()
        n = xs.shape[ax]
        while n > 1:
            if n % 2 == 1:
                pad = [(0, 0)] * xs.ndim
                pad[ax] = (0, 1)
                xs = jnp.pad(xs, pad)
                padp = [(0, 0)] * ys.x.ndim
                padp[ax] = (0, 1)
                # identity point pad: x=y=z=0 is the identity encoding
                ys = cv.JacPoint(
                    jnp.pad(ys.x, padp), jnp.pad(ys.y, padp), jnp.pad(ys.z, padp)
                )
                n += 1
            h = n // 2
            xl, xr = self._take(xs, 0, h), self._take(xs, h, n)
            yl, yr = self._g_take(ys, 0, h), self._g_take(ys, h, n)
            ip_l = self._g_ip_compute(fld, xl, yl)
            ip_r = cv.point_add(fld, ip, cv.point_neg(fld, ip_l))
            xm = F.sub(FR, xr, xl)
            ym = cv.point_add(fld, yr, cv.point_neg(fld, yl))
            x3 = F.add(FR, xr, xm)
            y3 = cv.point_add(fld, yr, ym)
            ip3 = self._g_ip_compute(fld, x3, y3)
            lam = self._coin()
            one = jnp.asarray(FR.one_mont)
            lam_m1 = F.sub(FR, lam, one)
            xs = F.add(FR, xl, F.mul(FR, xm, lam_m1[(None,) * (xm.ndim - 1)]))
            ys = cv.point_add(
                fld, yl, _g_scale_each_nd(fld, ym, lam_m1)
            )
            ip = self._g_parabola_at(fld, ip_l, ip_r, ip3, lam)
            n = h
        # blinded base case: open x * xr, yr * Y, (xr * yr) * IP
        xr_sh = self.king_share(self.ctx.rand_fr(()))
        yr_sh = self.king_share(self.ctx.rand_fr(()))
        x1 = self._squeeze_elem(xs)
        y1 = self._g_elem(ys, 0)
        ip_r = self.mul(xr_sh, yr_sh, queue_check=False)
        x_blind = self.mul(x1, xr_sh, queue_check=False)
        y_blind = self.g_scale_shared(fld, y1, yr_sh, queue_check=False)
        ip_blind = self.g_scale_shared(fld, ip, ip_r, queue_check=False)
        xv, okx = self._open_raw(x_blind, self.t)
        g = lambda sh: cv.JacPoint(
            self.net.all_gather(sh.x),
            self.net.all_gather(sh.y),
            self.net.all_gather(sh.z),
        )
        yv, oky = self._g_open_raw(fld, g(y_blind), self.t)
        zv, okz = self._g_open_raw(fld, g(ip_blind), self.t)
        self.ctx.push_check("gsz_g_ip_degree", okx & oky & okz)
        want = cv.point_scale_const(fld, yv, xv)
        self.ctx.push_check("gsz_g_ip_product", _g_points_eq(fld, want, zv))

    def _g_parabola_at(self, fld, ip1, ip2, ip3, lam):
        """Lagrange basis on {1,2,3} at public lam, applied to group shares."""
        one = jnp.asarray(FR.one_mont)
        two = F.add(FR, one, one)
        three = F.add(FR, two, one)
        l1 = F.sub(FR, lam, one)
        l2 = F.sub(FR, lam, two)
        l3 = F.sub(FR, lam, three)
        inv2 = jnp.asarray(
            F.ints_to_limbs(
                [pow(2, P - 2, P) * ((1 << (F.LIMB_BITS * FR.L)) % P) % P], FR.L
            )[0]
        )
        f1 = F.mul(FR, F.mul(FR, l2, l3), inv2)
        f2 = F.neg(FR, F.mul(FR, l1, l3))
        f3 = F.mul(FR, F.mul(FR, l1, l2), inv2)
        t1 = _g_scale_each_nd(fld, ip1, f1)
        t2 = _g_scale_each_nd(fld, ip2, f2)
        t3 = _g_scale_each_nd(fld, ip3, f3)
        return cv.point_add(fld, cv.point_add(fld, t1, t2), t3)

    def run_group_checks(self):
        """Drain the group triple queue per coordinate field: RLC the
        triples into one inner-product claim, recursive group ip check
        (ref check_accumulated_group_products :1352-1374)."""
        if not self.group_triple_queue:
            return
        queue, self.group_triple_queue = self.group_triple_queue, []
        by_fld = {}
        for (fld, k, Ppt, z) in queue:
            by_fld.setdefault(fld, []).append((k, Ppt, z))
        ax = self._elem_axis()
        for fld, triples in by_fld.items():
            xs = jnp.stack([k for (k, _, _) in triples], axis=ax)
            ys = self._g_stack_elems([p for (_, p, _) in triples])
            zs = self._g_stack_elems([z for (_, _, z) in triples])
            r = self._coin()
            m = len(triples)
            rb = jnp.broadcast_to(r, (m,) + r.shape).astype(jnp.uint32)
            one = jnp.broadcast_to(
                jnp.asarray(FR.one_mont), r.shape
            ).astype(jnp.uint32)
            rb = rb.at[0].set(one)
            rpow = jax.lax.associative_scan(
                lambda a, b: F.mul(FR, a, b), rb, axis=0
            )
            xs = self.scale(xs, rpow)
            rzs = _g_scale_each_nd(fld, zs, rpow)
            # sum the scaled z's over the element axis
            def fold_ax(pts):
                if ax == 1:
                    n_par = pts.x.shape[0]
                    parts = [
                        _fold_points(fld, cv.JacPoint(pts.x[p], pts.y[p], pts.z[p]))
                        for p in range(n_par)
                    ]
                    return cv.JacPoint(
                        jnp.stack([q.x for q in parts]),
                        jnp.stack([q.y for q in parts]),
                        jnp.stack([q.z for q in parts]),
                    )
                return _fold_points(fld, pts)

            ip = fold_ax(rzs)
            self._g_ip_check(fld, xs, ys, ip)


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
