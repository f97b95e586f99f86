"""Share-polynomial operations (the poly layer of the wire API).

This is the module `mpc/wire.py` routes polynomial hooks to — the analog of
the reference's MPC-aware ark-poly call sites (SURVEY.md §1 trick 2):

  * linear ops (add, scale, mul/divide by the vanishing polynomial, shifts
    by X^k) act coefficient-wise on shares with zero communication;
  * `mul` (share x share polynomial product) evaluates both factors on a
    large-enough radix-2 domain and runs ONE batched scheme multiplication
    (ref: algebra/poly/src/domain/mod.rs:227-231 mul_polynomials_in_
    evaluation_domain -> F::batch_product_in_place);
  * `divide_by_vanishing` mirrors DensePolynomial::divide_by_vanishing_poly
    — division by X^m - 1 is LINEAR in the coefficients, so it is local on
    shares (used by Marlin's q_1 / h_2 splits and the w-poly, ref
    marlin/src/ahp/prover.rs:356,547,705);
  * `univariate_div_qr` by a public divisor (ref share/field.rs:184-193,
    spdz.rs:210-240): synthetic division by a public polynomial is linear
    over the dividend's shares.

Coefficient arrays are (..., N, L) device limb vectors (shares carry their
scheme container, e.g. SpdzShare); public constants are Python ints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..algebra import params as C
from ..algebra import field as F
from ..algebra.field import FR
from ..ops import ntt

P = C.R_MOD


def n_coeffs(coeffs_sh) -> int:
    arr = coeffs_sh.sh if hasattr(coeffs_sh, "sh") else coeffs_sh
    return arr.shape[-2]


def pad_to(scheme, coeffs_sh, n: int):
    """Zero-pad the coefficient axis to length n (zero shares are zeros in
    every linear scheme representation)."""

    def f(arr):
        m = arr.shape[-2]
        if m >= n:
            return arr
        pad = [(0, 0)] * arr.ndim
        pad[-2] = (0, n - m)
        return jnp.pad(arr, pad)

    return scheme.lin_map(f, coeffs_sh)


def add(scheme, a_sh, b_sh):
    n = max(n_coeffs(a_sh), n_coeffs(b_sh))
    return scheme.add(pad_to(scheme, a_sh, n), pad_to(scheme, b_sh, n))


def scale_const(scheme, coeffs_sh, k: int):
    kd = FR.to_device([k % P])[0]
    return scheme.scale(coeffs_sh, kd[None])


def shift_up(scheme, coeffs_sh, k: int):
    """p(X) -> X^k * p(X): prepend k zero coefficients."""

    def f(arr):
        pad = [(0, 0)] * arr.ndim
        pad[-2] = (k, 0)
        return jnp.pad(arr, pad)

    return scheme.lin_map(f, coeffs_sh)


def mul_by_vanishing(scheme, coeffs_sh, m: int):
    """p(X) * (X^m - 1): shift-up minus original (linear, local).
    Mirrors DensePolynomial::mul_by_vanishing_poly."""
    n = n_coeffs(coeffs_sh)
    up = shift_up(scheme, coeffs_sh, m)
    return scheme.sub(up, pad_to(scheme, coeffs_sh, n + m))


def divide_by_vanishing(scheme, coeffs_sh, m: int):
    """(quotient, remainder) of p / (X^m - 1) — linear on shares.

    q_i = sum_{j>=1} c_{i + j*m} (a strided suffix sum); r_i = c_i + q_i for
    i < m.  Mirrors divide_by_vanishing_poly (used on shares throughout the
    Marlin prover, ref ahp/prover.rs:547,705)."""
    n = n_coeffs(coeffs_sh)
    if n <= m:
        zero_rem = pad_to(scheme, coeffs_sh, m)

        def zf(arr):
            sh = list(arr.shape)
            sh[-2] = 1
            return jnp.zeros(sh, arr.dtype)

        return scheme.lin_map(zf, coeffs_sh), zero_rem
    blocks = -(-n // m)  # ceil: pad to blocks*m

    def quot(arr):
        pad = [(0, 0)] * arr.ndim
        pad[-2] = (0, blocks * m - arr.shape[-2])
        ap = jnp.pad(arr, pad)
        shape = ap.shape[:-2] + (blocks, m, ap.shape[-1])
        ab = ap.reshape(shape)
        # reversed inclusive cumulative field-sum over the block axis,
        # excluding block 0: q block b = sum_{j>b} c block j
        rev = jnp.flip(ab, axis=-3)
        csum = jax.lax.associative_scan(
            lambda x, y: F.add(FR, x, y), rev, axis=-3
        )
        suf = jnp.flip(csum, axis=-3)  # suf[b] = sum_{j>=b}
        q = suf[..., 1:, :, :]  # q block b = sum_{j >= b+1}
        qf = q.reshape(ap.shape[:-2] + ((blocks - 1) * m, ap.shape[-1]))
        return qf[..., : n - m, :]

    q_sh = scheme.lin_map(quot, coeffs_sh)
    # r_i = c_i + q_i for i < m
    q_low = low_map(scheme, pad_to(scheme, q_sh, m), m)
    rem = scheme.add(low_map(scheme, coeffs_sh, m), q_low)
    return q_sh, rem


def low_map(scheme, coeffs_sh, m: int):
    return scheme.lin_map(lambda arr: arr[..., :m, :], coeffs_sh)


def mul(scheme, a_sh, b_sh):
    """Polynomial product of two SHARED polynomials: evaluate on a radix-2
    domain of size >= deg(a)+deg(b)+1, ONE batched scheme.mul, interpolate
    (ref domain/mod.rs:227-231)."""
    na, nb = n_coeffs(a_sh), n_coeffs(b_sh)
    out_len = na + nb - 1
    dom = ntt.get_radix2_domain(out_len)
    fft = lambda arr: _vmap_tf(dom.fft, arr)
    ifft = lambda arr: _vmap_tf(dom.ifft, arr)
    a_ev = scheme.lin_map(fft, pad_to(scheme, a_sh, dom.n))
    b_ev = scheme.lin_map(fft, pad_to(scheme, b_sh, dom.n))
    prod = scheme.mul(a_ev, b_ev)  # [NETWORK: 1 batched round]
    out = scheme.lin_map(ifft, prod)
    return low_map(scheme, out, out_len)


def mul_public(scheme, a_sh, pub_coeffs):
    """Share-poly times PUBLIC poly: evaluation-domain pointwise scale —
    entirely local."""
    na = n_coeffs(a_sh)
    nb = pub_coeffs.shape[-2]
    out_len = na + nb - 1
    dom = ntt.get_radix2_domain(out_len)
    pubpad = jnp.pad(pub_coeffs, [(0, dom.n - nb), (0, 0)])
    pub_ev = dom.fft(pubpad)
    a_ev = scheme.lin_map(lambda arr: _vmap_tf(dom.fft, arr), pad_to(scheme, a_sh, dom.n))
    prod = scheme.scale(a_ev, pub_ev)
    out = scheme.lin_map(lambda arr: _vmap_tf(dom.ifft, arr), prod)
    return low_map(scheme, out, out_len)


def univariate_div_qr(scheme, a_sh, divisor_ints):
    """(q, r) of a shared dividend by a PUBLIC monic-or-not divisor.

    Expressed as a linear map on the dividend: synthetic division matrix
    applied coefficient-wise (host-built public matrix, device matmul-free:
    iterated shift-subtract with public scalars).  Mirrors the share-layer
    univariate_div_qr hook (ref share/field.rs:184-193)."""
    d = [x % P for x in divisor_ints]
    while len(d) > 1 and d[-1] == 0:
        d.pop()
    assert d and any(d), "zero divisor"
    m = len(d) - 1
    n = n_coeffs(a_sh)
    if n <= m:
        zero_q = scheme.lin_map(
            lambda arr: jnp.zeros(arr.shape[:-2] + (1, arr.shape[-1]), arr.dtype),
            a_sh,
        )
        return zero_q, a_sh
    lead_inv = pow(d[-1], P - 2, P)
    if m == 0:
        # constant divisor: q = a / d0, r = 0
        q_sh = scale_const(scheme, a_sh, lead_inv)
        r_sh = scheme.lin_map(
            lambda arr: jnp.zeros(arr.shape[:-2] + (1, arr.shape[-1]), arr.dtype),
            a_sh,
        )
        return q_sh, r_sh
    # Reversal method (replaces the round-2 O(n^2) synthetic-division
    # matrices): with rev(p)(X) = X^deg(p) p(1/X),
    #   rev_n-1(a) = rev_m(d) * rev_qlen-1(q) + X^qlen * rev(r-part)
    # so rev(q) = rev(a) * rev(d)^{-1} mod X^qlen where rev(d)^{-1} is the
    # PUBLIC power-series inverse (host ints, O(qlen * min(m, qlen))), and
    # the share-side work is two local public-poly products (NTT-based).
    qlen = n - m
    drev = d[::-1]
    e = [0] * qlen
    e[0] = lead_inv
    for k in range(1, qlen):
        acc = 0
        for j in range(1, min(k, m) + 1):
            acc = (acc + drev[j] * e[k - j]) % P
        e[k] = (P - lead_inv * acc % P) % P
    a_rev = scheme.lin_map(
        lambda arr: jnp.flip(arr, axis=-2)[..., :qlen, :], a_sh
    )
    prod = mul_public(scheme, a_rev, FR.to_device(e).reshape(qlen, FR.L))
    q_rev = low_map(scheme, pad_to(scheme, prod, qlen), qlen)
    q_sh = scheme.lin_map(lambda arr: jnp.flip(arr, axis=-2), q_rev)
    qd = mul_public(scheme, q_sh, FR.to_device(d).reshape(m + 1, FR.L))
    r_sh = scheme.sub(
        low_map(scheme, a_sh, m), low_map(scheme, pad_to(scheme, qd, m), m)
    )
    return q_sh, r_sh


def eval_at(scheme, coeffs_sh, x: int):
    """p(x) for public x — share-local (scale by power table + fold)."""
    n = n_coeffs(coeffs_sh)
    pows = [1] * n
    for i in range(1, n):
        pows[i] = pows[i - 1] * x % P
    xp = FR.to_device(pows)

    def f(arr):
        return F.fold_sum(FR, F.mul(FR, arr, xp), axis=-2)

    return scheme.lin_map(f, coeffs_sh)


def _vmap_tf(tf, arr):
    if arr.ndim == 3:
        return jax.vmap(tf)(arr)
    return tf(arr)
