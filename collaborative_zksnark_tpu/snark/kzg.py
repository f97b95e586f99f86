"""KZG10 polynomial commitments over (possibly shared) polynomials.

The analog of the reference's poly-commit KZG10 (ref poly-commit/src/kzg10/
mod.rs:141 commit, :268 open, :295 check).  The crucial MPC property
(SURVEY.md §2.2 poly-commit row): commit/open over SHARED polynomials "just
work" because they are MSMs with public bases + local linear algebra — the
witness polynomial for an opening at a public x is computed WITHOUT long
division via

    w_i = x^{-(i+1)} * sum_{j >= i+1} c_j x^j

(a pointwise scale, a suffix sum, a pointwise scale — all share-local).
Verification is host-side pairings.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra import bls12_377 as C
from ..algebra import field as F
from ..algebra import hostfield as H
from ..algebra.field import FR
from ..ops import curve as cv
from ..ops import msm as msm_mod
from ..utils import fs as fsmod

P = C.R_MOD


@dataclasses.dataclass
class KzgSrs:
    powers: cv.JacPoint         # [tau^i]_1, device, (D+1, ...)
    max_degree: int
    # host verification elements
    g1: tuple
    g2: tuple
    beta_g2: tuple              # [tau]_2


def setup(max_degree: int, seed: int = 1) -> KzgSrs:
    rng = np.random.default_rng(seed)
    tau = int.from_bytes(rng.bytes(40), "little") % P
    pows = [1] * (max_degree + 1)
    for i in range(1, max_degree + 1):
        pows[i] = pows[i - 1] * tau % P
    powers = msm_mod.fixed_base_msm(
        cv.FQ_OPS, H.G1, H.G1_GEN, FR.to_device(pows), c=8
    )
    return KzgSrs(
        powers=powers,
        max_degree=max_degree,
        g1=H.G1_GEN,
        g2=H.G2_GEN,
        beta_g2=H.G2.scalar_mul(H.G2_GEN, tau),
    )


def _slice_powers(srs: KzgSrs, n: int) -> cv.JacPoint:
    return cv.JacPoint(srs.powers.x[:n], srs.powers.y[:n], srs.powers.z[:n])


def commit(scheme, srs: KzgSrs, coeffs_sh):
    """Commitment share = MSM(powers, coeffs) — local per party."""
    n = _n_coeffs(scheme, coeffs_sh)
    assert n - 1 <= srs.max_degree, (n, srs.max_degree)
    return scheme.g_msm(cv.FQ_OPS, _slice_powers(srs, n), coeffs_sh)


def commit_and_reveal(scheme, srs: KzgSrs, coeffs_sh):
    """Commit then publicize (ref mpc-plonk lib.rs:396): host affine point."""
    c_sh = commit(scheme, srs, coeffs_sh)
    c = scheme.g_reveal(cv.FQ_OPS, c_sh)
    return cv.g1_to_host(cv.JacPoint(c.x[None], c.y[None], c.z[None]))[0]


def _n_coeffs(scheme, coeffs_sh):
    arr = coeffs_sh.sh if hasattr(coeffs_sh, "sh") else coeffs_sh
    return arr.shape[-2]


def _pow_table_mont(x: int, n: int):
    pows = [1] * n
    for i in range(1, n):
        pows[i] = pows[i - 1] * x % P
    return FR.to_device(pows)


def eval_share(scheme, coeffs_sh, x: int):
    """p(x) for public x: pointwise scale by x^i + fold — share-local."""
    n = _n_coeffs(scheme, coeffs_sh)
    xp = _pow_table_mont(x, n)

    def f(arr):
        return F.fold_sum(FR, F.mul(FR, arr, xp), axis=-2)

    return scheme.lin_map(f, coeffs_sh)


def witness_poly(scheme, coeffs_sh, x: int):
    """(p(X) - p(x)) / (X - x) — share-local (no long division)."""
    assert x % P != 0
    n = _n_coeffs(scheme, coeffs_sh)
    xp = _pow_table_mont(x, n)
    xinv = pow(x, P - 2, P)
    # x^{-(i+1)} for i = 0..n-2
    acc = xinv
    invs = []
    for _ in range(n - 1):
        invs.append(acc)
        acc = acc * xinv % P
    xinv_shift = FR.to_device(invs)

    def f(arr):
        u = F.mul(FR, arr, xp)                       # c_j x^j
        rev = jnp.flip(u, axis=-2)
        suf = jnp.flip(
            jax.lax.associative_scan(
                lambda a, b: F.add(FR, a, b), rev, axis=-2
            ),
            axis=-2,
        )                                            # T_k = sum_{j>=k} c_j x^j
        t_next = suf[..., 1:, :]                     # T_{i+1}
        return F.mul(FR, t_next, xinv_shift)

    return scheme.lin_map(f, coeffs_sh)


def open_share(scheme, srs: KzgSrs, coeffs_sh, x: int):
    """Produce (y, proof) both revealed: y = p(x) (publicized, ref
    lib.rs:343-366 `eval`), proof = [w(tau)]_1."""
    y_sh = eval_share(scheme, coeffs_sh, x)
    y = int(FR.to_host(scheme.reveal(y_sh))[()])
    w_sh = witness_poly(scheme, coeffs_sh, x)
    pf = commit_and_reveal(scheme, srs, w_sh)
    return y, pf


def host_verify(srs: KzgSrs, commitment, x: int, y: int, proof) -> bool:
    """e(C - [y]_1, [1]_2) * e(-W, [tau - x]_2) == 1 — host pairings
    (native C++ when available, shared final exponentiation)."""
    c_minus_y = H.G1.add(commitment, H.G1.neg(H.G1.scalar_mul(H.G1_GEN, y)))
    tau_minus_x = H.G2.add(srs.beta_g2, H.G2.neg(H.G2.scalar_mul(H.G2_GEN, x)))
    prod = H.multi_pairing(
        [(c_minus_y, srs.g2), (H.G1.neg(proof), tau_minus_x)]
    )
    return prod == H.FQ12_ONE
