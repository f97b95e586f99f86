"""KZG10 / MarlinKZG10 polynomial commitments over (possibly shared) polys.

The analog of the reference's poly-commit KZG10
(ref poly-commit/src/kzg10/mod.rs:141 commit incl. hiding_bound, :200
compute_witness_polynomial, :225 open_with_witness_polynomial, :268 open,
:295 check, :318 batch_check) plus the MarlinKZG10 layer
(ref poly-commit/src/marlin/marlin_pc/mod.rs:172 commit w/ degree-bound
shifted commitments, :245 open_individual_opening_challenges, and the
accumulation rule poly-commit/src/marlin/mod.rs:91-133).

MPC properties (SURVEY.md §2.2 poly-commit row): commit/open over SHARED
polynomials are MSMs with public bases + local linear algebra, so they
produce G1 *shares* that are then publicized.  Hiding blinding polynomials
are sampled as shared randomness (king-dealt here, mirroring the reference's
stubbed preprocessing stance).

The witness polynomial for an opening at public x != 0 is computed WITHOUT
long division via  w_i = x^{-(i+1)} * sum_{j >= i+1} c_j x^j  (pointwise
scale, suffix sum, pointwise scale — all share-local).

Verification is host-side pairings (native C++ when available).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra import params as C
from ..algebra import field as F
from ..algebra import hostapi as H
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
    # hiding support (ref kzg10/mod.rs:39-108 setup: powers_of_gamma_g)
    gamma_powers: Optional[cv.JacPoint] = None   # [gamma tau^i]_1, (D+2, ...)
    gamma_g1: Optional[tuple] = None             # [gamma]_1 (host)
    # host cache of tau-power points for degree-bound shift checks
    _shift_host: dict = dataclasses.field(default_factory=dict)

    def shift_power_host(self, degree_bound: int) -> tuple:
        """[tau^(D - d)]_1 as a host affine point (verifier side of the
        degree-bound check, ref marlin/mod.rs:123-128 get_shift_power)."""
        k = self.max_degree - degree_bound
        if k not in self._shift_host:
            pt = cv.JacPoint(
                self.powers.x[k : k + 1],
                self.powers.y[k : k + 1],
                self.powers.z[k : k + 1],
            )
            self._shift_host[k] = cv.g1_to_host(pt)[0]
        return self._shift_host[k]


def setup(max_degree: int, seed: int = 1, hiding: bool = True) -> KzgSrs:
    rng = np.random.default_rng(seed)
    tau = int.from_bytes(rng.bytes(40), "little") % P
    gamma = int.from_bytes(rng.bytes(40), "little") % P
    pows = [1] * (max_degree + 2)
    for i in range(1, max_degree + 2):
        pows[i] = pows[i - 1] * tau % P
    powers = msm_mod.fixed_base_msm_ints(
        cv.FQ_OPS, H.G1, H.G1_GEN, pows[: max_degree + 1], c=8
    )
    gamma_powers = None
    gamma_g1 = None
    if hiding:
        gpows = [gamma * t % P for t in pows]
        gamma_powers = msm_mod.fixed_base_msm_ints(
            cv.FQ_OPS, H.G1, H.G1_GEN, gpows, c=8
        )
        gamma_g1 = H.G1.scalar_mul(H.G1_GEN, gamma)
    return KzgSrs(
        powers=powers,
        max_degree=max_degree,
        g1=H.G1_GEN,
        g2=H.G2_GEN,
        beta_g2=H.G2.scalar_mul(H.G2_GEN, tau),
        gamma_powers=gamma_powers,
        gamma_g1=gamma_g1,
    )


def _slice_powers(pts: cv.JacPoint, lo: int, n: int) -> cv.JacPoint:
    return cv.JacPoint(
        pts.x[lo : lo + n], pts.y[lo : lo + n], pts.z[lo : lo + n]
    )


def _n_coeffs(scheme, coeffs_sh):
    arr = coeffs_sh.sh if hasattr(coeffs_sh, "sh") else coeffs_sh
    return arr.shape[-2]


# ---------------------------------------------------------------------------
# Plain commitments (Groth16/Plonk compatibility surface)
# ---------------------------------------------------------------------------

def commit(scheme, srs: KzgSrs, coeffs_sh, shift: int = 0):
    """Commitment share = MSM(powers[shift:], coeffs) — local per party."""
    n = _n_coeffs(scheme, coeffs_sh)
    assert shift + n - 1 <= srs.max_degree, (shift, n, srs.max_degree)
    return scheme.g_msm(cv.FQ_OPS, _slice_powers(srs.powers, shift, n), coeffs_sh)


def commit_and_reveal(scheme, srs: KzgSrs, coeffs_sh, shift: int = 0):
    """Commit then publicize (ref mpc-plonk lib.rs:396): host affine point."""
    c_sh = commit(scheme, srs, coeffs_sh, shift=shift)
    c = scheme.g_reveal(cv.FQ_OPS, c_sh)
    return cv.g1_to_host(cv.JacPoint(c.x[None], c.y[None], c.z[None]))[0]


# ---------------------------------------------------------------------------
# Labeled (Marlin-style) commitments: hiding + degree bounds
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Commitment:
    """Publicized commitment (host affine points).
    shifted_comm mirrors marlin_pc::Commitment (ref marlin_pc/mod.rs:219-230)."""

    comm: tuple
    shifted_comm: Optional[tuple] = None
    degree_bound: Optional[int] = None


@dataclasses.dataclass
class Randomness:
    """Hiding blinding polynomials (SHARES), kept by the prover
    (ref kzg10 Randomness / marlin_pc Randomness{rand, shifted_rand})."""

    blind: object = None          # share coeffs (hb+2, L) or None
    shifted_blind: object = None


def _rand_poly_share(scheme, degree: int):
    """A jointly-random degree-`degree` blinding polynomial as shares
    (king-dealt; a deployment uses preprocessed randomness — same stance as
    the reference's stubbed rand, ref gsz20/mod.rs:383-410)."""
    return scheme.king_share(scheme.ctx.rand_fr((degree + 1,)))


def commit_labeled(
    scheme,
    srs: KzgSrs,
    coeffs_sh,
    hiding_bound: Optional[int] = None,
    degree_bound: Optional[int] = None,
):
    """(Commitment, Randomness) — the MarlinKZG10 commit
    (ref marlin_pc/mod.rs:172-244; kzg10/mod.rs:141-193 for each half).
    The commitment is publicized (as every SNARK caller does)."""
    n = _n_coeffs(scheme, coeffs_sh)
    rand = Randomness()
    c_sh = commit(scheme, srs, coeffs_sh)
    if hiding_bound is not None:
        assert srs.gamma_powers is not None, "SRS lacks hiding powers"
        rand.blind = _rand_poly_share(scheme, hiding_bound + 1)
        blind_sh = scheme.g_msm(
            cv.FQ_OPS,
            _slice_powers(srs.gamma_powers, 0, hiding_bound + 2),
            rand.blind,
        )
        c_sh = scheme.g_add(cv.FQ_OPS, c_sh, blind_sh)
    comm = _reveal_g1(scheme, c_sh)

    shifted_comm = None
    if degree_bound is not None:
        assert n - 1 <= degree_bound <= srs.max_degree
        shift = srs.max_degree - degree_bound
        s_sh = commit(scheme, srs, coeffs_sh, shift=shift)
        if hiding_bound is not None:
            rand.shifted_blind = _rand_poly_share(scheme, hiding_bound + 1)
            blind_sh = scheme.g_msm(
                cv.FQ_OPS,
                _slice_powers(srs.gamma_powers, 0, hiding_bound + 2),
                rand.shifted_blind,
            )
            s_sh = scheme.g_add(cv.FQ_OPS, s_sh, blind_sh)
        shifted_comm = _reveal_g1(scheme, s_sh)
    return Commitment(comm, shifted_comm, degree_bound), rand


def _reveal_g1(scheme, pt_sh) -> tuple:
    c = scheme.g_reveal(cv.FQ_OPS, pt_sh)
    return cv.g1_to_host(cv.JacPoint(c.x[None], c.y[None], c.z[None]))[0]


# ---------------------------------------------------------------------------
# Evaluation / witness polynomials (share-local)
# ---------------------------------------------------------------------------

def _pow_table_mont(x: int, n: int):
    pows = [1] * n
    for i in range(1, n):
        pows[i] = pows[i - 1] * x % P
    return FR.to_device(pows)


@functools.lru_cache(maxsize=None)
def _eval_kernel(shape):
    """Shape-cached jit: the eager associative_scan/fold graphs otherwise
    re-trace + XLA-mini-compile at EVERY opening (~0.4 s each on CPU —
    dominated the Plonk/Marlin prove walls)."""

    @jax.jit
    def f(arr, xp):
        return F.fold_sum(FR, F.mul(FR, arr, xp), axis=-2)

    return f


@functools.lru_cache(maxsize=None)
def _witness_kernel(shape):
    @jax.jit
    def f(arr, xp, xinv_shift):
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

    return f


def eval_share(scheme, coeffs_sh, x: int):
    """p(x) for public x: pointwise scale by x^i + fold — share-local."""
    n = _n_coeffs(scheme, coeffs_sh)
    xp = _pow_table_mont(x, n)

    def f(arr):
        if isinstance(arr, jax.core.Tracer):
            return F.fold_sum(FR, F.mul(FR, arr, xp), axis=-2)
        return _eval_kernel(arr.shape)(arr, xp)

    return scheme.lin_map(f, coeffs_sh)


def witness_poly(scheme, coeffs_sh, x: int):
    """(p(X) - p(x)) / (X - x) — share-local (no long division),
    ref kzg10/mod.rs:200-224 compute_witness_polynomial."""
    assert x % P != 0
    n = _n_coeffs(scheme, coeffs_sh)
    xp = _pow_table_mont(x, n)
    xinv = pow(x, P - 2, P)
    acc = xinv
    invs = []
    for _ in range(n - 1):
        invs.append(acc)
        acc = acc * xinv % P
    xinv_shift = FR.to_device(invs)

    def f(arr):
        if isinstance(arr, jax.core.Tracer):
            arr_xp = F.mul(FR, arr, xp)
            rev = jnp.flip(arr_xp, axis=-2)
            suf = jnp.flip(
                jax.lax.associative_scan(
                    lambda a, b: F.add(FR, a, b), rev, axis=-2
                ),
                axis=-2,
            )
            return F.mul(FR, suf[..., 1:, :], xinv_shift)
        return _witness_kernel(arr.shape)(arr, xp, xinv_shift)

    return scheme.lin_map(f, coeffs_sh)


# ---------------------------------------------------------------------------
# Single-poly opening (Plonk / client path) with optional hiding
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Proof:
    """Publicized opening proof (ref kzg10 Proof{w, random_v})."""

    w: tuple
    random_v: Optional[int] = None


def open_share(scheme, srs: KzgSrs, coeffs_sh, x: int, rand: Randomness = None):
    """Produce (y, Proof) both revealed: y = p(x) (publicized, ref
    mpc-plonk lib.rs:343-366 `eval`), proof = [w(tau)]_1 (+ hiding parts,
    ref kzg10/mod.rs:225-267)."""
    y_sh = eval_share(scheme, coeffs_sh, x)
    y = int(FR.to_host(scheme.reveal(y_sh))[()])
    w_sh = witness_poly(scheme, coeffs_sh, x)
    pf_sh = commit(scheme, srs, w_sh)
    random_v = None
    if rand is not None and rand.blind is not None:
        bw_sh = witness_poly(scheme, rand.blind, x)
        nb = _n_coeffs(scheme, bw_sh)
        gpart = scheme.g_msm(
            cv.FQ_OPS, _slice_powers(srs.gamma_powers, 0, nb), bw_sh
        )
        pf_sh = scheme.g_add(cv.FQ_OPS, pf_sh, gpart)
        rv_sh = eval_share(scheme, rand.blind, x)
        random_v = int(FR.to_host(scheme.reveal(rv_sh))[()])
    pf = _reveal_g1(scheme, pf_sh)
    return y, Proof(pf, random_v)


def host_verify(srs: KzgSrs, commitment, x: int, y: int, proof) -> bool:
    """e(C - [y]_1 - random_v [gamma]_1, [1]_2) * e(-W, [tau - x]_2) == 1 —
    host pairings (ref kzg10/mod.rs:295-316)."""
    if isinstance(proof, Proof):
        w, random_v = proof.w, proof.random_v
    else:  # bare point (legacy callers)
        w, random_v = proof, None
    inner = H.G1.add(commitment, H.G1.neg(H.G1.scalar_mul(H.G1_GEN, y)))
    if random_v is not None:
        inner = H.G1.add(inner, H.G1.neg(H.G1.scalar_mul(srs.gamma_g1, random_v)))
    tau_minus_x = H.G2.add(srs.beta_g2, H.G2.neg(H.G2.scalar_mul(H.G2_GEN, x)))
    prod = H.multi_pairing([(inner, srs.g2), (H.G1.neg(w), tau_minus_x)])
    return prod == H.FQ12_ONE


# ---------------------------------------------------------------------------
# Combined openings with opening challenges (MarlinKZG10)
# ---------------------------------------------------------------------------

def _combine_polys(scheme, entries, chals):
    """sum_j xi_j p_j as one share poly (pads to the longest).  entries:
    [(coeffs_sh, xi_index)]; chals: list of Montgomery-device challenge
    scalars index-able by xi_index."""
    max_n = max(_n_coeffs(scheme, e[0]) for e in entries)
    acc = None
    for coeffs_sh, ci in entries:
        n = _n_coeffs(scheme, coeffs_sh)

        def padf(arr, n=n):
            pad = [(0, 0)] * arr.ndim
            pad[-2] = (0, max_n - n)
            return jnp.pad(arr, pad)

        term = scheme.scale(
            scheme.lin_map(padf, coeffs_sh), chals[ci][None]
        )
        acc = term if acc is None else scheme.add(acc, term)
    return acc


def open_combined(
    scheme,
    srs: KzgSrs,
    labeled,           # list of (coeffs_sh, Randomness|None, degree_bound|None)
    point: int,
    opening_challenge: int,
) -> Proof:
    """One proof for many polynomials at one point with challenge powers
    xi^0, xi^1, ... (one extra per degree-bounded poly), mirroring
    ref marlin_pc/mod.rs:245-341 open_individual_opening_challenges."""
    chal_ints = []
    cur = 1
    # enough challenge powers: 2 per polynomial
    for _ in range(2 * len(labeled) + 1):
        chal_ints.append(cur)
        cur = cur * (opening_challenge % P) % P
    chals = [FR.to_device([c])[0] for c in chal_ints]

    plain_entries = []      # (coeffs, chal_idx)
    blind_entries = []
    shifted_entries = []    # already-shifted witness polys
    shifted_blind_entries = []
    ctr = 0
    for coeffs_sh, rand, dbound in labeled:
        plain_entries.append((coeffs_sh, ctr))
        if rand is not None and rand.blind is not None:
            blind_entries.append((rand.blind, ctr))
        ctr += 1
        if dbound is not None:
            # witness of p, then shift by X^(D - d)
            w_sh = witness_poly(scheme, coeffs_sh, point)
            shift = srs.max_degree - dbound

            def shiftf(arr, k=shift):
                pad = [(0, 0)] * arr.ndim
                pad[-2] = (k, 0)
                return jnp.pad(arr, pad)

            shifted_entries.append((scheme.lin_map(shiftf, w_sh), ctr))
            if rand is not None and rand.shifted_blind is not None:
                shifted_blind_entries.append((rand.shifted_blind, ctr))
            ctr += 1

    combined = _combine_polys(scheme, plain_entries, chals)
    w_sh = witness_poly(scheme, combined, point)
    pf_sh = commit(scheme, srs, w_sh)

    random_v = None
    rv_sh = None
    if blind_entries:
        combined_blind = _combine_polys(scheme, blind_entries, chals)
        bw_sh = witness_poly(scheme, combined_blind, point)
        nb = _n_coeffs(scheme, bw_sh)
        pf_sh = scheme.g_add(
            cv.FQ_OPS,
            pf_sh,
            scheme.g_msm(cv.FQ_OPS, _slice_powers(srs.gamma_powers, 0, nb), bw_sh),
        )
        rv_sh = eval_share(scheme, combined_blind, point)

    if shifted_entries:
        shifted_w = _combine_polys(scheme, shifted_entries, chals)
        pf_sh = scheme.g_add(cv.FQ_OPS, pf_sh, commit(scheme, srs, shifted_w))
        if shifted_blind_entries:
            sb = _combine_polys(scheme, shifted_blind_entries, chals)
            # gamma-witness of the shifted blinding polys
            sbw_sh = witness_poly(scheme, sb, point)
            nb = _n_coeffs(scheme, sbw_sh)
            pf_sh = scheme.g_add(
                cv.FQ_OPS,
                pf_sh,
                scheme.g_msm(
                    cv.FQ_OPS, _slice_powers(srs.gamma_powers, 0, nb), sbw_sh
                ),
            )
            sb_eval = eval_share(scheme, sb, point)
            rv_sh = sb_eval if rv_sh is None else scheme.add(rv_sh, sb_eval)

    if rv_sh is not None:
        random_v = int(FR.to_host(scheme.reveal(rv_sh))[()])
    return Proof(_reveal_g1(scheme, pf_sh), random_v)


def accumulate_commitments(
    srs: KzgSrs,
    items,             # list of (Commitment, value_int)
    opening_challenge: int,
):
    """(combined_comm, combined_value) host accumulation with degree-bound
    adjustment (ref poly-commit/src/marlin/mod.rs:91-133)."""
    xi = opening_challenge % P
    cur = 1
    combined = None
    combined_value = 0
    for cm, v in items:
        combined = H.G1.add(combined, H.G1.scalar_mul(cm.comm, cur))
        combined_value = (combined_value + v * cur) % P
        cur = cur * xi % P
        if cm.degree_bound is not None:
            sp = srs.shift_power_host(cm.degree_bound)
            adjusted = H.G1.add(
                cm.shifted_comm, H.G1.neg(H.G1.scalar_mul(sp, v % P))
            )
            combined = H.G1.add(combined, H.G1.scalar_mul(adjusted, cur))
            cur = cur * xi % P
    return combined, combined_value


def check_combined(
    srs: KzgSrs,
    items,
    point: int,
    proof: Proof,
    opening_challenge: int,
) -> bool:
    """MarlinKZG10 check for one point
    (ref marlin_pc/mod.rs:343-368 -> kzg10 check)."""
    combined, value = accumulate_commitments(srs, items, opening_challenge)
    return host_verify(srs, combined, point, value, proof)


def batch_check(srs: KzgSrs, checks, seed: int = 0) -> bool:
    """Combine (commitment, point, value, proof) tuples into one 2-pairing
    check with 128-bit randomizers (ref kzg10/mod.rs:318-371)."""
    rng = np.random.default_rng(seed)
    total_c = None
    total_w = None
    g_mult = 0
    gamma_mult = 0
    r = 1
    for commitment, z, v, proof in checks:
        cpt = H.G1.add(commitment, H.G1.scalar_mul(proof.w, z % P))
        total_c = H.G1.add(total_c, H.G1.scalar_mul(cpt, r))
        total_w = H.G1.add(total_w, H.G1.scalar_mul(proof.w, r))
        g_mult = (g_mult + r * v) % P
        if proof.random_v is not None:
            gamma_mult = (gamma_mult + r * proof.random_v) % P
        r = int.from_bytes(rng.bytes(16), "little")
    total_c = H.G1.add(total_c, H.G1.neg(H.G1.scalar_mul(H.G1_GEN, g_mult)))
    if gamma_mult and srs.gamma_g1 is not None:
        total_c = H.G1.add(
            total_c, H.G1.neg(H.G1.scalar_mul(srs.gamma_g1, gamma_mult))
        )
    prod = H.multi_pairing(
        [(H.G1.neg(total_w), srs.beta_g2), (total_c, srs.g2)]
    )
    return prod == H.FQ12_ONE
