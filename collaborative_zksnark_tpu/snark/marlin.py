"""Marlin: universal-setup zkSNARK for R1CS, local AND collaborative.

TPU-native re-design of the reference's forked ark-marlin
(behavior spec: marlin/src/lib.rs:153-451 prove/verify with `publicize()`
after every round's messages/commitments and on evaluations at
:173,182,210-211,232-233,300; AHP rounds marlin/src/ahp/prover.rs:213-726;
indexer arithmetization marlin/src/ahp/constraint_systems.rs:151-260;
verifier equations marlin/src/ahp/mod.rs:115-270; queries
marlin/src/ahp/verifier.rs:104-214).

MPC structure (why this prover is collaborative almost for free):
  * round 1 is share-local linear algebra (matvecs + NTTs + v_H blinds);
  * round 2 needs exactly ONE batched share multiplication (z_a * z_b via
    the evaluation-domain product hook — ref ahp/prover.rs:461-466 routed
    through batch_product_in_place); everything else is public x share;
  * round 3 is entirely PUBLIC (index polynomials + challenges);
  * commitments/evaluations are publicized exactly where the reference
    inserts publicize() calls; Fiat-Shamir then matches on every party.

Polynomial commitments are MarlinKZG10 (snark/kzg.py): hiding bounds on
w/z_a/z_b/g_1, strict degree bounds on g_1 (|H|-2) and g_2 (|K|-2), one
combined opening proof per query point.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra import params as C
from ..algebra import field as F
from ..algebra import hostapi as H
from ..algebra.field import FR
from ..mpc.local import LocalScheme
from ..ops import ntt
from ..relations.r1cs import R1CS, pack_rows, sparse_matvec
from ..utils import fs as fsmod
from . import kzg
from . import poly_share as ps

P = C.R_MOD

ZK_BOUND = 1  # ref ahp/prover.rs:281 "One query is sufficient"

INDEX_LABELS = [
    m + "_" + p for m in ("a", "b", "c") for p in ("row", "col", "val", "row_col")
]


# ---------------------------------------------------------------------------
# Host helpers
# ---------------------------------------------------------------------------

def _pow2_at_least(n: int) -> int:
    m = 1
    while m < n:
        m <<= 1
    return m


def _batch_inv_host(vals: List[int]) -> List[int]:
    """Montgomery batch inversion over host ints (ONE modular pow)."""
    n = len(vals)
    prefix = [1] * (n + 1)
    for i, v in enumerate(vals):
        prefix[i + 1] = prefix[i] * (v % P) % P
    inv_all = pow(prefix[n], P - 2, P)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv_all % P
        inv_all = inv_all * (vals[i] % P) % P
    return out


def _reindex(i: int, n: int, xsize: int) -> int:
    """Variable index -> position in H (ref domain/mod.rs:196-218
    reindex_by_subdomain: X embedded in H at stride n/|X|)."""
    period = n // xsize
    if i < xsize:
        return i * period
    j = i - xsize
    x = period - 1
    return j + (j // x) + 1


def _sample_outside_domain(fs: fsmod.FiatShamir, n: int) -> int:
    """FS challenge with v_H != 0 (ref verifier.rs:61
    sample_element_outside_domain)."""
    while True:
        v = fs.gen_fr()
        if pow(v, n, P) != 1:
            return v


def _fr_dev(x: int):
    return FR.to_device([x % P])[0]


# ---------------------------------------------------------------------------
# Share helpers (container-agnostic linear plumbing)
# ---------------------------------------------------------------------------

def _share_concat(parts, axis=-2):
    if hasattr(parts[0], "_fields"):
        return type(parts[0])(
            *[
                jnp.concatenate([getattr(p, f) for p in parts], axis=axis)
                for f in parts[0]._fields
            ]
        )
    return jnp.concatenate(list(parts), axis=axis)


def _v_h_blind(scheme, r_sh, n: int):
    """The share polynomial r * (X^n - 1): -r at X^0, +r at X^n (n+1
    coefficients).  r_sh: scalar share of shape (..., 1, L)."""

    def f(arr):
        zeros = jnp.zeros(arr.shape[:-2] + (n - 1, arr.shape[-1]), arr.dtype)
        return jnp.concatenate([F.neg(FR, arr), zeros, arr], axis=-2)

    return scheme.lin_map(f, r_sh)


def _rand_scalar_share(scheme):
    return scheme.king_share(scheme.ctx.rand_fr((1,)))


def _vfft(dom, arr):
    return jax.vmap(dom.fft)(arr) if arr.ndim == 3 else dom.fft(arr)


def _vifft(dom, arr):
    return jax.vmap(dom.ifft)(arr) if arr.ndim == 3 else dom.ifft(arr)


# ---------------------------------------------------------------------------
# Indexer (ref ahp/indexer.rs + constraint_systems.rs:151-260)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class MatrixArith:
    """Arithmetization of M^* (i,j) := M(j,i) * u_H(j,j)^-1 over K."""

    row_K: jnp.ndarray      # evals on K, (K, L) device
    col_K: jnp.ndarray
    val_K: jnp.ndarray
    row_poly: jnp.ndarray   # coefficient vectors, (K, L)
    col_poly: jnp.ndarray
    val_poly: jnp.ndarray
    row_col_poly: jnp.ndarray
    row_B: jnp.ndarray      # evals on the expanded domain B
    col_B: jnp.ndarray
    val_B: jnp.ndarray
    row_col_B: jnp.ndarray


@dataclasses.dataclass
class Index:
    n: int                      # |H| (= padded #constraints = #variables)
    xsize: int                  # |X|
    k_size: int                 # |K|
    b_size: int                 # |B|
    num_instance: int           # original instance count (incl. ONE)
    num_witness: int            # original witness count
    mats: Dict[str, MatrixArith]
    rows: Dict[str, list]       # remapped sparse rows (host; for matvec + t)
    packed: Dict[str, tuple]    # device gather matrices
    t_tables: Dict[str, tuple]  # per-matrix (rows_idx (n,T), vals (n,T,L))
    elems_dev: jnp.ndarray      # H elements as device Fr, (n, L)


@dataclasses.dataclass
class IndexProverKey:
    index: Index
    srs: kzg.KzgSrs
    comms: Dict[str, kzg.Commitment]


@dataclasses.dataclass
class IndexVerifierKey:
    n: int
    xsize: int
    k_size: int
    num_instance: int
    srs: kzg.KzgSrs
    comms: Dict[str, kzg.Commitment]


@dataclasses.dataclass
class Proof:
    comms: Dict[str, kzg.Commitment]
    evals: Dict[str, int]
    pf_beta: kzg.Proof
    pf_gamma: kzg.Proof


def _pack_t_table(mrows, n: int, xsize: int):
    """Column-grouped gather table for the per-prove t(X) evaluation sum
    t[pos] = sum over nonzeros in column pos of v * r_alpha[row]
    (ref ahp/mod.rs:214-227 eval on H): rows_idx (n, T) int32 + Montgomery
    values (n, T, L), T = max nonzeros per (reindexed) column, zero-padded.
    Built ONCE at index time so the prove-time sum is a device gather+mul
    (the round-2 verdict: the host loop over nnz dominated at scale)."""
    per_pos = [[] for _ in range(n)]
    for r, row in enumerate(mrows):
        for (c, v) in row:
            per_pos[_reindex(c, n, xsize)].append((r, v % P))
    T = max(1, max(len(e) for e in per_pos))
    ridx = np.zeros((n, T), np.int32)
    vals = [0] * (n * T)
    for pos, entries in enumerate(per_pos):
        for t, (r, v) in enumerate(entries):
            ridx[pos, t] = r
            vals[pos * T + t] = v
    Rint = 1 << (F.LIMB_BITS * FR.L)
    mont = F.ints_to_limbs([v * Rint % P for v in vals], FR.L)
    return jnp.asarray(ridx), jnp.asarray(mont.reshape(n, T, FR.L))


def max_degree_for(cs: R1CS) -> int:
    """SRS degree needed (ref ahp/mod.rs:76-98 max_degree)."""
    ni = cs.num_instance
    xsize = _pow2_at_least(ni)
    nv = xsize + cs.num_witness
    n = _pow2_at_least(max(nv, cs.num_constraints, 2))
    nnz = max(
        sum(len(r) for r in rows)
        for rows in (cs.a_rows, cs.b_rows, cs.c_rows)
    )
    k = _pow2_at_least(max(nnz, 2))
    return max(3 * n + 2 * ZK_BOUND - 3, 3 * k + 2, 2 * n + ZK_BOUND) + 2


def universal_setup(max_degree: int, seed: int = 3) -> kzg.KzgSrs:
    """SRS for all circuits with index degree <= max_degree
    (ref marlin/src/lib.rs:80-101)."""
    return kzg.setup(max_degree, seed=seed, hiding=True)


def index(cs: R1CS, srs: kzg.KzgSrs):
    """Build index polynomials + commitments (the AHP indexer,
    ref ahp/indexer.rs:120-209, matrices squared/padded as in
    constraint_systems.rs:54-111)."""
    ni = cs.num_instance
    xsize = _pow2_at_least(ni)
    nv = xsize + cs.num_witness
    n = _pow2_at_least(max(nv, cs.num_constraints, 2))

    def remap(rows):
        return [
            [((c if c < ni else c + xsize - ni), v % P) for (c, v) in row]
            for row in rows
        ]

    rows = {
        "a": remap(cs.a_rows),
        "b": remap(cs.b_rows),
        "c": remap(cs.c_rows),
    }
    nnz = max(sum(len(r) for r in m) for m in rows.values())
    k_size = _pow2_at_least(max(nnz, 2))
    # B must fit deg(b * f) = 4|K| - 4 exactly (the ref multiplies the dense
    # polys instead, ahp/prover.rs:700-706 — same object, exact either way)
    b_size = _pow2_at_least(max(4 * k_size - 3, 2))

    dom_h = ntt.get_radix2_domain(n)
    dom_k = ntt.get_radix2_domain(k_size)
    dom_b = ntt.get_radix2_domain(b_size)
    elems = dom_h.elements()

    mats = {}
    comms = {}
    local = LocalScheme()
    for name, mrows in rows.items():
        row_v: List[int] = []
        col_v: List[int] = []
        val_v: List[int] = []
        diag_u: List[int] = []
        for r, row in enumerate(mrows):
            for (c, v) in sorted(row, key=lambda e: e[0]):
                rp = elems[_reindex(c, n, xsize)]   # transposed: M^*
                cp = elems[r]
                rp_j = _reindex(c, n, xsize)
                row_v.append(rp)
                col_v.append(cp)
                val_v.append(v % P)
                # u_H(x, x) = n * x^(n-1); for x = w^j in H, x^(n-1) = w^-j
                # — a table lookup, not a modpow (ref ahp/mod.rs:349-356)
                diag_u.append(n * elems[(n - rp_j) % n] % P)
        inv_u = _batch_inv_host(diag_u) if diag_u else []
        val_v = [v * iu % P for v, iu in zip(val_v, inv_u)]
        pad = k_size - len(row_v)
        row_v += [elems[0]] * pad
        col_v += [elems[0]] * pad
        val_v += [0] * pad
        row_col_v = [r * c % P for r, c in zip(row_v, col_v)]

        row_K = FR.to_device(row_v)
        col_K = FR.to_device(col_v)
        val_K = FR.to_device(val_v)
        rc_K = FR.to_device(row_col_v)
        row_poly = dom_k.ifft(row_K)
        col_poly = dom_k.ifft(col_K)
        val_poly = dom_k.ifft(val_K)
        rc_poly = dom_k.ifft(rc_K)

        def on_b(poly):
            return dom_b.fft(jnp.pad(poly, ((0, b_size - k_size), (0, 0))))

        mats[name] = MatrixArith(
            row_K=row_K, col_K=col_K, val_K=val_K,
            row_poly=row_poly, col_poly=col_poly, val_poly=val_poly,
            row_col_poly=rc_poly,
            row_B=on_b(row_poly), col_B=on_b(col_poly),
            val_B=on_b(val_poly), row_col_B=on_b(rc_poly),
        )
        for pname, poly in (
            ("row", row_poly), ("col", col_poly),
            ("val", val_poly), ("row_col", rc_poly),
        ):
            cm, _ = kzg.commit_labeled(local, srs, poly)
            comms[f"{name}_{pname}"] = cm

    packed = {m: pack_rows(rows[m], n) for m in rows}
    t_tables = {m: _pack_t_table(rows[m], n, xsize) for m in rows}
    idx = Index(
        n=n, xsize=xsize, k_size=k_size, b_size=b_size,
        num_instance=ni, num_witness=cs.num_witness,
        mats=mats, rows=rows, packed=packed,
        t_tables=t_tables, elems_dev=FR.to_device(elems),
    )
    pk = IndexProverKey(index=idx, srs=srs, comms=comms)
    vk = IndexVerifierKey(
        n=n, xsize=xsize, k_size=k_size, num_instance=ni,
        srs=srs, comms=comms,
    )
    return pk, vk


# ---------------------------------------------------------------------------
# Fiat-Shamir transcript (every absorbed value is publicized first)
# ---------------------------------------------------------------------------

def _absorb_comm(fs: fsmod.FiatShamir, cm: kzg.Commitment):
    fs.absorb(fsmod.g1_to_bytes(cm.comm))
    if cm.shifted_comm is not None:
        fs.absorb(fsmod.g1_to_bytes(cm.shifted_comm))


def _fs_init(vk_comms: Dict[str, kzg.Commitment], formatted_input: List[int]):
    fs = fsmod.FiatShamir(b"cztpu-marlin")
    for label in INDEX_LABELS:
        _absorb_comm(fs, vk_comms[label])
    for x in formatted_input:
        fs.absorb(fsmod.fr_to_bytes(x))
    return fs


# ---------------------------------------------------------------------------
# Linear combinations (ref ahp/mod.rs:115-270)
# ---------------------------------------------------------------------------

def _r_alpha(alpha: int, n: int, at: int) -> int:
    """u_H(alpha, at) for at outside/inside H (ref ahp/mod.rs:349-356)."""
    if alpha == at:
        return n * pow(at, n - 1, P) % P
    va = (pow(alpha, n, P) - 1) % P
    vb = (pow(at, n, P) - 1) % P
    return (va - vb) * pow(alpha - at, P - 2, P) % P


def _x_at(formatted_input: List[int], xsize: int, beta: int) -> int:
    """x-hat(beta): Lagrange-evaluate the formatted input over X."""
    dom = ntt.get_radix2_domain(xsize)
    omega = dom.omega
    vx = (pow(beta, xsize, P) - 1) % P
    scale = vx * pow(xsize, P - 2, P) % P
    dens = [(beta - pow(omega, i, P)) % P for i in range(xsize)]
    invs = _batch_inv_host(dens)
    acc = 0
    for i, x in enumerate(formatted_input):
        li = scale * pow(omega, i, P) % P * invs[i] % P
        acc = (acc + li * x) % P
    return acc


def build_lcs(
    n: int,
    xsize: int,
    k_size: int,
    formatted_input: List[int],
    chals: dict,
    evals: Dict[str, int],
):
    """The nine LCs checked by the AHP, with public coefficients computed
    from challenges + claimed evaluations (ref ahp/mod.rs:115-270).
    Returns {label: (terms, const, point, degree_bound)}."""
    alpha, beta, gamma = chals["alpha"], chals["beta"], chals["gamma"]
    eta_a, eta_b, eta_c = chals["eta_a"], chals["eta_b"], chals["eta_c"]

    v_h_a = (pow(alpha, n, P) - 1) % P
    v_h_b = (pow(beta, n, P) - 1) % P
    v_x_b = (pow(beta, xsize, P) - 1) % P
    v_k_g = (pow(gamma, k_size, P) - 1) % P
    r_ab = _r_alpha(alpha, n, beta)
    x_b = _x_at(formatted_input, xsize, beta)

    z_b_b = evals["z_b"]
    t_b = evals["t"]
    g_1_b = evals["g_1"]
    g_2_g = evals["g_2"]
    aD = evals["a_denom"]
    bD = evals["b_denom"]
    cD = evals["c_denom"]

    lcs = {}
    lcs["z_b"] = ([(1, "z_b")], 0, beta, None)
    lcs["g_1"] = ([(1, "g_1")], 0, beta, n - 2)
    lcs["t"] = ([(1, "t")], 0, beta, None)
    lcs["outer_sumcheck"] = (
        [
            (1, "mask_poly"),
            (r_ab * ((eta_a + eta_c * z_b_b) % P) % P, "z_a"),
            ((-t_b * v_x_b) % P, "w"),
            ((-v_h_b) % P, "h_1"),
        ],
        (r_ab * eta_b % P * z_b_b - t_b * x_b - beta * g_1_b) % P,
        beta,
        None,
    )
    lcs["g_2"] = ([(1, "g_2")], 0, gamma, k_size - 2)
    for m in ("a", "b", "c"):
        lcs[f"{m}_denom"] = (
            [
                ((-alpha) % P, f"{m}_row"),
                ((-beta) % P, f"{m}_col"),
                (1, f"{m}_row_col"),
            ],
            beta * alpha % P,
            gamma,
            None,
        )
    vv = v_h_a * v_h_b % P
    b_g = aD * bD % P * cD % P
    b_expr = b_g * ((gamma * g_2_g + t_b * pow(k_size, P - 2, P)) % P) % P
    lcs["inner_sumcheck"] = (
        [
            (eta_a * bD % P * cD % P * vv % P, "a_val"),
            (eta_b * aD % P * cD % P * vv % P, "b_val"),
            (eta_c * bD % P * aD % P * vv % P, "c_val"),
            ((-v_k_g) % P, "h_2"),
        ],
        (-b_expr) % P,
        gamma,
        None,
    )
    return lcs


BETA_LCS = ["g_1", "outer_sumcheck", "t", "z_b"]
GAMMA_LCS = ["a_denom", "b_denom", "c_denom", "g_2", "inner_sumcheck"]
EVAL_LABELS = sorted(["z_b", "t", "g_1", "g_2", "a_denom", "b_denom", "c_denom"])


# ---------------------------------------------------------------------------
# Prover
# ---------------------------------------------------------------------------

def prove(
    pk: IndexProverKey,
    scheme,
    instance_ints: List[int],
    witness_sh,
) -> Proof:
    """The 3-round AHP prover over (possibly shared) witnesses
    (ref marlin/src/lib.rs:153-330, ahp/prover.rs:213-726).

    instance_ints: the PUBLIC formatted instance (leading 1 included) —
    publicized as in ref ahp/prover.rs:246.  witness_sh: share array/
    container of shape (..., num_witness, L)."""
    idx = pk.index
    srs = pk.srs
    n, xsize, k_size = idx.n, idx.xsize, idx.k_size
    dom_h = ntt.get_radix2_domain(n)
    dom_x = ntt.get_radix2_domain(xsize)

    formatted_input = [v % P for v in instance_ints] + [0] * (
        xsize - len(instance_ints)
    )
    fs = _fs_init(pk.comms, formatted_input)

    # -- assignment as a share vector in VARIABLE order -------------------
    x_dev = FR.to_device(formatted_input)
    x_pub_sh = scheme.from_public(x_dev)
    nw = idx.num_witness
    wpad = n - xsize - nw
    zero_w = scheme.lin_map(
        lambda arr: jnp.zeros(arr.shape[:-2] + (wpad, arr.shape[-1]), arr.dtype),
        witness_sh,
    )
    z_sh = _share_map2(
        scheme, x_pub_sh, witness_sh, zero_w, lambda a, b, c: _share_concat([a, b, c])
    )

    # -- round 1 (ref ahp/prover.rs:313-404) ------------------------------
    z_a_ev = scheme.lin_map(lambda a: sparse_matvec(idx.packed["a"], a), z_sh)
    z_b_ev = scheme.lin_map(lambda a: sparse_matvec(idx.packed["b"], a), z_sh)

    def blinded_poly(evals_sh):
        coeffs = scheme.lin_map(lambda a: _vifft(dom_h, a), evals_sh)
        padded = ps.pad_to(scheme, coeffs, n + 1)
        return scheme.add(padded, _v_h_blind(scheme, _rand_scalar_share(scheme), n))

    z_a_poly = blinded_poly(z_a_ev)
    z_b_poly = blinded_poly(z_b_ev)

    # w over H: zero at X-positions, w_extended - x_evals elsewhere
    x_poly = dom_x.ifft(x_dev)
    x_evals_h = dom_h.fft(jnp.pad(x_poly, ((0, n - xsize), (0, 0))))
    ratio = n // xsize
    gidx = np.zeros((n,), np.int32)
    is_x = np.zeros((n,), bool)
    for k in range(n):
        if k % ratio == 0:
            is_x[k] = True
        else:
            gidx[k] = k - (k // ratio) - 1
    gidx_d = jnp.asarray(gidx)
    mask_d = jnp.asarray(is_x)

    w_ext = _share_concat_maybe(scheme, witness_sh, wpad)

    def gatherf(arr):
        g = arr[..., gidx_d, :]
        return jnp.where(mask_d[:, None], 0, g).astype(arr.dtype)

    w_gather = scheme.lin_map(gatherf, w_ext)
    pub_vec = jnp.where(mask_d[:, None], 0, F.neg(FR, x_evals_h)).astype(jnp.uint32)
    w_evals = scheme.shift(w_gather, pub_vec)
    w_blinded = scheme.add(
        ps.pad_to(scheme, scheme.lin_map(lambda a: _vifft(dom_h, a), w_evals), n + 1),
        _v_h_blind(scheme, _rand_scalar_share(scheme), n),
    )
    w_hat, _ = ps.divide_by_vanishing(scheme, w_blinded, xsize)

    # mask poly (degree 3n + 2 zk - 3), sum over H forced to zero
    mask_len = 3 * n + 2 * ZK_BOUND - 2  # degree 3n + 2zk - 3
    mask_poly = scheme.king_share(scheme.ctx.rand_fr((mask_len,)))
    _, mrem = ps.divide_by_vanishing(scheme, mask_poly, n)
    sigma_fix = scheme.lin_map(
        lambda arr: jnp.concatenate(
            [
                F.neg(FR, arr[..., :1, :]),
                jnp.zeros(arr.shape[:-2] + (mask_len - 1, arr.shape[-1]), arr.dtype),
            ],
            axis=-2,
        ),
        mrem,
    )
    mask_poly = scheme.add(mask_poly, sigma_fix)

    comms: Dict[str, kzg.Commitment] = {}
    rands: Dict[str, kzg.Randomness] = {}
    polys = {}  # label -> (coeffs, is_share)

    def commit_poly(label, coeffs_sh, is_share, hb=None, db=None):
        sch = scheme if is_share else LocalScheme()
        cm, rd = kzg.commit_labeled(sch, srs, coeffs_sh, hiding_bound=hb, degree_bound=db)
        comms[label] = cm
        rands[label] = rd
        polys[label] = (coeffs_sh, is_share)
        _absorb_comm(fs, cm)

    commit_poly("w", w_hat, True, hb=1)
    commit_poly("z_a", z_a_poly, True, hb=1)
    commit_poly("z_b", z_b_poly, True, hb=1)
    commit_poly("mask_poly", mask_poly, True)

    alpha = _sample_outside_domain(fs, n)
    eta_a, eta_b, eta_c = fs.gen_fr(), fs.gen_fr(), fs.gen_fr()

    # -- round 2 (ref ahp/prover.rs:437-580) ------------------------------
    z_c = ps.mul(scheme, z_a_poly, z_b_poly)        # [NETWORK: 1 round]
    summed = scheme.add(
        ps.pad_to(scheme, scheme.scale(z_c, _fr_dev(eta_c)[None]), 2 * n + 1),
        ps.pad_to(
            scheme,
            scheme.add(
                scheme.scale(z_a_poly, _fr_dev(eta_a)[None]),
                scheme.scale(z_b_poly, _fr_dev(eta_b)[None]),
            ),
            2 * n + 1,
        ),
    )

    # r_alpha(X) = u_H(alpha, X) evals on H and t(X): device ops driven by
    # index-time tables — no per-prove Python loop over n or nnz
    # (round-2 verdict item: these dominated the prove at 2^19).
    v_h_alpha = (pow(alpha, n, P) - 1) % P
    alpha_dev = _fr_dev(alpha)
    dens_dev = F.sub(
        FR,
        jnp.broadcast_to(alpha_dev, idx.elems_dev.shape).astype(jnp.uint32),
        idx.elems_dev,
    )
    invs_dev = F.batch_inv(FR, dens_dev)
    r_alpha_evals_dev = F.mul(FR, invs_dev, _fr_dev(v_h_alpha)[None])
    r_alpha_dev = dom_h.ifft(r_alpha_evals_dev)

    t_evals_dev = None
    for name, eta in (("a", eta_a), ("b", eta_b), ("c", eta_c)):
        ridx, vals = idx.t_tables[name]
        gathered = r_alpha_evals_dev[ridx]           # (n, T, L)
        term = F.fold_sum(FR, F.mul(FR, vals, gathered), axis=-2)
        term = F.mul(FR, term, _fr_dev(eta)[None])
        t_evals_dev = term if t_evals_dev is None else F.add(FR, t_evals_dev, term)
    t_poly = dom_h.ifft(t_evals_dev)

    # z = w_hat * v_X + x_poly  (z length n + 1)
    z_van = ps.mul_by_vanishing(scheme, w_hat, xsize)
    z_len = ps.n_coeffs(z_van)
    z_poly = scheme.shift(
        z_van, jnp.pad(x_poly, ((0, z_len - xsize), (0, 0)))
    )

    md = ntt.get_radix2_domain(3 * n + 2)
    r_ev = md.fft(jnp.pad(r_alpha_dev, ((0, md.n - n), (0, 0))))
    t_ev = md.fft(jnp.pad(t_poly, ((0, md.n - n), (0, 0))))
    summed_ev = scheme.lin_map(
        lambda a: _vfft(md, a), ps.pad_to(scheme, summed, md.n)
    )
    z_ev = scheme.lin_map(lambda a: _vfft(md, a), ps.pad_to(scheme, z_poly, md.n))
    rhs_ev = scheme.sub(
        scheme.scale(summed_ev, r_ev), scheme.scale(z_ev, t_ev)
    )
    rhs = scheme.lin_map(lambda a: _vifft(md, a), rhs_ev)
    q_1 = scheme.add(ps.pad_to(scheme, mask_poly, md.n), rhs)
    h_1, xg1 = ps.divide_by_vanishing(scheme, q_1, n)
    g_1 = scheme.lin_map(lambda a: a[..., 1:n, :], ps.pad_to(scheme, xg1, n))

    commit_poly("t", t_poly, False)
    commit_poly("g_1", g_1, True, hb=1, db=n - 2)
    commit_poly("h_1", h_1, True)

    beta = _sample_outside_domain(fs, n)

    # -- round 3: entirely public (ref ahp/prover.rs:587-726) -------------
    local = LocalScheme()
    dom_k = ntt.get_radix2_domain(k_size)
    dom_b = ntt.get_radix2_domain(idx.b_size)
    a_dev = _fr_dev(alpha)
    b_dev = _fr_dev(beta)
    v_h_beta = (pow(beta, n, P) - 1) % P
    vv_dev = _fr_dev(v_h_alpha * v_h_beta % P)

    def denom_K(m: MatrixArith):
        t1 = F.sub(FR, jnp.broadcast_to(b_dev, m.row_K.shape).astype(jnp.uint32), m.row_K)
        t2 = F.sub(FR, jnp.broadcast_to(a_dev, m.col_K.shape).astype(jnp.uint32), m.col_K)
        return F.mul(FR, t1, t2)

    mats = idx.mats
    dA = F.batch_inv(FR, denom_K(mats["a"]))
    dB = F.batch_inv(FR, denom_K(mats["b"]))
    dC = F.batch_inv(FR, denom_K(mats["c"]))
    f_evals = None
    for m, inv, eta in (("a", dA, eta_a), ("b", dB, eta_b), ("c", dC, eta_c)):
        term = F.mul(FR, mats[m].val_K, inv)
        term = F.mul(FR, term, _fr_dev(eta)[None])
        f_evals = term if f_evals is None else F.add(FR, f_evals, term)
    f_evals = F.mul(FR, f_evals, vv_dev[None])
    f_poly = dom_k.ifft(f_evals)
    g_2 = f_poly[1:]

    def denom_B(m: MatrixArith):
        ab = _fr_dev(alpha * beta % P)
        t = jnp.broadcast_to(ab, m.row_B.shape).astype(jnp.uint32)
        t = F.sub(FR, t, F.mul(FR, m.row_B, a_dev[None]))
        t = F.sub(FR, t, F.mul(FR, m.col_B, b_dev[None]))
        return F.add(FR, t, m.row_col_B)

    dA_B = denom_B(mats["a"])
    dB_B = denom_B(mats["b"])
    dC_B = denom_B(mats["c"])
    a_ev = None
    for m, o1, o2, eta in (
        ("a", dB_B, dC_B, eta_a),
        ("b", dA_B, dC_B, eta_b),
        ("c", dA_B, dB_B, eta_c),
    ):
        term = F.mul(FR, mats[m].val_B, F.mul(FR, o1, o2))
        term = F.mul(FR, term, _fr_dev(eta)[None])
        a_ev = term if a_ev is None else F.add(FR, a_ev, term)
    a_ev = F.mul(FR, a_ev, vv_dev[None])
    b_ev = F.mul(FR, dA_B, F.mul(FR, dB_B, dC_B))
    f_B = dom_b.fft(jnp.pad(f_poly, ((0, idx.b_size - k_size), (0, 0))))
    h2_ev = F.sub(FR, a_ev, F.mul(FR, b_ev, f_B))
    h2_full = dom_b.ifft(h2_ev)
    h_2, _ = ps.divide_by_vanishing(local, h2_full, k_size)

    commit_poly("g_2", g_2, False, db=k_size - 2)
    commit_poly("h_2", h_2, False)

    gamma = fs.gen_fr()

    # index polys available for LC openings (public)
    for m in ("a", "b", "c"):
        polys[f"{m}_row"] = (mats[m].row_poly, False)
        polys[f"{m}_col"] = (mats[m].col_poly, False)
        polys[f"{m}_val"] = (mats[m].val_poly, False)
        polys[f"{m}_row_col"] = (mats[m].row_col_poly, False)
        for pn in ("row", "col", "val", "row_col"):
            rands.setdefault(f"{m}_{pn}", kzg.Randomness())

    # -- evaluations (publicized, ref lib.rs:289-300) ---------------------
    def eval_poly(label, point):
        coeffs, is_share = polys[label]
        sch = scheme if is_share else local
        y_sh = kzg.eval_share(sch, coeffs, point)
        if is_share:
            return int(FR.to_host(scheme.reveal(y_sh))[()])
        return int(FR.to_host(y_sh)[()])

    evals: Dict[str, int] = {}
    evals["z_b"] = eval_poly("z_b", beta)
    evals["t"] = eval_poly("t", beta)
    evals["g_1"] = eval_poly("g_1", beta)
    evals["g_2"] = eval_poly("g_2", gamma)
    for m in ("a", "b", "c"):
        row = eval_poly(f"{m}_row", gamma)
        col = eval_poly(f"{m}_col", gamma)
        rc = eval_poly(f"{m}_row_col", gamma)
        evals[f"{m}_denom"] = (beta * alpha - alpha * row - beta * col + rc) % P

    for lbl in EVAL_LABELS:
        fs.absorb(fsmod.fr_to_bytes(evals[lbl]))
    opening_challenge = fs.gen_fr()

    chals = dict(
        alpha=alpha, beta=beta, gamma=gamma,
        eta_a=eta_a, eta_b=eta_b, eta_c=eta_c,
    )
    lcs = build_lcs(n, xsize, k_size, formatted_input, chals, evals)

    # -- combined openings (ref lib.rs:307-320 open_combinations) ---------
    def lc_poly_and_rand(label):
        terms, const, _point, dbound = lcs[label]
        share_terms = []
        pub_len = 1
        share_len = 1
        for coeff, pl in terms:
            coeffs, is_share = polys[pl]
            ln = ps.n_coeffs(coeffs)
            if is_share:
                share_len = max(share_len, ln)
            else:
                pub_len = max(pub_len, ln)
        out_len = max(pub_len, share_len)
        pub_acc = jnp.zeros((out_len, FR.L), jnp.uint32)
        share_acc = None
        blind_acc = None
        shifted_blind_acc = None
        for coeff, pl in terms:
            coeffs, is_share = polys[pl]
            cd = _fr_dev(coeff)
            if is_share:
                term = scheme.scale(ps.pad_to(scheme, coeffs, out_len), cd[None])
                share_acc = term if share_acc is None else scheme.add(share_acc, term)
                rd = rands.get(pl)
                if rd is not None and rd.blind is not None:
                    bt = scheme.scale(rd.blind, cd[None])
                    blind_acc = (
                        bt if blind_acc is None else scheme.add(blind_acc, bt)
                    )
                if rd is not None and rd.shifted_blind is not None:
                    sbt = scheme.scale(rd.shifted_blind, cd[None])
                    shifted_blind_acc = (
                        sbt
                        if shifted_blind_acc is None
                        else scheme.add(shifted_blind_acc, sbt)
                    )
            else:
                padded = jnp.pad(coeffs, ((0, out_len - coeffs.shape[0]), (0, 0)))
                pub_acc = F.add(FR, pub_acc, F.mul(FR, padded, cd[None]))
        if const % P:
            pub_acc = pub_acc.at[0].set(F.add(FR, pub_acc[0], _fr_dev(const)))
        if share_acc is None:
            lc_coeffs = scheme.from_public(pub_acc)
        else:
            lc_coeffs = scheme.shift(share_acc, pub_acc)
        rand = kzg.Randomness(blind=blind_acc, shifted_blind=shifted_blind_acc)
        return (lc_coeffs, rand, dbound)

    beta_entries = [lc_poly_and_rand(l) for l in BETA_LCS]
    gamma_entries = [lc_poly_and_rand(l) for l in GAMMA_LCS]
    pf_beta = kzg.open_combined(scheme, srs, beta_entries, beta, opening_challenge)
    pf_gamma = kzg.open_combined(scheme, srs, gamma_entries, gamma, opening_challenge)

    if hasattr(scheme, "ctx") and scheme.ctx is not None:
        scheme.ctx.assert_checks()

    proof_comms = {
        l: comms[l]
        for l in ("w", "z_a", "z_b", "mask_poly", "t", "g_1", "h_1", "g_2", "h_2")
    }
    return Proof(comms=proof_comms, evals=evals, pf_beta=pf_beta, pf_gamma=pf_gamma)


def _share_map2(scheme, a, b, c, fn):
    """Apply a 3-ary linear concat to share containers of the same scheme."""
    if hasattr(b, "_fields"):
        return type(b)(
            *[fn(getattr(a, f), getattr(b, f), getattr(c, f)) for f in b._fields]
        )
    return fn(a, b, c)


def _share_concat_maybe(scheme, witness_sh, wpad: int):
    if wpad == 0:
        return witness_sh

    def f(arr):
        pad = [(0, 0)] * arr.ndim
        pad[-2] = (0, wpad)
        return jnp.pad(arr, pad)

    return scheme.lin_map(f, witness_sh)


# ---------------------------------------------------------------------------
# Verifier (ref marlin/src/lib.rs:333-451)
# ---------------------------------------------------------------------------

def verify(vk: IndexVerifierKey, public_ints: List[int], proof: Proof) -> bool:
    """public_ints: instance values EXCLUDING the leading one
    (ref lib.rs:341-351 pads and formats)."""
    n, xsize, k_size = vk.n, vk.xsize, vk.k_size
    formatted_input = ([1] + [v % P for v in public_ints])[:xsize]
    formatted_input += [0] * (xsize - len(formatted_input))

    fs = _fs_init(vk.comms, formatted_input)
    for lbl in ("w", "z_a", "z_b", "mask_poly"):
        _absorb_comm(fs, proof.comms[lbl])
    alpha = _sample_outside_domain(fs, n)
    eta_a, eta_b, eta_c = fs.gen_fr(), fs.gen_fr(), fs.gen_fr()
    for lbl in ("t", "g_1", "h_1"):
        _absorb_comm(fs, proof.comms[lbl])
    beta = _sample_outside_domain(fs, n)
    for lbl in ("g_2", "h_2"):
        _absorb_comm(fs, proof.comms[lbl])
    gamma = fs.gen_fr()

    for lbl in EVAL_LABELS:
        fs.absorb(fsmod.fr_to_bytes(proof.evals[lbl]))
    opening_challenge = fs.gen_fr()

    chals = dict(
        alpha=alpha, beta=beta, gamma=gamma,
        eta_a=eta_a, eta_b=eta_b, eta_c=eta_c,
    )
    lcs = build_lcs(n, xsize, k_size, formatted_input, chals, proof.evals)

    all_comms = dict(vk.comms)
    all_comms.update(proof.comms)

    def lc_commitment_and_value(label):
        terms, const, point, dbound = lcs[label]
        acc = None
        shifted = None
        for coeff, pl in terms:
            cm = all_comms[pl]
            acc = H.G1.add(acc, H.G1.scalar_mul(cm.comm, coeff % P))
            if dbound is not None and cm.shifted_comm is not None:
                shifted = H.G1.add(
                    shifted, H.G1.scalar_mul(cm.shifted_comm, coeff % P)
                )
        if const % P:
            acc = H.G1.add(acc, H.G1.scalar_mul(H.G1_GEN, const % P))
        value = proof.evals.get(label, 0)
        return kzg.Commitment(acc, shifted, dbound), value

    ok = True
    beta_items = [lc_commitment_and_value(l) for l in BETA_LCS]
    gamma_items = [lc_commitment_and_value(l) for l in GAMMA_LCS]
    ok &= kzg.check_combined(vk.srs, beta_items, beta, proof.pf_beta, opening_challenge)
    ok &= kzg.check_combined(
        vk.srs, gamma_items, gamma, proof.pf_gamma, opening_challenge
    )
    return bool(ok)
