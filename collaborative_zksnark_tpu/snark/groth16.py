"""Groth16 zkSNARK: setup / prove / verify.

TPU-native re-design of the reference's Groth16 path:
  * setup mirrors ark-groth16's generator (ref groth16/src/generator.rs
    semantics): toxic waste (alpha, beta, gamma, delta, tau) from a seeded
    rng, QAP instance map via Lagrange evaluation at tau (host bigints),
    key queries materialized on-device with fixed-base MSMs.
  * the prover mirrors the reference's *specialized MPC-capable* prover
    (ref mpc-snarks/src/groth/prover.rs:26-178 + groth/r1cs_to_qap.rs:46-113):
    sparse matvec -> iFFT -> coset FFT -> pointwise product (through the
    `hooks.mul_vec` seam, which is a local product for a single prover and a
    batched Beaver product over shares in MPC, ref r1cs_to_qap.rs:92) ->
    divide by the vanishing poly on the coset -> coset iFFT -> 4 MSMs +
    linear assembly.  The zero-check on r is removed exactly as the
    reference does for share-compatibility (groth/prover.rs:14-18).
  * verification runs on the host pairing (small; the reference also
    verifies locally on revealed proofs, ref mpc-snarks/src/proof.rs:141).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra import params as C
from ..algebra import field as F
from ..algebra import hostapi as H
from ..algebra.field import FR
from ..ops import curve as cv
from ..ops import msm as msm_mod
from ..ops import ntt
from ..relations.r1cs import R1CS, sparse_matvec

P = C.R_MOD


# ---------------------------------------------------------------------------
# Keys & proof containers
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ProvingKey:
    # device points
    a_query: cv.JacPoint      # G1, (m,)
    b_g1_query: cv.JacPoint   # G1, (m,)
    b_g2_query: cv.JacPoint   # G2, (m,)
    h_query: cv.JacPoint      # G1, (n-1,)
    l_query: cv.JacPoint      # G1, (num_witness,)
    alpha_g1: cv.JacPoint     # scalar G1 points
    beta_g1: cv.JacPoint
    beta_g2: cv.JacPoint
    delta_g1: cv.JacPoint
    delta_g2: cv.JacPoint
    vk: "VerifyingKey"


@dataclasses.dataclass
class VerifyingKey:
    # host points (verification is host-side)
    alpha_g1: tuple
    beta_g2: tuple
    gamma_g2: tuple
    delta_g2: tuple
    gamma_abc_g1: list  # per instance variable


class Proof(NamedTuple):
    a: cv.JacPoint   # G1 (scalar point)
    b: cv.JacPoint   # G2
    c: cv.JacPoint   # G1


@dataclasses.dataclass
class HostProof:
    a: tuple
    b: tuple
    c: tuple


def _host_affine_g1(xl, yl, zl):
    q = F.FQ.p
    Rinv = pow(1 << (F.LIMB_BITS * F.FQ.L), -1, q)
    x = F.limbs_to_int(xl) * Rinv % q
    y = F.limbs_to_int(yl) * Rinv % q
    z = F.limbs_to_int(zl) * Rinv % q
    if z == 0:
        return None
    zi = pow(z, q - 2, q)
    zi2 = zi * zi % q
    return (x * zi2 % q, y * zi2 * zi % q)


def _host_affine_g2(xl, yl, zl):
    from ..algebra import hostapi as H

    q = F.FQ.p
    Rinv = pow(1 << (F.LIMB_BITS * F.FQ.L), -1, q)
    cvt = lambda a: (
        F.limbs_to_int(a[0]) * Rinv % q,
        F.limbs_to_int(a[1]) * Rinv % q,
    )
    x, y, z = cvt(xl), cvt(yl), cvt(zl)
    if z == (0, 0):
        return None
    zi = H.fq2_inv(z)
    zi2 = H.fq2_mul(zi, zi)
    return (H.fq2_mul(x, zi2), H.fq2_mul(y, H.fq2_mul(zi2, zi)))


def reveal_proof(proof: Proof) -> HostProof:
    """Device proof -> host affine points with ONE device readback (the
    coordinate-wise path costs 9 tunnel round-trips on a remote TPU)."""
    flat = jnp.concatenate([
        proof.a.x.reshape(-1), proof.a.y.reshape(-1), proof.a.z.reshape(-1),
        proof.b.x.reshape(-1), proof.b.y.reshape(-1), proof.b.z.reshape(-1),
        proof.c.x.reshape(-1), proof.c.y.reshape(-1), proof.c.z.reshape(-1),
    ])
    host = np.asarray(flat)
    L = F.FQ.L
    a = _host_affine_g1(host[0:L], host[L:2 * L], host[2 * L:3 * L])
    o = 3 * L
    g2c = lambda lo: (host[lo:lo + L], host[lo + L:lo + 2 * L])
    b = _host_affine_g2(g2c(o), g2c(o + 2 * L), g2c(o + 4 * L))
    o += 6 * L
    c = _host_affine_g1(host[o:o + L], host[o + L:o + 2 * L],
                        host[o + 2 * L:o + 3 * L])
    return HostProof(a, b, c)


# ---------------------------------------------------------------------------
# Setup
# ---------------------------------------------------------------------------

def _lagrange_coeffs_at(tau: int, n: int, omega: int) -> List[int]:
    """L_r(tau) for the size-n radix-2 domain: Z(tau)/n * w^r / (tau - w^r),
    with a host-side Montgomery batch inversion."""
    z = (pow(tau, n, P) - 1) % P
    zn = z * pow(n, P - 2, P) % P
    pows = [1] * n
    for i in range(1, n):
        pows[i] = pows[i - 1] * omega % P
    dens = [(tau - w) % P for w in pows]
    # batch invert
    prefix = [1] * (n + 1)
    for i, d in enumerate(dens):
        prefix[i + 1] = prefix[i] * d % P
    inv_all = pow(prefix[n], P - 2, P)
    invs = [0] * n
    for i in range(n - 1, -1, -1):
        invs[i] = prefix[i] * inv_all % P
        inv_all = inv_all * dens[i] % P
    return [zn * pows[r] % P * invs[r] % P for r in range(n)]


def setup(cs: R1CS, seed: int = 0):
    """Generate (ProvingKey, VerifyingKey).  Host bigint math for the QAP
    instance map; device fixed-base MSMs for the key queries."""
    rng = np.random.default_rng(seed)

    def rand_fr():
        return int.from_bytes(rng.bytes(40), "little") % P

    alpha, beta, gamma, delta, tau = (rand_fr() for _ in range(5))
    ginv = pow(gamma, P - 2, P)
    dinv = pow(delta, P - 2, P)

    a_rows, b_rows, c_rows = cs.padded_rows()
    n_rows = len(a_rows)
    domain = ntt.get_radix2_domain(n_rows)
    n = domain.n
    m = cs.num_variables

    lag = _lagrange_coeffs_at(tau, n, domain.omega)

    u = [0] * m  # A-polys at tau
    v = [0] * m  # B-polys at tau
    w = [0] * m  # C-polys at tau
    for r, row in enumerate(a_rows):
        for col, cf in row:
            u[col] = (u[col] + cf * lag[r]) % P
    for r, row in enumerate(b_rows):
        for col, cf in row:
            v[col] = (v[col] + cf * lag[r]) % P
    for r, row in enumerate(c_rows):
        for col, cf in row:
            w[col] = (w[col] + cf * lag[r]) % P

    zt = (pow(tau, n, P) - 1) % P

    ninst = cs.num_instance
    gamma_abc = [
        (beta * u[i] + alpha * v[i] + w[i]) % P * ginv % P for i in range(ninst)
    ]
    l_scalars = [
        (beta * u[i] + alpha * v[i] + w[i]) % P * dinv % P for i in range(ninst, m)
    ]
    zd = zt * dinv % P
    h_scalars = [0] * (n - 1)
    tp = 1
    for j in range(n - 1):  # incremental tau powers (no per-j modpow)
        h_scalars[j] = tp * zd % P
        tp = tp * tau % P

    fb_g1 = lambda scalars: msm_mod.fixed_base_msm_ints(
        cv.FQ_OPS, H.G1, H.G1_GEN, scalars, c=8
    )
    fb_g2 = lambda scalars: msm_mod.fixed_base_msm_ints(
        cv.FQ2_OPS, H.G2, H.G2_GEN, scalars, c=8
    )

    a_query = fb_g1(u)
    b_g1_query = fb_g1(v)
    b_g2_query = fb_g2(v)
    h_query = fb_g1(h_scalars)
    l_query = fb_g1(l_scalars) if l_scalars else cv.g1_from_host([])
    singles_g1 = fb_g1([alpha, beta, delta])
    singles_g2 = fb_g2([beta, delta, gamma])

    def pick(pts, i):
        return cv.JacPoint(pts.x[i], pts.y[i], pts.z[i])

    vk = VerifyingKey(
        alpha_g1=H.G1.scalar_mul(H.G1_GEN, alpha),
        beta_g2=H.G2.scalar_mul(H.G2_GEN, beta),
        gamma_g2=H.G2.scalar_mul(H.G2_GEN, gamma),
        delta_g2=H.G2.scalar_mul(H.G2_GEN, delta),
        gamma_abc_g1=[H.G1.scalar_mul(H.G1_GEN, s) for s in gamma_abc],
    )
    pk = ProvingKey(
        a_query=a_query,
        b_g1_query=b_g1_query,
        b_g2_query=b_g2_query,
        h_query=h_query,
        l_query=l_query,
        alpha_g1=pick(singles_g1, 0),
        beta_g1=pick(singles_g1, 1),
        beta_g2=pick(singles_g2, 0),
        delta_g1=pick(singles_g1, 2),
        delta_g2=pick(singles_g2, 1),
        vk=vk,
    )
    return pk, vk


# ---------------------------------------------------------------------------
# On-device setup: regenerate the key queries ON the TPU.
#
# Rationale (measured on the axon-tunneled v5e): shipping a precomputed
# 2^20 proving key costs ~350 s (2.1 GB over a ~6 MB/s link) and the
# host-native fixed-base generation costs ~120 s of CPU; the device
# fixed-base kernel regenerates the same keys in seconds once its compile
# is cached, and the only transfers are the (dictionary-coded) circuit
# matrices and a handful of scalars.  Ref analog: ark-groth16 generator.rs
# (same math; the evaluation-at-tau work moves onto the chip).
# ---------------------------------------------------------------------------

def _transposed_rows(rows, m: int):
    """Column-encoded copy of sparse LC rows: out[col] = [(row, cf), ...].
    Turns the Lagrange-coefficient scatter u[col] += cf * lag[r] into a
    gather matvec u = A^T lag that reuses `sparse_matvec`."""
    out = [[] for _ in range(m)]
    for r, row in enumerate(rows):
        for col, cf in row:
            out[col].append((r, cf))
    return out


def _sq_pows(spec, x: int, logn: int) -> np.ndarray:
    """Host Montgomery limb array of [x^(2^0), x^(2^1), ..., x^(2^(logn-1))]."""
    Rint = 1 << (F.LIMB_BITS * spec.L)
    return F.ints_to_limbs(
        [pow(x, 1 << k, spec.p) * Rint % spec.p for k in range(logn)], spec.L
    )


def _pows_device(spec, sq_pows, n: int):
    """[1, x, x^2, ..., x^{n-1}] as a device Montgomery array (n, L):
    log2(n) doubling steps arr <- [arr, arr * x^(2^k)], with sq_pows the
    (logn, L) array of x^(2^k) (may be traced — seed-dependent values are
    passed as arguments so one compiled setup serves every seed).
    Trace-safe (no data-dependent shapes)."""
    logn = n.bit_length() - 1
    assert (1 << logn) == n
    arr = jnp.asarray(np.asarray(spec.one_mont, np.uint32))[None]
    for k in range(logn):
        arr = jnp.concatenate([arr, F.mul(spec, arr, sq_pows[k][None])], axis=0)
    return arr


@functools.lru_cache(maxsize=None)
def _setup_scalar_core(n: int, ninst: int, logn: int):
    """Jitted QAP-evaluation-at-tau core, cached per (domain size, ninst).
    All seed-dependent values arrive as arguments, so the compiled
    executable (and the on-disk XLA cache entry) is reused across seeds."""

    def core(at, bt, ct, consts, omega_sq, tau_sq):
        tau_c, zn_c, beta_c, alpha_c, dinv_c, ginv_c, ztd_c = (
            consts[i][None] for i in range(7)
        )
        # L_r(tau) = (Z(tau)/n) * w^r / (tau - w^r) for the radix-2 domain
        w_pows = _pows_device(FR, omega_sq, n)
        dens = F.sub(FR, tau_c, w_pows)
        invs = F.batch_inv(FR, dens)
        lag = F.mul(FR, F.mul(FR, zn_c, w_pows), invs)
        u = sparse_matvec(at, lag)
        v = sparse_matvec(bt, lag)
        w = sparse_matvec(ct, lag)
        buavw = F.add(FR, F.add(FR, F.mul(FR, beta_c, u),
                                F.mul(FR, alpha_c, v)), w)
        l_scalars = F.mul(FR, dinv_c, buavw[ninst:])
        gabc = F.mul(FR, ginv_c, buavw[:ninst])
        h_scalars = F.mul(FR, ztd_c, _pows_device(FR, tau_sq, n)[: n - 1])
        return u, v, l_scalars, h_scalars, gabc

    return jax.jit(core)


def setup_device(cs: R1CS, seed: int = 0):
    """setup() with the QAP evaluation + key queries computed on-device:
    same group elements as setup() for the same (cs, seed) (Jacobian
    representatives differ; affine values agree)."""
    from ..relations.r1cs import pack_rows

    rng = np.random.default_rng(seed)

    def rand_fr():
        return int.from_bytes(rng.bytes(40), "little") % P

    alpha, beta, gamma, delta, tau = (rand_fr() for _ in range(5))
    ginv = pow(gamma, P - 2, P)
    dinv = pow(delta, P - 2, P)

    a_rows, b_rows, c_rows = cs.padded_rows()
    domain = ntt.get_radix2_domain(len(a_rows))
    n = domain.n
    m = cs.num_variables
    ninst = cs.num_instance

    mats_t = [
        pack_rows(_transposed_rows(rows, m), m)
        for rows in (a_rows, b_rows, c_rows)
    ]

    zt = (pow(tau, n, P) - 1) % P
    ninv = pow(n, P - 2, P)
    zn = zt * ninv % P
    logn = n.bit_length() - 1

    # seed-dependent scalars as ARGUMENTS (one compiled setup per size)
    consts = FR.to_device([tau, zn, beta, alpha, dinv, ginv, zt * dinv % P])
    omega_sq = jnp.asarray(_sq_pows(FR, domain.omega, logn))  # size-only
    tau_sq = jnp.asarray(_sq_pows(FR, tau, logn))

    u, v, l_scalars, h_scalars, gabc = _setup_scalar_core(n, ninst, logn)(
        *mats_t, consts, omega_sq, tau_sq
    )

    fb_g1 = lambda sc: msm_mod.fixed_base_msm(cv.FQ_OPS, H.G1, H.G1_GEN, sc, c=8)
    fb_g2 = lambda sc: msm_mod.fixed_base_msm(cv.FQ2_OPS, H.G2, H.G2_GEN, sc, c=8)

    a_query = fb_g1(u)
    b_g1_query = fb_g1(v)
    b_g2_query = fb_g2(v)
    h_query = fb_g1(h_scalars)
    l_query = fb_g1(l_scalars) if m > ninst else cv.g1_from_host([])

    gamma_abc = [int(x) for x in FR.to_host(gabc)]
    vk = VerifyingKey(
        alpha_g1=H.G1.scalar_mul(H.G1_GEN, alpha),
        beta_g2=H.G2.scalar_mul(H.G2_GEN, beta),
        gamma_g2=H.G2.scalar_mul(H.G2_GEN, gamma),
        delta_g2=H.G2.scalar_mul(H.G2_GEN, delta),
        gamma_abc_g1=[H.G1.scalar_mul(H.G1_GEN, s) for s in gamma_abc],
    )
    singles_g1 = msm_mod.fixed_base_msm_ints(
        cv.FQ_OPS, H.G1, H.G1_GEN, [alpha, beta, delta]
    )
    singles_g2 = msm_mod.fixed_base_msm_ints(
        cv.FQ2_OPS, H.G2, H.G2_GEN, [beta, delta, gamma]
    )

    def pick(pts, i):
        return cv.JacPoint(pts.x[i], pts.y[i], pts.z[i])

    pk = ProvingKey(
        a_query=a_query,
        b_g1_query=b_g1_query,
        b_g2_query=b_g2_query,
        h_query=h_query,
        l_query=l_query,
        alpha_g1=pick(singles_g1, 0),
        beta_g1=pick(singles_g1, 1),
        beta_g2=pick(singles_g2, 0),
        delta_g1=pick(singles_g1, 2),
        delta_g2=pick(singles_g2, 1),
        vk=vk,
    )
    return pk, vk


# ---------------------------------------------------------------------------
# Prover
# ---------------------------------------------------------------------------

class LocalHooks:
    """MPC hook seam (SURVEY.md §7 item 7).  For a single prover every hook
    is a local operation; the MPC layer substitutes Beaver-batched variants
    (ref wire/field.rs:358-497)."""

    def mul_vec(self, x, y):
        """Elementwise product of two Fr vectors (the batch_product hook,
        ref algebra/ff/src/fields/mod.rs:216-220)."""
        return F.mul(FR, x, y)


LOCAL_HOOKS = LocalHooks()


def _witness_map_body(domain, mats, z, mul_vec):
    """QAP witness map body for EAGER call sites (witness_map /
    witness_map_mpc): rides the domain's per-transform jitted cores.
    The fused prover uses _witness_map_tabbed instead (tables as args of
    the one enclosing jit)."""
    a_ev = sparse_matvec(mats[0], z)
    b_ev = sparse_matvec(mats[1], z)
    c_ev = sparse_matvec(mats[2], z)

    a_cos = domain.coset_fft(domain.ifft(a_ev))
    b_cos = domain.coset_fft(domain.ifft(b_ev))
    c_cos = domain.coset_fft(domain.ifft(c_ev))

    ab = mul_vec(a_cos, b_cos)                # [NETWORK in MPC: 1 Beaver round]
    num = F.sub(FR, ab, c_cos)
    zinv = domain.vanishing_on_coset_inv()
    h_cos = F.mul(FR, num, zinv[None])
    h = domain.coset_ifft(h_cos)
    return h[: domain.n - 1]


def _domain_tables(domain):
    """Domain NTT/coset tables as a pytree of device arrays — passed as
    runtime ARGUMENTS to jitted provers.  Closing over them instead bakes
    them into the program as constants: the 2^20 witness map's HLO was
    ~960 MB of inlined twiddles, far over the remote-compile transport's
    body limit (HTTP 413 on the tunnel)."""
    d = domain._dev()
    cd = domain._coset_dev()
    import jax.numpy as _jnp

    return dict(
        perm=d["perm"], twf=d["twf"], twi=d["twi"], ninv=d["ninv"],
        g=cd["g"], ginv=cd["ginv"],
        zinv=_jnp.asarray(domain.vanishing_on_coset_inv()),
    )


def _witness_map_tabbed(domain, tabs, mats, z, mul_vec):
    ifft = lambda x: domain._ifft_core(x, tabs["perm"], tabs["twi"],
                                       tabs["ninv"])
    coset_fft = lambda x: domain._coset_fft_core(x, tabs["perm"],
                                                 tabs["twf"], tabs["g"])
    coset_ifft = lambda x: domain._coset_ifft_core(
        x, tabs["perm"], tabs["twi"], tabs["ninv"], tabs["ginv"])

    a_ev = sparse_matvec(mats[0], z)
    b_ev = sparse_matvec(mats[1], z)
    c_ev = sparse_matvec(mats[2], z)

    a_cos = coset_fft(ifft(a_ev))
    b_cos = coset_fft(ifft(b_ev))
    c_cos = coset_fft(ifft(c_ev))

    ab = mul_vec(a_cos, b_cos)                # [NETWORK in MPC: 1 Beaver round]
    num = F.sub(FR, ab, c_cos)
    h_cos = F.mul(FR, num, tabs["zinv"][None])
    h = coset_ifft(h_cos)
    return h[: domain.n - 1]


def witness_map(cs: R1CS, z, hooks=LOCAL_HOOKS):
    """R1CS assignment -> h(X) coefficients (the QAP witness map).
    Mirrors ref groth/r1cs_to_qap.rs:46-113: matvec, iFFT, coset FFT,
    pointwise product (hook), vanishing divide on coset, coset iFFT."""
    a_rows, _, _ = cs.padded_rows()
    domain = ntt.get_radix2_domain(len(a_rows))
    mats = cs.device_matrices(domain.n)
    return _witness_map_body(domain, mats, z, hooks.mul_vec)


import functools


@functools.lru_cache(maxsize=None)
def _scalar_mul_kernel(fld):
    def f(Ppt: cv.JacPoint, k_mont):
        sc = F.from_mont(FR, k_mont[None])[0]
        zero = msm_mod._scalar_zero_point(
            fld, cv.JacPoint(Ppt.x[None], Ppt.y[None], Ppt.z[None])
        )

        def body(i, acc):
            acc = cv.point_double(fld, acc)
            t = msm_mod.FR_BITS - 1 - i
            limb = jax.lax.dynamic_index_in_dim(sc, t // F.LIMB_BITS, keepdims=False)
            bit = (limb >> (t % F.LIMB_BITS).astype(jnp.uint32)) & 1
            cand = cv.point_add(fld, acc, Ppt)
            return cv.point_select(fld, bit == 1, cand, acc)

        return jax.lax.fori_loop(0, msm_mod.FR_BITS, body, zero)

    return jax.jit(f)


def _scalar_mul_point(fld, Ppt: cv.JacPoint, k_mont):
    """k * P for one device scalar (Montgomery form, shape (L,)) and one
    scalar point: 253-step double-and-add fori (jitted once per field)."""
    return _scalar_mul_kernel(fld)(Ppt, k_mont)


# ---------------------------------------------------------------------------
# Fused single-dispatch prover (the TPU hot path)
#
# On a tunneled TPU every eager op / per-chunk jit call costs ~1 s of
# round-trip latency; the unfused prove pays ~40 such dispatches (~half
# its 2^20 wall).  Here the ENTIRE prove — witness map, all five MSMs,
# blinding assembly — is one jitted program: the four same-shape G1 MSMs
# ride ONE lax.scan over a stacked chunk grid, so the Pippenger body
# compiles once, and the tiny (< _TAIL_MAX) remainders of sizes like
# m = 2^20 + 3 run bit-serially instead of wasting a full padded chunk.
# ---------------------------------------------------------------------------

_TAIL_MAX = 64


def _pad_points(pts: cv.JacPoint, k: int) -> cv.JacPoint:
    padc = lambda a: jnp.concatenate(
        [a, jnp.zeros((k,) + a.shape[1:], a.dtype)], axis=0
    )
    return cv.JacPoint(padc(pts.x), padc(pts.y), padc(pts.z))


def _msm_grid(fld, queries, chunk: int):
    """All MSMs in `queries` (list of (JacPoint, scalars_mont)) as ONE
    lax.scan over a stacked chunk grid (+ inline bit-serial for tiny
    remainders).  Trace-inline; returns one single-point JacPoint per
    query.  The scan body is traced once no matter how many chunks run."""
    # respect the per-field window cap: the Jacobian (G2) path miscompiles
    # on TPU at c=13 with the window-grouping split (ops/msm.py _c_cap)
    c_win = max(4, min(msm_mod._c_cap(fld), chunk.bit_length() - 1 - 5))
    grids_p, grids_s, bounds, tails = [], [], [], {}
    for qi, (pts, sc) in enumerate(queries):
        nq = sc.shape[0]
        nfull, r = divmod(nq, chunk)
        if r > _TAIL_MAX:  # pad the last partial chunk up to a full one
            pad = (nfull + 1) * chunk - nq
            pts = _pad_points(pts, pad)
            sc = jnp.concatenate(
                [sc, jnp.zeros((pad,) + sc.shape[1:], sc.dtype)], axis=0
            )
            nfull, r = nfull + 1, 0
        nb = nfull * chunk
        resh = lambda a: a[:nb].reshape((nfull, chunk) + a.shape[1:])
        if nfull:
            grids_p.append(cv.JacPoint(resh(pts.x), resh(pts.y), resh(pts.z)))
            grids_s.append(resh(sc))
        bounds.append(nfull)
        if r:
            tails[qi] = (
                cv.JacPoint(pts.x[nb:], pts.y[nb:], pts.z[nb:]),
                sc[nb:],
            )
    outs = [None] * len(queries)
    if grids_p:
        gx = jnp.concatenate([g.x for g in grids_p])
        gy = jnp.concatenate([g.y for g in grids_p])
        gz = jnp.concatenate([g.z for g in grids_p])
        gs = jnp.concatenate(grids_s)

        def body(carry, xs):
            px, py, pz, s = xs
            res = msm_mod.msm_pippenger(
                fld, cv.JacPoint(px, py, pz), s, c=c_win
            )
            return carry, (res.x, res.y, res.z)

        _, (rx, ry, rz) = jax.lax.scan(body, 0, (gx, gy, gz, gs))
        lo = 0
        for qi, nfull in enumerate(bounds):
            acc = None
            for t in range(lo, lo + nfull):
                pt = cv.JacPoint(rx[t], ry[t], rz[t])
                acc = pt if acc is None else cv.point_add(fld, acc, pt)
            outs[qi] = acc
            lo += nfull
    for qi, (pts_t, sc_t) in tails.items():
        tr = msm_mod.msm_bitserial(fld, pts_t, sc_t)
        outs[qi] = tr if outs[qi] is None else cv.point_add(fld, outs[qi], tr)
    return outs


@functools.lru_cache(maxsize=None)
def _fused_prove_kernel(n: int, m: int, ninst: int, kshape: tuple,
                        chunk: int):
    """TWO jitted programs — (witness map + the four G1 MSMs + G1/proof
    assembly) and (the G2 MSM + G2 assembly) — instead of one.  A single
    fused 2^20 program's serialized HLO exceeds the remote-compile
    transport's body limit (HTTP 413 observed on the axon tunnel); the
    split roughly halves each request while keeping the dispatch count at
    2 (vs ~40 for the eager path)."""
    domain = ntt.get_radix2_domain(n)
    G1, G2 = cv.FQ_OPS, cv.FQ2_OPS

    def f1(tabs, mats, aq, b1q, hq, lq, singles_g1, z, r_m, s_m):
        alpha_g1, beta_g1, delta_g1 = singles_g1
        h = _witness_map_tabbed(domain, tabs, mats, z,
                                lambda x, y: F.mul(FR, x, y))
        wit = z[ninst:]
        a_acc, b1_acc, h_acc, l_acc = _msm_grid(
            G1, [(aq, z), (b1q, z), (hq, h), (lq, wit)], chunk
        )
        r_delta_g1 = _scalar_mul_inline(G1, delta_g1, r_m)
        s_delta_g1 = _scalar_mul_inline(G1, delta_g1, s_m)
        g_a = cv.point_add(G1, cv.point_add(G1, alpha_g1, a_acc), r_delta_g1)
        g1_b = cv.point_add(G1, cv.point_add(G1, beta_g1, b1_acc), s_delta_g1)
        s_ga = _scalar_mul_inline(G1, g_a, s_m)
        r_gb = _scalar_mul_inline(G1, g1_b, r_m)
        rs = F.mul(FR, r_m[None], s_m[None])[0]
        rs_delta = _scalar_mul_inline(G1, delta_g1, rs)
        g_c = cv.point_add(G1, s_ga, r_gb)
        g_c = cv.point_add(G1, g_c, cv.point_neg(G1, rs_delta))
        g_c = cv.point_add(G1, g_c, l_acc)
        g_c = cv.point_add(G1, g_c, h_acc)
        return g_a, g_c

    def f2(b2q, beta_g2, delta_g2, z, s_m):
        (b2_acc,) = _msm_grid(G2, [(b2q, z)], chunk)
        s_delta_g2 = _scalar_mul_inline(G2, delta_g2, s_m)
        return cv.point_add(G2, cv.point_add(G2, beta_g2, b2_acc), s_delta_g2)

    return jax.jit(f1), jax.jit(f2)


def _prove_fused(pk: ProvingKey, cs: R1CS, z, r_mont, s_mont) -> Proof:
    a_rows, _, _ = cs.padded_rows()
    domain = ntt.get_radix2_domain(len(a_rows))
    mats = cs.device_matrices(domain.n)
    kshape = tuple(int(mt[0].shape[1]) for mt in mats)
    # chunk caps HBM per MSM program; don't pad small circuits up to the
    # global cap (a 2^14 prove would run its G2 MSM over 2^18 slots)
    chunk = min(msm_mod._CHUNK, 1 << max(8, (2 * domain.n - 1).bit_length() - 1))
    kern_g1, kern_g2 = _fused_prove_kernel(
        domain.n, cs.num_variables, cs.num_instance, kshape, chunk
    )
    g_a, g_c = kern_g1(
        _domain_tables(domain), tuple(mats),
        pk.a_query, pk.b_g1_query, pk.h_query, pk.l_query,
        (pk.alpha_g1, pk.beta_g1, pk.delta_g1),
        z, r_mont, s_mont,
    )
    g2_b = kern_g2(pk.b_g2_query, pk.beta_g2, pk.delta_g2, z, s_mont)
    return Proof(a=g_a, b=g2_b, c=g_c)


def _use_fused() -> bool:
    import os as _os

    flag = _os.environ.get("CZTPU_FUSED")
    if flag is not None:
        return flag != "0"
    return jax.default_backend() != "cpu"


def prove(pk: ProvingKey, cs: R1CS, z, r_mont, s_mont, hooks=LOCAL_HOOKS) -> Proof:
    """z: full assignment (m, L) device Fr (values or shares); r_mont/s_mont:
    blinding scalars (L,) (shared randomness in MPC — no zero-check, ref
    groth/prover.rs:116 removal)."""
    if hooks is LOCAL_HOOKS and _use_fused():
        return _prove_fused(pk, cs, z, r_mont, s_mont)
    h = witness_map(cs, z, hooks)

    ninst = cs.num_instance
    wit = z[ninst:]

    h_acc = msm_mod.msm(cv.FQ_OPS, pk.h_query, h)
    l_acc = msm_mod.msm(cv.FQ_OPS, pk.l_query, wit)
    a_acc = msm_mod.msm(cv.FQ_OPS, pk.a_query, z)
    b1_acc = msm_mod.msm(cv.FQ_OPS, pk.b_g1_query, z)
    b2_acc = msm_mod.msm(cv.FQ2_OPS, pk.b_g2_query, z)

    r_delta_g1 = _scalar_mul_point(cv.FQ_OPS, pk.delta_g1, r_mont)
    s_delta_g1 = _scalar_mul_point(cv.FQ_OPS, pk.delta_g1, s_mont)
    s_delta_g2 = _scalar_mul_point(cv.FQ2_OPS, pk.delta_g2, s_mont)

    g_a = cv.point_add(cv.FQ_OPS, cv.point_add(cv.FQ_OPS, pk.alpha_g1, a_acc), r_delta_g1)
    g1_b = cv.point_add(cv.FQ_OPS, cv.point_add(cv.FQ_OPS, pk.beta_g1, b1_acc), s_delta_g1)
    g2_b = cv.point_add(cv.FQ2_OPS, cv.point_add(cv.FQ2_OPS, pk.beta_g2, b2_acc), s_delta_g2)

    # g_c = s*g_a + r*g1_b - r*s*delta + l_acc + h_acc
    s_ga = _scalar_mul_point(cv.FQ_OPS, g_a, s_mont)
    r_gb = _scalar_mul_point(cv.FQ_OPS, g1_b, r_mont)
    rs = F.mul(FR, r_mont[None], s_mont[None])[0]
    rs_delta = _scalar_mul_point(cv.FQ_OPS, pk.delta_g1, rs)
    g_c = cv.point_add(cv.FQ_OPS, s_ga, r_gb)
    g_c = cv.point_add(cv.FQ_OPS, g_c, cv.point_neg(cv.FQ_OPS, rs_delta))
    g_c = cv.point_add(cv.FQ_OPS, g_c, l_acc)
    g_c = cv.point_add(cv.FQ_OPS, g_c, h_acc)

    return Proof(a=g_a, b=g2_b, c=g_c)


# ---------------------------------------------------------------------------
# Data-axis-sharded prover (SURVEY.md §2.3/§5.7: the reference parallelizes
# MSM/FFT inside every prove with rayon — ec/src/msm/variable_base.rs:36,
# poly/src/domain/radix2/fft.rs:81+; here the same axes shard over a mesh
# "data" axis with 4-step NTTs + gathered-fold MSMs.  Composes with the MPC
# "party" axis: run under a ("party", "data") mesh.)
# ---------------------------------------------------------------------------

def _split_dims(n: int, n_shards: int):
    """n = n1 * n2 with both divisible by n_shards (n, n_shards pow2)."""
    k = n.bit_length() - 1
    n1 = 1 << (k // 2)
    n2 = n // n1
    assert n1 % n_shards == 0 and n2 % n_shards == 0, (n, n_shards)
    return n1, n2


def witness_map_sharded(cs: R1CS, scheme, z_sh, data_axis: str, n_data: int):
    """The QAP witness map with every transform a 4-step sharded NTT over
    the data axis (runs INSIDE shard_map).  z_sh: replicated-across-data
    assignment (share or plain, (m, L)).  Returns (h_local, (n1, n2)):
    this shard's h block in the odd-chain colshard layout (n2, n1/S, L);
    pair static point queries via ntt_sharded.colshard_index_map."""
    from ..ops import ntt_sharded as nsh

    a_rows, _, _ = cs.padded_rows()
    domain = ntt.get_radix2_domain(len(a_rows))
    n = domain.n
    n1, n2 = _split_dims(n, n_data)
    mats = cs.device_matrices(n)
    lin = scheme.lin_map

    def shard_cols(vec):
        return nsh.colshard_slice(vec, n1, n2, data_axis, n_data)

    def chain2(ev_local):
        t = nsh.transform_colshard(
            ev_local, n1, n2, data_axis, n_data, inverse=True
        )
        return nsh.transform_colshard(
            t, n2, n1, data_axis, n_data, coset="fwd"
        )

    a_cos = lin(lambda arr: chain2(shard_cols(sparse_matvec(mats[0], arr))), z_sh)
    b_cos = lin(lambda arr: chain2(shard_cols(sparse_matvec(mats[1], arr))), z_sh)
    c_cos = lin(lambda arr: chain2(shard_cols(sparse_matvec(mats[2], arr))), z_sh)

    ab = scheme.mul(a_cos, b_cos)          # [NETWORK over party axis only]
    num = scheme.sub(ab, c_cos)
    zinv = domain.vanishing_on_coset_inv()
    h_cos = lin(lambda arr: F.mul(FR, arr, zinv[None]), num)
    h_loc = lin(
        lambda arr: nsh.transform_colshard(
            arr, n1, n2, data_axis, n_data, inverse=True, coset="inv"
        ),
        h_cos,
    )
    return h_loc, (n1, n2)


def prove_data_sharded(pk: ProvingKey, cs: R1CS, z, r_mont, s_mont, mesh,
                       data_axis: str = "data") -> Proof:
    """Single-prover Groth16 prove with the witness-map NTTs and all five
    MSMs sharded over `mesh`'s data axis.  Same proof as `prove` (bit-exact
    given the same randomness)."""
    from functools import partial

    from jax.sharding import PartitionSpec as Pspec
    from jax.experimental.shard_map import shard_map

    from ..mpc.local import LocalScheme
    from ..ops import ntt_sharded as nsh
    from ..parallel import sharded as shd

    S = mesh.shape[data_axis]
    a_rows, _, _ = cs.padded_rows()
    domain = ntt.get_radix2_domain(len(a_rows))
    n = domain.n
    n1, n2 = _split_dims(n, S)
    m = cs.num_variables
    ninst = cs.num_instance

    # static point blocking (outside shard_map)
    h_blocks = shd.block_points(pk.h_query, nsh.colshard_index_map(n1, n2, S))
    zmap = shd.block_index_map(m, S)
    wmap = shd.block_index_map(m - ninst, S)
    a_blocks = shd.block_points(pk.a_query, zmap)
    b1_blocks = shd.block_points(pk.b_g1_query, zmap)
    b2_blocks = shd.block_points(pk.b_g2_query, zmap)
    l_blocks = shd.block_points(pk.l_query, wmap)
    m_loc = zmap.shape[1]
    w_loc = wmap.shape[1]
    z_pad = jnp.pad(z, ((0, S * m_loc - m), (0, 0)))

    local = LocalScheme()
    pt_spec = cv.JacPoint(Pspec(data_axis), Pspec(data_axis), Pspec(data_axis))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(Pspec(), Pspec(), Pspec(),
                  pt_spec, pt_spec, pt_spec, pt_spec, pt_spec),
        out_specs=tuple(
            cv.JacPoint(Pspec(), Pspec(), Pspec()) for _ in range(3)
        ),
        check_rep=False,
    )
    def step(z_full, r_m, s_m, hb, ab, b1b, b2b, lb):
        unblk = lambda p: cv.JacPoint(p.x[0], p.y[0], p.z[0])
        hb, ab, b1b, b2b, lb = map(unblk, (hb, ab, b1b, b2b, lb))
        h_loc, _ = witness_map_sharded(cs, local, z_full[:m], data_axis, S)
        h_flat = h_loc.reshape(-1, FR.L)
        h_acc = shd.msm_data_sharded(cv.FQ_OPS, hb, h_flat, data_axis)

        didx = jax.lax.axis_index(data_axis)
        z_loc = jax.lax.dynamic_slice_in_dim(z_full, didx * m_loc, m_loc, 0)
        wit_full = jnp.pad(z_full[ninst:m], ((0, S * w_loc - (m - ninst)), (0, 0)))
        w_sl = jax.lax.dynamic_slice_in_dim(wit_full, didx * w_loc, w_loc, 0)
        a_acc = shd.msm_data_sharded(cv.FQ_OPS, ab, z_loc, data_axis)
        b1_acc = shd.msm_data_sharded(cv.FQ_OPS, b1b, z_loc, data_axis)
        b2_acc = shd.msm_data_sharded(cv.FQ2_OPS, b2b, z_loc, data_axis)
        l_acc = shd.msm_data_sharded(cv.FQ_OPS, lb, w_sl, data_axis)

        r_delta_g1 = _scalar_mul_inline(cv.FQ_OPS, pk.delta_g1, r_m)
        s_delta_g1 = _scalar_mul_inline(cv.FQ_OPS, pk.delta_g1, s_m)
        s_delta_g2 = _scalar_mul_inline(cv.FQ2_OPS, pk.delta_g2, s_m)
        g_a = cv.point_add(cv.FQ_OPS, cv.point_add(cv.FQ_OPS, pk.alpha_g1, a_acc), r_delta_g1)
        g1_b = cv.point_add(cv.FQ_OPS, cv.point_add(cv.FQ_OPS, pk.beta_g1, b1_acc), s_delta_g1)
        g2_b = cv.point_add(cv.FQ2_OPS, cv.point_add(cv.FQ2_OPS, pk.beta_g2, b2_acc), s_delta_g2)
        s_ga = _scalar_mul_inline(cv.FQ_OPS, g_a, s_m)
        r_gb = _scalar_mul_inline(cv.FQ_OPS, g1_b, r_m)
        rs = F.mul(FR, r_m[None], s_m[None])[0]
        rs_delta = _scalar_mul_inline(cv.FQ_OPS, pk.delta_g1, rs)
        g_c = cv.point_add(cv.FQ_OPS, s_ga, r_gb)
        g_c = cv.point_add(cv.FQ_OPS, g_c, cv.point_neg(cv.FQ_OPS, rs_delta))
        g_c = cv.point_add(cv.FQ_OPS, g_c, l_acc)
        g_c = cv.point_add(cv.FQ_OPS, g_c, h_acc)
        return g_a, g2_b, g_c

    with mesh:
        g_a, g2_b, g_c = jax.jit(step)(
            z_pad, r_mont, s_mont, h_blocks, a_blocks, b1_blocks, b2_blocks,
            l_blocks,
        )
    return Proof(a=g_a, b=g2_b, c=g_c)


def _scalar_mul_inline(fld, Ppt: cv.JacPoint, k_mont):
    """Unjitted scalar mul (for use inside an outer trace/shard_map)."""
    sc = F.from_mont(FR, k_mont[None])[0]
    zero = msm_mod._scalar_zero_point(
        fld, cv.JacPoint(Ppt.x[None], Ppt.y[None], Ppt.z[None])
    )

    def body(i, acc):
        acc = cv.point_double(fld, acc)
        t = msm_mod.FR_BITS - 1 - i
        limb = jax.lax.dynamic_index_in_dim(sc, t // F.LIMB_BITS, keepdims=False)
        bit = (limb >> (t % F.LIMB_BITS).astype(jnp.uint32)) & 1
        cand = cv.point_add(fld, acc, Ppt)
        return cv.point_select(fld, bit == 1, cand, acc)

    return jax.lax.fori_loop(0, msm_mod.FR_BITS, body, zero)


# ---------------------------------------------------------------------------
# MPC prover: the same pipeline over secret-shared assignments
# (ref flow: mpc-snarks/src/proof.rs:112-143 + groth/prover.rs over
#  MpcPairingEngine shares; SURVEY.md §3.1)
# ---------------------------------------------------------------------------

def _maybe_vmap(fn, arr):
    """Apply a rows-leading transform, vmapping over a party axis if present
    (share arrays are (P, rows, L) in the stacked backend)."""
    if arr.ndim == 3:
        return jax.vmap(fn)(arr)
    return fn(arr)


def witness_map_mpc(cs: R1CS, scheme, z_sh):
    """QAP witness map over shares: every step is local linear algebra
    except the single batched pointwise product, which runs the scheme's
    multiplication protocol (ref groth/r1cs_to_qap.rs:92 batch_product)."""
    a_rows, _, _ = cs.padded_rows()
    domain = ntt.get_radix2_domain(len(a_rows))
    mats = cs.device_matrices(domain.n)

    lin = scheme.lin_map
    a_ev = lin(lambda arr: sparse_matvec(mats[0], arr), z_sh)
    b_ev = lin(lambda arr: sparse_matvec(mats[1], arr), z_sh)
    c_ev = lin(lambda arr: sparse_matvec(mats[2], arr), z_sh)

    a_cos = lin(lambda arr: _maybe_vmap(domain.coset_fft, _maybe_vmap(domain.ifft, arr)), a_ev)
    b_cos = lin(lambda arr: _maybe_vmap(domain.coset_fft, _maybe_vmap(domain.ifft, arr)), b_ev)
    c_cos = lin(lambda arr: _maybe_vmap(domain.coset_fft, _maybe_vmap(domain.ifft, arr)), c_ev)

    ab = scheme.mul(a_cos, b_cos)             # [NETWORK: 1 batched round]
    num = scheme.sub(ab, c_cos)
    zinv = domain.vanishing_on_coset_inv()
    h_cos = lin(lambda arr: F.mul(FR, arr, zinv[None]), num)
    h = lin(lambda arr: _maybe_vmap(domain.coset_ifft, arr), h_cos)
    return lin(lambda arr: arr[..., : domain.n - 1, :], h)


def prove_mpc(pk: ProvingKey, cs: R1CS, scheme, z_sh, r_sh, s_sh) -> Proof:
    """Collaborative prove over a shared assignment.  Mirrors `prove` with
    every value a share; only the Beaver product, the scalar openings inside
    g_scale_shared, and the final proof reveal communicate."""
    G1 = cv.FQ_OPS
    G2 = cv.FQ2_OPS
    h = witness_map_mpc(cs, scheme, z_sh)

    ninst = cs.num_instance
    wit = scheme.lin_map(lambda a: a[..., ninst:, :], z_sh)

    h_acc = scheme.g_msm(G1, pk.h_query, h)
    l_acc = scheme.g_msm(G1, pk.l_query, wit)
    a_acc = scheme.g_msm(G1, pk.a_query, z_sh)
    b1_acc = scheme.g_msm(G1, pk.b_g1_query, z_sh)
    b2_acc = scheme.g_msm(G2, pk.b_g2_query, z_sh)

    r_delta = scheme.g_from_scalar_mul(G1, pk.delta_g1, r_sh)
    s_delta = scheme.g_from_scalar_mul(G1, pk.delta_g1, s_sh)
    s_delta2 = scheme.g_from_scalar_mul(G2, pk.delta_g2, s_sh)

    g_a = scheme.g_shift(G1, scheme.g_add(G1, a_acc, r_delta), pk.alpha_g1)
    g1_b = scheme.g_shift(G1, scheme.g_add(G1, b1_acc, s_delta), pk.beta_g1)
    g2_b = scheme.g_shift(G2, scheme.g_add(G2, b2_acc, s_delta2), pk.beta_g2)

    s_ga = scheme.g_scale_shared(G1, g_a, s_sh)       # [NETWORK: Beaver/king]
    r_gb = scheme.g_scale_shared(G1, g1_b, r_sh)      # [NETWORK]
    rs = scheme.mul(r_sh, s_sh)                       # [NETWORK]
    rs_delta = scheme.g_from_scalar_mul(G1, pk.delta_g1, rs)

    neg = lambda sh: (
        sh._replace(pt=cv.point_neg(G1, sh.pt), mac=cv.point_neg(G1, sh.mac))
        if hasattr(sh, "mac")
        else cv.point_neg(G1, sh)
    )
    g_c = scheme.g_add(G1, s_ga, r_gb)
    g_c = scheme.g_add(G1, g_c, neg(rs_delta))
    g_c = scheme.g_add(G1, g_c, l_acc)
    g_c = scheme.g_add(G1, g_c, h_acc)

    # reveal the proof (ref proof.rs:135 proof.reveal() -> broadcast + checks)
    a_pub = scheme.g_reveal(G1, g_a)
    b_pub = scheme.g_reveal(G2, g2_b)
    c_pub = scheme.g_reveal(G1, g_c)
    scheme.ctx.assert_checks()
    return Proof(a=a_pub, b=b_pub, c=c_pub)


# ---------------------------------------------------------------------------
# Verifier (host)
# ---------------------------------------------------------------------------

def verify(vk: VerifyingKey, proof: HostProof, public_inputs: List[int]) -> bool:
    """e(A,B) == e(alpha,beta) * e(sum x_i gammaABC_i, gamma) * e(C, delta).
    public_inputs excludes the leading ONE."""
    xs = [1] + [x % P for x in public_inputs]
    assert len(xs) == len(vk.gamma_abc_g1)
    acc = None
    for x, pt in zip(xs, vk.gamma_abc_g1):
        acc = H.G1.add(acc, H.G1.scalar_mul(pt, x))
    # e(-A,B) e(alpha,beta) e(acc,gamma) e(C,delta) == 1 (one shared
    # final exponentiation; native C++ when available)
    prod = H.multi_pairing(
        [
            (H.G1.neg(proof.a), proof.b),
            (vk.alpha_g1, vk.beta_g2),
            (acc, vk.gamma_g2),
            (proof.c, vk.delta_g2),
        ]
    )
    return prod == H.FQ12_ONE
