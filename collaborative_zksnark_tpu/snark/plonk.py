"""Plonk (CS251 lecture-17 formulation) over KZG commitments, MPC-capable.

Re-design of the reference's from-scratch mpc-plonk prover/verifier
(behavioral spec: ref mpc-plonk/src/lib.rs — prove = commit(P) ->
prove_public (vanishing-quotient vs. the input poly, :260-293) ->
prove_gates (S*(p+pw) + (1-S)*p*pw - pww = Q * Z_gates, :295-338) ->
prove_wiring (ratio poly L1 with grand product via partial products,
quotient L2, :104-258); the verifier mirrors at :431-583; Fiat-Shamir
absorbs every publicized commitment, ref :371-402).

All polynomial arithmetic over SHARES uses only: local NTTs/coset NTTs,
scale-by-public, gathers — plus exactly the hook protocols: one batched
share-product per quotient (ref batch_product_in_place), one batched share
division (L1), one masked prefix-product (the grand product), and KZG
commits/opens (MSMs + reveals).  Divisions are never long divisions: every
quotient is computed on a coset where the divisor's public evaluations are
invertible, then interpolated (exactness argued per-quotient below).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra import params as C
from ..algebra import field as F
from ..algebra import hostapi as H
from ..algebra.field import FR
from ..mpc.local import LocalScheme
from ..ops import ntt
from ..relations.plonk_circuit import CircuitLayout, PlonkCircuit
from ..utils import fs as fsmod
from . import kzg

P = C.R_MOD
Open = Tuple[int, tuple]  # (y, kzg proof point)


# ---------------------------------------------------------------------------
# Keys
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ProverKey:
    layout: CircuitLayout
    srs: kzg.KzgSrs
    s_cmt: tuple
    w_cmt: tuple


@dataclasses.dataclass
class VerifierKey:
    srs: kzg.KzgSrs
    s_cmt: tuple
    w_cmt: tuple
    n_gates: int
    wires_gen: int
    gates_gen: int
    public_indices: Dict[str, int]


def universal_setup(max_gates: int, seed: int = 1) -> kzg.KzgSrs:
    """SRS big enough for the gate quotient (degree ~6n; ref
    CircuitLayout::degree_bound = 2*|wires| - 1)."""
    return kzg.setup(6 * max_gates, seed=seed)


def circuit_setup(srs: kzg.KzgSrs, layout: CircuitLayout):
    """Commit to the public circuit polynomials S and W
    (ref mpc-plonk/src/lib.rs:42-80)."""
    local = LocalScheme()
    s_cmt = kzg.commit_and_reveal(local, srs, layout.s_coeffs)
    w_cmt = kzg.commit_and_reveal(local, srs, layout.w_coeffs)
    pk = ProverKey(layout=layout, srs=srs, s_cmt=s_cmt, w_cmt=w_cmt)
    vk = VerifierKey(
        srs=srs,
        s_cmt=s_cmt,
        w_cmt=w_cmt,
        n_gates=layout.n_gates,
        wires_gen=layout.wires_domain.omega,
        gates_gen=layout.gates_domain.omega,
        public_indices=dict(layout.public_indices),
    )
    return pk, vk


# ---------------------------------------------------------------------------
# Share-poly helpers (all local)
# ---------------------------------------------------------------------------

def _pad_coeffs(arr, n):
    m = arr.shape[-2]
    if m == n:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[-2] = (0, n - m)
    return jnp.pad(arr, pad)


def _distribute_powers(coeffs, g: int):
    """coeffs_i *= g^i (evaluates p(gX); public g)."""
    n = coeffs.shape[-2]
    pows = [1] * n
    for i in range(1, n):
        pows[i] = pows[i - 1] * g % P
    return F.mul(FR, coeffs, FR.to_device(pows))


def _public_evals_inv(vals):
    """Batch inverse of a public int list -> device Montgomery array.
    Montgomery's trick: one modpow + 3(n-1) host mults (a per-element
    pow here cost ~1 s per call at 2^11 — it dominated the CPU prove)."""
    n = len(vals)
    safe = [v % P if v % P != 0 else 1 for v in vals]
    prefix = [1] * (n + 1)
    for i, v in enumerate(safe):
        prefix[i + 1] = prefix[i] * v % P
    inv_all = pow(prefix[n], P - 2, P)
    invs = [0] * n
    for i in range(n - 1, -1, -1):
        invs[i] = prefix[i] * inv_all % P if vals[i] % P != 0 else 0
        inv_all = inv_all * safe[i] % P
    return FR.to_device(invs)


# ---------------------------------------------------------------------------
# Prover
# ---------------------------------------------------------------------------

class Prover:
    def __init__(self, scheme, pk: ProverKey):
        self.scheme = scheme
        self.pk = pk
        self.fs = fsmod.FiatShamir()

    # commit + publicize + absorb (ref lib.rs:371-402).  Witness-derived
    # polynomials get HIDING commitments (blinding polys over the gamma
    # powers, ref kzg10/mod.rs:141-166 hiding_bound) so their openings are
    # zero-knowledge; hb = number of openings of that polynomial.
    def _commit(self, coeffs_sh, hb: int = 1):
        cmt, rand = kzg.commit_labeled(
            self.scheme, self.pk.srs, coeffs_sh, hiding_bound=hb
        )
        self.fs.absorb(fsmod.g1_to_bytes(cmt.comm))
        return cmt.comm, rand

    # open + publicize y (ref lib.rs:343-366)
    def _open(self, coeffs_sh, x: int, rand=None) -> Open:
        return kzg.open_share(self.scheme, self.pk.srs, coeffs_sh, x, rand=rand)

    def _open_public(self, coeffs_pub, x: int) -> Open:
        return kzg.open_share(LocalScheme(), self.pk.srs, coeffs_pub, x)

    def prove(self, values_sh, public_values: Dict[str, int]):
        sch = self.scheme
        lay = self.pk.layout
        wires = lay.wires_domain
        gates = lay.gates_domain
        n = lay.n_gates
        K = 3 * n
        eta = wires.omega

        p_evals = lay.p_evals_from_values(sch, values_sh)
        p_coeffs = sch.lin_map(lambda a: _vifft(wires, a), p_evals)
        p_cmt, self._p_rand = self._commit(p_coeffs, hb=6)

        public = self._prove_public(p_coeffs, public_values)
        gatespf = self._prove_gates(p_coeffs)
        wiring = self._prove_wiring(p_coeffs, p_evals)
        return {
            "p_cmt": p_cmt,
            "public": public,
            "gates": gatespf,
            "wiring": wiring,
        }

    # -- public-input consistency (ref lib.rs:260-293) ---------------------
    def _prove_public(self, p_coeffs, public_values: Dict[str, int]):
        lay = self.pk.layout
        wires = lay.wires_domain
        eta_pows = wires.elements()
        pts = [
            (eta_pows[lay.public_indices[name]], public_values[name] % P)
            for name in sorted(lay.public_indices)
        ]
        v_poly = _host_interpolate(pts)              # public, small
        z_roots = [x for x, _ in pts]
        # q = (p - v) / prod(X - root): the roots lie on the wires domain,
        # so divide on the wires COSET (divisor nonzero there); deg q =
        # 3n - 1 - #pub < 3n -> the coset interpolation is exact.
        p_cos = self.scheme.lin_map(lambda a: _vcoset_fft(wires, a), p_coeffs)
        g = C.FR_GENERATOR
        coset_pts = [g * w % P for w in eta_pows]
        v_cos_pub = FR.to_device([_host_eval(v_poly, x) for x in coset_pts])
        z_cos_inv = _public_evals_inv(
            [_host_eval_roots(z_roots, x) for x in coset_pts]
        )
        # (p - v) via a public shift (king-rule aware), then public scale
        diff = self.scheme.shift(p_cos, F.neg(FR, v_cos_pub))
        num_cos = self.scheme.scale(diff, z_cos_inv)
        q_coeffs = self.scheme.lin_map(lambda a: _vcoset_ifft(wires, a), num_cos)
        q_cmt, q_rand = self._commit(q_coeffs)
        x = self.fs.gen_fr()
        q_open = self._open(q_coeffs, x, q_rand)
        p_open = self._open(p_coeffs, x, self._p_rand)
        return {"q_cmt": q_cmt, "q_open": q_open, "p_open": p_open, "x": x}

    # -- gate constraints (ref lib.rs:295-338) -----------------------------
    def _prove_gates(self, p_coeffs):
        sch = self.scheme
        lay = self.pk.layout
        wires = lay.wires_domain
        gates = lay.gates_domain
        n = lay.n_gates
        eta = wires.omega
        # d = S*(p + pw) + (1 - S)*(p * pw) - pww, deg <= 7n-3: evaluate all
        # factors on a coset of an 8n radix-2 domain, ONE share-product, then
        # interpolate q = d / Z_gates exactly (deg q <= 6n-3 < 8n).
        big = ntt.get_radix2_domain(8 * n)
        pw_coeffs = sch.lin_map(lambda a: _distribute_powers(a, eta), p_coeffs)
        pww_coeffs = sch.lin_map(
            lambda a: _distribute_powers(a, eta * eta % P), p_coeffs
        )
        pad = lambda a: _pad_coeffs(a, big.n)
        p8 = sch.lin_map(lambda a: _vcoset_fft(big, pad(a)), p_coeffs)
        pw8 = sch.lin_map(lambda a: _vcoset_fft(big, pad(a)), pw_coeffs)
        pww8 = sch.lin_map(lambda a: _vcoset_fft(big, pad(a)), pww_coeffs)
        s8 = big.coset_fft(_pad_coeffs(lay.s_coeffs, big.n))   # public

        prod = sch.mul(p8, pw8)                    # [NETWORK: 1 round]
        one = jnp.asarray(FR.one_mont)
        one_minus_s = F.sub(FR, jnp.broadcast_to(one, s8.shape).astype(jnp.uint32), s8)
        # d8 = S*(p8 + pw8) + (1-S)*prod - pww8  (public scales: share-safe)
        t1 = sch.scale(sch.add(p8, pw8), s8)
        t2 = sch.scale(prod, one_minus_s)
        d8 = sch.sub(sch.add(t1, t2), pww8)
        # divide by Z_gates on the coset (public, nonzero)
        g = C.FR_GENERATOR
        zg_inv = _public_evals_inv(
            [
                (pow(g * w % P, n, P) - 1) % P
                for w in big.elements()
            ]
        )
        q8 = sch.lin_map(lambda a: F.mul(FR, a, zg_inv), d8)
        q_coeffs = sch.lin_map(
            lambda a: _vcoset_ifft(big, a)[..., : 6 * n, :], q8
        )
        q_cmt, q_rand = self._commit(q_coeffs)
        x = self.fs.gen_fr()
        s_open = self._open_public(lay.s_coeffs, x)
        p_open = self._open(p_coeffs, x, self._p_rand)
        q_open = self._open(q_coeffs, x, q_rand)
        p_w_open = self._open(p_coeffs, eta * x % P, self._p_rand)
        p_w2_open = self._open(p_coeffs, eta * eta % P * x % P, self._p_rand)
        return {
            "q_cmt": q_cmt,
            "s_open": s_open,
            "p_open": p_open,
            "q_open": q_open,
            "p_w_open": p_w_open,
            "p_w2_open": p_w2_open,
            "x": x,
        }

    # -- wiring / copy constraints (ref lib.rs:104-258) --------------------
    def _prove_wiring(self, p_coeffs, p_evals):
        sch = self.scheme
        lay = self.pk.layout
        wires = lay.wires_domain
        K = wires.n
        eta = wires.omega
        y = self.fs.gen_fr()
        z = self.fs.gen_fr()

        w_evals_pub = wires.fft(lay.w_coeffs)  # public
        y_dev = FR.to_device([y])[0]
        z_dev = FR.to_device([z])[0]
        yw = F.mul(FR, w_evals_pub, y_dev[None])
        yw_z = F.add(FR, yw, jnp.broadcast_to(z_dev, yw.shape).astype(jnp.uint32))
        num_evals = sch.shift(p_evals, yw_z)
        yx_z = FR.to_device([(y * w + z) % P for w in wires.elements()])
        den_evals = sch.shift(p_evals, yx_z)

        l1_evals = sch.div(num_evals, den_evals)   # [NETWORK: batched]
        l1_coeffs = sch.lin_map(lambda a: _vifft(wires, a), l1_evals)
        l1_cmt, l1_rand = self._commit(l1_coeffs, hb=2)
        prod_pf = self._prove_unit_product(l1_coeffs, l1_evals, l1_rand)

        # l2: q2 = (l1*den - num)/Z_wires on the wires coset; deg q2 <=
        # 3n-2 < 3n so interpolation is exact (values of l1*den at coset
        # points are pointwise-true).
        # num poly = p + y*W + z ; den poly = p + y*X + z  (coefficient-level
        # public shifts, king-rule aware)
        yw_poly = F.mul(FR, lay.w_coeffs, y_dev[None])
        yw_poly = yw_poly.at[0].set(F.add(FR, yw_poly[0], z_dev))
        num_coeffs = sch.shift(p_coeffs, yw_poly)
        lin_poly = _pad_coeffs(FR.to_device([z, y]), K)
        den_coeffs = sch.shift(p_coeffs, lin_poly)
        l1_cos = sch.lin_map(lambda a: _vcoset_fft(wires, a), l1_coeffs)
        den_cos = sch.lin_map(lambda a: _vcoset_fft(wires, a), den_coeffs)
        num_cos = sch.lin_map(lambda a: _vcoset_fft(wires, a), num_coeffs)
        ld = sch.mul(l1_cos, den_cos)              # [NETWORK: 1 round]
        diff = sch.sub(ld, num_cos)
        zw_inv_const = _coset_vanishing_inv(K)
        q2_cos = sch.lin_map(lambda a: F.mul(FR, a, zw_inv_const[None]), diff)
        q2_coeffs = sch.lin_map(lambda a: _vcoset_ifft(wires, a), q2_cos)
        q2_cmt, q2_rand = self._commit(q2_coeffs)
        x = self.fs.gen_fr()
        q2_open = self._open(q2_coeffs, x, q2_rand)
        w_open = self._open_public(lay.w_coeffs, x)
        l1_open = self._open(l1_coeffs, x, l1_rand)
        p_open = self._open(p_coeffs, x, self._p_rand)
        return {
            "y": y,
            "z": z,
            "l1_cmt": l1_cmt,
            "prod_pf": prod_pf,
            "l2_q_cmt": q2_cmt,
            "l2_q_open": q2_open,
            "w_open": w_open,
            "l1_open": l1_open,
            "p_open": p_open,
            "x": x,
        }

    # -- grand-product argument (ref lib.rs:110-196 prove_unit_product) ----
    def _prove_unit_product(self, f_coeffs, f_evals, f_rand):
        sch = self.scheme
        lay = self.pk.layout
        wires = lay.wires_domain
        K = wires.n
        eta = wires.omega
        t_evals = sch.partial_products(f_evals)    # [NETWORK: masked rounds]
        t_coeffs = sch.lin_map(lambda a: _vifft(wires, a), t_evals)
        t_cmt, t_rand = self._commit(t_coeffs, hb=3)
        # q = (t(eta X) - t(X) f(eta X)) / Z_wires on the coset;
        # deg q <= 3n-2 < 3n -> exact.
        tw_coeffs = sch.lin_map(lambda a: _distribute_powers(a, eta), t_coeffs)
        fw_coeffs = sch.lin_map(lambda a: _distribute_powers(a, eta), f_coeffs)
        t_cos = sch.lin_map(lambda a: _vcoset_fft(wires, a), t_coeffs)
        tw_cos = sch.lin_map(lambda a: _vcoset_fft(wires, a), tw_coeffs)
        fw_cos = sch.lin_map(lambda a: _vcoset_fft(wires, a), fw_coeffs)
        tf = sch.mul(t_cos, fw_cos)                # [NETWORK: 1 round]
        diff = sch.sub(tw_cos, tf)
        zw_inv_const = _coset_vanishing_inv(K)
        q_cos = sch.lin_map(lambda a: F.mul(FR, a, zw_inv_const[None]), diff)
        q_coeffs = sch.lin_map(lambda a: _vcoset_ifft(wires, a), q_cos)
        q_cmt, q_rand = self._commit(q_coeffs)
        r = self.fs.gen_fr()
        t_wr_open = self._open(t_coeffs, eta * r % P, t_rand)
        t_r_open = self._open(t_coeffs, r, t_rand)
        t_wk_open = self._open(t_coeffs, pow(eta, K - 1, P), t_rand)
        f_wr_open = self._open(f_coeffs, eta * r % P, f_rand)
        q_r_open = self._open(q_coeffs, r, q_rand)
        return {
            "t_cmt": t_cmt,
            "q_cmt": q_cmt,
            "t_wr_open": t_wr_open,
            "t_r_open": t_r_open,
            "t_wk_open": t_wk_open,
            "f_wr_open": f_wr_open,
            "q_r_open": q_r_open,
            "r": r,
        }


# ---------------------------------------------------------------------------
# host helpers
# ---------------------------------------------------------------------------

def _vifft(dom, arr):
    if arr.ndim == 3:
        return jax.vmap(dom.ifft)(arr)
    return dom.ifft(arr)


def _vcoset_fft(dom, arr):
    if arr.ndim == 3:
        return jax.vmap(dom.coset_fft)(arr)
    return dom.coset_fft(arr)


def _vcoset_ifft(dom, arr):
    if arr.ndim == 3:
        return jax.vmap(dom.coset_ifft)(arr)
    return dom.coset_ifft(arr)


def _host_interpolate(pts):
    """Lagrange interpolation over a small public point set -> coeff list."""
    n = len(pts)
    coeffs = [0] * n
    for i, (xi, yi) in enumerate(pts):
        # numerator poly prod_{j!=i} (X - xj), scaled
        num = [1]
        den = 1
        for j, (xj, _) in enumerate(pts):
            if j == i:
                continue
            num = _poly_mul_host(num, [(-xj) % P, 1])
            den = den * (xi - xj) % P
        scale = yi * pow(den, P - 2, P) % P
        for k, c in enumerate(num):
            coeffs[k] = (coeffs[k] + c * scale) % P
    return coeffs


def _poly_mul_host(a, b):
    out = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            out[i + j] = (out[i + j] + ai * bj) % P
    return out


def _host_eval(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % P
    return acc


def _host_eval_roots(roots, x):
    acc = 1
    for r in roots:
        acc = acc * (x - r) % P
    return acc


def _add_public_poly(p_coeffs, pub_coeffs, const: int):
    """p + pub + const (coefficient-level; pub shorter or equal length)."""
    m = pub_coeffs.shape[-2]
    out = p_coeffs.at[..., :m, :].set(
        F.add(FR, p_coeffs[..., :m, :], pub_coeffs)
    )
    c = FR.to_device([const])[0]
    return out.at[..., 0, :].set(F.add(FR, out[..., 0, :], c))


def _add_linear(p_coeffs, y: int, z: int):
    """p + y*X + z."""
    yz = FR.to_device([z, y])
    return p_coeffs.at[..., :2, :].set(F.add(FR, p_coeffs[..., :2, :], yz))


def _coset_vanishing_inv(K: int):
    """1 / Z_K(g x) for x in the size-K domain: (g^K - 1)^{-1} (constant)."""
    g = C.FR_GENERATOR
    v = (pow(g, K, P) - 1) % P
    return FR.to_device([pow(v, P - 2, P)])[0]


# ---------------------------------------------------------------------------
# Verifier (host; mirrors ref lib.rs:431-583)
# ---------------------------------------------------------------------------

def _check_open(vk: VerifierKey, cmt, x: int, opening: Open) -> bool:
    y, pf = opening
    return kzg.host_verify(vk.srs, cmt, x, y, pf)


def verify(vk: VerifierKey, proof, public_values: Dict[str, int]) -> bool:
    fs = fsmod.FiatShamir()
    fs.absorb(fsmod.g1_to_bytes(proof["p_cmt"]))
    n = vk.n_gates
    K = 3 * n
    eta = vk.wires_gen

    ok = True

    # public-input proof
    pub = proof["public"]
    fs.absorb(fsmod.g1_to_bytes(pub["q_cmt"]))
    x1 = fs.gen_fr()
    ok &= x1 == pub["x"]
    ok &= _check_open(vk, pub["q_cmt"], x1, pub["q_open"])
    ok &= _check_open(vk, proof["p_cmt"], x1, pub["p_open"])
    eta_pows_needed = {name: pow(eta, i, P) for name, i in vk.public_indices.items()}
    pts = [
        (eta_pows_needed[name], public_values[name] % P)
        for name in sorted(vk.public_indices)
    ]
    v_poly = _host_interpolate(pts)
    zval = _host_eval_roots([x for x, _ in pts], x1)
    ok &= (pub["p_open"][0] - _host_eval(v_poly, x1)) % P == pub["q_open"][0] * zval % P

    # gate proof
    g = proof["gates"]
    fs.absorb(fsmod.g1_to_bytes(g["q_cmt"]))
    x2 = fs.gen_fr()
    ok &= x2 == g["x"]
    ok &= _check_open(vk, vk.s_cmt, x2, g["s_open"])
    ok &= _check_open(vk, proof["p_cmt"], x2, g["p_open"])
    ok &= _check_open(vk, g["q_cmt"], x2, g["q_open"])
    ok &= _check_open(vk, proof["p_cmt"], eta * x2 % P, g["p_w_open"])
    ok &= _check_open(vk, proof["p_cmt"], eta * eta % P * x2 % P, g["p_w2_open"])
    s_v, p_v, q_v = g["s_open"][0], g["p_open"][0], g["q_open"][0]
    pw_v, pww_v = g["p_w_open"][0], g["p_w2_open"][0]
    lhs = (s_v * (p_v + pw_v) + (1 - s_v) * p_v % P * pw_v - pww_v) % P
    zg = (pow(x2, n, P) - 1) % P
    ok &= lhs == q_v * zg % P

    # wiring proof
    w = proof["wiring"]
    y = fs.gen_fr()
    z = fs.gen_fr()
    ok &= y == w["y"] and z == w["z"]
    fs.absorb(fsmod.g1_to_bytes(w["l1_cmt"]))
    pp = w["prod_pf"]
    fs.absorb(fsmod.g1_to_bytes(pp["t_cmt"]))
    fs.absorb(fsmod.g1_to_bytes(pp["q_cmt"]))
    r = fs.gen_fr()
    ok &= r == pp["r"]
    ok &= _check_open(vk, pp["t_cmt"], eta * r % P, pp["t_wr_open"])
    ok &= _check_open(vk, pp["t_cmt"], r, pp["t_r_open"])
    ok &= _check_open(vk, pp["t_cmt"], pow(eta, K - 1, P), pp["t_wk_open"])
    ok &= _check_open(vk, w["l1_cmt"], eta * r % P, pp["f_wr_open"])
    ok &= _check_open(vk, pp["q_cmt"], r, pp["q_r_open"])
    zk_r = (pow(r, K, P) - 1) % P
    ok &= (pp["t_wr_open"][0] - pp["t_r_open"][0] * pp["f_wr_open"][0]) % P == (
        pp["q_r_open"][0] * zk_r % P
    )
    ok &= pp["t_wk_open"][0] == 1

    fs.absorb(fsmod.g1_to_bytes(w["l2_q_cmt"]))
    x3 = fs.gen_fr()
    ok &= x3 == w["x"]
    ok &= _check_open(vk, w["l2_q_cmt"], x3, w["l2_q_open"])
    ok &= _check_open(vk, vk.w_cmt, x3, w["w_open"])
    ok &= _check_open(vk, w["l1_cmt"], x3, w["l1_open"])
    ok &= _check_open(vk, proof["p_cmt"], x3, w["p_open"])
    p_v = w["p_open"][0]
    l1_v = w["l1_open"][0]
    w_v = w["w_open"][0]
    q2_v = w["l2_q_open"][0]
    zw_x = (pow(x3, K, P) - 1) % P
    lhs = ((p_v + y * x3 + z) * l1_v - (p_v + y * w_v + z)) % P
    ok &= lhs == q2_v * zw_x % P

    return bool(ok)
