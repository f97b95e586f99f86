"""NTT / iNTT over the device field: radix-2 and mixed-radix 3*2^k domains.

TPU-native re-design of the reference's FFT layer
(ref: algebra/poly/src/domain/radix2/fft.rs:37-245 serial+parallel radix-2;
 algebra/poly/src/domain/mixed_radix.rs:133-350 mixed-radix 3*2^k, needed by
 the Plonk wires domain, ref mpc-plonk/src/relations/flat.rs:282-301).

Design: iterative decimation-in-time butterflies, fully vectorized — each of
the log2(N) stages is ONE batched field multiplication (N/2 elements) plus an
add and a subtract on (N/2, L) limb arrays.  There is no scalar loop over
elements; the stage loop is unrolled at trace time (<= ~47 stages).  Twiddle
tables are precomputed host-side per domain (cached) and live in HBM in
Montgomery form.

A key property inherited from the reference's MPC design (SURVEY.md §1,
"trick 1"): NTTs over *secret-shared* vectors are entirely local per party,
because the butterflies are linear with public twiddles — so these same
kernels run unchanged on shares.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np

# Opt-in plane-resident NTT stage loop.  Read ONCE at import: set it before
# the first domain call (the jitted entry points would otherwise silently
# ignore later flips through the jit cache).
_NTT_PLANES = _os.environ.get("CZTPU_NTT_PLANES", "0") == "1"
# Measured on v5e: 8.6 ms @2^16 (on par with radix2) but 147 ms @2^20 vs
# the ladder's 74.7 ms — the matmuls are ~1 ms of MXU work; the loss is
# carry/relayout HBM traffic (undigitize's Kogge-Stone chains alone are
# 62 ms).  Stays off by default until the carry pipeline is fused.
# Latched at import for the same jit-cache reason as _NTT_PLANES.

from ..algebra import params as C
from ..algebra import field as F
from ..algebra.field import FieldSpec


def _bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev.astype(np.int32)


def _pow_table(base: int, n: int, p: int) -> list[int]:
    """[base^0, base^1, ..., base^(n-1)] mod p (host ints)."""
    out = [1] * n
    acc = 1
    for i in range(1, n):
        acc = acc * base % p
        out[i] = acc
    return out


def _to_mont_limbs(spec: FieldSpec, ints) -> np.ndarray:
    Rint = 1 << (F.LIMB_BITS * spec.L)
    return F.ints_to_limbs([v * Rint % spec.p for v in ints], spec.L)


class Radix2Domain:
    """Evaluation domain of size N = 2^k with generator omega (order N).

    Mirrors ark-poly's Radix2EvaluationDomain semantics: `fft` maps
    coefficients -> evaluations at [omega^0 .. omega^(N-1)] in natural order.
    """

    def __init__(self, spec: FieldSpec, n: int, omega: int = None):
        assert n & (n - 1) == 0 and n >= 1
        self.spec = spec
        self.n = n
        k = n.bit_length() - 1
        self.log_n = k
        p = spec.p
        if omega is None:
            if spec is F.FR:
                assert k <= C.FR_TWO_ADICITY
                omega = pow(C.FR_TWO_ADIC_ROOT, 1 << (C.FR_TWO_ADICITY - k), p)
            else:
                raise NotImplementedError("only Fr domains are used by the SNARKs")
        assert pow(omega, n, p) == 1 and (n == 1 or pow(omega, n // 2, p) != 1)
        self.omega = omega
        self.omega_inv = pow(omega, p - 2, p)
        self.n_inv_mont = np.asarray(_to_mont_limbs(spec, [pow(n, p - 2, p)])[0])
        self._perm = np.asarray(_bit_reverse_perm(n))
        # stage twiddle tables: stage s (1-indexed) has half-block 2^(s-1)
        # twiddles [w^0 .. w^(h-1)] with w = omega^(n / 2^s).
        self._tw_fwd = self._stage_twiddles(omega)
        self._tw_inv = self._stage_twiddles(self.omega_inv)
        # jit entry points with ALL tables passed as runtime ARGUMENTS:
        # captured numpy twiddle tables get baked into the HLO as literal
        # constants, and at 2^19+ the serialized module (64+ MB of twiddles)
        # exceeds the remote-compile request limit on the TPU tunnel
        # (observed: HTTP 413 on coset_fft @2^20).  Device tables are built
        # lazily, once, and live in HBM across calls.
        self._dev_tables = None
        self._coset_dev_tables = None
        self._fft_j = jax.jit(self._fft_core)
        self._ifft_j = jax.jit(self._ifft_core)
        self._ifft_un_j = jax.jit(self._ifft_unnorm_core)
        self._coset_fft_j = jax.jit(self._coset_fft_core)
        self._coset_ifft_j = jax.jit(self._coset_ifft_core)

    def _stage_twiddles(self, omega: int):
        p = self.spec.p
        tws = []
        for s in range(1, self.log_n + 1):
            h = 1 << (s - 1)
            w = pow(omega, self.n >> s, p)
            tws.append(np.asarray(_to_mont_limbs(self.spec, _pow_table(w, h, p))))
        return tws

    def elements(self) -> list[int]:
        return _pow_table(self.omega, self.n, self.spec.p)

    # -- core transforms ---------------------------------------------------
    def _butterflies_planes(self, x, tws, kern=None):
        """Plane-resident stage loop (TPU, unbatched x of shape (n, L)).

        `kern` is injectable for layout testing: the default is the fused
        Pallas butterfly; tests pass a plain-jnp emulation so the pairing /
        re-interleave reshapes are pinned WITHOUT Pallas (advisor round-2
        medium finding: the plane layouts had no default-run coverage).

        The element-major loop below pays a (n,L)<->(L,8,C) relayout of
        lo/hi/tw per stage inside butterfly_flat — pure transpose traffic on
        top of the fused kernel (same disease the MSM v4 scan cured).  Here
        the state lives in ONE fixed plane layout, element e = sublane*C +
        column, for all log2(n) stages; lo/hi pairing and re-interleaving
        are reshape-slices on the column axis (sublane axis for the top 3
        stages), and the butterfly kernel is called on raw planes."""
        from . import pallas_field as PF

        spec = self.spec
        n = self.n
        L = spec.L
        C = n // 8
        if kern is None:
            T = PF.T_BIG
            kern = PF._butterfly_kernel(spec, (C // 2) // T, T)
        xp = x.reshape(8, C, L).transpose(2, 0, 1)          # (L, 8, C)
        for s in range(1, self.log_n + 1):
            h = 1 << (s - 1)
            twc = jnp.asarray(tws[s - 1]).T[:, None, :]     # (L, 1, h)
            if h < C:
                m = 2 * h
                xb = xp.reshape(L, 8, C // m, 2, h)
                lo = xb[:, :, :, 0].reshape(L, 8, C // 2)
                hi = xb[:, :, :, 1].reshape(L, 8, C // 2)
                tw = jnp.broadcast_to(
                    jnp.tile(twc, (1, 1, C // m)), (L, 8, C // 2)
                )
            else:
                # cross-sublane stage: pair stride h = Sst*C sublanes; the
                # hi element (.., r, c) carries twiddle w^(r*C + c)
                Sst = h // C
                G = 8 // (2 * Sst)
                xb = xp.reshape(L, G, 2, Sst, C)
                lo = xb[:, :, 0].reshape(L, 8, C // 2)
                hi = xb[:, :, 1].reshape(L, 8, C // 2)
                tw = jnp.broadcast_to(
                    twc.reshape(L, 1, Sst, C), (L, G, Sst, C)
                ).reshape(L, 8, C // 2)
            a, b = kern(lo, hi, tw)
            if h < C:
                m = 2 * h
                ar = a.reshape(L, 8, C // m, 1, h)
                br = b.reshape(L, 8, C // m, 1, h)
                xp = jnp.concatenate([ar, br], axis=3).reshape(L, 8, C)
            else:
                Sst = h // C
                G = 8 // (2 * Sst)
                ar = a.reshape(L, G, 1, Sst, C)
                br = b.reshape(L, G, 1, Sst, C)
                xp = jnp.concatenate([ar, br], axis=2).reshape(L, 8, C)
        return xp.transpose(1, 2, 0).reshape(n, L)

    def _butterflies(self, x, tws):
        """x: (n, ..., L) — transforms along axis 0, batching over the rest."""
        spec = self.spec
        n = self.n
        rest = x.shape[1:]
        extra = len(rest) - 1  # batch dims between n and L
        use_fused = F._pallas_ok()
        # Plane-resident stage loop: measured on-par with the element-major
        # loop at 2^20 (78.4 vs 74.9 ms — the NTT is bound by the per-stage
        # butterfly kernel itself, not relayout, unlike the MSM scan).  Kept
        # opt-in as the substrate for multi-stage in-kernel fusion.
        # (_NTT_PLANES is latched at module import: these entry points are
        # jitted, so a post-first-call env flip would be silently ignored by
        # the jit cache anyway.)
        if use_fused and extra == 0 and n >= 8192 and _NTT_PLANES:
            return self._butterflies_planes(x, tws)
        for s in range(1, self.log_n + 1):
            m = 1 << s
            h = m >> 1
            xb = x.reshape((n // m, m) + rest)
            lo = xb[:, :h]
            tw = tws[s - 1].reshape((1, h) + (1,) * extra + (spec.L,))
            if use_fused:
                from . import pallas_field

                a, b = pallas_field.butterfly_flat(spec, lo, xb[:, h:], tw)
            else:
                hi = F.mul(spec, xb[:, h:], tw)
                a, b = F.add(spec, lo, hi), F.sub(spec, lo, hi)
            x = jnp.concatenate([a, b], axis=1).reshape((n,) + rest)
        return x

    # jit cores: every table an argument, never a captured constant
    def _dev(self):
        if self._dev_tables is None:
            # ensure_compile_time_eval: the first call may happen inside a
            # trace (shard_map provers); cached tables must be CONCRETE
            with jax.ensure_compile_time_eval():
                self._dev_tables = dict(
                    perm=jnp.asarray(self._perm),
                    twf=tuple(jnp.asarray(t) for t in self._tw_fwd),
                    twi=tuple(jnp.asarray(t) for t in self._tw_inv),
                    ninv=jnp.asarray(self.n_inv_mont),
                )
        return self._dev_tables

    def _coset_dev(self):
        if self._coset_dev_tables is None:
            with jax.ensure_compile_time_eval():
                self._coset_dev_tables = dict(
                    g=jnp.asarray(self._coset_g),
                    ginv=jnp.asarray(self._coset_g_inv),
                )
        return self._coset_dev_tables

    def _fft_core(self, x, perm, tws):
        return self._butterflies(jnp.take(x, perm, axis=0), tws)

    def _ifft_unnorm_core(self, x, perm, tws):
        return self._butterflies(jnp.take(x, perm, axis=0), tws)

    def _ifft_core(self, x, perm, tws, ninv):
        out = self._ifft_unnorm_core(x, perm, tws)
        return F.mul(self.spec, out, ninv[None])

    def _coset_fft_core(self, x, perm, tws, g_tbl):
        xg = F.mul(self.spec, x, self._coset_reshape(g_tbl, x))
        return self._fft_core(xg, perm, tws)

    def _coset_ifft_core(self, x, perm, tws, ninv, ginv_tbl):
        out = self._ifft_core(x, perm, tws, ninv)
        return F.mul(self.spec, out, self._coset_reshape(ginv_tbl, out))

    def fft(self, coeffs):
        """coefficients (n, ..., L) -> evaluations (n, ..., L), natural order."""
        d = self._dev()
        return self._fft_j(coeffs, d["perm"], d["twf"])

    def ifft(self, evals):
        d = self._dev()
        return self._ifft_j(evals, d["perm"], d["twi"], d["ninv"])

    def _ifft_unnormalized(self, evals):
        d = self._dev()
        return self._ifft_un_j(evals, d["perm"], d["twi"])

    # -- coset transforms (g = Fr multiplicative generator) -----------------
    @functools.cached_property
    def _coset_g(self):
        g = C.FR_GENERATOR
        return np.asarray(_to_mont_limbs(self.spec, _pow_table(g, self.n, self.spec.p)))

    @functools.cached_property
    def _coset_g_inv(self):
        ginv = pow(C.FR_GENERATOR, self.spec.p - 2, self.spec.p)
        return np.asarray(
            _to_mont_limbs(self.spec, _pow_table(ginv, self.n, self.spec.p))
        )

    def _coset_reshape(self, tbl, like):
        extra = like.ndim - 2
        return tbl.reshape((self.n,) + (1,) * extra + (self.spec.L,))

    def coset_fft(self, coeffs):
        """Evaluations over the coset g*H (ref: distribute_powers + fft)."""
        d = self._dev()
        return self._coset_fft_j(coeffs, d["perm"], d["twf"], self._coset_dev()["g"])

    def coset_ifft(self, evals):
        d = self._dev()
        return self._coset_ifft_j(
            evals, d["perm"], d["twi"], d["ninv"], self._coset_dev()["ginv"]
        )

    def vanishing_on_coset_inv(self):
        """1 / Z_H(g x) for x in H: Z_H(g w^i) = g^n - 1, a scalar
        (ref: domain/mod.rs evaluate_vanishing_polynomial over cosets)."""
        p = self.spec.p
        val = (pow(C.FR_GENERATOR, self.n, p) - 1) % p
        return np.asarray(_to_mont_limbs(self.spec, [pow(val, p - 2, p)])[0])


class MixedRadixDomain:
    """Evaluation domain of size N = 3 * 2^k (the Plonk wires domain).

    Cooley-Tukey split N = 3*M: three size-M radix-2 NTTs on the stride-3
    slices, twiddle multiply, then a DFT-3 combine across the three halves
    (ref behavior: algebra/poly/src/domain/mixed_radix.rs).
    """

    def __init__(self, spec: FieldSpec, n: int):
        assert n % 3 == 0
        m = n // 3
        assert m & (m - 1) == 0
        assert spec is F.FR
        p = spec.p
        self.spec = spec
        self.n = n
        self.m = m
        k = m.bit_length() - 1
        # generator of the order-(3*2^47) subgroup, raised to get order 3*2^k
        assert k <= C.FR_TWO_ADICITY
        omega = pow(C.FR_LARGE_SUBGROUP_ROOT, 1 << (C.FR_TWO_ADICITY - k), p)
        assert pow(omega, n, p) == 1 and pow(omega, n // 3, p) != 1
        self.omega = omega
        self.omega_inv = pow(omega, p - 2, p)
        self.n_inv_mont = np.asarray(_to_mont_limbs(spec, [pow(n, p - 2, p)])[0])
        # the sub-domain generator must equal omega^3; with the arkworks
        # radix-2 root adopted for standalone domains (fr.rs:14-18) that is
        # a DIFFERENT order-m root, so build the sub-domain with omega^3
        # explicitly (matching ark-poly's MixedRadixEvaluationDomain
        # internal consistency rather than its standalone radix-2 root)
        self.sub = Radix2Domain(spec, m, omega=pow(omega, 3, p))
        self._tw_fwd = self._twiddles(omega)
        self._tw_inv = self._twiddles(self.omega_inv)
        w3 = pow(omega, m, p)  # primitive cube root of unity
        self._w3_fwd = self._dft3_consts(w3)
        self._w3_inv = self._dft3_consts(pow(w3, 2, p))
        # tables as runtime args (see Radix2Domain: HTTP 413 at 2^19+)
        self._dev_tables = None
        self._coset_dev_tables = None
        self._fft_j = jax.jit(self._fft_core)
        self._ifft_j = jax.jit(self._ifft_core)
        self._coset_fft_j = jax.jit(self._coset_fft_core)
        self._coset_ifft_j = jax.jit(self._coset_ifft_core)

    def _twiddles(self, omega: int):
        # tw[r] = [omega^(r*k0) for k0 < M], r = 0,1,2
        p = self.spec.p
        return [
            np.asarray(
                _to_mont_limbs(self.spec, _pow_table(pow(omega, r, p), self.m, p))
            )
            for r in range(3)
        ]

    def _dft3_consts(self, w3: int):
        p = self.spec.p
        return (
            np.asarray(_to_mont_limbs(self.spec, [w3])[0]),
            np.asarray(_to_mont_limbs(self.spec, [w3 * w3 % p])[0]),
        )

    def elements(self) -> list[int]:
        return _pow_table(self.omega, self.n, self.spec.p)

    def _transform(self, x, tws, w3c, sub_tf):
        spec = self.spec
        m = self.m
        # stride-3 decimation
        parts = [sub_tf(x[r::3]) for r in range(3)]
        # twiddle multiply: B_r[k0] = tw[r][k0] * A_r[k0]
        b0 = parts[0]
        b1 = F.mul(spec, parts[1], tws[1])
        b2 = F.mul(spec, parts[2], tws[2])
        w3, w3sq = w3c
        # X[k0 + M*k1] = sum_r w3^(r*k1) * B_r[k0]
        x0 = F.add(spec, b0, F.add(spec, b1, b2))
        t1 = F.mul(spec, b1, w3[None])
        t2 = F.mul(spec, b2, w3sq[None])
        x1 = F.add(spec, b0, F.add(spec, t1, t2))
        u1 = F.mul(spec, b1, w3sq[None])
        u2 = F.mul(spec, b2, w3[None])
        x2 = F.add(spec, b0, F.add(spec, u1, u2))
        return jnp.concatenate([x0, x1, x2], axis=0)

    def _dev(self):
        if self._dev_tables is None:
            with jax.ensure_compile_time_eval():
                self._dev_tables = dict(
                    twf=tuple(jnp.asarray(t) for t in self._tw_fwd),
                    twi=tuple(jnp.asarray(t) for t in self._tw_inv),
                    w3f=tuple(jnp.asarray(t) for t in self._w3_fwd),
                    w3i=tuple(jnp.asarray(t) for t in self._w3_inv),
                    ninv=jnp.asarray(self.n_inv_mont),
                )
        return self._dev_tables

    def _coset_dev(self):
        if self._coset_dev_tables is None:
            with jax.ensure_compile_time_eval():
                self._coset_dev_tables = dict(
                    g=jnp.asarray(self._coset_g),
                    ginv=jnp.asarray(self._coset_g_inv),
                )
        return self._coset_dev_tables

    def _fft_core(self, x, tws, w3c, sub_perm, sub_twf):
        sub_tf = lambda v: self.sub._fft_core(v, sub_perm, sub_twf)
        return self._transform(x, tws, w3c, sub_tf)

    def _ifft_core(self, x, tws, w3c, sub_perm, sub_twi, ninv):
        # inverse: same structure with omega^{-1}, then scale by 1/N (the
        # transform with omega_inv is the unnormalized inverse DFT)
        sub_tf = lambda v: self.sub._ifft_unnorm_core(v, sub_perm, sub_twi)
        out = self._transform(x, tws, w3c, sub_tf)
        return F.mul(self.spec, out, ninv[None])

    def _coset_fft_core(self, x, tws, w3c, sub_perm, sub_twf, g_tbl):
        return self._fft_core(
            F.mul(self.spec, x, g_tbl), tws, w3c, sub_perm, sub_twf
        )

    def _coset_ifft_core(self, x, tws, w3c, sub_perm, sub_twi, ninv, ginv_tbl):
        out = self._ifft_core(x, tws, w3c, sub_perm, sub_twi, ninv)
        return F.mul(self.spec, out, ginv_tbl)

    def fft(self, coeffs):
        d, sd = self._dev(), self.sub._dev()
        return self._fft_j(coeffs, d["twf"], d["w3f"], sd["perm"], sd["twf"])

    def ifft(self, evals):
        d, sd = self._dev(), self.sub._dev()
        return self._ifft_j(
            evals, d["twi"], d["w3i"], sd["perm"], sd["twi"], d["ninv"]
        )

    @functools.cached_property
    def _coset_g(self):
        return np.asarray(
            _to_mont_limbs(self.spec, _pow_table(C.FR_GENERATOR, self.n, self.spec.p))
        )

    @functools.cached_property
    def _coset_g_inv(self):
        ginv = pow(C.FR_GENERATOR, self.spec.p - 2, self.spec.p)
        return np.asarray(
            _to_mont_limbs(self.spec, _pow_table(ginv, self.n, self.spec.p))
        )

    def coset_fft(self, coeffs):
        d, sd = self._dev(), self.sub._dev()
        return self._coset_fft_j(
            coeffs, d["twf"], d["w3f"], sd["perm"], sd["twf"],
            self._coset_dev()["g"],
        )

    def coset_ifft(self, evals):
        d, sd = self._dev(), self.sub._dev()
        return self._coset_ifft_j(
            evals, d["twi"], d["w3i"], sd["perm"], sd["twi"], d["ninv"],
            self._coset_dev()["ginv"],
        )


@functools.lru_cache(maxsize=None)
def get_radix2_domain(n: int, spec: FieldSpec = F.FR) -> Radix2Domain:
    size = 1
    while size < n:
        size <<= 1
    return Radix2Domain(spec, size)


@functools.lru_cache(maxsize=None)
def get_mixed_domain(n: int, spec: FieldSpec = F.FR) -> MixedRadixDomain:
    """Smallest 3*2^k domain of size >= n."""
    m = 1
    while 3 * m < n:
        m <<= 1
    return MixedRadixDomain(spec, 3 * m)
