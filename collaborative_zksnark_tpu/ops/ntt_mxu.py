"""MXU digit-matmul NTT: radix-16 butterflies as int8 matmuls.

The radix-2 NTT's butterfly ladder is VPU-multiply-bound (~1.3 ms/stage at
2^20 => a 26 ms floor for 20 stages).  This path moves the multiply work to
the MXU (the systolic array — two orders of magnitude more int8 MACs/s):

  * Each radix-R butterfly group  X_k = sum_u W[k,u] * x_u  becomes ONE
    int8 matmul with mod-p reduction absorbed into the table
        A[(k,d), (u,lb)] = digit_d( W[k,u] * 2^(D*lb) mod p )
    so the int32 output digits are already congruent mod p:
        sum_d 2^(D*d) * (A @ xdigits)[k,d]  ==  sum_u W[k,u]*x_u   (mod p).
    No outer-product T, no anti-diagonal fold, no VPU Montgomery multiply
    (contrast scripts/mxu_dft_probe.py, whose XLA form was HBM-bound on the
    355 MB T intermediate).
  * Inter-stage twiddles w_m^(u*r) factor over r = r_hi*K + r_lo into TWO
    batched (DT, dx) matmuls with per-(u, r_lo) / per-(u, r_hi) tables —
    table size O(R*sqrt(h)) per stage instead of O(R*h).
  * Digit base 2^6: after each matmul, THREE carry-relax passes bound data
    digits <= ~80 < 127 (int8-safe, REDUNDANT — the next matmul needs
    bounded digits, not canonical ones).  Contractions stay < 2^22 << int31.
  * Values stay in Montgomery form throughout (the tables hold PLAIN
    residues, so sum W*(x*R) = (sum W*x)*R — form is preserved).

Digits-domain layout: (n, dx) int8, dx = 43 canonical / 46 relaxed.
Validated numerically against Radix2Domain in tests/test_ntt_mxu.py.

Reference behavior: ark-poly Radix2EvaluationDomain fft/ifft
(algebra/poly/src/domain/radix2/fft.rs:37-245); this file is a TPU-first
reformulation, not a translation — the reference has no MXU analog.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra import params as C
from ..algebra import field as F
from ..algebra.field import FR

P = C.R_MOD
D = 6                         # digit bits
BASE = 1 << D
DX = -(-254 // D)             # 43 digits hold any value < 2p < 2^254
DT = -(-P.bit_length() // D)  # 43 digit rows per table constant (< p)
DREL = DX + 3                 # relaxed digit count (3 carry positions)
LIMB_BITS = F.LIMB_BITS       # 16
L = FR.L                      # 16 u32 limbs


# ---------------------------------------------------------------------------
# host-side tables
# ---------------------------------------------------------------------------

def _digits_of(v: int, n: int) -> np.ndarray:
    return np.array([(v >> (D * i)) & (BASE - 1) for i in range(n)], np.int8)


def _const_table(vals, dx_in: int) -> np.ndarray:
    """M[i, d, lb] = digit_d(vals[i] * 2^(D*lb) mod p): multiply-by-constant
    as a (DT, dx_in) int8 digit matrix per constant."""
    out = np.zeros((len(vals), DT, dx_in), np.int8)
    for i, c in enumerate(vals):
        for lb in range(dx_in):
            out[i, :, lb] = _digits_of((c << (D * lb)) % P, DT)
    return out


def _radices_for(n: int) -> list[int]:
    """n = 2^k -> stage radices, largest-first [16,16,...,(2|4|8)?]."""
    k = n.bit_length() - 1
    rad = [16] * (k // 4)
    if k % 4:
        rad.append(1 << (k % 4))
    return rad


def _digitrev_perm(n: int, radices) -> np.ndarray:
    """Input permutation for iterative DIT with stage radices radices[0]
    (first combine) .. radices[-1] (last): recursive stride split, deepest
    level = stage 0."""
    idx = np.arange(n, dtype=np.int64)

    def rec(v, rads):
        if not rads:
            return v
        r = rads[-1]
        return np.concatenate([rec(v[u::r], rads[:-1]) for u in range(r)])

    return rec(idx, list(radices)).astype(np.int32)


def _tw_split(h: int) -> int:
    """Divisor K of h with K ~ sqrt(h) (h is a product of 2/4/8/16)."""
    K = 1
    while K * K < h:
        K *= 2
    while h % K:
        K *= 2
    return K


class MxuPlan:
    """Digit-matmul plan for one (n, omega[, scale]) transform.  `scale`
    (e.g. n^{-1} for the inverse) folds into the LAST stage's butterfly
    table for free."""

    def __init__(self, n: int, omega: int, scale: int = 1):
        self.n = n
        self.radices = _radices_for(n)
        self.perm = _digitrev_perm(n, self.radices)
        self.stages = []
        h = 1
        S = len(self.radices)
        for s, R in enumerate(self.radices):
            m = h * R
            wR = pow(omega, n // R, P)       # primitive R-th root
            sc = scale if s == S - 1 else 1
            dx_in = DX if s == 0 else DREL
            # butterfly table: A[k, d, u, lb]
            A = np.zeros((R, DT, R, dx_in), np.int8)
            for k in range(R):
                for u in range(R):
                    w = pow(wR, (k * u) % R, P) * sc % P
                    for lb in range(dx_in):
                        A[k, :, u, lb] = _digits_of((w << (D * lb)) % P, DT)
            tw1 = tw2 = None
            K = r_hi_n = 1
            if s > 0:
                wm = pow(omega, n // m, P)
                K = _tw_split(h)
                r_hi_n = h // K
                tw1 = _const_table(
                    [pow(wm, u * rl, P) for u in range(R) for rl in range(K)],
                    DREL,
                ).reshape(R, K, DT, DREL)
                if r_hi_n > 1:
                    wmK = pow(wm, K, P)
                    tw2 = _const_table(
                        [pow(wmK, u * rh, P)
                         for u in range(R) for rh in range(r_hi_n)],
                        DREL,
                    ).reshape(R, r_hi_n, DT, DREL)
            self.stages.append(dict(R=R, h=h, K=K, r_hi_n=r_hi_n,
                                    A=A, tw1=tw1, tw2=tw2))
            h = m
        # final reduction tables (p-dependent only; see _undigitize):
        #  fold_hi[t-44] = digits of 2^(6t) mod p for t in {44, 45}
        #  fold_lut[h]   = digits of h * 2^252 mod p, h < 8192
        self.fold_hi = np.stack(
            [_digits_of(pow(2, D * t, P), DT) for t in (44, 45)]
        )
        self.fold_lut = np.stack(
            [_digits_of(h * pow(2, 252, P) % P, DT) for h in range(8192)]
        )
        self._dev = None

    def device_tables(self):
        if self._dev is None:
            with jax.ensure_compile_time_eval():
                st = []
                for g in self.stages:
                    st.append(dict(
                        A=jnp.asarray(g["A"]),
                        tw1=None if g["tw1"] is None else jnp.asarray(g["tw1"]),
                        tw2=None if g["tw2"] is None else jnp.asarray(g["tw2"]),
                    ))
                self._dev = dict(
                    perm=jnp.asarray(self.perm),
                    stages=st,
                    fold_hi=jnp.asarray(self.fold_hi),
                    fold_lut=jnp.asarray(self.fold_lut),
                )
        return self._dev


# ---------------------------------------------------------------------------
# device pipeline
# ---------------------------------------------------------------------------

def _digitize(x):
    """(n, L) u32 canonical base-2^16 limbs (value < 2p) -> (n, DX) int8
    base-2^6 digits."""
    cols = []
    for d in range(DX):
        bit = D * d
        q, o = bit // LIMB_BITS, bit % LIMB_BITS
        v = x[:, q] >> o
        if o + D > LIMB_BITS and q + 1 < L:
            v = v | (x[:, q + 1] << (LIMB_BITS - o))
        cols.append(v & (BASE - 1))
    return jnp.stack(cols, axis=-1).astype(jnp.int8)


def _relax(y32, d_out: int, axis: int = -1):
    """int32 digits (< 2^22, on `axis`) -> int8 digits <= ~80, value kept.
    Three relax passes (see module docstring for the bound chain)."""
    x = y32.astype(jnp.int32)
    axis %= x.ndim
    pad = d_out - x.shape[axis]
    zero = [(0, 0)] * x.ndim
    if pad:
        spec = list(zero)
        spec[axis] = (0, pad)
        x = jnp.pad(x, spec)
    shift = list(zero)
    shift[axis] = (1, 0)
    for _ in range(3):
        lo = x & (BASE - 1)
        hi = x >> D
        x = lo + jnp.pad(
            jax.lax.slice_in_dim(hi, 0, x.shape[axis] - 1, axis=axis), shift
        )
    return x.astype(jnp.int8)


def _ks_carry_digits(x):
    """int32 base-2^6 digits (small redundancy, digits <= ~127) -> exact
    canonical digits via Kogge-Stone generate/propagate along axis -1."""
    for _ in range(2):
        lo = x & (BASE - 1)
        hi = x >> D
        x = lo + jnp.pad(hi[..., :-1], [(0, 0)] * (x.ndim - 1) + [(1, 0)])
    g = (x >= BASE).astype(jnp.int32)
    pr = (x == BASE - 1).astype(jnp.int32)
    d = 1
    K = x.shape[-1]
    while d < K:
        pad = [(0, 0)] * (x.ndim - 1)
        gs = jnp.pad(g[..., :-d], pad + [(d, 0)])
        ps = jnp.pad(pr[..., :-d], pad + [(d, 0)], constant_values=1)
        g = g | (pr & gs)
        pr = pr & ps
        d <<= 1
    carry_in = jnp.pad(g[..., :-1], [(0, 0)] * (x.ndim - 1) + [(1, 0)])
    out = x + carry_in
    return jnp.where(out >= BASE, out - BASE, out)


def _undigitize(xd_int8, fold_hi, fold_lut):
    """(n, DREL) int8 relaxed digits -> (n, L) u32 canonical base-2^16
    limbs with value in [0, 2p) (the field-layer invariant).

    Exact reduction chain (all bounds static):
      relaxed digits <= ~80, 46 positions  => value < 2^277
      KS-canonicalize                      => 46 canonical digits
      fold digits 44,45 (x += d_t*(2^(6t) mod p), t=44,45; drop them)
                                           => value < 2^264 + 126p < 2^264.1
      KS                                   => digits 0..44, digit44 <= 1
      LUT fold: h = d42 + 64*d43 + 4096*d44 < 8192,
                x = lo252 + (h*2^252 mod p) => value < 2^252 + p < 2p  DONE
      KS, regroup                          => (n, L) u32, [0, 2p)
    """
    x = _ks_carry_digits(xd_int8.astype(jnp.int32))       # 46 canonical
    # fold digits 44,45
    contrib = jax.lax.dot_general(
        x[..., 44:46], fold_hi.astype(jnp.int32),
        (((x.ndim - 1,), (0,)), ((), ())),
    )                                                     # (..., DT)
    x = x[..., :44] + jnp.pad(contrib, [(0, 0)] * (x.ndim - 1) + [(0, 1)])
    x = _ks_carry_digits(jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, 1)]))
    # LUT fold of bits >= 252
    h = x[..., 42] + (x[..., 43] << D) + (x[..., 44] << (2 * D))
    x = jnp.pad(x[..., :42], [(0, 0)] * (x.ndim - 1) + [(0, DT - 42)]) + (
        jnp.take(fold_lut, h, axis=0).astype(jnp.int32)
    )
    x = _ks_carry_digits(x)                               # value < 2p

    # regroup base-2^6 digits -> base-2^16 limbs
    limbs = []
    K = x.shape[-1]
    for i in range(L):
        bit = LIMB_BITS * i
        acc = None
        for t in range(bit // D, min(K, (bit + LIMB_BITS) // D + 1)):
            sh = D * t - bit
            v = (x[..., t] << sh) if sh >= 0 else (x[..., t] >> (-sh))
            acc = v if acc is None else acc + v
        limbs.append(acc & 0xFFFF)
    return jnp.stack(limbs, axis=-1).astype(jnp.uint32)


def _apply_stage(xd, g, R: int, h: int, K: int, r_hi_n: int, first: bool):
    """One DIT stage on (n, dx) int8 digits."""
    n = xd.shape[0]
    dx = xd.shape[1]
    m = R * h
    nblk = n // m
    if g["tw1"] is not None:
        # x as (nblk, R, r_hi, r_lo=K, dx); batch-matmul over (u, r_lo)
        xb = xd.reshape(nblk, R, r_hi_n, K, dx)
        xb = jnp.transpose(xb, (1, 3, 4, 0, 2)).reshape(R, K, dx, nblk * r_hi_n)
        y = jax.lax.dot_general(
            g["tw1"], xb,
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32,
        )  # (R, K, DT, nblk*r_hi)
        xd8 = _relax(y, DREL, axis=2)
        xb = xd8.reshape(R, K, DREL, nblk, r_hi_n)
        if g["tw2"] is not None:
            xb2 = jnp.transpose(xb, (0, 4, 2, 3, 1)).reshape(
                R, r_hi_n, DREL, nblk * K
            )
            y = jax.lax.dot_general(
                g["tw2"], xb2,
                dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.int32,
            )  # (R, r_hi, DT, nblk*K)
            xd8 = _relax(y, DREL, axis=2)
            xb = xd8.reshape(R, r_hi_n, DREL, nblk, K).transpose(0, 4, 2, 3, 1)
        # back to (nblk, R, r, dx): xb is (R, K, DREL, nblk, r_hi)
        xd = jnp.transpose(xb, (3, 0, 4, 1, 2)).reshape(n, DREL)
        dx = DREL
    # butterfly: out[b,k,r,d] = sum_{u,lb} A[k,d,u,lb] * x[b,u,r,lb]
    xb = xd.reshape(nblk, R, h, dx)
    xb = jnp.transpose(xb, (1, 3, 0, 2)).reshape(R * dx, nblk * h)
    A = g["A"].reshape(R * DT, R * dx)
    y = jax.lax.dot_general(
        A, xb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).reshape(R, DT, nblk, h)
    xd8 = _relax(jnp.transpose(y, (2, 0, 3, 1)), DREL)   # (nblk, R, h, DREL)
    return xd8.reshape(n, DREL)


def _transform_core(x_limbs, dev, plan: MxuPlan):
    xd = _digitize(jnp.take(x_limbs, dev["perm"], axis=0))
    for s, (g, meta) in enumerate(zip(dev["stages"], plan.stages)):
        xd = _apply_stage(
            xd, g, meta["R"], meta["h"], meta["K"], meta["r_hi_n"], s == 0
        )
    return _undigitize(xd, dev["fold_hi"], dev["fold_lut"])


@functools.lru_cache(maxsize=None)
def get_plan(n: int, omega: int, scale: int = 1) -> MxuPlan:
    return MxuPlan(n, omega, scale)


def transform(plan: MxuPlan, x_limbs):
    """One n-point NTT with plan's omega/scale: (n, L) u32 -> (n, L) u32,
    natural order in, natural order out (matches Radix2Domain.fft)."""
    dev = plan.device_tables()
    return _transform_jit(x_limbs, dev, plan)


@functools.lru_cache(maxsize=None)
def _jit_for(plan: MxuPlan):
    return jax.jit(lambda x, dev: _transform_core(x, dev, plan))


def _transform_jit(x, dev, plan):
    return _jit_for(plan)(x, dev)
