"""Fused digit-domain NTT: multi-factor four-step pipeline in Pallas.

The XLA-level MXU NTT (ops/ntt_mxu.py) proved the digit-matmul formulation
but lost to the radix-2 ladder at 2^20 (147 vs 75 ms) because every carry
relax and regroup round-tripped HBM.  This module keeps the whole pipeline
in VMEM:

  n = f1 * f2 [* f3],  f_i <= 256 (VMEM block), with the classic four-step
  recursion (Bailey):

    K1  digitize:  Montgomery limbs (n, L) u32 -> base-2^6 digit planes
        (DGR, f1, n/f1) int8, one Pallas kernel (optionally fused with the
        coset premultiply as an in-kernel CIOS mul).
    Ki  pass i:    DIT stages of an f_i-point NTT as int8 MXU matmuls with
        mod-p reduction absorbed into the tables; carry relax after every
        matmul stays in VMEM.  For i < k the kernel ends with the four-step
        boundary twiddle w_i^{k_i * m}: digits -> canonical value < 2^256
        (Kogge-Stone + two per-bit fold matmuls -- no gathers), ONE in-VMEM
        CIOS multiply against a streamed Montgomery twiddle table, and
        re-digitization.  The last pass ends with the same fold + a trimmed
        REDC (tables carry a 2^256 factor) so outputs land canonically in
        [0, 2p) -- the field-layer invariant.
    Layout rule: the transform dim of each pass is always OFF the 128-lane
        axis, so every regroup/transpose inside a kernel is vreg-level; the
        single lane-crossing transpose (pass-1's four-step corner turn)
        happens once, in VMEM.

  Element order bookkeeping: after pass i the array order is
  (m_i, k_i, k_{i-1}, ..., k_1); with X[k1 + f1*k2 + f1*f2*k3] this makes
  the final layout exactly natural order -- no output permutation.

Reference behavior: ark-poly Radix2EvaluationDomain fft/ifft/coset
(algebra/poly/src/domain/radix2/fft.rs:37-245).  TPU-first redesign; the
reference has no MXU/digit-plane analog.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra import params as C
from ..algebra import field as F

P = C.R_MOD
D = 6
BASE = 1 << D
DT = 43            # digit rows of a table constant (< p < 2^258)
DGR = 48           # state digit rows (43 canonical + 3 relax growth + pad)
L = F.FR.L         # 16 u32 limbs of 16 bits
LIMB_BITS = F.LIMB_BITS
RINT = 1 << (LIMB_BITS * L)      # Montgomery R = 2^256


# ---------------------------------------------------------------------------
# host tables
# ---------------------------------------------------------------------------

def _digits_of(v: int, rows: int) -> np.ndarray:
    return np.array([(v >> (D * i)) & (BASE - 1) for i in range(rows)], np.int8)


def _radices_for(f: int):
    k = f.bit_length() - 1
    rad = [16] * (k // 4)
    if k % 4:
        rad.append(1 << (k % 4))
    return rad


def _digitrev_perm(f: int, radices) -> np.ndarray:
    idx = np.arange(f, dtype=np.int64)

    def rec(v, rads):
        if not rads:
            return v
        r = rads[-1]
        return np.concatenate([rec(v[u::r], rads[:-1]) for u in range(r)])

    return rec(idx, list(radices)).astype(np.int32)


def _mont_limb_table(ints) -> np.ndarray:
    """plain residues -> (len, L) u32 Montgomery limbs."""
    return F.ints_to_limbs([v * RINT % P for v in ints], L)


def _pow_list(base: int, count: int) -> list[int]:
    out = [1] * count
    acc = 1
    for i in range(1, count):
        acc = acc * base % P
        out[i] = acc
    return out


def _butterfly_table(R: int, wR: int, sc: int) -> np.ndarray:
    """A2[k*DT + d, u*DGR + lb] = digit_d(W[k,u] * sc * 2^(D*lb) mod p)."""
    A = np.zeros((R, DT, R, DGR), np.int8)
    wpows = _pow_list(wR, R)
    for k in range(R):
        for u in range(R):
            w = wpows[(k * u) % R] * sc % P
            for lb in range(DGR):
                A[k, :, u, lb] = _digits_of((w << (D * lb)) % P, DT)
    return A.reshape(R * DT, R * DGR)


def _const_digit_table(vals, cols: int = DGR) -> np.ndarray:
    """M[i, d, lb] = digit_d(vals[i] * 2^(D*lb) mod p)."""
    out = np.zeros((len(vals), DT, cols), np.int8)
    for i, c in enumerate(vals):
        for lb in range(cols):
            out[i, :, lb] = _digits_of((c << (D * lb)) % P, DT)
    return out


def _tw_split(h: int) -> int:
    K = 1
    while K * K < h:
        K *= 2
    while h % K:
        K *= 2
    return K


def _fold_tables():
    """Per-bit fold matmuls taking canonical digits to a value < 2^256.

    fold1: bits 253..276 (24 bits, from digit rows 42..46)
    fold2: bits 253..257 (5 bits, from digit row 42)     [after round 1]
    Each is (DT, nbits) int8 with column j = digits(2^bit_j mod p).
    """
    f1 = np.stack([_digits_of(pow(2, j, P), DT) for j in range(253, 277)], 1)
    f2 = np.stack([_digits_of(pow(2, j, P), DT) for j in range(253, 258)], 1)
    return f1.astype(np.int8), f2.astype(np.int8)


FOLD1, FOLD2 = _fold_tables()


def choose_factors(n: int) -> list[int]:
    """n = prod(factors), each <= 256, first >= 128 (lane rectangularity of
    pass-2 blocks), last >= 2.  Supported n: 2^11 .. 2^20."""
    assert n & (n - 1) == 0 and 1 << 11 <= n <= 1 << 20
    f1 = 256 if n >= (1 << 16) else 128
    rest = n // f1
    if rest <= 256:
        return [f1, rest]
    assert rest % 256 == 0
    return [f1, 256, rest // 256]


class PassPlan:
    """Tables for one pass: f-point DIT NTT (+ optional boundary twiddle)."""

    def __init__(self, f: int, omega_f: int, last_scale: int = 1):
        self.f = f
        self.radices = _radices_for(f)
        perm = _digitrev_perm(f, self.radices)
        # verify the reshape/transpose representation used in-kernel
        rr = np.arange(f).reshape(self.radices)
        rr = rr.transpose(tuple(reversed(range(len(self.radices))))).ravel()
        assert np.array_equal(perm, rr), "digit-rev reshape form mismatch"
        self.stages = []
        h = 1
        S = len(self.radices)
        for s, R in enumerate(self.radices):
            wR = pow(omega_f, f // R, P)
            sc = last_scale if s == S - 1 else 1
            A2 = _butterfly_table(R, wR, sc)
            tw = None
            K = r_hi_n = 1
            if s > 0:
                wm = pow(omega_f, f // (h * R), P)
                K = _tw_split(h)
                r_hi_n = h // K
                tw1 = _const_digit_table(
                    [pow(wm, u * rl, P) for u in range(R) for rl in range(K)]
                )       # (R*K, DT, DGR)
                tw2 = None
                if r_hi_n > 1:
                    wmK = pow(wm, K, P)
                    tw2 = _const_digit_table(
                        [pow(wmK, u * rh, P)
                         for u in range(R) for rh in range(r_hi_n)]
                    )   # (R*r_hi_n, DT, DGR)
                tw = (tw1, tw2)
            self.stages.append(dict(R=R, h=h, K=K, r_hi_n=r_hi_n,
                                    A2=A2, tw=tw))
            h *= R


class FusedPlan:
    """All tables for one (n, omega, scale, coset) transform.

    kind:
      fwd         fft
      inv         ifft (omega_inv + 1/n scale)
      inv_unnorm  unnormalized inverse
      coset_fwd   coset_fft   (premultiply by g powers in K1)
      coset_inv   coset_ifft  (inv + postmultiply by g^-1 powers)
    """

    def __init__(self, n: int, omega: int, scale: int = 1,
                 coset_pre: int | None = None, coset_post: int | None = None):
        self.n = n
        self.factors = choose_factors(n)
        k = len(self.factors)
        self.coset_post = coset_post
        # pass sub-roots: pass i transforms f_i with root omega^(prod f_<i)
        # restricted to order f_i; boundary i twiddle root has order
        # f_i * m_i = n / prod f_<i.
        self.passes = []
        self.boundaries = []   # (f_i, m_i) Montgomery limb tables
        pre = 1
        for i, f in enumerate(self.factors):
            m = n // (pre * f)
            w_blk = pow(omega, pre, P)        # order f*m
            w_pass = pow(w_blk, m, P)         # order f
            last = i == k - 1
            # last pass carries the transform scale, plus 2^256 so the
            # final trimmed REDC lands back in Montgomery form (with a coset
            # postmultiply the order is redc -> CIOS, which preserves it).
            sc = 1
            if last:
                sc = scale * RINT % P
            self.passes.append(PassPlan(f, w_pass, sc))
            if not last:
                tw = [pow(w_blk, ki * j, P) for ki in range(f)
                      for j in range(m)]
                # stored limb-leading (L, f, m) for the in-kernel CIOS
                self.boundaries.append(
                    _mont_limb_table(tw).reshape(f, m, L).transpose(2, 0, 1)
                )
            pre *= f
        self.coset_pre_tbl = None
        if coset_pre is not None:
            f1, m1 = self.factors[0], n // self.factors[0]
            self.coset_pre_tbl = _mont_limb_table(
                _pow_list(coset_pre, n)
            ).reshape(f1, m1, L).transpose(2, 0, 1)
        self.coset_post_tbl = None
        if coset_post is not None:
            # final element order IS natural, so g^-i in natural order,
            # viewed in the last pass's (k_last, rest) block layout:
            # element index = k_last * (n/f_last) + rest  ... no: natural
            # index = k1 + f1*k2 + ... => rest-major.  Build in the layout
            # the last kernel writes: (f_last, n/f_last) with element
            # natural index = rest * f_...; see _out_index_check below.
            fl = self.factors[-1]
            gl = _pow_list(coset_post, n)
            # last-pass block coords (k_last, chunk of k_old): natural
            # index = k_last * prod(f_<last) + k_old_linear  where
            # k_old_linear = k_{k-1}*f_{k-2}*.. + ... + k_1 -- i.e. the
            # trailing dims ARE the low digits: natural = k_last*(n//fl)+rest
            tbl = np.array(gl).reshape(fl, n // fl)          # [k_last, rest]
            self.coset_post_tbl = _mont_limb_table(
                tbl.ravel()
            ).reshape(fl, n // fl, L).transpose(2, 0, 1)
        self._dev = None

    def device_tables(self):
        if self._dev is None:
            with jax.ensure_compile_time_eval():
                passes = []
                for pp in self.passes:
                    st = []
                    for g in pp.stages:
                        st.append(dict(
                            A2=jnp.asarray(g["A2"]),
                            tw=None if g["tw"] is None else tuple(
                                None if t is None else jnp.asarray(t)
                                for t in g["tw"]
                            ),
                        ))
                    passes.append(st)
                self._dev = dict(
                    passes=passes,
                    boundaries=[jnp.asarray(b) for b in self.boundaries],
                    fold1=jnp.asarray(FOLD1),
                    fold2=jnp.asarray(FOLD2),
                    coset_pre=None if self.coset_pre_tbl is None
                    else jnp.asarray(self.coset_pre_tbl),
                    coset_post=None if self.coset_post_tbl is None
                    else jnp.asarray(self.coset_post_tbl),
                )
        return self._dev


@functools.lru_cache(maxsize=None)
def get_fused_plan(n: int, kind: str, omega: int, scale: int = 1,
                   coset_g: int | None = None) -> FusedPlan:
    if kind in ("fwd", "inv", "inv_unnorm"):
        return FusedPlan(n, omega, scale)
    if kind == "coset_fwd":
        return FusedPlan(n, omega, scale, coset_pre=coset_g)
    assert kind == "coset_inv"
    ginv = pow(coset_g, P - 2, P)
    return FusedPlan(n, omega, scale, coset_post=ginv)


# ---------------------------------------------------------------------------
# pure block functions (jnp; run inside Pallas kernels AND in CPU tests)
# All state: (DGR, F, C) int8 digit planes -- digit row leading, transform
# dim middle, lanes last.
# ---------------------------------------------------------------------------

def _relax_rows(y32, rows_out: int = DGR):
    """int32 digits (< 2^22, axis 0 = digit rows) -> int8 digits <= ~80."""
    x = y32.astype(jnp.int32)
    pad = rows_out - x.shape[0]
    zero = [(0, 0)] * (x.ndim - 1)
    if pad:
        x = jnp.pad(x, [(0, pad)] + zero)
    for _ in range(3):
        lo = x & (BASE - 1)
        hi = x >> D
        x = lo + jnp.pad(hi[:-1], [(1, 0)] + zero)
    return x.astype(jnp.int8)


def _ks_rows(x):
    """int32 digit rows (axis 0) -> canonical base-2^6 digits, exact."""
    zero = [(0, 0)] * (x.ndim - 1)
    for _ in range(2):
        lo = x & (BASE - 1)
        hi = x >> D
        x = lo + jnp.pad(hi[:-1], [(1, 0)] + zero)
    g = (x >= BASE).astype(jnp.int32)
    pr = (x == BASE - 1).astype(jnp.int32)
    d = 1
    K = x.shape[0]
    while d < K:
        gs = jnp.pad(g[:-d], [(d, 0)] + zero)
        ps = jnp.pad(pr[:-d], [(d, 0)] + zero, constant_values=1)
        g = g | (pr & gs)
        pr = pr & ps
        d <<= 1
    out = x + jnp.pad(g[:-1], [(1, 0)] + zero)
    return jnp.where(out >= BASE, out - BASE, out)


def digitize_limbs(x):
    """(L, ...) u32 canonical base-2^16 limb rows -> (DGR, ...) int8 digit
    rows (rows 43.. zero)."""
    rows = []
    for d in range(DGR):
        bit = D * d
        q, o = bit // LIMB_BITS, bit % LIMB_BITS
        if q >= L:
            rows.append(jnp.zeros_like(x[0]))
            continue
        v = x[q] >> o
        if o + D > LIMB_BITS and q + 1 < L:
            v = v | (x[q + 1] << (LIMB_BITS - o))
        rows.append(v & (BASE - 1))
    return jnp.stack(rows, axis=0).astype(jnp.int8)


def fold_to_limbs(xd, fold1, fold2):
    """(DGR, ...) int8 relaxed digits -> (L, ...) u32 canonical limbs with
    the SAME value mod p, < 2^256 (NOT fully reduced -- feeds CIOS).

    Chain (static bounds): relaxed digits <= ~80 on rows <= 45
      => value < 2^276.4; KS => canonical rows <= 46.
      fold bits 253..276 (24 per-bit constants, one small matmul)
      => value < 2^253 + 24p < 2^258; KS => bits <= 257.
      fold bits 253..257 => value < 2^253 + 5p < 2^255.8 < 2^256; KS.
      regroup 43 canonical digit rows -> 16 u32 limb rows.
    """
    zero = [(0, 0)] * (xd.ndim - 1)
    x = _ks_rows(xd.astype(jnp.int32))                  # (DGR, ...)

    def fold(x, lo_rows, bits_lo, tbl):
        nbits = tbl.shape[1]
        bits = []
        for j in range(bits_lo, bits_lo + nbits):
            bits.append((x[j // D] >> (j % D)) & 1)
        bits = jnp.stack(bits, 0).astype(jnp.int8)       # (nbits, ...)
        contrib = jax.lax.dot_general(
            tbl, bits.reshape(nbits, -1),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape((DT,) + x.shape[1:])
        lo = x[:lo_rows]
        # mask row (lo_rows-1) to bits below bits_lo
        keep = (1 << (bits_lo - D * (lo_rows - 1))) - 1
        lo = jnp.concatenate([lo[:-1], lo[-1:] & keep], axis=0)
        v = jnp.pad(lo, [(0, DT - lo_rows)] + zero) + contrib
        return _ks_rows(jnp.pad(v, [(0, 1)] + zero))     # (DT+1, ...)

    x = fold(x, 43, 253, fold1)      # rows 0..43, value < 2^258
    x = fold(x, 43, 253, fold2)      # rows 0..43, value < 2^256
    # regroup base-2^6 rows -> base-2^16 limb rows
    limbs = []
    Kr = x.shape[0]
    for i in range(L):
        bit = LIMB_BITS * i
        acc = None
        for t in range(bit // D, min(Kr, (bit + LIMB_BITS) // D + 1)):
            sh = D * t - bit
            v = (x[t] << sh) if sh >= 0 else (x[t] >> (-sh))
            acc = v if acc is None else acc + v
        limbs.append(acc & 0xFFFF)
    return jnp.stack(limbs, axis=0).astype(jnp.uint32)


def k_redc(spec, v):
    """Trimmed CIOS: canonical limb rows (L, ...) u32, value < 2^256 ->
    REDC(v) = v * 2^-256 mod p in [0, p+1) (canonical rows)."""
    from . import pallas_field as PF

    np0 = np.uint32(int(spec.nprime_limbs[0]))
    p_col = PF._const_col(spec.p_limbs, v)
    rest = v.shape[1:]
    zero_row = jnp.zeros((1,) + rest, jnp.uint32)
    acc = jnp.concatenate([v, zero_row], axis=0)         # (L+1, ...)
    for _ in range(L):
        m = (acc[0] & F.MASK) * np0 & F.MASK
        mp = m[None] * p_col
        lo = mp & F.MASK
        hi = mp >> LIMB_BITS
        acc = acc + jnp.pad(lo, [(0, 1)] + [(0, 0)] * len(rest)) \
                  + jnp.pad(hi, [(1, 0)] + [(0, 0)] * len(rest))
        carry = acc[0] >> LIMB_BITS
        acc = jnp.concatenate([acc[1:], zero_row], axis=0)
        acc = jnp.concatenate([acc[0:1] + carry, acc[1:]], axis=0)
    out, _ = PF._ks_carry(acc, K_out=L)
    return out


def apply_stage(xd, g, R: int, h: int, K: int, r_hi_n: int,
                mm_chunk: int | None = 512):
    """One DIT stage on state (DGR, F, C): twiddle matmuls (if h>1) then
    the radix-R butterfly matmul, relaxing after each.  mm_chunk bounds the
    int32 matmul output held at once (VMEM)."""
    DGRr, Ff, Cc = xd.shape
    b = Ff // (R * h)

    def tw_apply(xd, tbl, bsz, inner_first: bool):
        # xd (DGR, b, R, r_hi, K, C); tbl (R*bsz, DT, DGR) with bsz = K
        # (inner twiddle, batch (u, r_lo)) or r_hi_n (outer, batch (u,r_hi))
        x6 = xd.reshape(DGR, b, R, r_hi_n, K, Cc)
        if inner_first:
            xb = jnp.transpose(x6, (2, 4, 0, 1, 3, 5)).reshape(
                R * K, DGR, b * r_hi_n * Cc
            )
        else:
            xb = jnp.transpose(x6, (2, 3, 0, 1, 4, 5)).reshape(
                R * r_hi_n, DGR, b * K * Cc
            )
        cols = xb.shape[2]
        outs = []
        step = mm_chunk or cols
        for c0 in range(0, cols, step):
            y = jax.lax.dot_general(
                tbl, xb[:, :, c0 : c0 + step],
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )                                            # (B, DT, cols)
            outs.append(_relax_rows(jnp.transpose(y, (1, 0, 2))))
        y8 = jnp.concatenate(outs, axis=2)               # (DGR, B, cols)
        if inner_first:
            y6 = y8.reshape(DGR, R, K, b, r_hi_n, Cc)
            return jnp.transpose(y6, (0, 3, 1, 4, 2, 5)).reshape(DGR, Ff, Cc)
        y6 = y8.reshape(DGR, R, r_hi_n, b, K, Cc)
        return jnp.transpose(y6, (0, 3, 1, 2, 4, 5)).reshape(DGR, Ff, Cc)

    if g["tw"] is not None:
        tw1, tw2 = g["tw"]
        xd = tw_apply(xd, tw1, K, True)
        if tw2 is not None:
            xd = tw_apply(xd, tw2, r_hi_n, False)

    # butterfly: rows (u, lb) contraction
    xb = xd.reshape(DGR, b, R, h * Cc)
    xb = jnp.transpose(xb, (2, 0, 1, 3)).reshape(R * DGR, b * h * Cc)
    cols = xb.shape[1]
    outs = []
    step = mm_chunk or cols
    for c0 in range(0, cols, step):
        y = jax.lax.dot_general(
            g["A2"], xb[:, c0 : c0 + step],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(R, DT, -1)
        outs.append(_relax_rows(jnp.transpose(y, (1, 0, 2))))  # (DGR, R, c)
    y8 = jnp.concatenate(outs, axis=2).reshape(DGR, R, b, h, Cc)
    return jnp.transpose(y8, (0, 2, 1, 3, 4)).reshape(DGR, Ff, Cc)


def pass_body(xd, stage_tables, pp: PassPlan, mm_chunk: int | None = 512):
    """All DIT stages of one pass on (DGR, F, C) state (digit-rev included)."""
    DGRr, Ff, Cc = xd.shape
    # digit-reverse along the transform dim: reshape radices + reverse
    rad = pp.radices
    if len(rad) > 1:
        xr = xd.reshape((DGR,) + tuple(rad) + (Cc,))
        axes = (0,) + tuple(range(len(rad), 0, -1)) + (len(rad) + 1,)
        xd = jnp.transpose(xr, axes).reshape(DGR, Ff, Cc)
    for g_dev, g_meta in zip(stage_tables, pp.stages):
        xd = apply_stage(xd, g_dev, g_meta["R"], g_meta["h"],
                         g_meta["K"], g_meta["r_hi_n"], mm_chunk)
    return xd


# ---------------------------------------------------------------------------
# XLA emulation of the full pipeline (no Pallas): the numerics reference the
# kernels must match bit-for-bit, and the CPU test target.
# ---------------------------------------------------------------------------

def _kmul_limbs(v, tw):
    """CIOS Montgomery product on (L, ...) u32 limb rows (both canonical)."""
    from . import pallas_field as PF

    return PF.k_mul(F.FR, v, tw, unroll=True)


def transform_xla(plan: FusedPlan, x):
    """(n, L) u32 -> (n, L) u32, natural order in/out.  Pure jnp (runs on
    any backend); identical arithmetic to the Pallas kernels."""
    n = plan.n
    dev = plan.device_tables()
    k = len(plan.factors)
    f1 = plan.factors[0]
    v = jnp.transpose(x.reshape(f1, n // f1, L), (2, 0, 1))   # (L, f1, m1)
    if dev["coset_pre"] is not None:
        v = _kmul_limbs(v, dev["coset_pre"])
    xd = digitize_limbs(v)                                    # (DGR, f1, m1)
    for i, pp in enumerate(plan.passes):
        xd = pass_body(xd, dev["passes"][i], pp, mm_chunk=None)
        last = i == k - 1
        if not last:
            vv = fold_to_limbs(xd, dev["fold1"], dev["fold2"])
            tw = dev["boundaries"][i]           # (L, f_i, m_i)
            f_i, m_i = tw.shape[1], tw.shape[2]
            k_old = vv.shape[2] // m_i
            vv = _kmul_limbs(
                vv.reshape(L, f_i, m_i, k_old), tw[:, :, :, None]
            )                                        # (L, f_i, m_i, k_old)
            xd = digitize_limbs(vv)
            # corner turn: (f_i, m_i, k_old) -> (m_i, f_i, k_old), i.e. the
            # new element order (m_i, k_i, k_old); reinterpret as the next
            # pass's (f_{i+1}, rest)
            fn = plan.factors[i + 1]
            xd = jnp.transpose(xd, (0, 2, 1, 3)).reshape(DGR, fn, n // fn)
    vv = fold_to_limbs(xd, dev["fold1"], dev["fold2"])
    if dev["coset_post"] is not None:
        vv = k_redc(F.FR, vv)
        vv = _kmul_limbs(vv, dev["coset_post"])
    else:
        vv = k_redc(F.FR, vv)
    # (L, f_k, rest) -> natural (n, L)
    return jnp.transpose(vv, (1, 2, 0)).reshape(n, L)


# ---------------------------------------------------------------------------
# Pallas kernels: the same block functions, blocked over 128-lane chunks
# with all state/carries in VMEM.
# ---------------------------------------------------------------------------

from jax.experimental import pallas as pl           # noqa: E402
from jax.experimental.pallas import tpu as pltpu    # noqa: E402
from . import pallas_field as PF                    # noqa: E402

INTERPRET = PF.INTERPRET

# The pass kernels hold several int32 matmul/carry intermediates on the
# Mosaic stack; the default 16 MiB scoped-VMEM limit rejects them (observed:
# 23.5 MiB at f=128, cb=128).  v5e has 128 MiB physical VMEM — raise the cap.
_VMEM_CAP = dict(
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
)


def _chunk_lanes(f: int, M: int) -> int:
    """Lane width per grid step: ~32k elements per block, >= 128."""
    cb = max(128, 32768 // f)
    while M % cb:
        cb //= 2
    return max(cb, 128 if M >= 128 else M)


def _k1_digitize(plan: FusedPlan):
    f1 = plan.factors[0]
    m1 = plan.n // f1
    cb = _chunk_lanes(f1, m1)
    has_coset = plan.coset_pre_tbl is not None

    def kernel(*refs):
        if has_coset:
            x_ref, g_ref, o_ref = refs
        else:
            x_ref, o_ref = refs
            g_ref = None
        v = x_ref[:, :, :]                            # (f1, cb, L)
        v = jnp.transpose(v, (0, 2, 1))               # (f1, L, cb)
        v = jnp.transpose(v, (1, 0, 2))               # (L, f1, cb)
        if g_ref is not None:
            v = PF.k_mul(F.FR, v, g_ref[:, :, :], unroll=True)
        o_ref[:, :, :] = digitize_limbs(v)

    in_specs = [pl.BlockSpec((f1, cb, L), lambda j: (0, j, 0),
                             memory_space=pltpu.VMEM)]
    if has_coset:
        in_specs.append(pl.BlockSpec((L, f1, cb), lambda j: (0, 0, j),
                                     memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((DGR, f1, m1), jnp.int8),
        grid=(m1 // cb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((DGR, f1, cb), lambda j: (0, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
        **({} if INTERPRET else _VMEM_CAP),
    )


def _pass_call(plan: FusedPlan, i: int):
    """Builds the pallas_call for pass i.  Input (DGR, f_i, M) int8; output:
      i < k-1 : (DGR, m_i, f_i, k_old) int8   [corner turn at block level]
      last    : (f_k, M, L) u32 canonical [0, 2p) limbs, natural order
    """
    n = plan.n
    k = len(plan.factors)
    f = plan.factors[i]
    M = n // f
    pp = plan.passes[i]
    last = i == k - 1
    pre = 1
    for j in range(i):
        pre *= plan.factors[j]
    k_old = pre                      # product of done factors
    m_i = n // (pre * f)
    cb = _chunk_lanes(f, M)
    mm_chunk = 512

    # flatten stage tables into a positional input list
    tbl_arrays = []
    tbl_slots = []                   # per stage: (a2_idx, tw1_idx, tw2_idx)
    for g in pp.stages:
        a2i = len(tbl_arrays)
        tbl_arrays.append(g["A2"])
        t1i = t2i = None
        if g["tw"] is not None:
            t1i = len(tbl_arrays)
            tbl_arrays.append(g["tw"][0])
            if g["tw"][1] is not None:
                t2i = len(tbl_arrays)
                tbl_arrays.append(g["tw"][1])
        tbl_slots.append((a2i, t1i, t2i))

    has_boundary = not last
    has_post = last and plan.coset_post_tbl is not None

    def kernel(*refs):
        x_ref = refs[0]
        f1_ref, f2_ref = refs[1], refs[2]
        tbl_refs = refs[3 : 3 + len(tbl_arrays)]
        extra = refs[3 + len(tbl_arrays) : -1]
        o_ref = refs[-1]
        xd = x_ref[:, :, :]                            # (DGR, f, cb)
        stage_tables = []
        for (a2i, t1i, t2i) in tbl_slots:
            stage_tables.append(dict(
                A2=tbl_refs[a2i][:, :],
                tw=None if t1i is None else (
                    tbl_refs[t1i][:, :, :],
                    None if t2i is None else tbl_refs[t2i][:, :, :],
                ),
            ))
        xd = pass_body(xd, stage_tables, pp, mm_chunk=mm_chunk)
        if has_boundary:
            vv = fold_to_limbs(xd, f1_ref[:, :], f2_ref[:, :])
            if k_old == 1:
                tw = extra[0][:, :, :]                 # (L, f, cb)
                vv = PF.k_mul(F.FR, vv, tw, unroll=True)
                out = digitize_limbs(vv)               # (DGR, f, cb)
                o_ref[:, :, :] = jnp.transpose(out, (0, 2, 1))
            else:
                # one m-column of the (L, f, m_i) table, picked dynamically
                m_idx = pl.program_id(0) // (k_old // cb)
                tw = extra[0][:, :, pl.ds(m_idx, 1)]   # (L, f, 1)
                vv = PF.k_mul(F.FR, vv, jnp.broadcast_to(tw, vv.shape),
                              unroll=True)
                out = digitize_limbs(vv)
                o_ref[:, :, :, :] = out[:, None]       # (DGR, 1, f, cb)
        else:
            vv = fold_to_limbs(xd, f1_ref[:, :], f2_ref[:, :])
            vv = k_redc(F.FR, vv)
            if has_post:
                vv = PF.k_mul(F.FR, vv, extra[0][:, :, :], unroll=True)
            # (L, f, cb) -> (f, cb, L)
            vv = jnp.transpose(vv, (1, 0, 2))
            o_ref[:, :, :] = jnp.transpose(vv, (0, 2, 1))

    in_specs = [pl.BlockSpec((DGR, f, cb), lambda c: (0, 0, c),
                             memory_space=pltpu.VMEM)]
    in_specs.append(pl.BlockSpec(FOLD1.shape, lambda c: (0, 0),
                                 memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(FOLD2.shape, lambda c: (0, 0),
                                 memory_space=pltpu.VMEM))
    for t in tbl_arrays:
        nd = t.ndim
        in_specs.append(pl.BlockSpec(
            t.shape, (lambda c, _nd=nd: (0,) * _nd),
            memory_space=pltpu.VMEM,
        ))
    extra_arrays = []
    if has_boundary:
        tw = plan.device_tables()["boundaries"][i]     # (L, f, m_i)
        extra_arrays.append(tw)
        if k_old == 1:
            in_specs.append(pl.BlockSpec((L, f, cb), lambda c: (0, 0, c),
                                         memory_space=pltpu.VMEM))
        else:
            # small (m_i <= 256): whole table resident, dynamic m slice
            in_specs.append(pl.BlockSpec((L, f, m_i), lambda c: (0, 0, 0),
                                         memory_space=pltpu.VMEM))
    if has_post:
        gt = plan.device_tables()["coset_post"]        # (L, f, M)
        extra_arrays.append(gt)
        in_specs.append(pl.BlockSpec((L, f, cb), lambda c: (0, 0, c),
                                     memory_space=pltpu.VMEM))

    if not last:
        if k_old == 1:
            out_shape = jax.ShapeDtypeStruct((DGR, m_i, f), jnp.int8)
            out_spec = pl.BlockSpec((DGR, cb, f), lambda c: (0, c, 0),
                                    memory_space=pltpu.VMEM)
        else:
            ko_blocks = k_old // cb
            out_shape = jax.ShapeDtypeStruct((DGR, m_i, f, k_old), jnp.int8)
            out_spec = pl.BlockSpec(
                (DGR, 1, f, cb),
                lambda c, _kb=ko_blocks: (0, c // _kb, 0, c % _kb),
                memory_space=pltpu.VMEM,
            )
    else:
        out_shape = jax.ShapeDtypeStruct((f, M, L), jnp.uint32)
        out_spec = pl.BlockSpec((f, cb, L), lambda c: (0, c, 0),
                                memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(M // cb,),
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=INTERPRET,
        **({} if INTERPRET else _VMEM_CAP),
    )
    return call, tbl_arrays, extra_arrays


@functools.lru_cache(maxsize=None)
def _transform_fn(plan: FusedPlan):
    """jitted (n, L) u32 -> (n, L) u32 through the Pallas pipeline."""
    n = plan.n
    k = len(plan.factors)
    k1 = _k1_digitize(plan)
    passes = [_pass_call(plan, i) for i in range(k)]
    dev = plan.device_tables()

    def fn(x):
        f1 = plan.factors[0]
        xv = x.reshape(f1, n // f1, L)
        if dev["coset_pre"] is not None:
            xd = k1(xv, dev["coset_pre"])
        else:
            xd = k1(xv)
        for i in range(k):
            call, tbls, extras = passes[i]
            fi = plan.factors[i]
            xd = call(xd.reshape(DGR, fi, n // fi),
                      dev["fold1"], dev["fold2"], *tbls, *extras)
        return xd.reshape(n, L)

    return jax.jit(fn)


def transform(plan: FusedPlan, x):
    return _transform_fn(plan)(x)
