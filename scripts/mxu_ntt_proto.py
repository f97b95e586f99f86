"""Numpy prototype of the digit-matmul radix-16 NTT (round-3 NTT plan v2).

The round-2 probe (mxu_dft_probe.py) validated DFT-16 as an int8 digit
matmul but was HBM-bound on the (16*LW, LW*B) outer-product T.  This
prototype removes T entirely: fold + mod-p reduction are absorbed into the
table
    A[(k,d), (j,lb)] = digit_d( W16[k,j] * 2^(D*lb) mod p )
so ONE (16*Dt, 16*Dx) int8 matmul yields output digits already reduced
mod p (int32, redundant).  Inter-stage twiddles w_m^(u*r) factor as
r = r_hi*K + r_lo into TWO batched small matmuls with per-(u, r_lo) /
(u, r_hi) digit tables — no elementwise field mul anywhere.

Digit base 2^6: three carry-relax passes bound data digits <= ~80 < 127
(int8-safe, redundant — the matmul needs bounded digits, not canonical).

This file checks CORRECTNESS against the production Radix2Domain on CPU
and records the op-count budget; ops/ntt_mxu.py is the production port.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from collaborative_zksnark_tpu.algebra import bls12_377 as C

P = C.R_MOD
D = 6                      # digit bits
BASE = 1 << D
DX = -(-256 // D)          # 43 data digits hold a canonical 253-bit value
DT = -(-P.bit_length() // D)   # 43 table digits (constants < p)


def to_digits(v: int, n: int) -> np.ndarray:
    return np.array([(v >> (D * i)) & (BASE - 1) for i in range(n)], np.int8)


def from_digits(d) -> int:
    return sum(int(v) << (D * i) for i, v in enumerate(d.tolist()))


def relax3(x32: np.ndarray, d_out: int) -> np.ndarray:
    """int32 redundant digits (axis -1) -> int8 digits <= ~80, value kept.
    Three relax passes; digit count grows to d_out."""
    x = x32.astype(np.int64)
    pad = d_out - x.shape[-1]
    assert pad >= 0
    x = np.concatenate([x, np.zeros(x.shape[:-1] + (pad,), np.int64)], -1)
    for _ in range(3):
        lo = x & (BASE - 1)
        hi = x >> D
        x = lo + np.concatenate(
            [np.zeros(x.shape[:-1] + (1,), np.int64), hi[..., :-1]], -1
        )
        assert int(hi[..., -1].max() if hi.size else 0) == 0, "top carry lost"
    m = int(x.max())
    assert m <= 127, f"digit overflow after relax3: {m}"
    return x.astype(np.int8)


def stage_matrix(w16_pows, dx_in: int):
    """A[(k,d),(u,lb)] = digit_d(W16[k,u] * 2^(D*lb) mod p), int8."""
    A = np.zeros((16 * DT, 16 * dx_in), np.int8)
    for k in range(16):
        for u in range(16):
            w = w16_pows[(k * u) % 16]
            for lb in range(dx_in):
                c = (w << (D * lb)) % P
                A[k * DT : (k + 1) * DT, u * dx_in + lb] = to_digits(c, DT)
    return A


def tw_tables(vals, dx_in: int):
    """vals: dict (idx -> int const).  M[idx][d, lb] = digit_d(c*2^(D*lb)%p)."""
    out = np.zeros((len(vals), DT, dx_in), np.int8)
    for i, c in enumerate(vals):
        for lb in range(dx_in):
            out[i, :, lb] = to_digits((c << (D * lb)) % P, DT)
    return out


def ntt_digit_matmul(x_ints, omega):
    """Full radix-16 digit-matmul NTT of n = 16^S values (plain ints in
    [0,p)); returns ints.  Mirrors the device pipeline op-for-op."""
    n = len(x_ints)
    S = 0
    m = n
    while m > 1:
        assert m % 16 == 0
        m //= 16
        S += 1
    # base-16 digit reversal permutation
    idx = np.arange(n)
    rev = np.zeros_like(idx)
    t = idx.copy()
    for _ in range(S):
        rev = rev * 16 + (t % 16)
        t //= 16
    x = np.asarray([x_ints[j] for j in rev], object)

    # digitize: (n, DX) int8
    xd = np.stack([to_digits(int(v), DX) for v in x])
    dx = DX
    mul_macs = 0

    for s in range(S):
        h = 16 ** s
        # ---- inter-stage twiddle: w_m^(u*r), m = 16^(s+1) ----------------
        if s > 0:
            wm = pow(omega, n // (16 ** (s + 1)), P)
            # split r = r_hi*K + r_lo, K = smallest pow16 >= sqrt(h)
            K = 1
            while K * K < h:
                K *= 16
            r_hi_n = h // K
            # view x as (blocks, u, r_hi, r_lo, digits)
            xb = xd.reshape(n // (16 * h), 16, r_hi_n, K, dx)
            # sub-layer 1: mul by wm^(u*r_lo): table index (u, r_lo)
            t1 = tw_tables(
                [pow(wm, u * rl, P) for u in range(16) for rl in range(K)], dx
            ).reshape(16, K, DT, dx)
            # out[b,u,rh,rl,d] = sum_lb t1[u,rl,d,lb] * xb[b,u,rh,rl,lb]
            y = np.einsum("urdl,buRrl->buRrd",
                          t1.astype(np.int64), xb.astype(np.int64))
            mul_macs += 16 * K * DT * dx * (n // (16 * h)) * r_hi_n
            xd = relax3(y, DT + 3)
            dx = xd.shape[-1]
            if r_hi_n > 1:
                wmK = pow(wm, K, P)
                t2 = tw_tables(
                    [pow(wmK, u * rh, P) for u in range(16) for rh in range(r_hi_n)],
                    dx,
                ).reshape(16, r_hi_n, DT, dx)
                xb = xd.reshape(n // (16 * h), 16, r_hi_n, K, dx)
                y = np.einsum("uRdl,buRrl->buRrd",
                              t2.astype(np.int64), xb.astype(np.int64))
                mul_macs += 16 * r_hi_n * DT * dx * (n // (16 * h)) * K
                xd = relax3(y, DT + 3)
                dx = xd.shape[-1]
        # ---- radix-16 butterfly: one (16*DT, 16*dx) matmul ---------------
        # the 16-point DFT root is omega^(n/16) at EVERY stage (the stage
        # dependence lives entirely in the twiddle layer above)
        w16 = pow(omega, n // 16, P)
        A = stage_matrix([pow(w16, e, P) for e in range(16)], dx)
        xb = xd.reshape(n // (16 * h), 16, h, dx)
        # out[b,k,r,d] = sum_{u,lb} A[(k,d),(u,lb)] * xb[b,u,r,lb]
        y = np.einsum(
            "kdul,burl->bkrd",
            A.reshape(16, DT, 16, dx).astype(np.int64),
            xb.astype(np.int64),
        )
        mul_macs += 16 * DT * 16 * dx * (n // (16 * h)) * h
        xd = relax3(y, DT + 3).reshape(n, DT + 3)
        dx = DT + 3

    out = [from_digits(xd[i]) % P for i in range(n)]
    return out, mul_macs


def main():
    from collaborative_zksnark_tpu.ops import ntt

    rng = np.random.default_rng(1)
    for n in (256, 4096):
        dom = ntt.get_radix2_domain(n)
        xs = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]
        t0 = time.time()
        got, macs = ntt_digit_matmul(xs, dom.omega)
        # reference: direct host evaluation via the production domain
        import jax.numpy as jnp
        from collaborative_zksnark_tpu.algebra import field as F

        xs_dev = F.FR.to_device(xs)
        exp = [int(v) for v in F.FR.to_host(np.asarray(dom.fft(xs_dev)))]
        assert got == exp, f"MISMATCH at n={n}"
        print(
            f"n={n}: digit-matmul NTT CORRECT  "
            f"({macs/n:.0f} MACs/element, host {time.time()-t0:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
