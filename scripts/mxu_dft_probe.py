"""MXU DFT-16 probe: the 16-point Fr DFT as an int8-digit matmul.

Round-3 NTT plan (see ROUND2_NOTES.md): a radix-16 NTT whose base case is
    X[k] = sum_j W[k,j] * x[j]   (W = 16x16 DFT matrix, SHARED across batch)
computed on the MXU by limb-decomposing both sides into base-2^7 digits:
    T[k, la, lb, b] = sum_j W[k,j]_la * x[j]_lb[b]
is a real (16*Lw, 16) x (16, Lx*B) int8 matmul with int32 accumulation
(products <= 127^2, 16-term contraction => well inside int32), followed by
an anti-diagonal fold  Y[k, t, b] = sum_{la+lb=t} T[k, la, lb, b]  on the
VPU, leaving one redundant base-2^7 digit vector per output to Montgomery-
reduce (one VPU pass, vs 4 full butterfly muls for the radix-2 ladder).

This probe checks CORRECTNESS of the matmul+fold against host big-int DFT
(reduction done host-side) and measures matmul+fold throughput on the v5e.

MEASURED (v5e, 2026-08-18): correctness PASSES; throughput 0.7 M el/s —
HBM-bound, not compute-bound: the (16*LW, LW*B) int32 digit outer-product
T is ~355 MB per 2^16 elements and XLA materializes it between the dot and
the fold.  Conclusion for round 3: the formulation only pays off as a FUSED
Pallas kernel (per-la A_la (16,16) int8 dots accumulated into the (16,
2LW-1, Bt) fold buffer in VMEM, never materializing T to HBM); otherwise
prefer multi-stage in-kernel radix-2 fusion on the VPU (per-stage cost is
3.7 ms vs ~1.3 ms compute bound at 2^20 — a more certain ~2.5x).

Run: python scripts/mxu_dft_probe.py   (needs the axon TPU; CPU also works)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.ops import ntt

P = F.FR.p
D = 7                      # digit bits (signed-int8 safe: digits in [0,127])
LW = -(-P.bit_length() // D)   # 37 digits for a 253-bit value


def to_digits(v: int, n: int) -> list[int]:
    return [(v >> (D * i)) & ((1 << D) - 1) for i in range(n)]


def main():
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)

    dom = ntt.get_radix2_domain(16)
    w = dom.omega
    W = [[pow(w, (j * k) % 16, P) for j in range(16)] for k in range(16)]

    # A[k*LW + la, j] = la-th digit of W[k][j]
    A = np.zeros((16 * LW, 16), np.int8)
    for k in range(16):
        for j in range(16):
            for la, d in enumerate(to_digits(W[k][j], LW)):
                A[k * LW + la, j] = d
    A_dev = jnp.asarray(A)

    B = 1 << 12                      # batch of independent DFT-16s
    xs = [[int.from_bytes(rng.bytes(40), "little") % P for _ in range(16)]
          for _ in range(B)]
    # X[j, lb*B + b]: random timing filler first, then the checked prefix
    # written ONCE (host digitization is slow, so only the first 2^10
    # columns carry real digits; the rest only feed the timing run)
    X = rng.integers(0, 1 << D, (16, LW * B), dtype=np.int8)
    for b, vec in enumerate(xs[: 1 << 10]):
        for j, v in enumerate(vec):
            for lb, d in enumerate(to_digits(v, LW)):
                X[j, lb * B + b] = d
    X_dev = jnp.asarray(X)

    @jax.jit
    def dft_digits(Xd):
        # (16*LW, 16) x (16, LW*B) -> (16*LW, LW*B) int32 on the MXU
        T = jax.lax.dot_general(
            A_dev, Xd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        T = T.reshape(16, LW, LW, B)          # (k, la, lb, b)
        # anti-diagonal fold: Y[k, t, b] = sum_{la+lb=t} T[k, la, lb, b]
        out = jnp.zeros((16, 2 * LW - 1, B), jnp.int32)
        for la in range(LW):
            out = out.at[:, la : la + LW].add(T[:, la])
        return out                            # (k, 2*LW-1, b) int32

    Y = np.asarray(jax.block_until_ready(dft_digits(X_dev)))

    # correctness on the checked prefix, reduction host-side
    for b in range(64):
        for k in range(16):
            got = sum(int(Y[k, t, b]) << (D * t) for t in range(2 * LW - 1)) % P
            exp = sum(W[k][j] * xs[b][j] for j in range(16)) % P
            assert got == exp, (b, k)
    print("MXU-DFT16-CORRECT (64x16 outputs vs host big-int)", flush=True)

    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = dft_digits(X_dev)
    np.asarray(out[0, 0, 0])
    dt = (time.perf_counter() - t0) / reps
    n_el = 16 * B
    print(
        f"DFT-16 digit-matmul+fold: {dt*1e3:.2f} ms for {n_el} Fr elements "
        f"-> {n_el/dt/1e6:.1f} M el/s "
        f"(radix-2 equiv: 4 butterfly muls/el saved per radix-16 stage)",
        flush=True,
    )


if __name__ == "__main__":
    main()
