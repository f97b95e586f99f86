"""Time the MXU digit-matmul NTT on the real TPU vs the radix-2 ladder.

Usage: python scripts/ntt_mxu_tpu_bench.py [log2_sizes...]  (default 16 20)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.ops import ntt, ntt_mxu

P = C.R_MOD


def timeit(fn, reps=5):
    fn()  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    logs = [int(a) for a in sys.argv[1:]] or [16, 20]
    for lg in logs:
        n = 1 << lg
        rng = np.random.default_rng(lg)
        xs = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]
        xd = F.FR.to_device(xs)
        dom = ntt.get_radix2_domain(n)
        plan = ntt_mxu.get_plan(n, dom.omega)

        t_mxu = timeit(lambda: ntt_mxu.transform(plan, xd))
        d = dom._dev()
        t_r2 = timeit(lambda: dom._fft_j(xd, d["perm"], d["twf"]))

        # correctness spot check
        a = np.asarray(ntt_mxu.transform(plan, xd))
        b = np.asarray(dom._fft_j(xd, d["perm"], d["twf"]))
        va = [sum(int(l) << (16 * i) for i, l in enumerate(r)) % P for r in a[:64]]
        vb = [sum(int(l) << (16 * i) for i, l in enumerate(r)) % P for r in b[:64]]
        ok = va == vb
        print(f"2^{lg}: mxu {t_mxu*1e3:8.2f} ms   radix2 {t_r2*1e3:8.2f} ms   "
              f"speedup {t_r2/t_mxu:5.2f}x   match={ok}", flush=True)


if __name__ == "__main__":
    main()
