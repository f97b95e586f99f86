"""Benchmark driver: runs the headline configs on the real TPU chip and
prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} to stdout.

Headline metric (BASELINE.json: "MSM points/s/chip + NTT butterflies/s/chip"):
measured G1 Pippenger MSM throughput at 2^16.

Baseline derivation (per-kernel, not whole-prove attribution): the
reference's Groth16 local prove at 2^20 takes 127.4 s on a GCP VM
(analysis/data/groth16.csv:22).  A Groth16 prove at 2^20 is ~4 G1 MSMs of
2^20 points + 1 G2 MSM + 7 FFTs; attributing the dominant ~70% of the wall
time to the ~4.2M G1-point MSM work gives ~47 K G1 points/s for arkworks'
Pippenger on that machine (consistent with ~20 us/point single-thread
BLS12-377 rules of thumb).  vs_baseline > 1 means this chip beats the
reference VM's measured per-kernel MSM throughput.

Robustness contract (round-1 failure: rc=124, no JSON): the JSON line is
printed IMMEDIATELY after the two kernel measurements; everything after it
(Groth16 prove walls, MPC rows) is budget-guarded extras on stderr.
"""

import json
import os
import sys
import time

T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "2100"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def remaining():
    return BUDGET_S - (time.perf_counter() - T_START)


def _device_watchdog():
    """The axon TPU claim can wedge indefinitely (observed: a stuck remote
    grant blocks client init at import).  Probe device init in a THROWAWAY
    subprocess first; if it can't come up within BENCH_INIT_TIMEOUT_S,
    emit a value-0 headline (parseable; vs_baseline 0 flags the outage)
    instead of hanging into the driver's rc=124."""
    import subprocess

    budget = float(os.environ.get("BENCH_INIT_TIMEOUT_S", "300"))
    code = (
        "import os; os.environ.setdefault('JAX_PLATFORMS','tpu');"
        "import jax; jax.devices(); print('up')"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=budget, capture_output=True
        )
        if b"up" in r.stdout:
            return
        log("device probe failed:", r.stderr[-400:])
    except subprocess.TimeoutExpired:
        log(f"device init did not complete in {budget}s — TPU unreachable")
    print(
        json.dumps(
            {
                "metric": "msm_g1_points_per_sec_2^16",
                "value": 0,
                "unit": "points/s",
                "vs_baseline": 0,
            }
        ),
        flush=True,
    )
    sys.exit(0)


def main():
    os.environ["JAX_PLATFORMS"] = "tpu"  # the axon plugin registers as 'tpu'
    _device_watchdog()
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

    P = C.R_MOD
    rng = np.random.default_rng(0)

    # Timing rule on the axon tunnel: jax.block_until_ready does NOT force
    # remote execution — only a host materialization (np.asarray) does, and
    # a LARGE materialization also pays the (slow) tunnel transfer.  So every
    # timed section materializes a TINY dependent slice of the result.

    # ---- NTT throughput at 2^20 (config 2) ------------------------------
    n = 1 << 20
    dom = ntt.get_radix2_domain(n)
    big = F.rand(F.FR, rng, (n,))
    y = dom.fft(big)
    np.asarray(y[0])
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        y = dom.fft(y)
    np.asarray(y[0])  # dependent on ALL reps; tiny transfer
    ntt_time = (time.perf_counter() - t0) / reps
    butterflies = n // 2 * 20
    log(
        f"NTT 2^20: {ntt_time*1e3:.1f} ms -> "
        f"{butterflies/ntt_time/1e6:.1f} M butterflies/s"
    )

    # ---- MSM throughput at 2^16 (config 2) ------------------------------
    # 2^16 DISTINCT random points via the native host fixed-base kernel
    # (round-2 verdict item 9: no tiled-points caveat; the native path makes
    # this cheap and keeps device fixed-base compiles out of the headline).
    n_msm = 1 << 16
    from collaborative_zksnark_tpu.algebra import ffi_field

    if ffi_field.HAVE_FFI:
        pts = msm_mod.fixed_base_msm_ints(
            cv.FQ_OPS,
            H.G1,
            H.G1_GEN,
            [int.from_bytes(rng.bytes(32), "little") % P for _ in range(n_msm)],
        )
    else:  # no native lib: tiled distinct points (timing-neutral fallback)
        n_distinct = 64
        host_pts = [
            H.G1.scalar_mul(H.G1_GEN, int(rng.integers(1, 1 << 62)))
            for _ in range(n_distinct)
        ]
        pts1 = cv.g1_from_host(host_pts)
        reps_t = n_msm // n_distinct
        pts = cv.JacPoint(
            jnp.tile(pts1.x, (reps_t, 1)),
            jnp.tile(pts1.y, (reps_t, 1)),
            jnp.tile(pts1.z, (reps_t, 1)),
        )
    np.asarray(pts.x[0])
    sc = F.rand(F.FR, rng, (n_msm,))
    res = msm_mod.msm(cv.FQ_OPS, pts, sc)
    np.asarray(res.x)
    sc2 = F.rand(F.FR, rng, (n_msm,))
    np.asarray(sc2[0])  # land the input before timing
    t0 = time.perf_counter()
    res = msm_mod.msm(cv.FQ_OPS, pts, sc2)
    np.asarray(res.x)  # single point: tiny transfer
    msm_time = time.perf_counter() - t0
    msm_rate = n_msm / msm_time
    log(f"MSM 2^16: {msm_time*1e3:.1f} ms -> {msm_rate/1e3:.1f} K points/s")

    # ---- headline JSON: printed NOW, before any slow extras -------------
    msm_baseline = 47_000.0  # see module docstring for the derivation
    print(
        json.dumps(
            {
                "metric": "msm_g1_points_per_sec_2^16",
                "value": round(msm_rate, 1),
                "unit": "points/s",
                "vs_baseline": round(msm_rate / msm_baseline, 3),
            }
        ),
        flush=True,
    )

    # ---- extras (budget-guarded, stderr only) ---------------------------
    try:
        extras(rng)
    except Exception as e:  # extras must never poison the headline
        log(f"extras aborted: {type(e).__name__}: {e}")


def extras(rng):
    """Reference-scale rows (budget-guarded, stderr): Groth16 local at
    2^14/2^20 and 2-party SPDZ at 2^16 (+2^20 budget permitting) on the
    chip — the BASELINE.md:15-17 flagship configs (ref: 127.4 s local /
    133.2 s 2-party SPDZ @2^20 on GCP VMs, analysis/data/groth16.csv:22).
    Setup runs on the NATIVE host fixed-base kernel and ships points once
    (the round-2 198 s device-compile setup wall is gone)."""
    import jax
    import numpy as np

    from collaborative_zksnark_tpu.algebra import field as F
    from collaborative_zksnark_tpu.mpc import wire
    from collaborative_zksnark_tpu.mpc.context import MpcContext
    from collaborative_zksnark_tpu.parallel.net import StackedNet
    from collaborative_zksnark_tpu.relations import r1cs
    from collaborative_zksnark_tpu.snark import groth16

    def build(logn, seed):
        size = 1 << logn
        t0 = time.perf_counter()
        cs, assign = r1cs.squaring_circuit(size)
        pk, vk = groth16.setup(cs, seed=seed)
        np.asarray(pk.a_query.x[0])  # land the key transfer
        log(f"groth16 setup 2^{logn}: {time.perf_counter()-t0:.1f}s "
            f"(native fixed-base + one device transfer)")
        return cs, assign, pk, vk

    def local_prove(cs, assign, pk, vk, logn):
        inst, wit = assign(12345)
        z = F.FR.to_device(inst + wit)
        r_m = F.rand(F.FR, rng, ())
        s_m = F.rand(F.FR, rng, ())
        proof = groth16.prove(pk, cs, z, r_m, s_m)  # warm-up (compile)
        groth16.reveal_proof(proof)
        t0 = time.perf_counter()
        proof = groth16.prove(pk, cs, z, r_m, s_m)
        hp = groth16.reveal_proof(proof)
        dt = time.perf_counter() - t0
        ok = groth16.verify(vk, hp, inst[1:])
        log(f"groth16 local prove 2^{logn}: {dt:.3f}s verified={ok}  "
            f"(ref @2^20: 127.4s)")
        assert ok
        return dt

    def spdz_prove(cs, assign, pk, vk, logn):
        """2-party SPDZ collaborative prove, stacked on the one chip: the
        wall carries BOTH parties' compute serially + MAC tracking (a real
        2-chip deployment runs the halves concurrently)."""
        inst, wit = assign(777)
        net = StackedNet(2)
        ctx = MpcContext(net, seed=9)
        sch = wire.make_scheme("spdz", ctx)
        z_sh = sch.king_share(F.FR.to_device(inst + wit))
        r_sh = wire.rand_share(sch)
        s_sh = wire.rand_share(sch)
        pf = groth16.prove_mpc(pk, cs, sch, z_sh, r_sh, s_sh)  # warm-up
        groth16.reveal_proof(pf)
        net2 = StackedNet(2)
        ctx2 = MpcContext(net2, seed=9)
        sch2 = wire.make_scheme("spdz", ctx2)
        z_sh = sch2.king_share(F.FR.to_device(inst + wit))
        r_sh = wire.rand_share(sch2)
        s_sh = wire.rand_share(sch2)
        t0 = time.perf_counter()
        pf = groth16.prove_mpc(pk, cs, sch2, z_sh, r_sh, s_sh)
        hp = groth16.reveal_proof(pf)
        dt = time.perf_counter() - t0
        ok = groth16.verify(vk, hp, inst[1:])
        ctx2.assert_checks()
        log(f"groth16 SPDZ 2-party prove 2^{logn}: {dt:.3f}s "
            f"(both parties stacked on 1 chip; per-party-equiv "
            f"~{dt/2:.1f}s; ref 2x VM @2^20: 133.2s) verified={ok}")
        assert ok
        return dt

    # the 2^20 FLAGSHIP first (BASELINE.md:15-17), then smaller insurance
    # rows with whatever budget remains; each block is fault-isolated
    def block20():
        if remaining() < 700:
            log("skipping 2^20 rows: budget")
            return
        cs20, assign20, pk20, vk20 = build(20, seed=3)
        t_local = local_prove(cs20, assign20, pk20, vk20, 20)
        log(f"vs reference local @2^20: {127.4/t_local:.2f}x")
        if remaining() > max(350, 3.5 * t_local):
            t_spdz = spdz_prove(cs20, assign20, pk20, vk20, 20)
            log(f"vs reference 2-party SPDZ @2^20: {133.2/t_spdz:.2f}x")

    def block(logn, seed):
        if remaining() < 250:
            log(f"skipping 2^{logn} rows: budget")
            return
        cs, assign, pk, vk = build(logn, seed=seed)
        local_prove(cs, assign, pk, vk, logn)
        if remaining() > 200:
            spdz_prove(cs, assign, pk, vk, logn)

    for blk in (block20, lambda: block(14, 1), lambda: block(16, 2)):
        try:
            blk()
        except Exception as e:  # fault-isolate: later blocks still run
            log(f"block failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
