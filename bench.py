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
# The driver wraps the bench in a hard timeout somewhere past ~1634 s
# (round-4 forensics: the driver run started 19:49:46, its last
# compile-cache write lands at 20:16:xx, and the kill came later — rc=124
# in rounds 1/3/4).  The internal budget sits safely below that floor so
# the SIGALRM clean-exit (budget+40 s) always beats the driver kill.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1560"))


def log(*a):
    el = time.perf_counter() - T_START
    print(f"[+{el:7.1f}s]", *a, file=sys.stderr, flush=True)


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
    # butterflies are data-independent: tile a small host-random block to
    # full size ON DEVICE instead of shipping 32 MB over the tunnel
    seedblk = F.rand(F.FR, rng, (4096,))
    big = jnp.tile(seedblk, (n // 4096, 1))
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
    reps_m = 3  # single-shot timing is hostage to tunnel latency spikes
    t0 = time.perf_counter()
    outs = [msm_mod.msm(cv.FQ_OPS, pts, sc2) for _ in range(reps_m)]
    for o in outs:  # programs execute serially in dispatch order
        np.asarray(o.x)  # single point: tiny transfer
    msm_time = (time.perf_counter() - t0) / reps_m
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

    # The headline is out — from here on rc must be 0 no matter what.  A
    # block that starts inside the budget but hits an unexpected recompile
    # (cache eviction, code drift) could otherwise run into the driver's
    # hard timeout (rc=124, rounds 1/3/4).  A daemon WATCHDOG THREAD exits
    # cleanly at BUDGET+40 s; every row already flushes as it lands.
    # (SIGALRM is not enough: delivery waits for the main thread to leave
    # its current C call, and a tunnel RPC delayed it 116 s in rehearsal.)
    import threading

    def _budget_watchdog():
        time.sleep(max(1.0, remaining() + 40))
        log("budget watchdog - exiting cleanly with the rows recorded so far")
        sys.stderr.flush()
        os._exit(0)

    threading.Thread(target=_budget_watchdog, daemon=True).start()
    log("full warm row set (all systems/sizes, this code, measured in-session):"
        " analysis/data/tpu_bench_r5.txt")

    # ---- speed-of-light accounting (BASELINE north star) ----------------
    # Measure the chip's elementwise modmul peaks LIVE (Fr for NTT, Fq for
    # curve adds), then relate each headline to its kernel's known mul
    # count.  A chained y = y*b loop forces sequential execution.
    try:
        def peak_muls(spec, tag):
            # 2^20 operands: smaller sizes under-amortize the fixed
            # per-dispatch tunnel latency and UNDERSTATE the peak (a 2^19
            # probe read 139 M Fr-muls/s vs the true ~229 M, pushing the
            # roofline % over 100) — the SoL denominator must be the
            # best-achievable rate
            m = 1 << 20
            # elementwise modmul is data-independent — tile small random
            # blocks on device (saves ~2x32 MB of tunnel transfer)
            ab = F.rand(spec, rng, (4096,))
            bb = F.rand(spec, rng, (4096,))
            a = jnp.tile(ab, (m // 4096, 1))
            b = jnp.tile(bb, (m // 4096, 1))
            f = jax.jit(lambda u, v: F.mul(spec, u, v))
            y = f(a, b)
            np.asarray(y[0])
            reps_p = 8
            t0 = time.perf_counter()
            for _ in range(reps_p):
                y = f(y, b)
            np.asarray(y[0])
            rate = m * reps_p / (time.perf_counter() - t0)
            log(f"peak {tag} modmul: {rate/1e6:.0f} M muls/s")
            return rate

        fr_peak = peak_muls(F.FR, "Fr(8-limb)")
        fq_peak = peak_muls(F.FQ, "Fq(12-limb)")
        # NTT: one Fr mul per butterfly is the irreducible work.
        ntt_rate = butterflies / ntt_time
        log(f"roofline NTT 2^20: {ntt_rate/1e6:.1f} M butterflies/s = "
            f"{100*ntt_rate/fr_peak:.0f}% of Fr-mul SoL")
        # MSM (sort/scan Pippenger): adds ~ W*(N + 4*2^c) (msm.py v3 cost
        # model), complete projective add = 12 Fq muls (ops/curve.py).
        # SoL = the chip doing nothing but those muls.  Window + scalar
        # width come from the live dispatcher tuning (advisor r4).
        c_w = msm_mod.chosen_window(cv.FQ_OPS, n_msm)
        n_windows = -(-msm_mod.scalar_bits(cv.FQ_OPS) // c_w)
        adds = n_windows * (n_msm + 4 * (1 << c_w))
        muls_per_pt = adds * 12 / n_msm
        sol_pts = fq_peak / muls_per_pt
        log(f"roofline MSM 2^16: {msm_rate/1e3:.1f} K pts/s "
            f"({muls_per_pt:.0f} Fq muls/pt model) = "
            f"{100*msm_rate/sol_pts:.0f}% of Fq-mul SoL "
            f"({sol_pts/1e3:.0f} K pts/s)")
    except Exception as e:
        log(f"roofline aborted: {type(e).__name__}: {e}")

    # ---- extras (budget-guarded, stderr only) ---------------------------
    try:
        extras(rng)
    except Exception as e:  # extras must never poison the headline
        log(f"extras aborted: {type(e).__name__}: {e}")


# ---------------------------------------------------------------------------
# Bench-side disk cache for Plonk/Marlin setup artifacts.  Setup is
# deterministic given (circuit, seed) — exactly the Groth16 keycache
# argument (snark/keycache.py) applied to the KZG SRS + index: the ~50-160 s
# of host-side setup per system is paid once, and the driver-run budget goes
# to PROVE rows.  Serialization preserves exact dtypes/shapes so the loaded
# arrays trace identically to freshly-built ones (no program re-keying).
# ---------------------------------------------------------------------------

def _sc_flatten(obj, prefix, arrs, meta):
    import numpy as np

    if obj is None:
        meta[prefix] = {"t": "none"}
    elif isinstance(obj, bool):
        meta[prefix] = {"t": "bool", "v": obj}
    elif isinstance(obj, int):
        meta[prefix] = {"t": "int", "v": str(obj)}
    elif isinstance(obj, str):
        meta[prefix] = {"t": "str", "v": obj}
    elif isinstance(obj, (tuple, list)):
        meta[prefix] = {"t": type(obj).__name__, "n": len(obj)}
        for i, x in enumerate(obj):
            _sc_flatten(x, f"{prefix}.{i}", arrs, meta)
    elif isinstance(obj, dict):
        keys = list(obj.keys())
        meta[prefix] = {"t": "dict", "keys": keys}
        for k in keys:
            _sc_flatten(obj[k], f"{prefix}[{k}]", arrs, meta)
    else:  # array (jnp or np): store narrow, remember the true dtype
        import numpy as np

        a = np.asarray(obj)
        stored = a
        if a.dtype == np.uint32 and a.size and a.max() < (1 << 16):
            stored = a.astype(np.uint16)
        meta[prefix] = {"t": "arr", "dtype": str(a.dtype)}
        arrs[prefix] = stored
    return arrs, meta


def _sc_unflatten(prefix, arrs, meta):
    import jax.numpy as jnp
    import numpy as np

    m = meta[prefix]
    t = m["t"]
    if t == "none":
        return None
    if t == "bool":
        return m["v"]
    if t == "int":
        return int(m["v"])
    if t == "str":
        return m["v"]
    if t in ("tuple", "list"):
        xs = [_sc_unflatten(f"{prefix}.{i}", arrs, meta) for i in range(m["n"])]
        return tuple(xs) if t == "tuple" else xs
    if t == "dict":
        return {k: _sc_unflatten(f"{prefix}[{k}]", arrs, meta) for k in m["keys"]}
    a = arrs[prefix]
    return jnp.asarray(np.ascontiguousarray(a).astype(np.dtype(m["dtype"])))


def _sc_save(path, obj):
    import json as _json

    import numpy as np

    arrs, meta = _sc_flatten(obj, "r", {}, {})
    arrs["__meta__"] = np.frombuffer(
        _json.dumps(meta).encode(), dtype=np.uint8
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrs)
    os.replace(tmp, path)


def _sc_load(path):
    import json as _json

    import numpy as np

    if not os.path.exists(path):
        return None
    z = np.load(path)
    meta = _json.loads(bytes(z["__meta__"]).decode())
    return _sc_unflatten("r", z, meta)


def _srs_to_obj(srs):
    return {
        "powers": (srs.powers.x, srs.powers.y, srs.powers.z),
        "max_degree": srs.max_degree,
        "g1": srs.g1, "g2": srs.g2, "beta_g2": srs.beta_g2,
        "gamma_powers": None if srs.gamma_powers is None else
            (srs.gamma_powers.x, srs.gamma_powers.y, srs.gamma_powers.z),
        "gamma_g1": srs.gamma_g1,
    }


def _srs_from_obj(o):
    from collaborative_zksnark_tpu.ops import curve as cv
    from collaborative_zksnark_tpu.snark import kzg

    gp = o["gamma_powers"]
    return kzg.KzgSrs(
        powers=cv.JacPoint(*o["powers"]),
        max_degree=o["max_degree"],
        g1=o["g1"], g2=o["g2"], beta_g2=o["beta_g2"],
        gamma_powers=None if gp is None else cv.JacPoint(*gp),
        gamma_g1=o["gamma_g1"],
    )


def _cmt_to_obj(cm):
    return {"comm": cm.comm, "shifted": cm.shifted_comm, "db": cm.degree_bound}


def _cmt_from_obj(o):
    from collaborative_zksnark_tpu.snark import kzg

    return kzg.Commitment(
        comm=o["comm"], shifted_comm=o["shifted"], degree_bound=o["db"]
    )


def plonk_setup_cached(layout, logn, seed):
    """(pk, vk) for the squaring Plonk circuit, from disk if present."""
    from collaborative_zksnark_tpu.snark import keycache, plonk

    path = os.path.join(keycache.DEFAULT_DIR, f"plonk_srs_v1_n{logn}_seed{seed}.npz")
    got = _sc_load(path)
    if got is not None:
        srs = _srs_from_obj(got["srs"])
        s_cmt, w_cmt = got["s_cmt"], got["w_cmt"]
        log(f"plonk setup cache hit: {path}")
        pk = plonk.ProverKey(layout=layout, srs=srs, s_cmt=s_cmt, w_cmt=w_cmt)
        vk = plonk.VerifierKey(
            srs=srs, s_cmt=s_cmt, w_cmt=w_cmt, n_gates=layout.n_gates,
            wires_gen=layout.wires_domain.omega,
            gates_gen=layout.gates_domain.omega,
            public_indices=dict(layout.public_indices),
        )
        return pk, vk
    srs = plonk.universal_setup(layout.n_gates, seed=seed)
    pk, vk = plonk.circuit_setup(srs, layout)
    try:
        _sc_save(path, {"srs": _srs_to_obj(srs), "s_cmt": pk.s_cmt,
                        "w_cmt": pk.w_cmt})
        log(f"plonk setup cache written: {path}")
    except Exception as e:
        log(f"plonk setup cache write failed: {e}")
    return pk, vk


def marlin_setup_cached(cs, logn, seed):
    """(pk, vk) for the squaring Marlin circuit, from disk if present."""
    from collaborative_zksnark_tpu.snark import keycache, marlin

    path = os.path.join(keycache.DEFAULT_DIR, f"marlin_idx_v1_n{logn}_seed{seed}.npz")
    got = _sc_load(path)
    if got is not None:
        srs = _srs_from_obj(got["srs"])
        comms = {k: _cmt_from_obj(v) for k, v in got["comms"].items()}
        import json as _json

        ix = got["index"]
        rows = {m: [[(int(c), int(v)) for c, v in row] for row in rws]
                for m, rws in _json.loads(ix["rows"]).items()}
        mats = {m: marlin.MatrixArith(**ix["mats"][m]) for m in ix["mats"]}
        idx = marlin.Index(
            n=ix["n"], xsize=ix["xsize"], k_size=ix["k_size"],
            b_size=ix["b_size"], num_instance=ix["num_instance"],
            num_witness=ix["num_witness"], mats=mats, rows=rows,
            packed=ix["packed"], t_tables=ix["t_tables"],
            elems_dev=ix["elems_dev"],
        )
        log(f"marlin setup cache hit: {path}")
        return (marlin.IndexProverKey(index=idx, srs=srs, comms=comms),
                marlin.IndexVerifierKey(
                    n=idx.n, xsize=idx.xsize, k_size=idx.k_size,
                    num_instance=idx.num_instance, srs=srs, comms=comms))
    srs = marlin.universal_setup(marlin.max_degree_for(cs), seed=seed)
    pk, vk = marlin.index(cs, srs)
    try:
        import json as _json

        idx = pk.index
        rows_s = _json.dumps(
            {m: [[(str(c), str(v)) for c, v in row] for row in idx.rows[m]]
             for m in idx.rows})
        _sc_save(path, {
            "srs": _srs_to_obj(srs),
            "comms": {k: _cmt_to_obj(v) for k, v in pk.comms.items()},
            "index": {
                "n": idx.n, "xsize": idx.xsize, "k_size": idx.k_size,
                "b_size": idx.b_size, "num_instance": idx.num_instance,
                "num_witness": idx.num_witness,
                "mats": {m: dataclasses_asdict_arrays(idx.mats[m])
                         for m in idx.mats},
                "rows": rows_s, "packed": idx.packed,
                "t_tables": idx.t_tables, "elems_dev": idx.elems_dev,
            },
        })
        log(f"marlin setup cache written: {path}")
    except Exception as e:
        log(f"marlin setup cache write failed: {e}")
    return pk, vk


def dataclasses_asdict_arrays(ma):
    """MatrixArith -> field dict WITHOUT copying arrays (dataclasses.asdict
    deep-copies; we just need the field mapping)."""
    import dataclasses as _dc

    return {f.name: getattr(ma, f.name) for f in _dc.fields(ma)}


def extras(rng):
    """Reference-scale rows (budget-guarded, stderr): Groth16 local +
    2-party SPDZ at 2^20/2^14/2^16 and Plonk/Marlin local + SPDZ at 2^14
    on the chip — the BASELINE.md:15-22 flagship configs (ref Groth16
    @2^20: 127.4 s local / 133.2 s 2-party SPDZ on GCP VMs,
    analysis/data/groth16.csv:22; ref Plonk @2^20 local 1516 s,
    weak_1_20.csv).  Groth16 keys come from the disk cache
    (snark/keycache.py — setup is deterministic given (circuit, seed), so
    the 300 s native setup is paid once ever, like the reference keeps
    setup outside its `timed section`, mpc-snarks/src/proof.rs).  Every
    row flushes immediately; each block re-checks the remaining budget;
    if the budget dies before a warm rerun, the COLD wall (compile
    included) is the row — a number always lands."""
    import numpy as np

    from collaborative_zksnark_tpu.algebra import field as F
    from collaborative_zksnark_tpu.mpc import wire
    from collaborative_zksnark_tpu.mpc.context import MpcContext
    from collaborative_zksnark_tpu.parallel.net import StackedNet
    from collaborative_zksnark_tpu.relations import r1cs
    from collaborative_zksnark_tpu.snark import groth16, keycache

    def build(logn, seed):
        size = 1 << logn
        t0 = time.perf_counter()
        cs, assign = r1cs.squaring_circuit(size)
        pk, vk = keycache.setup_cached(cs, seed=seed, logn=logn, log=log)
        np.asarray(pk.a_query.x[0])  # land the key transfer
        np.asarray(pk.h_query.x[0])
        log(f"groth16 keys 2^{logn}: {time.perf_counter()-t0:.1f}s "
            f"(disk cache + one device transfer)")
        return cs, assign, pk, vk

    def timed_pair(tag, run_once, ref_s=None, min_warm_s=60, warm_est=None,
                   greedy=False):
        """cold run (compile incl.) -> row; warm rerun if budget allows ->
        better row.  Both flush immediately.  `warm_est` bounds the
        expected warm wall when the cold run is compile-dominated (the old
        1.6*cold guard skipped the warm rerun exactly when it mattered
        most: a 1100 s compile-heavy cold with a ~2 min warm body)."""
        t0 = time.perf_counter()
        run_once()
        cold = time.perf_counter() - t0
        log(f"{tag}: {cold:.3f}s (cold, compile included)"
            + (f"  [ref {ref_s}s]" if ref_s else ""))
        est = min(cold, warm_est) if warm_est else cold
        # greedy: this is the block's LAST must-have row — rerun whenever
        # the warm body itself fits (the budget alarm bounds any overrun)
        need = 1.05 * est if greedy else max(min_warm_s, 1.6 * est)
        if remaining() < need:
            log(f"{tag}: warm rerun skipped (remaining {remaining():.0f}s"
                f" < {need:.0f}s) — see analysis/data/tpu_bench_r5.txt")
            return cold
        t0 = time.perf_counter()
        run_once()
        dt = time.perf_counter() - t0
        log(f"{tag}: {dt:.3f}s (warm)"
            + (f"  [ref {ref_s}s -> {ref_s/dt:.1f}x]" if ref_s else ""))
        return dt

    def local_prove(cs, assign, pk, vk, logn, ref_s=None):
        inst, wit = assign(12345)
        z = F.FR.to_device(inst + wit)
        r_m = F.rand(F.FR, rng, ())
        s_m = F.rand(F.FR, rng, ())

        def once():
            pf = groth16.prove(pk, cs, z, r_m, s_m)
            hp = groth16.reveal_proof(pf)
            assert groth16.verify(vk, hp, inst[1:])

        return timed_pair(f"groth16 local prove 2^{logn}", once, ref_s,
                          warm_est=60 if logn >= 20 else 20)

    def spdz_prove(cs, assign, pk, vk, logn, ref_s=None):
        """2-party SPDZ collaborative prove, stacked on the one chip: the
        wall carries BOTH parties' compute serially + MAC tracking (a real
        2-chip deployment runs the halves concurrently)."""
        inst, wit = assign(777)

        def once():
            net = StackedNet(2)
            ctx = MpcContext(net, seed=9)
            sch = wire.make_scheme("spdz", ctx)
            z_sh = sch.king_share(F.FR.to_device(inst + wit))
            r_sh = wire.rand_share(sch)
            s_sh = wire.rand_share(sch)
            pf = groth16.prove_mpc(pk, cs, sch, z_sh, r_sh, s_sh)
            hp = groth16.reveal_proof(pf)
            ok = groth16.verify(vk, hp, inst[1:])
            ctx.assert_checks()
            assert ok

        return timed_pair(
            f"groth16 SPDZ 2-party prove 2^{logn} (both parties stacked "
            f"on 1 chip)", once, ref_s,
            warm_est=175 if logn >= 20 else 60, greedy=logn >= 20)

    # the 2^20 FLAGSHIP first (BASELINE.md:15-17), then Plonk/Marlin (the
    # BASELINE headline names SPDZ Plonk), then smaller insurance rows;
    # each block is fault-isolated
    def block20():
        # a cold key cache means ~300 s of native setup before any prove
        # row can land — require the budget for it (advisor r4)
        need = 200 if os.path.exists(keycache.path_for("groth16", 20, 3)) \
            else 520
        if remaining() < need:
            log(f"skipping 2^20 rows: budget (need {need}s)")
            return
        cs20, assign20, pk20, vk20 = build(20, seed=3)
        local_prove(cs20, assign20, pk20, vk20, 20, ref_s=127.4)
        if remaining() > 120:
            spdz_prove(cs20, assign20, pk20, vk20, 20, ref_s=133.2)

    def block_plonk(logn):
        # fresh-process cost: setup load ~25 s + first prove (program
        # loads + trace) ~300 s + warm ~25 s — don't start what can't
        # finish (measured, analysis/data/tpu_bench_r5.txt)
        if remaining() < 360:
            log(f"skipping plonk 2^{logn} rows: budget")
            return
        from collaborative_zksnark_tpu.relations.plonk_circuit import (
            CircuitLayout, PlonkCircuit)
        from collaborative_zksnark_tpu.snark import plonk

        circ = PlonkCircuit.squaring(1 << logn, start=3)
        layout = CircuitLayout.from_circuit(circ)
        t0 = time.perf_counter()
        pk, vk = plonk_setup_cached(layout, logn, seed=5)
        log(f"plonk setup 2^{logn}: {time.perf_counter()-t0:.1f}s")
        out = next(circ.values[v] for v, nm in circ.pub_vars.items()
                   if nm == "out")
        vals = F.FR.to_device(circ.values)

        def once_local():
            from collaborative_zksnark_tpu.mpc.local import LocalScheme
            pf = plonk.Prover(LocalScheme(), pk).prove(vals, {"out": out})
            assert plonk.verify(vk, pf, {"out": out})

        def once_spdz():
            ctx = MpcContext(StackedNet(2), seed=9)
            sch = wire.make_scheme("spdz", ctx)
            pf = plonk.Prover(sch, pk).prove(
                sch.king_share(vals), {"out": out})
            ctx.assert_checks()
            assert plonk.verify(vk, pf, {"out": out})

        timed_pair(f"plonk local prove 2^{logn}", once_local,
                   warm_est=40)
        if remaining() > 150:
            timed_pair(f"plonk SPDZ 2-party prove 2^{logn} (stacked)",
                       once_spdz, warm_est=80)

    def block_marlin(logn):
        if remaining() < 500:
            log(f"skipping marlin 2^{logn} rows: budget")
            return
        from collaborative_zksnark_tpu.snark import marlin

        cs, assign = r1cs.squaring_circuit(1 << logn)
        t0 = time.perf_counter()
        pk, vk = marlin_setup_cached(cs, logn, seed=5)
        log(f"marlin setup 2^{logn}: {time.perf_counter()-t0:.1f}s")
        inst, wit = assign(3)
        wit_dev = F.FR.to_device(wit)

        def once_local():
            from collaborative_zksnark_tpu.mpc.local import LocalScheme
            pf = marlin.prove(pk, LocalScheme(), inst, wit_dev)
            assert marlin.verify(vk, inst[1:], pf)

        def once_spdz():
            ctx = MpcContext(StackedNet(2), seed=9)
            sch = wire.make_scheme("spdz", ctx)
            pf = marlin.prove(pk, sch, inst, sch.king_share(wit_dev))
            ctx.assert_checks()
            assert marlin.verify(vk, inst[1:], pf)

        timed_pair(f"marlin local prove 2^{logn}", once_local,
                   warm_est=30)
        if remaining() > 150:
            timed_pair(f"marlin SPDZ 2-party prove 2^{logn} (stacked)",
                       once_spdz, warm_est=50)

    def block(logn, seed):
        if remaining() < 420:
            log(f"skipping 2^{logn} rows: budget")
            return
        cs, assign, pk, vk = build(logn, seed=seed)
        local_prove(cs, assign, pk, vk, logn)
        if remaining() > 100:
            spdz_prove(cs, assign, pk, vk, logn)

    for blk in (block20,
                lambda: block_plonk(14),
                lambda: block_marlin(14),
                lambda: block(14, 1),
                lambda: block(16, 2)):
        try:
            blk()
        except Exception as e:  # fault-isolate: later blocks still run
            log(f"block failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
