"""Benchmark matrix: system x scheme x size prove walls -> CSV.

The analog of the reference's scripts/bench.zsh + analysis/ collection
(ref mpc-snarks/scripts/bench.zsh:19,57 greps the `timed section` scope;
analysis/data/*.csv).  Runs on the CPU backend (the virtual-party mesh);
bench.py covers the real-TPU kernel headlines.

    python scripts/bench_matrix.py --systems groth16,plonk,marlin \
        --algs local,hbc,spdz,gsz --sizes 11 --out analysis/data/matrix.csv

CSV columns: system,alg,parties,size_log2,setup_s,prove_s,verify_ok
(prove_s is the WARM wall — compile excluded via one throwaway run;
cold = first-run compile is amortized by the persistent cache).
"""

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.pop("JAX_PLATFORMS", None)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.mpc import wire
from collaborative_zksnark_tpu.mpc.context import MpcContext
from collaborative_zksnark_tpu.mpc.local import LocalScheme
from collaborative_zksnark_tpu.parallel.net import StackedNet
from collaborative_zksnark_tpu.relations import r1cs
from collaborative_zksnark_tpu.utils.timers import Timer


def _mk_scheme(alg, parties, seed=9):
    if alg == "local":
        return None, LocalScheme()
    ctx = MpcContext(StackedNet(parties), seed=seed)
    return ctx, wire.make_scheme(alg, ctx)


def bench_groth16(alg, parties, logn, rng):
    from collaborative_zksnark_tpu.snark import groth16

    cs, assign = r1cs.squaring_circuit(1 << logn)
    t0 = time.perf_counter()
    pk, vk = groth16.setup(cs, seed=1)
    jax.block_until_ready(pk.a_query.x)
    setup_s = time.perf_counter() - t0
    inst, wit = assign(12345)

    def run():
        ctx, sch = _mk_scheme(alg, parties)
        tm = Timer("timed section")
        if alg == "local":
            pf = groth16.prove(
                pk, cs, F.FR.to_device(inst + wit),
                F.rand(F.FR, rng, ()), F.rand(F.FR, rng, ()),
            )
        else:
            z_sh = sch.king_share(F.FR.to_device(inst + wit))
            pf = groth16.prove_mpc(
                pk, cs, sch, z_sh, wire.rand_share(sch), wire.rand_share(sch)
            )
        hp = groth16.reveal_proof(pf)
        dt = tm.stop()
        if ctx:
            ctx.assert_checks()
        return dt, groth16.verify(vk, hp, inst[1:])

    run()  # warm (compile)
    prove_s, ok = run()
    return setup_s, prove_s, ok


def bench_plonk(alg, parties, logn, rng):
    from collaborative_zksnark_tpu.relations.plonk_circuit import (
        CircuitLayout, PlonkCircuit)
    from collaborative_zksnark_tpu.snark import plonk

    circ = PlonkCircuit.squaring(1 << logn, start=3)
    layout = CircuitLayout.from_circuit(circ)
    t0 = time.perf_counter()
    srs = plonk.universal_setup(layout.n_gates, seed=5)
    pk, vk = plonk.circuit_setup(srs, layout)
    setup_s = time.perf_counter() - t0
    out = next(circ.values[v] for v, nm in circ.pub_vars.items() if nm == "out")

    def run():
        ctx, sch = _mk_scheme(alg, parties)
        vals = F.FR.to_device(circ.values)
        vals_in = vals if alg == "local" else sch.king_share(vals)
        tm = Timer("timed section")
        pf = plonk.Prover(sch, pk).prove(vals_in, {"out": out})
        dt = tm.stop()
        if ctx:
            ctx.assert_checks()
        return dt, plonk.verify(vk, pf, {"out": out})

    run()
    prove_s, ok = run()
    return setup_s, prove_s, ok


def bench_marlin(alg, parties, logn, rng):
    from collaborative_zksnark_tpu.snark import marlin

    cs, assign = r1cs.squaring_circuit(1 << logn)
    t0 = time.perf_counter()
    srs = marlin.universal_setup(marlin.max_degree_for(cs), seed=5)
    pk, vk = marlin.index(cs, srs)
    setup_s = time.perf_counter() - t0
    inst, wit = assign(3)

    def run():
        ctx, sch = _mk_scheme(alg, parties)
        wit_in = (
            F.FR.to_device(wit) if alg == "local"
            else sch.king_share(F.FR.to_device(wit))
        )
        tm = Timer("timed section")
        pf = marlin.prove(pk, sch, inst, wit_in)
        dt = tm.stop()
        if ctx:
            ctx.assert_checks()
        return dt, marlin.verify(vk, inst[1:], pf)

    run()
    prove_s, ok = run()
    return setup_s, prove_s, ok


BENCHES = {"groth16": bench_groth16, "plonk": bench_plonk, "marlin": bench_marlin}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--systems", default="groth16,plonk,marlin")
    ap.add_argument("--algs", default="local,hbc,spdz,gsz")
    ap.add_argument("--sizes", default="11")
    ap.add_argument("--parties", type=int, default=2)
    ap.add_argument("--out", default="analysis/data/matrix.csv")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    rows = []
    for system in args.systems.split(","):
        for logn in [int(s) for s in args.sizes.split(",")]:
            for alg in args.algs.split(","):
                parties = 1 if alg == "local" else (
                    max(3, args.parties) if alg == "gsz" else args.parties
                )
                t0 = time.perf_counter()
                setup_s, prove_s, ok = BENCHES[system](alg, parties, logn, rng)
                rows.append(
                    dict(system=system, alg=alg, parties=parties,
                         size_log2=logn, setup_s=round(setup_s, 3),
                         prove_s=round(prove_s, 3),
                         # stacked sim carries ALL parties serially in one
                         # process; per-party-equivalent is the comparable
                         # number against the reference's per-machine walls
                         per_party_s=round(prove_s / parties, 3),
                         verify_ok=ok)
                )
                print(
                    f"{system} {alg} {parties}p 2^{logn}: "
                    f"prove {prove_s:.3f}s verified={ok} "
                    f"(total incl. warm {time.perf_counter()-t0:.0f}s)",
                    flush=True,
                )
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
