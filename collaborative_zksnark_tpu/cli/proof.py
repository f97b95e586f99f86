"""`proof` driver — the analog of the reference's mpc-snarks `proof` binary
(ref mpc-snarks/src/proof.rs:464-508):

    python -m collaborative_zksnark_tpu.cli.proof \
        -p {groth16,plonk,marlin} -c squaring --computation-size N \
        {local | mpc --alg {hbc,spdz,gsz} --parties K} [--platform cpu|tpu]

Runs the prove inside a "timed section" scope (the line the reference's
bench harness greps, ref scripts/bench.zsh:19), verifies the revealed proof
locally (ref proof.rs:141), prints per-party traffic stats at teardown
(ref proof.rs:367).  Parties are logical (stacked backend) — the analog of
the reference's N processes on localhost.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser("proof")
    ap.add_argument(
        "-p", "--proof-system", choices=["groth16", "plonk", "marlin"], required=True
    )
    ap.add_argument("-c", "--computation", default="squaring")
    ap.add_argument("--computation-size", type=int, default=8)
    ap.add_argument("mode", choices=["local", "mpc"], nargs="?", default="local")
    ap.add_argument("--alg", choices=["hbc", "spdz", "gsz"], default="spdz")
    ap.add_argument("--parties", type=int, default=2)
    ap.add_argument("--platform", choices=["cpu", "tpu"], default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.platform != "tpu":
        # default to CPU: the ambient axon plugin exports JAX_PLATFORMS
        # itself, so an unset --platform must not accidentally select the
        # tunneled TPU (eager dispatch there is ~1 s/op)
        os.environ.pop("JAX_PLATFORMS", None)
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    from ..algebra import params as C
    from ..algebra import field as F
    from ..mpc import wire
    from ..mpc.context import MpcContext
    from ..parallel.net import StackedNet
    from ..utils.timers import timed

    n_parties = args.parties if args.mode == "mpc" else 1
    alg = args.alg if args.mode == "mpc" else "local"
    net = StackedNet(n_parties)
    ctx = MpcContext(net, seed=args.seed)
    scheme = wire.make_scheme(alg, ctx)
    rng = np.random.default_rng(args.seed)
    x0 = int.from_bytes(rng.bytes(40), "little") % C.R_MOD

    if args.proof_system == "groth16":
        from ..relations import r1cs
        from ..snark import groth16

        cs, assign = r1cs.squaring_circuit(args.computation_size)
        with timed("setup"):
            pk, vk = groth16.setup(cs, seed=args.seed + 1)
        inst, wit = assign(x0)
        z_sh = scheme.king_share(F.FR.to_device(inst + wit))
        r_sh = wire.rand_share(scheme)
        s_sh = wire.rand_share(scheme)
        net.stats.reset()
        with timed("timed section"):
            if alg == "local":
                proof = groth16.prove(
                    pk, cs, z_sh, r_sh, s_sh
                )
            else:
                proof = groth16.prove_mpc(pk, cs, scheme, z_sh, r_sh, s_sh)
            hp = groth16.reveal_proof(proof)
        ok = groth16.verify(vk, hp, inst[1:])
    elif args.proof_system == "marlin":
        from ..relations import r1cs
        from ..snark import marlin

        cs, assign = r1cs.squaring_circuit(args.computation_size)
        with timed("setup"):
            srs = marlin.universal_setup(marlin.max_degree_for(cs), seed=args.seed + 1)
            pk, vk = marlin.index(cs, srs)
        inst, wit = assign(x0)
        wit_sh = scheme.king_share(F.FR.to_device(wit))
        net.stats.reset()
        with timed("timed section"):
            proof = marlin.prove(pk, scheme, inst, wit_sh)
        ok = marlin.verify(vk, inst[1:], proof)
    else:
        from ..relations.plonk_circuit import CircuitLayout, PlonkCircuit
        from ..snark import plonk

        circ = PlonkCircuit.squaring(args.computation_size, start=x0)
        layout = CircuitLayout.from_circuit(circ)
        with timed("setup"):
            srs = plonk.universal_setup(layout.n_gates, seed=args.seed + 1)
            pk, vk = plonk.circuit_setup(srs, layout)
        vals_pub = F.FR.to_device(circ.values)
        vals_sh = scheme.king_share(vals_pub)
        pub_vals = {"out": _out_value(circ)}
        net.stats.reset()
        with timed("timed section"):
            prover = plonk.Prover(scheme, pk)
            proof = prover.prove(vals_sh, pub_vals)
        ok = plonk.verify(vk, proof, pub_vals)

    ctx.assert_checks()
    print(f"verified: {ok}")
    print(f"stats: {net.stats.as_dict()}")
    return 0 if ok else 1


def _out_value(circ):
    for v, name in circ.pub_vars.items():
        if name == "out":
            return circ.values[v]
    raise KeyError("out")


if __name__ == "__main__":
    sys.exit(main())
