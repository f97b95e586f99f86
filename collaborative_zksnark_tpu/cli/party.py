"""`party` driver — one OS process per MPC party over real cross-process
collectives (the deployment analog of the reference's TCP mesh,
ref mpc-net/src/multi.rs:73-141 connect_from_dir + hosts files).

Each party process runs:

    python -m collaborative_zksnark_tpu.cli.party --hosts hosts.json \
        --party I <computation> --alg {hbc,spdz,gsz} --size N

with a shared hosts file

    {"coordinator": "10.0.0.1:29500", "parties": 3}

The processes form a jax.distributed cluster; each contributes one device
to a global ("party",) mesh, and the MPC schemes run unchanged on MeshNet —
share openings become Gloo/ICI/DCN collectives BETWEEN PROCESSES instead of
in-process stacking.  This is the TPU-native deployment shape: on real
hardware each party is a distinct host (its own TPU slice), parties talk
over DCN, and in-party sharding (data axis) rides ICI.

Per-party traffic stats print at teardown (ref mpc-net Stats / the
reference's end-of-run stats dump).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from functools import partial


def main(argv=None):
    ap = argparse.ArgumentParser("party")
    ap.add_argument(
        "computation",
        choices=["sum", "product", "inv", "groth16", "plonk", "marlin"],
    )
    ap.add_argument("--hosts", required=True, help="JSON hosts file")
    ap.add_argument("--party", type=int, required=True)
    ap.add_argument("--alg", choices=["hbc", "spdz", "gsz"], default="hbc")
    ap.add_argument("--size", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    with open(args.hosts) as f:
        hosts = json.load(f)
    n_parties = int(hosts["parties"])
    assert 0 <= args.party < n_parties

    os.environ.pop("JAX_PLATFORMS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            ),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.distributed.initialize(
        coordinator_address=hosts["coordinator"],
        num_processes=n_parties,
        process_id=args.party,
    )

    if args.computation in ("groth16", "plonk", "marlin"):
        return _run_snark(args, n_parties)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as Pspec
    from jax.experimental.shard_map import shard_map

    from ..algebra import params as C
    from ..algebra import field as F
    from ..mpc.context import MpcContext
    from ..mpc.gsz import GszScheme, _party_matmul, _party_vandermonde
    from ..mpc.spdz import SpdzScheme, SpdzShare
    from ..mpc.additive import AdditiveScheme
    from ..parallel.net import MeshNet

    P = C.R_MOD
    rng = np.random.default_rng(args.seed)
    xs = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(args.size)]

    # deal shares host-side from the shared seed (every process derives the
    # same dealing, keeps its own row — the king-deals preprocessing stance)
    if args.alg == "gsz":
        t = (n_parties - 1) // 2
        V, _ = _party_vandermonde(n_parties)
        coeffs = [F.FR.to_device(xs)]
        for _ in range(t):
            coeffs.append(
                F.FR.to_device(
                    [int.from_bytes(rng.bytes(40), "little") % P for _ in xs]
                )
            )
        for _ in range(n_parties - 1 - t):
            coeffs.append(jnp.zeros((args.size, F.FR.L), jnp.uint32))
        all_shares = np.asarray(_party_matmul(V, jnp.stack(coeffs)))
    else:
        rows = [
            [int.from_bytes(rng.bytes(40), "little") % P for _ in xs]
            for _ in range(n_parties - 1)
        ]
        king_row = [
            (v - sum(r[i] for r in rows)) % P for i, v in enumerate(xs)
        ]
        all_shares = np.asarray(F.FR.to_device([king_row] + rows))

    mesh = Mesh(np.array(jax.devices()[:n_parties]), ("party",))
    local = jnp.asarray(all_shares[args.party])[None]  # (1, size, L) shard
    garr = jax.make_array_from_single_device_arrays(
        (n_parties,) + local.shape[1:],
        NamedSharding(mesh, Pspec("party")),
        [jax.device_put(local, jax.local_devices()[0])],
    )

    comp = args.computation
    alg = args.alg
    # constructed outside the trace so the (trace-time) Stats accounting is
    # readable at teardown; device state still lives inside the traced step
    net = MeshNet(n_parties, "party")

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(Pspec("party"),),
        out_specs=(Pspec(), Pspec()),
        check_rep=False,
    )
    def step(sh_stacked):
        sh = sh_stacked[0]
        ctx = MpcContext(net, seed=args.seed + 1)
        if alg == "spdz":
            scheme = SpdzScheme(ctx)
            x = SpdzShare(sh, sh)  # alpha = 1 stub: mac rows mirror shares
        elif alg == "gsz":
            scheme = GszScheme(ctx)
            x = sh
        else:
            scheme = AdditiveScheme(ctx)
            x = sh
        if comp == "product":
            y = scheme.mul(x, x)
        elif comp == "inv":
            y = scheme.inv(x)
        else:
            y = x
        opened = scheme.reveal(y)
        checks = [jnp.all(c) for _, c in ctx.checks]
        ok = jnp.array(checks).all() if checks else jnp.asarray(True)
        return opened, ok

    with mesh:
        opened, ok = jax.jit(step)(garr)
        opened.block_until_ready()

    got = [int(v) for v in F.FR.to_host(np.asarray(opened))]
    if comp == "product":
        expect = [v * v % P for v in xs]
    elif comp == "inv":
        expect = [pow(v, P - 2, P) for v in xs]
    else:
        expect = xs
    assert got == expect, f"party {args.party}: MISMATCH"
    assert bool(np.asarray(ok)), f"party {args.party}: runtime checks failed"
    print(
        f"party {args.party}/{n_parties} [{alg}] {comp}: OK  "
        f"(cross-process collectives over {jax.devices()})",
        flush=True,
    )
    print(f"party {args.party} stats: {net.stats.as_dict()}", flush=True)
    jax.distributed.shutdown()
    return 0


def _run_snark(args, n_parties):
    """Collaborative SNARK prove as REAL OS processes: the full eager
    prover stack (incl. host Fiat-Shamir between rounds) runs unchanged on
    ProcNet's cross-process collectives.  Analog of the reference's
    mpc-snarks/test.zsh groth16/plonk/marlin 2-process rows
    (ref mpc-snarks/src/groth.rs:11-42 mpc_test_prove_and_verify)."""
    import numpy as np

    from ..algebra import params as C
    from ..algebra import field as F
    from ..mpc import wire
    from ..mpc.context import MpcContext
    from ..parallel.net import ProcNet
    from ..utils.timers import timed

    P = C.R_MOD
    # the king star channel listens next to the coordinator: same host,
    # port + 1000 (overridable with a "star": "host:port" hosts entry)
    with open(args.hosts) as f:
        hosts = json.load(f)
    star = hosts.get("star")
    if star:
        s_host, s_port = star.rsplit(":", 1)
    else:
        s_host, s_port = hosts["coordinator"].rsplit(":", 1)
        s_port = int(s_port) + 1000
    net = ProcNet(n_parties, args.party, star_addr=(s_host, int(s_port)))
    ctx = MpcContext(net, seed=args.seed + 1, party_id=args.party)
    scheme = wire.make_scheme(args.alg, ctx)
    rng = np.random.default_rng(args.seed)
    x0 = int.from_bytes(rng.bytes(40), "little") % P

    if args.computation == "groth16":
        from ..relations import r1cs
        from ..snark import groth16

        cs, assign = r1cs.squaring_circuit(args.size)
        pk, vk = groth16.setup(cs, seed=args.seed + 2)
        inst, wit = assign(x0)
        z_sh = scheme.king_share(F.FR.to_device(inst + wit))
        r_sh = wire.rand_share(scheme)
        s_sh = wire.rand_share(scheme)
        net.stats.reset()
        with timed("timed section"):
            proof = groth16.prove_mpc(pk, cs, scheme, z_sh, r_sh, s_sh)
            hp = groth16.reveal_proof(proof)
        ok = groth16.verify(vk, hp, inst[1:])
    elif args.computation == "marlin":
        from ..relations import r1cs
        from ..snark import marlin

        cs, assign = r1cs.squaring_circuit(args.size)
        srs = marlin.universal_setup(marlin.max_degree_for(cs), seed=args.seed + 2)
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

        circ = PlonkCircuit.squaring(args.size, start=x0)
        layout = CircuitLayout.from_circuit(circ)
        srs = plonk.universal_setup(layout.n_gates, seed=args.seed + 2)
        pk, vk = plonk.circuit_setup(srs, layout)
        vals_sh = scheme.king_share(F.FR.to_device(circ.values))
        pub_vals = {
            "out": next(
                circ.values[v] for v, nm in circ.pub_vars.items() if nm == "out"
            )
        }
        net.stats.reset()
        with timed("timed section"):
            prover = plonk.Prover(scheme, pk)
            proof = prover.prove(vals_sh, pub_vals)
        ok = plonk.verify(vk, proof, pub_vals)

    ctx.assert_checks()
    assert ok, f"party {args.party}: proof did not verify"
    print(
        f"party {args.party}/{n_parties} [{args.alg}] {args.computation}: "
        f"verified {ok}",
        flush=True,
    )
    print(f"party {args.party} stats: {net.stats.as_dict()}", flush=True)
    import jax

    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
