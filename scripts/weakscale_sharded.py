"""Data-axis scaling of the sharded Groth16 prove on the virtual CPU mesh.

Usage: python scripts/weakscale_sharded.py [--sizes 10,12] [--shards 1,2,4,8]

Writes analysis/data/weakscale_sharded.csv with prove walls per (size, S).
CAVEAT (printed into the CSV header): virtual devices share the same host
cores, so wall-clock here validates the sharded path and measures its
overheads (all_to_all transposes, gathered folds), NOT real-chip speedup —
on hardware each shard is a chip and the per-shard work drops as 1/S.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="10")
    ap.add_argument("--shards", default="1,2,4,8")
    args = ap.parse_args()
    shards = [int(s) for s in args.shards.split(",")]
    sizes = [int(s) for s in args.sizes.split(",")]

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={max(shards)}"
    )
    os.environ.pop("JAX_PLATFORMS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    import numpy as np
    from jax.sharding import Mesh

    from collaborative_zksnark_tpu.algebra import field as F
    from collaborative_zksnark_tpu.relations import r1cs
    from collaborative_zksnark_tpu.snark import groth16

    rng = np.random.default_rng(0)
    rows = []
    for logn in sizes:
        cs, assign = r1cs.squaring_circuit((1 << logn) - 1)
        pk, vk = groth16.setup(cs, seed=5)
        inst, wit = assign(123)
        z = F.FR.to_device(inst + wit)
        r_m = F.rand(F.FR, rng, ())
        s_m = F.rand(F.FR, rng, ())
        for S in shards:
            mesh = Mesh(np.array(jax.devices()[:S]), ("data",))
            if S == 1:
                # unsharded baseline
                pf = groth16.prove(pk, cs, z, r_m, s_m)  # warm
                groth16.reveal_proof(pf)
                t0 = time.perf_counter()
                pf = groth16.prove(pk, cs, z, r_m, s_m)
                hp = groth16.reveal_proof(pf)
                dt = time.perf_counter() - t0
            else:
                pf = groth16.prove_data_sharded(pk, cs, z, r_m, s_m, mesh)
                groth16.reveal_proof(pf)
                t0 = time.perf_counter()
                pf = groth16.prove_data_sharded(pk, cs, z, r_m, s_m, mesh)
                hp = groth16.reveal_proof(pf)
                dt = time.perf_counter() - t0
            ok = groth16.verify(vk, hp, inst[1:])
            assert ok
            rows.append((logn, S, round(dt, 4)))
            print(f"2^{logn} S={S}: {dt:.3f}s verified={ok}", flush=True)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "analysis", "data", "weakscale_sharded.csv",
    )
    with open(out, "w") as f:
        f.write("# virtual CPU mesh: shards share host cores — validates the\n")
        f.write("# sharded path + overheads, not real-chip speedup\n")
        f.write("log2_size,data_shards,prove_wall_s\n")
        for r in rows:
            f.write(",".join(map(str, r)) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
