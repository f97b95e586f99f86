import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.pop("JAX_PLATFORMS", None)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.mpc import wire
from collaborative_zksnark_tpu.mpc.context import MpcContext
from collaborative_zksnark_tpu.mpc.local import LocalScheme
from collaborative_zksnark_tpu.parallel.net import StackedNet
from collaborative_zksnark_tpu.relations import r1cs
from collaborative_zksnark_tpu.snark import marlin

chain = int(sys.argv[1]) if len(sys.argv) > 1 else 2
alg = sys.argv[2] if len(sys.argv) > 2 else "local"

cs, assign = r1cs.squaring_circuit(chain)
srs = marlin.universal_setup(marlin.max_degree_for(cs), seed=5)
pk, vk = marlin.index(cs, srs)
inst, wit = assign(3)
print("indexed: n=", pk.index.n, "K=", pk.index.k_size, flush=True)

if alg == "local":
    sch = LocalScheme()
    wit_in = F.FR.to_device(wit)
else:
    parties = 3 if alg == "gsz" else 2
    ctx = MpcContext(StackedNet(parties), seed=7)
    sch = wire.make_scheme(alg, ctx)
    wit_in = sch.king_share(F.FR.to_device(wit))

pf = marlin.prove(pk, sch, inst, wit_in)
print("proved", flush=True)
ok = marlin.verify(vk, inst[1:], pf)
print("verify:", ok, flush=True)
assert ok
bad = marlin.verify(vk, [(inst[1] + 1)], pf)
print("negative verify (should be False):", bad, flush=True)
assert not bad
print("MARLIN", alg, "OK", flush=True)
