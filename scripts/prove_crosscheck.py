"""Deterministic Groth16 prove on the current backend; prints the revealed
proof as JSON so TPU and CPU runs can be diffed (same cached keys, same
seeded inputs).  Usage: [JAX_PLATFORMS=tpu] python scripts/prove_crosscheck.py LOGN SEED"""
import json, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logn = int(sys.argv[1]); seed = int(sys.argv[2])
import jax
if os.environ.get("JAX_PLATFORMS") != "tpu":
    os.environ.pop("JAX_PLATFORMS", None)
    jax.config.update("jax_platforms", "cpu")
    cache = ".jax_cache"
else:
    cache = ".jax_cache_tpu"
jax.config.update("jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), cache))
os.environ.setdefault("CZTPU_FUSED", "1")
import numpy as np
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.relations import r1cs
from collaborative_zksnark_tpu.snark import groth16, keycache
cs, assign = r1cs.squaring_circuit(1 << logn)
pk, vk = keycache.load_groth16(keycache.path_for("groth16", logn, seed))
assert pk is not None
inst, wit = assign(12345)
z = F.FR.to_device(inst + wit)
rng = np.random.default_rng(1)
r_m = F.rand(F.FR, rng, ()); s_m = F.rand(F.FR, rng, ())
pf = groth16.prove(pk, cs, z, r_m, s_m)
hp = groth16.reveal_proof(pf)
ok = groth16.verify(vk, hp, inst[1:])
print(json.dumps({"backend": jax.default_backend(), "ok": bool(ok),
                  "a": [str(v) for v in hp.a],
                  "b": [[str(v) for v in c] for c in hp.b],
                  "c": [str(v) for v in hp.c]}))
