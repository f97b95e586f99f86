"""Build the Groth16 key cache for a given size on the CPU backend.

Usage: python scripts/build_keycache.py LOGN SEED
Setup is host-native (fixed-base FFI kernel); running on the CPU backend
keeps the (slow) tunnel out of it entirely — the TPU bench later pays
only the one np.load + device transfer.  Prints phase timings.
"""
import os
import sys
import time

os.environ.pop("JAX_PLATFORMS", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the ambient axon plugin overrides the env var — force CPU via config
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
seed = int(sys.argv[2]) if len(sys.argv) > 2 else 3

from collaborative_zksnark_tpu.relations import r1cs
from collaborative_zksnark_tpu.snark import groth16, keycache

log = lambda *a: print(*a, file=sys.stderr, flush=True)

t0 = time.perf_counter()
cs, assign = r1cs.squaring_circuit(1 << logn)
log(f"circuit 2^{logn}: {time.perf_counter()-t0:.1f}s")

path = keycache.path_for("groth16", logn, seed)
if os.path.exists(path):
    log(f"cache already present: {path}")
    sys.exit(0)

t0 = time.perf_counter()
pk, vk = groth16.setup(cs, seed=seed)
log(f"setup: {time.perf_counter()-t0:.1f}s")

t0 = time.perf_counter()
keycache.save_groth16(path, pk, vk)
log(f"save: {time.perf_counter()-t0:.1f}s -> {path} "
    f"({os.path.getsize(path)/1e6:.0f} MB)")
