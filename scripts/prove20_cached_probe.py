"""Groth16 prove probe on the real chip, keys from the disk cache.

Times every phase separately (cache load, device transfer, witness-map
compile/run, full prove cold/warm, SPDZ cold/warm) so the bench budget
can be allocated from measurements, and leaves the persistent jit cache
warm for bench.py.

Usage: python scripts/prove20_cached_probe.py [LOGN] [SEED] [--local-only]
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
seed = int(sys.argv[2]) if len(sys.argv) > 2 else 3
local_only = "--local-only" in sys.argv

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"),
)
import numpy as np

log = lambda *a: print(*a, file=sys.stderr, flush=True)
T0 = time.perf_counter()
el = lambda: f"[{time.perf_counter()-T0:7.1f}s]"
log(el(), "devices:", jax.devices())

from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.relations import r1cs
from collaborative_zksnark_tpu.snark import groth16, keycache

t0 = time.perf_counter()
cs, assign = r1cs.squaring_circuit(1 << logn)
log(el(), f"circuit 2^{logn}: {time.perf_counter()-t0:.1f}s")

t0 = time.perf_counter()
pk, vk = keycache.load_groth16(keycache.path_for("groth16", logn, seed))
assert pk is not None, "key cache missing — run scripts/build_keycache.py"
log(el(), f"cache load (lazy): {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
np.asarray(pk.a_query.x[0]); np.asarray(pk.b_g2_query.x[0])
np.asarray(pk.h_query.x[0]); np.asarray(pk.l_query.x[0])
np.asarray(pk.b_g1_query.x[0])
log(el(), f"device transfer forced: {time.perf_counter()-t0:.1f}s")

rng = np.random.default_rng(1)
inst, wit = assign(12345)
t0 = time.perf_counter()
z = F.FR.to_device(inst + wit)
np.asarray(z[0])
log(el(), f"assignment to device: {time.perf_counter()-t0:.1f}s")
r_m = F.rand(F.FR, rng, ())
s_m = F.rand(F.FR, rng, ())

# witness map first (isolates the FFT-chain compile from the MSMs)
t0 = time.perf_counter()
h = groth16.witness_map(cs, z)
np.asarray(h[0])
log(el(), f"witness_map cold: {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
h = groth16.witness_map(cs, z)
np.asarray(h[0])
log(el(), f"witness_map warm: {time.perf_counter()-t0:.2f}s")

t0 = time.perf_counter()
pf = groth16.prove(pk, cs, z, r_m, s_m)
hp = groth16.reveal_proof(pf)
log(el(), f"local prove cold (incl MSM compiles): {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
pf = groth16.prove(pk, cs, z, r_m, s_m)
hp = groth16.reveal_proof(pf)
dt = time.perf_counter() - t0
ok = groth16.verify(vk, hp, inst[1:])
log(el(), f"local prove warm: {dt:.2f}s verified={ok} "
    f"(ref @2^20: 127.4s -> {127.4/dt:.1f}x)" if logn == 20 else
    f"local prove warm: {dt:.2f}s verified={ok}")
assert ok

if local_only:
    sys.exit(0)

from collaborative_zksnark_tpu.mpc import wire
from collaborative_zksnark_tpu.mpc.context import MpcContext
from collaborative_zksnark_tpu.parallel.net import StackedNet


def spdz_once(tag):
    net = StackedNet(2)
    ctx = MpcContext(net, seed=9)
    sch = wire.make_scheme("spdz", ctx)
    z_sh = sch.king_share(z)
    r_sh = wire.rand_share(sch)
    s_sh = wire.rand_share(sch)
    t0 = time.perf_counter()
    pf = groth16.prove_mpc(pk, cs, sch, z_sh, r_sh, s_sh)
    hp = groth16.reveal_proof(pf)
    dt = time.perf_counter() - t0
    ok = groth16.verify(vk, hp, inst[1:])
    ctx.assert_checks()
    log(el(), f"spdz 2-party prove {tag}: {dt:.2f}s verified={ok}")
    return dt


spdz_once("cold")
dt = spdz_once("warm")
if logn == 20:
    log(el(), f"ref 133.2s -> {133.2/dt:.1f}x")
