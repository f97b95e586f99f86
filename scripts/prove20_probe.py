"""One-off: Groth16 2^20 setup + local prove + SPDZ prove on the chip
(validates the flagship bench block: memory, compiles, walls)."""
import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu"))
import numpy as np
log = lambda *a: print(*a, file=sys.stderr, flush=True)
log("devices:", jax.devices())
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.mpc import wire
from collaborative_zksnark_tpu.mpc.context import MpcContext
from collaborative_zksnark_tpu.parallel.net import StackedNet
from collaborative_zksnark_tpu.relations import r1cs
from collaborative_zksnark_tpu.snark import groth16

rng = np.random.default_rng(0)
t0 = time.perf_counter()
cs, assign = r1cs.squaring_circuit(1 << 20)
log(f"circuit: {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
pk, vk = groth16.setup(cs, seed=3)
np.asarray(pk.a_query.x[0])
log(f"setup 2^20: {time.perf_counter()-t0:.1f}s")
inst, wit = assign(12345)
z = F.FR.to_device(inst + wit)
r_m = F.rand(F.FR, rng, ()); s_m = F.rand(F.FR, rng, ())
t0 = time.perf_counter()
pf = groth16.prove(pk, cs, z, r_m, s_m)
hp = groth16.reveal_proof(pf)
log(f"local prove 2^20 (cold incl compile): {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
pf = groth16.prove(pk, cs, z, r_m, s_m)
hp = groth16.reveal_proof(pf)
dt = time.perf_counter() - t0
ok = groth16.verify(vk, hp, inst[1:])
log(f"local prove 2^20 (warm): {dt:.2f}s verified={ok}  ref 127.4s -> {127.4/dt:.1f}x")
# SPDZ
net = StackedNet(2); ctx = MpcContext(net, seed=9)
sch = wire.make_scheme("spdz", ctx)
z_sh = sch.king_share(z)
r_sh = wire.rand_share(sch); s_sh = wire.rand_share(sch)
t0 = time.perf_counter()
pf = groth16.prove_mpc(pk, cs, sch, z_sh, r_sh, s_sh)
hp = groth16.reveal_proof(pf)
log(f"spdz prove 2^20 (cold): {time.perf_counter()-t0:.1f}s")
net2 = StackedNet(2); ctx2 = MpcContext(net2, seed=9)
sch2 = wire.make_scheme("spdz", ctx2)
z_sh = sch2.king_share(z)
r_sh = wire.rand_share(sch2); s_sh = wire.rand_share(sch2)
t0 = time.perf_counter()
pf = groth16.prove_mpc(pk, cs, sch2, z_sh, r_sh, s_sh)
hp = groth16.reveal_proof(pf)
dt = time.perf_counter() - t0
ok = groth16.verify(vk, hp, inst[1:])
ctx2.assert_checks()
log(f"spdz prove 2^20 (warm): {dt:.2f}s verified={ok}  ref 133.2s -> {133.2/dt:.1f}x")
