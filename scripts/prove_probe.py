"""One-off: Groth16 setup + local prove + verify at a given log2 size on
the chip (usage: python scripts/prove_probe.py [logn] [spdz])."""
import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np
log = lambda *a: print(*a, file=sys.stderr, flush=True)
logn = int(sys.argv[1]) if len(sys.argv) > 1 else 18
do_spdz = "spdz" in sys.argv
log("devices:", jax.devices())
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.relations import r1cs
from collaborative_zksnark_tpu.snark import groth16

rng = np.random.default_rng(0)
t0 = time.perf_counter()
cs, assign = r1cs.squaring_circuit(1 << logn)
log(f"circuit 2^{logn}: {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
pk, vk = groth16.setup(cs, seed=3)
np.asarray(pk.a_query.x[0])
log(f"setup: {time.perf_counter()-t0:.1f}s")
inst, wit = assign(12345)
z = F.FR.to_device(inst + wit)
r_m = F.rand(F.FR, rng, ()); s_m = F.rand(F.FR, rng, ())
t0 = time.perf_counter()
pf = groth16.prove(pk, cs, z, r_m, s_m)
hp = groth16.reveal_proof(pf)
ok = groth16.verify(vk, hp, inst[1:])
log(f"local prove 2^{logn} (cold): {time.perf_counter()-t0:.1f}s verified={ok}")
t0 = time.perf_counter()
pf = groth16.prove(pk, cs, z, r_m, s_m)
hp = groth16.reveal_proof(pf)
dt = time.perf_counter() - t0
ok = groth16.verify(vk, hp, inst[1:])
log(f"local prove 2^{logn} (warm): {dt:.2f}s verified={ok}")

if do_spdz:
    from collaborative_zksnark_tpu.mpc import wire
    from collaborative_zksnark_tpu.mpc.context import MpcContext
    from collaborative_zksnark_tpu.parallel.net import StackedNet

    net = StackedNet(2); ctx = MpcContext(net, seed=9)
    sch = wire.make_scheme("spdz", ctx)
    z_sh = sch.king_share(z)
    r_sh = wire.rand_share(sch); s_sh = wire.rand_share(sch)
    t0 = time.perf_counter()
    pf = groth16.prove_mpc(pk, cs, sch, z_sh, r_sh, s_sh)
    hp = groth16.reveal_proof(pf)
    log(f"spdz prove 2^{logn} (cold): {time.perf_counter()-t0:.1f}s")
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
    log(f"spdz prove 2^{logn} (warm): {dt:.2f}s verified={ok}")
