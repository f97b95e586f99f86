"""Plonk / Marlin prove walls on the real chip (local + 2-party SPDZ,
StackedNet) — sizes the bench.py plonk/marlin blocks and warms the
persistent jit cache for them.

Usage: python scripts/snark_tpu_probe.py {plonk|marlin} [LOGN] [--local-only]
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

system = sys.argv[1] if len(sys.argv) > 1 else "plonk"
logn = int(sys.argv[2]) if len(sys.argv) > 2 else 14
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
from collaborative_zksnark_tpu.mpc import wire
from collaborative_zksnark_tpu.mpc.context import MpcContext
from collaborative_zksnark_tpu.parallel.net import StackedNet

if system == "plonk":
    from collaborative_zksnark_tpu.relations.plonk_circuit import (
        CircuitLayout, PlonkCircuit)
    from collaborative_zksnark_tpu.snark import plonk

    t0 = time.perf_counter()
    circ = PlonkCircuit.squaring(1 << logn, start=12345)
    layout = CircuitLayout.from_circuit(circ)
    srs = plonk.universal_setup(layout.n_gates, seed=7)
    pk, vk = plonk.circuit_setup(srs, layout)
    log(el(), f"plonk setup 2^{logn}: {time.perf_counter()-t0:.1f}s")
    vals_pub = F.FR.to_device(circ.values)
    pub_vals = None
    for v, name in circ.pub_vars.items():
        if name == "out":
            pub_vals = {"out": circ.values[v]}
    assert pub_vals is not None

    def once(alg):
        net = StackedNet(2 if alg == "spdz" else 1)
        ctx = MpcContext(net, seed=11)
        sch = wire.make_scheme(alg, ctx)
        vals_sh = sch.king_share(vals_pub)
        t0 = time.perf_counter()
        proof = plonk.Prover(sch, pk).prove(vals_sh, pub_vals)
        dt = time.perf_counter() - t0
        ok = plonk.verify(vk, proof, pub_vals)
        ctx.assert_checks()
        return dt, ok
else:
    from collaborative_zksnark_tpu.relations import r1cs
    from collaborative_zksnark_tpu.snark import marlin

    cs, assign = r1cs.squaring_circuit(1 << logn)
    t0 = time.perf_counter()
    srs = marlin.universal_setup(marlin.max_degree_for(cs), seed=13)
    pk, vk = marlin.index(cs, srs)
    log(el(), f"marlin setup+index 2^{logn}: {time.perf_counter()-t0:.1f}s")
    inst, wit = assign(999)

    def once(alg):
        net = StackedNet(2 if alg == "spdz" else 1)
        ctx = MpcContext(net, seed=11)
        sch = wire.make_scheme(alg, ctx)
        wit_sh = sch.king_share(F.FR.to_device(wit))
        t0 = time.perf_counter()
        proof = marlin.prove(pk, sch, inst, wit_sh)
        dt = time.perf_counter() - t0
        ok = marlin.verify(vk, inst[1:], proof)
        ctx.assert_checks()
        return dt, ok

dt, ok = once("local")
log(el(), f"{system} local cold 2^{logn}: {dt:.2f}s verified={ok}")
assert ok
dt, ok = once("local")
log(el(), f"{system} local warm 2^{logn}: {dt:.2f}s verified={ok}")
if not local_only:
    dt, ok = once("spdz")
    log(el(), f"{system} spdz cold 2^{logn}: {dt:.2f}s verified={ok}")
    assert ok
    dt, ok = once("spdz")
    log(el(), f"{system} spdz warm 2^{logn}: {dt:.2f}s verified={ok}")
