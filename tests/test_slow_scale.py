"""Scale tier (-m slow): 2^10-size SNARK proves on the CPU mesh — catches
scale-only bugs the toy-size default tier can't (round-2 verdict item 10).

Run with:  python -m pytest tests/test_slow_scale.py -m slow -q
(cache-warm budget ~5 min; excluded from the default suite)
"""

import numpy as np
import pytest

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.mpc import wire
from collaborative_zksnark_tpu.mpc.context import MpcContext
from collaborative_zksnark_tpu.parallel.net import StackedNet

SIZE = 1 << 10


def _scheme(name, n):
    net = StackedNet(n)
    ctx = MpcContext(net, seed=17)
    return ctx, wire.make_scheme(name, ctx)


@pytest.mark.slow
def test_groth16_spdz_2p_1024():
    from collaborative_zksnark_tpu.relations import r1cs
    from collaborative_zksnark_tpu.snark import groth16

    cs, assign = r1cs.squaring_circuit(SIZE)
    pk, vk = groth16.setup(cs, seed=18)
    inst, wit = assign(4321)
    ctx, sch = _scheme("spdz", 2)
    z_sh = sch.king_share(F.FR.to_device(inst + wit))
    pf = groth16.prove_mpc(pk, cs, sch, z_sh, wire.rand_share(sch), wire.rand_share(sch))
    hp = groth16.reveal_proof(pf)
    assert groth16.verify(vk, hp, inst[1:])
    ctx.assert_checks()


@pytest.mark.slow
def test_plonk_spdz_2p_1024():
    from collaborative_zksnark_tpu.relations.plonk_circuit import (
        CircuitLayout,
        PlonkCircuit,
    )
    from collaborative_zksnark_tpu.snark import plonk

    circ = PlonkCircuit.squaring(SIZE, start=3)
    layout = CircuitLayout.from_circuit(circ)
    srs = plonk.universal_setup(layout.n_gates, seed=19)
    pk, vk = plonk.circuit_setup(srs, layout)
    ctx, sch = _scheme("spdz", 2)
    vals_sh = sch.king_share(F.FR.to_device(circ.values))
    out = next(circ.values[v] for v, nm in circ.pub_vars.items() if nm == "out")
    pf = plonk.Prover(sch, pk).prove(vals_sh, {"out": out})
    assert plonk.verify(vk, pf, {"out": out})
    ctx.assert_checks()


@pytest.mark.slow
def test_marlin_spdz_2p_1024():
    from collaborative_zksnark_tpu.relations import r1cs
    from collaborative_zksnark_tpu.snark import marlin

    cs, assign = r1cs.squaring_circuit(SIZE)
    srs = marlin.universal_setup(marlin.max_degree_for(cs), seed=20)
    pk, vk = marlin.index(cs, srs)
    inst, wit = assign(4321)
    ctx, sch = _scheme("spdz", 2)
    wit_sh = sch.king_share(F.FR.to_device(wit))
    pf = marlin.prove(pk, sch, inst, wit_sh)
    assert marlin.verify(vk, inst[1:], pf)
    ctx.assert_checks()
