"""Plonk prove/verify — local and MPC — on the squaring circuit.

Mirror of the reference's plonk tests (mpc-plonk/src/lib.rs:637-672
plonk_test local; mpc-snarks plonk client computation for the MPC path),
including negative verification."""

import pytest

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.mpc import wire
from collaborative_zksnark_tpu.mpc.context import MpcContext
from collaborative_zksnark_tpu.mpc.local import LocalScheme
from collaborative_zksnark_tpu.parallel.net import StackedNet
from collaborative_zksnark_tpu.relations.plonk_circuit import CircuitLayout, PlonkCircuit
from collaborative_zksnark_tpu.snark import plonk

P = C.R_MOD


@pytest.fixture(scope="module")
def setup():
    circ = PlonkCircuit.squaring(4, start=3)
    layout = CircuitLayout.from_circuit(circ)
    srs = plonk.universal_setup(layout.n_gates, seed=5)
    pk, vk = plonk.circuit_setup(srs, layout)
    return circ, layout, pk, vk


def _out(circ):
    for v, name in circ.pub_vars.items():
        if name == "out":
            return circ.values[v]
    raise KeyError


def test_plonk_local(setup):
    circ, layout, pk, vk = setup
    vals = F.FR.to_device(circ.values)
    prover = plonk.Prover(LocalScheme(), pk)
    proof = prover.prove(vals, {"out": _out(circ)})
    assert plonk.verify(vk, proof, {"out": _out(circ)})
    # negative: wrong public value must not verify
    assert not plonk.verify(vk, proof, {"out": 12345})


@pytest.mark.parametrize("name,n", [("hbc", 2), ("spdz", 2), ("gsz", 3)])
def test_plonk_mpc(setup, name, n):
    circ, layout, pk, vk = setup
    net = StackedNet(n)
    ctx = MpcContext(net, seed=13)
    sch = wire.make_scheme(name, ctx)
    vals_sh = sch.king_share(F.FR.to_device(circ.values))
    prover = plonk.Prover(sch, pk)
    proof = prover.prove(vals_sh, {"out": _out(circ)})
    ctx.assert_checks()
    assert plonk.verify(vk, proof, {"out": _out(circ)})
    assert not plonk.verify(vk, proof, {"out": 4})
