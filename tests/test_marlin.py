"""Marlin prove/verify: local + collaborative (hbc/spdz/gsz) + negative.

Mirrors the reference's test pattern (mpc-snarks/src/marlin.rs
mpc_test_prove_and_verify + the client `marlin` computation): prove over a
(shared) witness, verify on the revealed proof, and assert a WRONG public
input does NOT verify (ref mpc-snarks/src/groth.rs:39-40 analog).
"""

import pytest

from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.mpc import wire
from collaborative_zksnark_tpu.mpc.context import MpcContext
from collaborative_zksnark_tpu.mpc.local import LocalScheme
from collaborative_zksnark_tpu.parallel.net import StackedNet
from collaborative_zksnark_tpu.relations import r1cs
from collaborative_zksnark_tpu.snark import marlin


def _setup(chain=8, seed=5):
    cs, assign = r1cs.squaring_circuit(chain)
    srs = marlin.universal_setup(marlin.max_degree_for(cs), seed=seed)
    pk, vk = marlin.index(cs, srs)
    inst, wit = assign(3)
    return cs, pk, vk, inst, wit


@pytest.fixture(scope="module")
def small():
    return _setup(8)


def test_marlin_local(small):
    cs, pk, vk, inst, wit = small
    sch = LocalScheme()
    pf = marlin.prove(pk, sch, inst, F.FR.to_device(wit))
    assert marlin.verify(vk, inst[1:], pf)
    # negative: wrong public input must not verify
    assert not marlin.verify(vk, [(inst[1] + 1)], pf)


@pytest.mark.parametrize(
    "alg,parties", [("hbc", 2), ("spdz", 2), ("gsz", 3)]
)
def test_marlin_mpc(small, alg, parties):
    cs, pk, vk, inst, wit = small
    net = StackedNet(parties)
    ctx = MpcContext(net, seed=7)
    sch = wire.make_scheme(alg, ctx)
    wit_sh = sch.king_share(F.FR.to_device(wit))
    pf = marlin.prove(pk, sch, inst, wit_sh)
    assert marlin.verify(vk, inst[1:], pf)
    assert not marlin.verify(vk, [(inst[1] + 1)], pf)


@pytest.mark.slow
def test_marlin_local_2pow6():
    # >= 2^6 constraints (the VERDICT round-2 bar)
    cs, pk, vk, inst, wit = _setup(64)
    sch = LocalScheme()
    pf = marlin.prove(pk, sch, inst, F.FR.to_device(wit))
    assert marlin.verify(vk, inst[1:], pf)
