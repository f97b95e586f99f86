"""Collaborative Groth16: 2-party SPDZ / additive and 3-party GSZ prove over
a shared witness; the revealed proof must verify (and fail on a wrong
input).  Mirror of the reference flow mpc-snarks/src/proof.rs:112-143
(flagship path, SURVEY.md §3.1)."""

import numpy as np
import pytest

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.mpc import wire
from collaborative_zksnark_tpu.mpc.context import MpcContext
from collaborative_zksnark_tpu.parallel.net import StackedNet
from collaborative_zksnark_tpu.relations import r1cs
from collaborative_zksnark_tpu.snark import groth16

CASES = [("hbc", 2), ("spdz", 2), ("gsz", 3)]


@pytest.fixture(scope="module")
def keys():
    cs, assign = r1cs.squaring_circuit(8)
    pk, vk = groth16.setup(cs, seed=42)
    return cs, assign, pk, vk


@pytest.mark.parametrize("name,n", CASES, ids=[f"{a}{b}" for a, b in CASES])
def test_mpc_groth16(keys, name, n):
    cs, assign, pk, vk = keys
    net = StackedNet(n)
    ctx = MpcContext(net, seed=9)
    sch = wire.make_scheme(name, ctx)
    inst, wit = assign(12345)
    z_sh = sch.king_share(F.FR.to_device(inst + wit))
    r_sh = wire.rand_share(sch)
    s_sh = wire.rand_share(sch)
    proof = groth16.prove_mpc(pk, cs, sch, z_sh, r_sh, s_sh)
    hp = groth16.reveal_proof(proof)
    assert groth16.verify(vk, hp, inst[1:])
    assert not groth16.verify(vk, hp, [999])
    assert net.stats.bytes_sent > 0
