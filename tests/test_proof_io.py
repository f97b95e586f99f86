"""Proof serialization round-trips: serialize -> deserialize -> verify.

Mirrors the reference's CanonicalSerialize on proofs (ark-serialize derives
on groth16::Proof / marlin Proof / poly-commit commitments), including the
compressed-point validation on decode.
"""

import numpy as np
import pytest

from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.relations import r1cs as r1csmod
from collaborative_zksnark_tpu.snark import groth16
from collaborative_zksnark_tpu.utils import proof_io


def _groth16_proof(size=16):
    cs, assign = r1csmod.squaring_circuit(size)
    pk, vk = groth16.setup(cs, seed=1)
    inst, wit = assign(7)
    rng = np.random.default_rng(5)
    z = F.FR.to_device(inst + wit)
    proof = groth16.prove(pk, cs, z, F.rand(F.FR, rng, ()), F.rand(F.FR, rng, ()))
    return vk, groth16.reveal_proof(proof), inst


def test_groth16_proof_bytes_roundtrip():
    vk, hp, inst = _groth16_proof()
    b = proof_io.groth16_proof_to_bytes(hp)
    assert len(b) == 192  # arkworks compressed Proof size
    hp2 = proof_io.groth16_proof_from_bytes(b)
    assert (hp2.a, hp2.b, hp2.c) == (hp.a, hp.b, hp.c)
    assert groth16.verify(vk, hp2, inst[1:])


def test_groth16_proof_bytes_tamper():
    vk, hp, inst = _groth16_proof()
    b = bytearray(proof_io.groth16_proof_to_bytes(hp))
    b[3] ^= 0x40
    try:
        hp2 = proof_io.groth16_proof_from_bytes(bytes(b))
    except AssertionError:
        return  # x no longer on curve: decode rejects
    assert not groth16.verify(vk, hp2, inst[1:])


def test_tagged_roundtrip_nested():
    from collaborative_zksnark_tpu.algebra import hostfield as H
    from collaborative_zksnark_tpu.snark import kzg

    g1 = H.G1.scalar_mul(H.G1_GEN, 9)
    g2 = H.G2.scalar_mul(H.G2_GEN, 11)
    tree = {
        "a": 5,
        "big": F.FR.p - 3,
        "pt": g1,
        "pt2": g2,
        "inf": None,
        "cmt": kzg.Commitment(g1, None, None),
        "cmt_bound": kzg.Commitment(g1, g1, 7),
        "open": kzg.Proof(g1, 123456789),
        "lst": [1, g1, {"x": 2}],
    }
    b = proof_io.dumps(tree)
    back = proof_io.loads(b)
    assert back["a"] == 5 and back["big"] == F.FR.p - 3
    assert back["pt"] == g1 and back["pt2"] == g2 and back["inf"] is None
    assert back["cmt"].comm == g1 and back["cmt"].shifted_comm is None
    assert back["cmt_bound"].degree_bound == 7
    assert back["open"].w == g1 and back["open"].random_v == 123456789
    assert back["lst"][2]["x"] == 2
    # determinism: same tree -> same bytes
    assert proof_io.dumps(back) == b


def test_marlin_proof_bytes_roundtrip():
    from collaborative_zksnark_tpu.mpc.local import LocalScheme
    from collaborative_zksnark_tpu.snark import marlin

    cs, assign = r1csmod.squaring_circuit(8)
    srs = marlin.universal_setup(marlin.max_degree_for(cs), seed=3)
    ipk, ivk = marlin.index(cs, srs)
    inst, wit = assign(3)
    proof = marlin.prove(ipk, LocalScheme(), inst, F.FR.to_device(wit))
    b = proof_io.marlin_proof_to_bytes(proof)
    proof2 = proof_io.marlin_proof_from_bytes(b)
    assert marlin.verify(ivk, inst[1:], proof2)
