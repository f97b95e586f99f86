"""Groth16 end-to-end: prove on device, verify via host pairing.

Mirror of the reference's Groth16 test path (mpc-snarks/src/groth.rs:11-42
mpc_test_prove_and_verify), including the negative check that a wrong public
input does NOT verify.
"""

import numpy as np

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.relations import r1cs
from collaborative_zksnark_tpu.snark import groth16


def test_groth16_squaring_e2e():
    cs, assign = r1cs.squaring_circuit(8)
    pk, vk = groth16.setup(cs, seed=42)

    inst, wit = assign(12345)
    z = F.FR.to_device(inst + wit)
    rng = np.random.default_rng(7)
    r_m = F.FR.to_device([int.from_bytes(rng.bytes(40), "little") % C.R_MOD])[0]
    s_m = F.FR.to_device([int.from_bytes(rng.bytes(40), "little") % C.R_MOD])[0]
    proof = groth16.prove(pk, cs, z, r_m, s_m)
    hp = groth16.reveal_proof(proof)

    assert groth16.verify(vk, hp, inst[1:])
    # negative test (ref mpc-snarks/src/groth.rs:39-40)
    assert not groth16.verify(vk, hp, [999])
