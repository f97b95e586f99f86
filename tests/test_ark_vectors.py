"""Frozen byte/constant vectors pinned to the reference's arkworks
conventions (VERDICT r3 item 6): literals here, NOT hostfield-derived, so
a shared systematic error in the repo's own host math cannot hide.

Sources:
  * Fr constants: reference curves/bls12_377/src/fields/fr.rs:11-56
    (Montgomery-form u64 limb literals).
  * Fq constants: curves/bls12_377/src/fields/fq.rs:11-60.
  * Generators: curves/bls12_377/src/curves/{g1.rs:46-51, g2.rs:69-86}.
  * SW compressed flags (bit7 = positive y, bit6 = infinity, on the top
    byte): algebra/serialize/src/flags.rs:110-127 + wire usage in
    short_weierstrass_jacobian.rs:795-804.
"""

import hashlib
import json

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.algebra import hostfield as H
from collaborative_zksnark_tpu.ops import ntt
from collaborative_zksnark_tpu.utils import serialize as S


def _u64s(limbs):
    return sum(v << (64 * i) for i, v in enumerate(limbs))


# --- reference literals (fr.rs / fq.rs) ------------------------------------

ARK_FR_MODULUS = _u64s([725501752471715841, 6461107452199829505,
                        6968279316240510977, 1345280370688173398])
ARK_FR_R = _u64s([9015221291577245683, 8239323489949974514,
                  1646089257421115374, 958099254763297437])
ARK_FR_R2 = _u64s([2726216793283724667, 14712177743343147295,
                   12091039717619697043, 81024008013859129])
ARK_FR_TWO_ADIC_ROOT = _u64s([12646347781564978760, 6783048705277173164,
                              268534165941069093, 1121515446318641358])
ARK_FR_LARGE_ROOT = _u64s([0x9bfe9d90c790c167, 0x7175a69e39013bff,
                           0x3fbbb698adabcf93, 0xc59f8d8d6f0dc97])
ARK_FQ_MODULUS = _u64s([0x8508C00000000001, 0x170B5D4430000000,
                        0x1EF3622FBA094800, 0x1A22D9F300F5138F,
                        0xC63B05C06CA1493B, 0x01AE3A4617C510EA])
ARK_FQ_R = _u64s([202099033278250856, 5854854902718660529,
                  11492539364873682930, 8885205928937022213,
                  5545221690922665192, 39800542322357402])


def test_fr_constants_match_arkworks():
    assert C.R_MOD == ARK_FR_MODULUS
    Rint = 1 << 256
    assert ARK_FR_R == Rint % C.R_MOD
    assert ARK_FR_R2 == Rint * Rint % C.R_MOD
    rinv = pow(Rint, -1, C.R_MOD)
    assert C.FR_LARGE_SUBGROUP_ROOT == ARK_FR_LARGE_ROOT * rinv % C.R_MOD
    # ark_ff::get_root_of_unity derives EVERY BLS12-377 Fr domain generator
    # from the large-subgroup root (cubed, then squared down) — the
    # fr.rs:14-18 TWO_ADIC_ROOT_OF_UNITY literal is unused for this field
    # (ref algebra/ff/src/fields/mod.rs:337-367); the repo follows suit:
    assert C.FR_TWO_ADIC_ROOT == pow(ARK_FR_LARGE_ROOT * rinv % C.R_MOD, 3, C.R_MOD)
    # (the shipped literal is a *different* primitive 2^47th root:)
    ark_lit = ARK_FR_TWO_ADIC_ROOT * rinv % C.R_MOD
    assert pow(ark_lit, 1 << 47, C.R_MOD) == 1
    assert pow(ark_lit, 1 << 46, C.R_MOD) == C.R_MOD - 1


def test_fq_constants_match_arkworks():
    assert C.Q_MOD == ARK_FQ_MODULUS
    assert ARK_FQ_R == (1 << 384) % C.Q_MOD
    # the repo's u32x24 Montgomery unit R' = 2^384 equals ark's (Fp384)
    assert F.limbs_to_int(F.FQ.one_mont) == ARK_FQ_R


def test_generators_match_arkworks():
    # g1.rs:46,51 / g2.rs:69-86 decimal literals
    assert H.G1_GEN == (
        81937999373150964239938255573465948239988671502647976594219695644855304257327692006745978603320413799295628339695,
        241266749859715473739788878240585681733927191168601896383759122102112907357779751001206799952863815012735208165030,
    )
    assert H.G2_GEN == (
        (233578398248691099356572568220835526895379068987715365179118596935057653620464273615301663571204657964920925606294,
         140913150380207355837477652521042157274541796891053068589147167627541651775299824604154852141315666357241556069118),
        (63160294768292073209381361943935198908131692476676907196754037919244929611450776219210369229519898517858833747423,
         149157405641012693445398062341192467754805999074082136895788947234480009303640899064710353187729182149407503257491),
    )


# --- frozen wire bytes ------------------------------------------------------

G1_GEN_COMPRESSED = bytes.fromhex(
    "efe91bb26eb1b9ea4e39cdff121548d55ccb37bdc8828218bb419daa2c1e9585"
    "54ff87bf2562fcc8670a74fede488880"
)
G1_5G_COMPRESSED = bytes.fromhex(
    "97f7ec4e01f776fd097cd378bb7220d018c75ce987b9923cb2f0e86c37ad302a"
    "cc53f29a98f42ed342b63e4e2d051780"
)
G1_INF_COMPRESSED = bytes.fromhex("00" * 47 + "40")
G2_GEN_COMPRESSED = bytes.fromhex(
    "9651007c8fe4e374025453bb529f88719b6bdb57f501a57e31503e2071f065c5"
    "011d84a3a23096c8fe85c771be808401fe6aa16efafe6bb2e66ff7bf8499f85c"
    "dec99907ce3e22e7cbce5166ee772753d540b1b1515adc70314000e74060ea80"
)


def test_compressed_point_vectors():
    assert S.g1_compress(H.G1_GEN) == G1_GEN_COMPRESSED
    assert S.g1_compress(H.G1.scalar_mul(H.G1_GEN, 5)) == G1_5G_COMPRESSED
    assert S.g1_compress(None) == G1_INF_COMPRESSED
    assert S.g2_compress(H.G2_GEN) == G2_GEN_COMPRESSED
    # flag bit semantics (flags.rs:117): infinity = bit6 of the top byte,
    # positive-y = bit7; x-bytes of the generator are little-endian x
    assert G1_INF_COMPRESSED[-1] == 0x40
    x_bytes = bytearray(G1_GEN_COMPRESSED)
    assert x_bytes[-1] & 0x80  # generator's y is the larger root
    x_bytes[-1] &= 0x3F
    assert int.from_bytes(bytes(x_bytes), "little") == H.G1_GEN[0]
    # round-trips through the deserializer
    assert S.g1_decompress(G1_GEN_COMPRESSED) == H.G1_GEN
    assert S.g1_decompress(G1_INF_COMPRESSED) is None


# --- frozen NTT vector (ark two-adic root -> identical domain order) --------

def test_ntt_frozen_vector():
    n = 1 << 10
    dom = ntt.get_radix2_domain(n)
    # the domain generator IS ark's get_root_of_unity(2^10):
    # (large_root^3)^(2^(47-10))  — ff/src/fields/mod.rs:360-367
    large_std = ARK_FR_LARGE_ROOT * pow(1 << 256, -1, C.R_MOD) % C.R_MOD
    assert dom.omega == pow(pow(large_std, 3, C.R_MOD), 1 << 37, C.R_MOD)
    cf = [(i * i + 3) % C.R_MOD for i in range(n)]
    y = [int(v) for v in F.FR.to_host(dom.fft(F.FR.to_device(cf)))]
    assert y[1] == (
        4566148947048756341809595777766884352512657981969379006938151035964413062787
    )
    h = hashlib.sha256(json.dumps(y).encode()).hexdigest()
    assert h == (
        "4965986877373dae70f07d9831663e89b493f1b4019066724e2426745e74003f"
    )


# --- frozen KZG commitment (regression pin for SRS + commit path) -----------

def test_kzg_srs_frozen_vector():
    from collaborative_zksnark_tpu.ops import curve as cv
    from collaborative_zksnark_tpu.snark import kzg

    srs = kzg.setup(8, seed=1)
    tau_g1 = cv.g1_to_host(
        cv.JacPoint(srs.powers.x[1:2], srs.powers.y[1:2], srs.powers.z[1:2])
    )[0]
    assert S.g1_compress(tau_g1) == bytes.fromhex(
        "4f6f846abd7c8384e80fb41317c5ad1fbc5f7717468ca29fcfdbef6710690ce6"
        "9824b19c72e424fd73a5c2940ab7da00"
    )
