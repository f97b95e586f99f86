"""Canonical serialization round-trips (the ark-serialize analog,
SURVEY.md §2.2 algebra/serialize)."""

import pytest

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import hostfield as H
from collaborative_zksnark_tpu.utils import serialize as S


def test_fr_fq_roundtrip():
    for v in (0, 1, C.R_MOD - 1, 12345678901234567890):
        assert S.fr_from_bytes(S.fr_to_bytes(v)) == v % C.R_MOD
    for v in (0, 1, C.Q_MOD - 1, 987654321):
        assert S.fq_from_bytes(S.fq_to_bytes(v)) == v % C.Q_MOD
    with pytest.raises(AssertionError):
        S.fr_from_bytes(b"\xff" * 32)


@pytest.mark.parametrize("k", [1, 2, 777, 123456789])
def test_g1_roundtrip(k):
    pt = H.G1.scalar_mul(H.G1_GEN, k)
    assert S.g1_decompress(S.g1_compress(pt)) == pt
    assert S.g1_from_uncompressed(S.g1_uncompressed(pt)) == pt
    assert len(S.g1_compress(pt)) == 48


def test_g1_identity():
    assert S.g1_decompress(S.g1_compress(None)) is None
    assert S.g1_from_uncompressed(S.g1_uncompressed(None)) is None


@pytest.mark.parametrize("k", [1, 3, 991])
def test_g2_roundtrip(k):
    pt = H.G2.scalar_mul(H.G2_GEN, k)
    assert S.g2_decompress(S.g2_compress(pt)) == pt
    assert S.g2_from_uncompressed(S.g2_uncompressed(pt)) == pt
    assert len(S.g2_compress(pt)) == 96


def test_g2_identity():
    assert S.g2_decompress(S.g2_compress(None)) is None


def test_g1_invalid_point_rejected():
    bad = bytearray(S.g1_compress(H.G1.scalar_mul(H.G1_GEN, 5)))
    bad[0] ^= 1  # x' = x +- 1: overwhelmingly not on the curve
    with pytest.raises(AssertionError):
        S.g1_decompress(bytes(bad))
