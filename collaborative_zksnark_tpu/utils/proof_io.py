"""Canonical proof / key (de)serialization.

The reference serializes proofs and keys with ark-serialize (CanonicalSerialize
on Proof/VerifyingKey — ref groth16/src/data_structures.rs derive macros,
poly-commit/src/data_structures.rs) so parties and verifiers can exchange
them as bytes.  This module is the analog:

  * `groth16_proof_to_bytes` / `from_bytes` — the compact 192-byte form
    (compressed A | B | C), byte-size-matching arkworks' compressed Proof.
  * A small TAGGED canonical format (`dumps`/`loads`) for the structured
    Plonk / Marlin proofs: deterministic (dict keys sorted), self-describing,
    round-trips host-side proof trees built from Fr ints, affine G1/G2
    points, kzg Commitments and opening Proofs, dicts and lists.

All group elements serialize COMPRESSED with curve-membership validation on
decode (utils/serialize.py), so deserialized proofs are safe to verify.
"""

from __future__ import annotations

import struct
from typing import Any

from . import serialize as S

_T_NONE = 0
_T_INT = 1
_T_G1 = 2
_T_G2 = 3
_T_DICT = 4
_T_LIST = 5
_T_COMMIT = 6
_T_KZGPROOF = 7
_T_SMALLINT = 8


def _is_g1(v) -> bool:
    return (
        isinstance(v, tuple)
        and len(v) == 2
        and all(isinstance(c, int) for c in v)
    )


def _is_g2(v) -> bool:
    return (
        isinstance(v, tuple)
        and len(v) == 2
        and all(isinstance(c, tuple) and len(c) == 2 for c in v)
    )


def dumps(v: Any) -> bytes:
    """Canonical tagged encoding of a host-side proof tree."""
    from ..snark import kzg

    if v is None:
        return bytes([_T_NONE])
    if isinstance(v, bool):
        raise TypeError("bool is ambiguous in proofs; encode explicitly")
    if isinstance(v, int):
        if 0 <= v < (1 << 62):
            return bytes([_T_SMALLINT]) + struct.pack("<q", v)
        return bytes([_T_INT]) + S.fr_to_bytes(v)
    if isinstance(v, kzg.Commitment):
        return (
            bytes([_T_COMMIT])
            + dumps(v.comm)
            + dumps(v.shifted_comm)
            + dumps(v.degree_bound)
        )
    if isinstance(v, kzg.Proof):
        return bytes([_T_KZGPROOF]) + dumps(v.w) + dumps(v.random_v)
    if _is_g2(v):
        return bytes([_T_G2]) + S.g2_compress(v)
    if _is_g1(v):
        return bytes([_T_G1]) + S.g1_compress(v)
    if isinstance(v, dict):
        out = [bytes([_T_DICT]), struct.pack("<I", len(v))]
        for k in sorted(v):
            kb = k.encode()
            out.append(struct.pack("<H", len(kb)))
            out.append(kb)
            out.append(dumps(v[k]))
        return b"".join(out)
    if isinstance(v, (list, tuple)):
        out = [bytes([_T_LIST]), struct.pack("<I", len(v))]
        out.extend(dumps(x) for x in v)
        return b"".join(out)
    raise TypeError(f"unserializable proof node: {type(v)}")


def _loads(b: bytes, off: int):
    from ..snark import kzg

    tag = b[off]
    off += 1
    if tag == _T_NONE:
        return None, off
    if tag == _T_SMALLINT:
        return struct.unpack_from("<q", b, off)[0], off + 8
    if tag == _T_INT:
        return S.fr_from_bytes(b[off : off + 32]), off + 32
    if tag == _T_G1:
        return S.g1_decompress(b[off : off + 48]), off + 48
    if tag == _T_G2:
        return S.g2_decompress(b[off : off + 96]), off + 96
    if tag == _T_COMMIT:
        comm, off = _loads(b, off)
        shifted, off = _loads(b, off)
        bound, off = _loads(b, off)
        return kzg.Commitment(comm, shifted, bound), off
    if tag == _T_KZGPROOF:
        w, off = _loads(b, off)
        rv, off = _loads(b, off)
        return kzg.Proof(w, rv), off
    if tag == _T_DICT:
        (n,) = struct.unpack_from("<I", b, off)
        off += 4
        d = {}
        for _ in range(n):
            (kl,) = struct.unpack_from("<H", b, off)
            off += 2
            k = b[off : off + kl].decode()
            off += kl
            d[k], off = _loads(b, off)
        return d, off
    if tag == _T_LIST:
        (n,) = struct.unpack_from("<I", b, off)
        off += 4
        out = []
        for _ in range(n):
            x, off = _loads(b, off)
            out.append(x)
        return out, off
    raise ValueError(f"bad tag {tag} at {off - 1}")


def loads(b: bytes) -> Any:
    v, off = _loads(b, 0)
    if off != len(b):
        raise ValueError("trailing bytes")
    return v


# ---------------------------------------------------------------------------
# Groth16 compact form (ref groth16 Proof: compressed A | B | C = 192 bytes)
# ---------------------------------------------------------------------------

def groth16_proof_to_bytes(hp) -> bytes:
    return S.g1_compress(hp.a) + S.g2_compress(hp.b) + S.g1_compress(hp.c)


def groth16_proof_from_bytes(b: bytes):
    from ..snark.groth16 import HostProof

    assert len(b) == 192, "Groth16 compressed proof is 192 bytes"
    return HostProof(
        a=S.g1_decompress(b[:48]),
        b=S.g2_decompress(b[48:144]),
        c=S.g1_decompress(b[144:192]),
    )


# ---------------------------------------------------------------------------
# Marlin proof (structured; uses the tagged format)
# ---------------------------------------------------------------------------

def marlin_proof_to_bytes(proof) -> bytes:
    return dumps(
        {
            "comms": proof.comms,
            "evals": proof.evals,
            "pf_beta": proof.pf_beta,
            "pf_gamma": proof.pf_gamma,
        }
    )


def marlin_proof_from_bytes(b: bytes):
    from ..snark.marlin import Proof

    d = loads(b)
    return Proof(
        comms=d["comms"],
        evals=d["evals"],
        pf_beta=d["pf_beta"],
        pf_gamma=d["pf_gamma"],
    )
