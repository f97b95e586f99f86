"""Fiat-Shamir transcript RNG (blake2s), and canonical serialization.

The analog of the reference's `FiatShamirRng<Blake2s>`
(ref mpc-plonk/src/util.rs:47-108; marlin uses the same construction):
`absorb` re-seeds as seed = H(seed || input); `gen` squeezes digest blocks.
All absorbed values are OPENED (publicized) first, so every party derives
identical challenges (SURVEY.md §1 trick 3).

Serialization follows arkworks' convention for field elements: little-endian
bytes of the canonical (non-Montgomery) representative.
"""

from __future__ import annotations

import hashlib

from ..algebra import params as C

P = C.R_MOD
Q = C.Q_MOD


def fr_to_bytes(x: int) -> bytes:
    return int(x % P).to_bytes(32, "little")


def fq_to_bytes(x: int) -> bytes:
    return int(x % Q).to_bytes(48, "little")


def g1_to_bytes(pt) -> bytes:
    """Affine host point (x, y) or None -> uncompressed-style bytes."""
    if pt is None:
        return b"\x00" * 97
    return fq_to_bytes(pt[0]) + fq_to_bytes(pt[1]) + b"\x01"


def g2_to_bytes(pt) -> bytes:
    if pt is None:
        return b"\x00" * 193
    (x0, x1), (y0, y1) = pt
    return (
        fq_to_bytes(x0) + fq_to_bytes(x1) + fq_to_bytes(y0) + fq_to_bytes(y1) + b"\x01"
    )


class FiatShamir:
    """seed = H(seed || absorbed); challenges squeezed in counter mode."""

    def __init__(self, domain_sep: bytes = b"cztpu-fs"):
        self.seed = hashlib.blake2s(domain_sep).digest()
        self.ctr = 0

    def absorb(self, data: bytes):
        self.seed = hashlib.blake2s(self.seed + data).digest()
        self.ctr = 0

    def gen_fr(self) -> int:
        """A uniform-ish Fr challenge (rejection-free: 512 bits mod r)."""
        out = b""
        for _ in range(2):
            out += hashlib.blake2s(
                self.seed + self.ctr.to_bytes(8, "little")
            ).digest()
            self.ctr += 1
        return int.from_bytes(out, "little") % P
