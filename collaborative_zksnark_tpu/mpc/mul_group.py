"""MulFieldGroup: an extension field's multiplicative group viewed as an
additive Group with Fr scalars (ref mpc-algebra/src/group.rs:21-188).

The reference keeps this as unused scaffolding for pairing shares (its GT
share machinery lives in share/add.rs MulFieldShare instead — as ours lives
in mpc/pairing_share.py).  It exists so code generic over `Group` can treat
GT = Fq12* uniformly:

    group add      = field multiply
    group negate   = field inverse
    group zero     = field one
    scalar action  = field power

Host-side (pairing outputs are O(1) per proof; see pairing_share.py design
notes).
"""

from __future__ import annotations

import dataclasses

from ..algebra import params as C
from ..algebra import hostapi as H


@dataclasses.dataclass(frozen=True)
class MulFieldGroup:
    """An Fq12 element under multiplicative-as-additive group semantics."""

    val: tuple

    @staticmethod
    def zero() -> "MulFieldGroup":
        return MulFieldGroup(H.FQ12_ONE)

    def is_zero(self) -> bool:
        return self.val == H.FQ12_ONE

    def add(self, other: "MulFieldGroup") -> "MulFieldGroup":
        return MulFieldGroup(H.fq12_mul(self.val, other.val))

    def neg(self) -> "MulFieldGroup":
        return MulFieldGroup(H.fq12_inv(self.val))

    def sub(self, other: "MulFieldGroup") -> "MulFieldGroup":
        return self.add(other.neg())

    def double(self) -> "MulFieldGroup":
        return self.add(self)

    def scale(self, k: int) -> "MulFieldGroup":
        """Scalar action: val^k with k an Fr scalar (ref group.rs MulAssign
        by the scalar field — exponentiation in the multiplicative group)."""
        return MulFieldGroup(H.fq12_pow(self.val, k % C.R_MOD))
