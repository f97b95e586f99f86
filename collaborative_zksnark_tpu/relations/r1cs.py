"""R1CS constraint system (the analog of the reference's `snark/relations`
ConstraintSystem, ref snark/relations/src/r1cs/constraint_system.rs).

The builder is host-side (matrices are public structure); the *assignment*
is a device Fr limb array — possibly a secret SHARE per party, which is why
the prover-side matrix-vector products below are formulated as batched
gathers + local field ops only (linear algebra on shares is local; SURVEY.md
§1 trick 1).

Matrix encoding for the device matvec: each matrix row is padded to the max
row weight; `idx` (rows, k) holds column indices (padding points at column 0
with coefficient 0) and `coeff` (rows, k, L) holds Montgomery coefficients.
The matvec is then one gather + one batched mul + log2(k) batched adds.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra import params as C
from ..algebra import field as F
from ..algebra.field import FR

LC = List[Tuple[int, int]]  # linear combination: [(var_index, int_coeff)]


class R1CS:
    """Programmatic R1CS builder.  Variable 0 is the constant ONE.

    Mirrors the semantics of ark-relations' ConstraintSystem: instance
    variables first (starting with ONE), then witness variables; constraints
    are (A z) * (B z) = (C z) rows.
    """

    def __init__(self):
        self.num_instance = 1  # var 0 = ONE
        self.num_witness = 0
        self.a_rows: List[LC] = []
        self.b_rows: List[LC] = []
        self.c_rows: List[LC] = []

    # -- building ----------------------------------------------------------
    def new_instance(self) -> int:
        assert self.num_witness == 0, "instance vars must precede witness vars"
        self.num_instance += 1
        return self.num_instance - 1

    def new_witness(self) -> int:
        self.num_witness += 1
        return self.num_instance + self.num_witness - 1

    def enforce(self, a: LC, b: LC, c: LC):
        self.a_rows.append(list(a))
        self.b_rows.append(list(b))
        self.c_rows.append(list(c))
        self._dev_mats = None
        self._padded = None

    @property
    def num_constraints(self) -> int:
        return len(self.a_rows)

    @property
    def num_variables(self) -> int:
        return self.num_instance + self.num_witness

    # -- QAP-ready matrices ------------------------------------------------
    def padded_rows(self):
        """Rows extended with the input-consistency constraints arkworks
        appends (one per instance variable: A=z_i, B=0, C=0), which make the
        instance polynomials linearly independent
        (ref: groth16/src/r1cs_to_qap.rs:141-162 inlining semantics).
        Cached per instance (list copies alone cost ~5 s at 2^20)."""
        cached = getattr(self, "_padded", None)
        if cached is not None:
            return cached
        a = [list(r) for r in self.a_rows] + [
            [(i, 1)] for i in range(self.num_instance)
        ]
        b = [list(r) for r in self.b_rows] + [[] for _ in range(self.num_instance)]
        c = [list(r) for r in self.c_rows] + [[] for _ in range(self.num_instance)]
        self._padded = (a, b, c)
        return a, b, c

    def device_matrices(self, domain_size: int):
        """Pack padded rows into device gather matrices of `domain_size`
        rows.  Cached per instance — rebuilding + re-shipping the matrices
        on every prove costs seconds at 2^20."""
        cached = getattr(self, "_dev_mats", None)
        if cached is not None and cached[0] == domain_size:
            return cached[1]
        a, b, c = self.padded_rows()
        assert len(a) <= domain_size
        mats = [pack_rows(rows, domain_size) for rows in (a, b, c)]
        # only cache concrete arrays: inside a jit/shard_map trace the
        # dictionary-decode gather yields tracers, which must not escape
        if not any(
            isinstance(leaf, jax.core.Tracer)
            for mt in mats for leaf in mt
        ):
            self._dev_mats = (domain_size, mats)
        return mats


def pack_rows(rows, domain_size: int):
    """Pack sparse LC rows into (idx, coeff) device gather matrices
    (`domain_size` rows; rows beyond len(rows) are zero).

    Coefficients are dictionary-coded when few distinct values occur
    (typical circuits use a handful): only a (ncodes, L) Montgomery table
    plus a uint8 code matrix cross the host->device link, and the full
    (rows, k, L) coefficient array is materialized by one device gather.
    At 2^20 rows this cuts the transfer from ~134 MB to ~2 MB — which
    matters on a tunneled TPU."""
    k = max(1, max((len(r) for r in rows), default=1))
    k = 1 << (k - 1).bit_length()
    idx = np.zeros((domain_size, k), np.int32)
    Rint = 1 << (F.LIMB_BITS * FR.L)
    codes = np.zeros((domain_size, k), np.int32)
    table: dict = {0: 0}
    big = False
    coeffs = [0] * (domain_size * k)
    for r, row in enumerate(rows):
        for j, (col, cf) in enumerate(row):
            idx[r, j] = col
            cf = cf % C.R_MOD
            coeffs[r * k + j] = cf
            if not big:
                code = table.setdefault(cf, len(table))
                if code > 255:
                    big = True
                codes[r, j] = code
    if not big:
        vals = [0] * len(table)
        for cf, code in table.items():
            vals[code] = cf
        tab_mont = F.ints_to_limbs([v * Rint % C.R_MOD for v in vals], FR.L)
        coeff_dev = jnp.asarray(tab_mont)[jnp.asarray(codes.astype(np.uint8))]
        return (jnp.asarray(idx), coeff_dev)
    mont = F.ints_to_limbs([v * Rint % C.R_MOD for v in coeffs], FR.L)
    return (jnp.asarray(idx), jnp.asarray(mont.reshape(domain_size, k, FR.L)))


def sparse_matvec(mat, z):
    """(idx, coeff) packed matrix  x  assignment z (m, L)  ->  (rows, L).

    gather + batched mul + log2(k) adds; entirely local (share-safe).
    Batch-agnostic: z may carry leading axes (e.g. a party axis)."""
    idx, coeff = mat
    vals = z[..., idx, :]             # (..., rows, k, L)
    prods = F.mul(FR, coeff, vals)    # batched
    k = prods.shape[-2]               # power of two by construction
    while k > 1:
        half = k // 2
        prods = F.add(FR, prods[..., :half, :], prods[..., half:, :])
        k = half
    return prods[..., 0, :]


def evaluate_lc(lc: LC, values: dict) -> int:
    acc = 0
    for var, cf in lc:
        acc = (acc + cf * values[var]) % C.R_MOD
    return acc


# ---------------------------------------------------------------------------
# The benchmark circuit: repeated squaring (ref mpc-snarks/src/proof.rs:318-344)
# ---------------------------------------------------------------------------

def squaring_circuit(chain_length: int):
    """x_{i+1} = x_i^2 for i < chain_length; x_0 witness, x_final public.

    Returns (r1cs, assign) where assign(x0_int) -> (instance_ints,
    witness_ints) host assignment values.
    """
    cs = R1CS()
    y = cs.new_instance()  # public: final value
    xs = [cs.new_witness() for _ in range(chain_length + 1)]
    for i in range(chain_length):
        cs.enforce([(xs[i], 1)], [(xs[i], 1)], [(xs[i + 1], 1)])
    # final equality: x_last * 1 = y
    cs.enforce([(xs[-1], 1)], [(0, 1)], [(y, 1)])

    def assign(x0: int):
        vals = [x0 % C.R_MOD]
        for _ in range(chain_length):
            vals.append(vals[-1] * vals[-1] % C.R_MOD)
        instance = [1, vals[-1]]
        witness = vals
        return instance, witness

    return cs, assign
