"""Marlin (universal-setup zkSNARK for R1CS) — indexer + scaffolding.

Reference behavior spec: marlin/src/lib.rs (Marlin::{universal_setup, index,
prove, verify}); the MPC-relevant deltas are the `publicize()` points after
each AHP round's messages/commitments and on evaluations
(ref marlin/src/lib.rs:173,182,210-211,232-233,300; SURVEY.md §3.3).

STATUS (round 1): the universal setup and the index-polynomial
arithmetization (row/col/val polynomials of A,B,C over the non-zero-entry
domain K, evaluated with the device NTT stack) are implemented and tested;
the AHP prover/verifier rounds (lincheck sumchecks over H, matrix sumcheck
over K, KZG batch openings at the query set) are the top work item for the
next round — the protocol skeleton and hook usage below documents exactly
which MPC hooks each round consumes:

  round 1: w-hat/z_A/z_B polys (local NTTs on shares) + commits (MSM) +
           publicize round message                     -> g_msm, g_reveal
  round 2: sumcheck q_1/h_1/g_1 — polynomial products  -> scheme.mul batches
  round 3: h_2/g_2 over K — batch inversion on PUBLIC index data (local)
  eval   : evaluations at the query set, publicized    -> reveal
  open   : KZG batch openings (linear combination of witness polys, one MSM)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from ..algebra import bls12_377 as C
from ..algebra import field as F
from ..algebra.field import FR
from ..ops import ntt
from ..relations.r1cs import R1CS
from . import kzg

P = C.R_MOD


def universal_setup(max_degree: int, seed: int = 3) -> kzg.KzgSrs:
    """SRS for all circuits with index degree <= max_degree
    (ref marlin/src/lib.rs:80-101)."""
    return kzg.setup(max_degree, seed=seed)


@dataclasses.dataclass
class MatrixIndex:
    """Arithmetization of one R1CS matrix over the non-zero-entries domain K:
    row(kappa), col(kappa), val(kappa) coefficient vectors (device)."""

    row_coeffs: jnp.ndarray
    col_coeffs: jnp.ndarray
    val_coeffs: jnp.ndarray
    row_evals: List[int]
    col_evals: List[int]
    val_evals: List[int]
    domain_k: object


@dataclasses.dataclass
class IndexerKey:
    domain_h: object
    mats: Dict[str, MatrixIndex]
    num_instance: int
    num_variables: int


def index(cs: R1CS) -> IndexerKey:
    """Build the index polynomials (the AHP indexer,
    ref marlin/src/ahp/indexer.rs behavior)."""
    a_rows, b_rows, c_rows = cs.padded_rows()
    n_h = max(len(a_rows), cs.num_variables)
    domain_h = ntt.get_radix2_domain(n_h)
    h_elems = domain_h.elements()

    mats = {}
    for name, rows in (("a", a_rows), ("b", b_rows), ("c", c_rows)):
        entries = []
        for r, row in enumerate(rows):
            for col, cf in row:
                entries.append((r, col, cf % P))
        n_k = max(1, len(entries))
        domain_k = ntt.get_radix2_domain(n_k)
        k_sz = domain_k.n
        row_e = [1] * k_sz
        col_e = [1] * k_sz
        val_e = [0] * k_sz
        for i, (r, col, cf) in enumerate(entries):
            row_e[i] = h_elems[r]
            col_e[i] = h_elems[col]
            val_e[i] = cf
        mats[name] = MatrixIndex(
            row_coeffs=domain_k.ifft(FR.to_device(row_e)),
            col_coeffs=domain_k.ifft(FR.to_device(col_e)),
            val_coeffs=domain_k.ifft(FR.to_device(val_e)),
            row_evals=row_e,
            col_evals=col_e,
            val_evals=val_e,
            domain_k=domain_k,
        )
    return IndexerKey(
        domain_h=domain_h,
        mats=mats,
        num_instance=cs.num_instance,
        num_variables=cs.num_variables,
    )


def prove(*args, **kwargs):
    raise NotImplementedError(
        "Marlin AHP prover lands next round — see module docstring for the "
        "round-by-round plan and the MPC hooks each round consumes."
    )


def verify(*args, **kwargs):
    raise NotImplementedError("Marlin AHP verifier lands next round.")
