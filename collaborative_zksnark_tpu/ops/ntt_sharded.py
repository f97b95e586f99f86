"""Cross-chip sharded NTT: the 4-step (Bailey) decomposition over a mesh
data axis (SURVEY.md §5.7 large-domain FFT sharding).

A size-N = N1*N2 NTT factors into
    X[k1 + N1*k2] = FFT_N2( twiddle[n2,k1] * FFT_N1(A)[k1, n2] )
with A[n1, n2] = x[n1*N2 + n2]:

  step 1: independent size-N1 NTTs over the COLUMN axis — each device
          transforms its slice of columns locally (zero communication);
  step 2: pointwise twiddle multiply w^(n2*k1) — local;
  step 3: ONE all_to_all "transpose" re-sharding from columns to rows
          (the only cross-chip traffic: N*limb bytes once);
  step 4: independent size-N2 NTTs over the row axis — local.

This is the TPU-native analog of a distributed arkworks FFT: collectives
ride the ICI mesh instead of MPI (contrast: the reference keeps FFTs
single-node — algebra/poly domain fft — and scales only via more parties).

Intended use under shard_map with a mesh ("...", "data"): the caller holds
`local` = A[:, lo:hi] (columns sharded), gets back rows-sharded
Y[k1_lo:k1_hi, :] where the GLOBAL result index is k1 + N1*k2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..algebra import field as F
from ..algebra.field import FR
from . import ntt


def plan(n1: int, n2: int):
    """(dom1, dom2, full omega) for a 2-step N = n1*n2 NTT."""
    dom1 = ntt.get_radix2_domain(n1)
    dom2 = ntt.get_radix2_domain(n2)
    domN = ntt.get_radix2_domain(n1 * n2)
    return dom1, dom2, domN.omega


def _twiddle_block(omega: int, n1: int, n2_lo: int, n2_cnt: int):
    """w^(n2*k1) for k1 in [0,n1), n2 in [n2_lo, n2_lo+n2_cnt): device
    constant block of shape (n1, n2_cnt, L)."""
    p = FR.p
    rows = []
    for k1 in range(n1):
        base = pow(omega, k1, p)
        cur = pow(base, n2_lo, p)
        row = []
        for _ in range(n2_cnt):
            row.append(cur)
            cur = cur * base % p
        rows.append(row)
    return FR.to_device(rows)


def fft_columns_sharded(local, n1: int, n2: int, axis_name: str, n_shards: int,
                        shard_idx=None):
    """One shard's step of the 4-step NTT.

    local: (n1, n2/n_shards, L) — this device's column slice of
    A[n1, n2] = x[n1*n2_index layout].  Returns (n1/n_shards, n2, L): this
    device's row slice of Y with Y[k1, k2] = X[k1 + n1*k2].

    Must run inside shard_map over `axis_name`.  Twiddles are selected per
    shard with ONE gather from a precomputed (n_shards, ...) table so the
    traced program is identical on every device (SPMD)."""
    n2_loc = n2 // n_shards
    assert local.shape[0] == n1 and local.shape[1] == n2_loc

    # step 1: size-n1 NTTs over every local column
    dom1 = ntt.get_radix2_domain(n1)
    b = jax.vmap(dom1.fft, in_axes=1, out_axes=1)(local)   # (n1, n2_loc, L)

    # step 2: twiddles w^(n2*k1), block per shard
    domN = ntt.get_radix2_domain(n1 * n2)
    blocks = jnp.stack(
        [
            _twiddle_block(domN.omega, n1, s * n2_loc, n2_loc)
            for s in range(n_shards)
        ]
    )  # (n_shards, n1, n2_loc, L)
    idx = jax.lax.axis_index(axis_name) if shard_idx is None else shard_idx
    tw = jax.lax.dynamic_index_in_dim(blocks, idx, axis=0, keepdims=False)
    c = F.mul(FR, b, tw)

    # step 3: all_to_all transpose (columns-sharded -> rows-sharded)
    d = jax.lax.all_to_all(c, axis_name, split_axis=0, concat_axis=1, tiled=True)

    # step 4: size-n2 NTTs over every local row
    dom2 = ntt.get_radix2_domain(n2)
    return jax.vmap(dom2.fft, in_axes=0, out_axes=0)(d)    # (n1_loc, n2, L)
