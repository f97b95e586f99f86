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

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra import field as F
from ..algebra.field import FR
from . import ntt


def plan(n1: int, n2: int):
    """(dom1, dom2, full omega) for a 2-step N = n1*n2 NTT."""
    dom1 = ntt.get_radix2_domain(n1)
    dom2 = ntt.get_radix2_domain(n2)
    domN = ntt.get_radix2_domain(n1 * n2)
    return dom1, dom2, domN.omega


@functools.lru_cache(maxsize=None)
def _twiddle_block(omega: int, n1: int, n2_lo: int, n2_cnt: int):
    """w^(n2*k1) for k1 in [0,n1), n2 in [n2_lo, n2_lo+n2_cnt): Montgomery
    limb block (n1, n2_cnt, L), HOST numpy (cache-safe across traces)."""
    p = FR.p
    Rint = 1 << (F.LIMB_BITS * FR.L)
    rows = []
    for k1 in range(n1):
        base = pow(omega, k1, p)
        cur = pow(base, n2_lo, p)
        for _ in range(n2_cnt):
            rows.append(cur * Rint % p)
            cur = cur * base % p
    return F.ints_to_limbs(rows, FR.L).reshape(n1, n2_cnt, FR.L)


@functools.lru_cache(maxsize=None)
def _sep_block(a: int, b: int, n_rows: int, lo: int, cnt: int):
    """Separable scale block B[r, c] = a^r * b^(lo + c) as Montgomery limbs
    (n_rows, cnt, L), HOST numpy (cached across traces — a cached device
    constant created under one trace leaks into the next).  Covers coset
    pre/post scaling: any g^(natural index) factors over the index split."""
    p = FR.p
    Rint = 1 << (F.LIMB_BITS * FR.L)
    out = []
    ar = 1
    b_lo = pow(b, lo, p)
    for _ in range(n_rows):
        cur = ar * b_lo % p
        for _ in range(cnt):
            out.append(cur * Rint % p)
            cur = cur * b % p
        ar = ar * a % p
    return F.ints_to_limbs(out, FR.L).reshape(n_rows, cnt, FR.L)


def transform_colshard(
    local,
    n1: int,
    n2: int,
    axis_name: str,
    n_shards: int,
    inverse: bool = False,
    coset: str = None,
    shard_idx=None,
):
    """General 4-step transform in the self-chaining COLSHARD layout.

    Input: this device's column slice of the natural row-major matrix
    M[j1, j2] = x[j1*n2 + j2], shape (n1, n2/S, L).  Output: the SAME
    colshard layout of the RESULT viewed as its natural (n2, n1) row-major
    matrix Z[k2, k1] = X[k1 + n1*k2] — shape (n2, n1/S, L).  Chaining a
    second transform with (n1', n2') = (n2, n1) therefore needs NO
    relayout: an even number of transforms returns to the original dims.

    inverse=True: iNTT (1/N scaling folded into the two sub-iNTTs).
    coset='fwd': evaluate on the coset g*H (pre-scale by g^i, separable
    over (j1, j2));  coset='inv': interpolate from coset evals (post-scale
    by g^-i over the output index split (k1, k2)).
    Ref analogs: distribute_powers + fft / coset_ifft
    (algebra/poly/src/domain/mod.rs) distributed per SURVEY.md §5.7."""
    from ..algebra import params as C

    n2_loc = n2 // n_shards
    assert local.shape[0] == n1 and local.shape[1] == n2_loc, local.shape
    p = FR.p
    idx = jax.lax.axis_index(axis_name) if shard_idx is None else shard_idx
    g = C.FR_GENERATOR

    if coset == "fwd":
        blocks = jnp.stack(
            [
                _sep_block(pow(g, n2, p), g, n1, s * n2_loc, n2_loc)
                for s in range(n_shards)
            ]
        )
        sc = jax.lax.dynamic_index_in_dim(blocks, idx, axis=0, keepdims=False)
        local = F.mul(FR, local, sc)

    dom1 = ntt.get_radix2_domain(n1)
    dom2 = ntt.get_radix2_domain(n2)
    domN = ntt.get_radix2_domain(n1 * n2)
    omega = pow(domN.omega, p - 2, p) if inverse else domN.omega

    tf1 = dom1.ifft if inverse else dom1.fft
    tf2 = dom2.ifft if inverse else dom2.fft

    # step 1: size-n1 (i)NTTs over every local column
    b = jax.vmap(tf1, in_axes=1, out_axes=1)(local)        # (n1, n2_loc, L)
    # step 2: twiddles omega^(j2 * k1), block per shard
    tw_blocks = jnp.stack(
        [
            _twiddle_block(omega, n1, s * n2_loc, n2_loc)
            for s in range(n_shards)
        ]
    )
    tw = jax.lax.dynamic_index_in_dim(tw_blocks, idx, axis=0, keepdims=False)
    c = F.mul(FR, b, tw)
    # step 3: the single all_to_all transpose (columns -> rows sharded)
    d = jax.lax.all_to_all(c, axis_name, split_axis=0, concat_axis=1, tiled=True)
    # step 4: size-n2 (i)NTTs over every local row
    e = jax.vmap(tf2, in_axes=0, out_axes=0)(d)            # (n1/S, n2, L)

    if coset == "inv":
        ginv = pow(g, p - 2, p)
        n1_loc = n1 // n_shards
        # g^-(k1 + n1 k2) with k1 = s*n1_loc + k1loc: a shard-independent
        # (k1loc, k2) block times a per-shard scalar offset g^-(s*n1_loc)
        sc = _sep_block(ginv, pow(ginv, n1, p), n1_loc, 0, n2)
        offs = FR.to_device(
            [pow(ginv, s * n1_loc, p) for s in range(n_shards)]
        )
        off = jax.lax.dynamic_index_in_dim(offs, idx, axis=0, keepdims=False)
        e = F.mul(FR, F.mul(FR, e, sc), off[None, None])

    # local transpose: (n1/S, n2) rows-of-Y  ==  colshard of Z = Y^T
    return jnp.swapaxes(e, 0, 1)                           # (n2, n1/S, L)


def colshard_slice(vec, n1: int, n2: int, axis_name: str, n_shards: int):
    """Replicated natural vector (n1*n2, L) -> this device's colshard slice
    (n1, n2/S, L) (dynamic_slice by shard index; no communication)."""
    n2_loc = n2 // n_shards
    M = vec.reshape(n1, n2, vec.shape[-1])
    idx = jax.lax.axis_index(axis_name)
    return jax.lax.dynamic_slice_in_dim(M, idx * n2_loc, n2_loc, axis=1)


def colshard_index_map(n1: int, n2: int, n_shards: int):
    """Global natural indices of each shard's FLATTENED (n2, n1/S) local
    output after an odd number of transform_colshard calls:
    local (k2, k1loc) holds X[(s*n1/S + k1loc) + n1*k2].
    Returns int32 (n_shards, n2 * n1/S) — used to pre-permute static point
    queries so data-sharded MSMs pair points with their scalars."""
    n1_loc = n1 // n_shards
    k2 = np.arange(n2)[:, None]
    k1loc = np.arange(n1_loc)[None, :]
    base = (k1loc + n1 * k2).reshape(-1)[None, :]          # (1, n2*n1loc)
    offs = (np.arange(n_shards) * n1_loc)[:, None]
    return (base + offs).astype(np.int32)


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
