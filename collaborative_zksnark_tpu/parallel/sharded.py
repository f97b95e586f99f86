"""Data-axis sharding library: the in-prover analogs of the reference's
rayon-parallel MSM/FFT (ref algebra/ec/src/msm/variable_base.rs:36,
algebra/poly/src/domain/radix2/fft.rs:81+ — intra-party compute
parallelism, SURVEY.md §2.3/§5.7), re-designed as shard_map collectives
over a mesh "data" axis.  The MPC "party" axis composes orthogonally: a
("party", "data") mesh runs share openings over `party` and point/NTT
sharding over `data`.

All functions here run INSIDE shard_map over the named data axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra import field as F
from ..ops import curve as cv
from ..ops import msm as msm_mod


def fold_points_gathered(fld, axis_name: str, partial: cv.JacPoint) -> cv.JacPoint:
    """Combine per-shard partial MSM points: all_gather over the data axis
    + log-fold point adds (every shard computes the replicated total)."""
    from ..mpc.additive import _fold_points

    g = cv.JacPoint(
        jax.lax.all_gather(partial.x, axis_name),
        jax.lax.all_gather(partial.y, axis_name),
        jax.lax.all_gather(partial.z, axis_name),
    )
    return _fold_points(fld, g)


def msm_data_sharded(fld, pts_local: cv.JacPoint, scalars_local, axis_name: str):
    """MSM with points+scalars sharded over the data axis: local MSM per
    shard, ONE gathered point-fold to combine.  scalars in Montgomery form
    (n_local, L); result replicated across the axis."""
    part = msm_mod.msm(fld, pts_local, scalars_local)
    return fold_points_gathered(fld, axis_name, part)


def block_points(pts: cv.JacPoint, index_map: np.ndarray) -> cv.JacPoint:
    """Pre-permute a static point query into per-shard blocks OUTSIDE
    shard_map: index_map (S, n_local) of global indices (entries >= n take
    the identity).  Returns (S, n_local, ...) coords to pass with
    PartitionSpec(data_axis)."""
    n = pts.x.shape[0]
    S, n_local = index_map.shape
    idx = jnp.asarray(index_map.reshape(-1))
    safe = jnp.clip(idx, 0, n - 1)
    take = lambda a: jnp.where(
        (idx < n).reshape((-1,) + (1,) * (a.ndim - 1)),
        jnp.take(a, safe, axis=0),
        jnp.zeros_like(jnp.take(a, safe, axis=0)),
    )
    resh = lambda a: a.reshape((S, n_local) + a.shape[1:])
    return cv.JacPoint(
        resh(take(pts.x)), resh(take(pts.y)), resh(take(pts.z))
    )


def block_index_map(n: int, n_shards: int) -> np.ndarray:
    """Contiguous block sharding indices (S, ceil(n/S) padded)."""
    n_local = -(-n // n_shards)
    base = np.arange(n_local)[None, :]
    offs = (np.arange(n_shards) * n_local)[:, None]
    return (base + offs).astype(np.int32)
