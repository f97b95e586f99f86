"""Fused Pallas kernels for G1 (Fq) Jacobian point add / double.

One kernel launch per batched point operation instead of ~50 field-kernel
launches: the full branchless add (general add + doubling path + identity /
inverse handling, mirroring ops/curve.point_add) runs VMEM-resident on
limb-plane rows.  This removes the inter-op HBM round trips that dominate
MSM/NTT point pipelines and the launch latency that dominates small sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..algebra.field import FQ
from . import pallas_field as PF


def _rows(ref, L):
    return [ref[i : i + 1, :] for i in range(L)]


def _is_zero_rows(spec, rows):
    """Field zero test on (1,T) rows: digits all zero or equal to p."""
    pl_ = spec.p_limbs
    z0 = None
    zp = None
    for r, pc in zip(rows, pl_):
        c0 = r == 0
        cp = r == np.uint32(int(pc))
        z0 = c0 if z0 is None else (z0 & c0)
        zp = cp if zp is None else (zp & cp)
    return z0 | zp


def _sel_rows(mask, a_rows, b_rows):
    return [jnp.where(mask, x, y) for x, y in zip(a_rows, b_rows)]


def _dbl_rows(spec, rows):
    return PF._add_rows(spec, rows, rows)


def _mul_small_rows(spec, rows, k):
    acc = None
    base = rows
    while k:
        if k & 1:
            acc = base if acc is None else PF._add_rows(spec, acc, base)
        k >>= 1
        if k:
            base = PF._add_rows(spec, base, base)
    return acc


def _point_add_rows(spec, X1, Y1, Z1, X2, Y2, Z2):
    mul = lambda a, b: PF._mont_mul_rows(spec, a, b)
    add = lambda a, b: PF._add_rows(spec, a, b)
    sub = lambda a, b: PF._sub_rows(spec, a, b)

    Z1Z1 = mul(Z1, Z1)
    Z2Z2 = mul(Z2, Z2)
    U1 = mul(X1, Z2Z2)
    U2 = mul(X2, Z1Z1)
    S1 = mul(Y1, mul(Z2, Z2Z2))
    S2 = mul(Y2, mul(Z1, Z1Z1))
    H = sub(U2, U1)
    r = sub(S2, S1)

    HH = mul(H, H)
    HHH = mul(H, HH)
    V = mul(U1, HH)
    X3 = sub(sub(mul(r, r), HHH), _dbl_rows(spec, V))
    Y3 = sub(mul(r, sub(V, X3)), mul(S1, HHH))
    Z3 = mul(mul(Z1, Z2), H)

    # doubling path (a = 0)
    A = mul(X1, X1)
    Bv = mul(Y1, Y1)
    Cv = mul(Bv, Bv)
    xb = add(X1, Bv)
    t = mul(xb, xb)
    D = _dbl_rows(spec, sub(t, add(A, Cv)))
    E = add(_dbl_rows(spec, A), A)
    Fv = mul(E, E)
    Xd = sub(Fv, _dbl_rows(spec, D))
    Yd = sub(mul(E, sub(D, Xd)), _mul_small_rows(spec, Cv, 8))
    Zd = _dbl_rows(spec, mul(Y1, Z1))

    p1_inf = _is_zero_rows(spec, Z1)
    p2_inf = _is_zero_rows(spec, Z2)
    eq_x = _is_zero_rows(spec, H)
    eq_y = _is_zero_rows(spec, r)

    zero = [jnp.zeros_like(X1[0]) for _ in X1]
    one_m = [
        jnp.full_like(X1[0], np.uint32(int(c))) for c in spec.one_mont
    ]

    ox, oy, oz = X3, Y3, Z3
    m_dbl = eq_x & eq_y
    ox = _sel_rows(m_dbl, Xd, ox)
    oy = _sel_rows(m_dbl, Yd, oy)
    oz = _sel_rows(m_dbl, Zd, oz)
    m_zero = eq_x & (~eq_y)
    ox = _sel_rows(m_zero, one_m, ox)
    oy = _sel_rows(m_zero, one_m, oy)
    oz = _sel_rows(m_zero, zero, oz)
    ox = _sel_rows(p1_inf, X2, ox)
    oy = _sel_rows(p1_inf, Y2, oy)
    oz = _sel_rows(p1_inf, Z2, oz)
    m_p = p2_inf & (~p1_inf)
    ox = _sel_rows(m_p, X1, ox)
    oy = _sel_rows(m_p, Y1, oy)
    oz = _sel_rows(m_p, Z1, oz)
    return ox, oy, oz


def _point_double_rows(spec, X1, Y1, Z1):
    mul = lambda a, b: PF._mont_mul_rows(spec, a, b)
    add = lambda a, b: PF._add_rows(spec, a, b)
    sub = lambda a, b: PF._sub_rows(spec, a, b)
    A = mul(X1, X1)
    Bv = mul(Y1, Y1)
    Cv = mul(Bv, Bv)
    xb = add(X1, Bv)
    t = mul(xb, xb)
    D = _dbl_rows(spec, sub(t, add(A, Cv)))
    E = add(_dbl_rows(spec, A), A)
    Fv = mul(E, E)
    Xd = sub(Fv, _dbl_rows(spec, D))
    Yd = sub(mul(E, sub(D, Xd)), _mul_small_rows(spec, Cv, 8))
    Zd = _dbl_rows(spec, mul(Y1, Z1))
    return Xd, Yd, Zd


@functools.lru_cache(maxsize=None)
def _add_kernel(n_tiles: int, T: int):
    L = FQ.L

    def kernel(px, py, pz, qx, qy, qz, ox, oy, oz):
        outs = _point_add_rows(
            FQ,
            _rows(px, L), _rows(py, L), _rows(pz, L),
            _rows(qx, L), _rows(qy, L), _rows(qz, L),
        )
        for ref, rows in zip((ox, oy, oz), outs):
            for i in range(L):
                ref[i : i + 1, :] = rows[i]

    spec = lambda: pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, n_tiles * T), jnp.uint32) for _ in range(3)
        ),
        grid=(n_tiles,),
        in_specs=[spec() for _ in range(6)],
        out_specs=tuple(spec() for _ in range(3)),
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _dbl_kernel(n_tiles: int, T: int):
    L = FQ.L

    def kernel(px, py, pz, ox, oy, oz):
        outs = _point_double_rows(FQ, _rows(px, L), _rows(py, L), _rows(pz, L))
        for ref, rows in zip((ox, oy, oz), outs):
            for i in range(L):
                ref[i : i + 1, :] = rows[i]

    spec = lambda: pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, n_tiles * T), jnp.uint32) for _ in range(3)
        ),
        grid=(n_tiles,),
        in_specs=[spec() for _ in range(3)],
        out_specs=tuple(spec() for _ in range(3)),
    )
    return jax.jit(fn)


TILE = 1024
SMALL_TILE = 512


def _flatten(coords):
    """(..., L) coord arrays -> ((L, Npad) planes, unflatten info).
    Lane counts quantize to two tile shapes (see pallas_field.binop_flat)."""
    shape = coords[0].shape
    n = 1
    for s in shape[:-1]:
        n *= s
    flat = [c.reshape(n, FQ.L) for c in coords]
    tile = SMALL_TILE if n <= SMALL_TILE else TILE
    pad = (-n) % tile
    if pad:
        flat = [jnp.pad(c, ((0, pad), (0, 0))) for c in flat]
    m = n + pad
    return [c.T for c in flat], (shape, n, m, tile)


def _unflatten(planes, info):
    shape, n, m, _ = info
    outs = []
    for p in planes:
        o = p.T
        if m != n:
            o = o[:n]
        outs.append(o.reshape(shape))
    return outs


def point_add_g1(P_coords, Q_coords):
    """(x,y,z) tuples of (..., L) arrays -> fused general add."""
    shape = jnp.broadcast_shapes(P_coords[0].shape, Q_coords[0].shape)
    P_coords = [jnp.broadcast_to(c, shape) for c in P_coords]
    Q_coords = [jnp.broadcast_to(c, shape) for c in Q_coords]
    planes, info = _flatten(list(P_coords) + list(Q_coords))
    _, _, m, tile = info
    outs = _add_kernel(m // tile, tile)(*planes)
    return _unflatten(list(outs), info)


def point_double_g1(P_coords):
    planes, info = _flatten(list(P_coords))
    _, _, m, tile = info
    outs = _dbl_kernel(m // tile, tile)(*planes)
    return _unflatten(list(outs), info)
