"""Pallas TPU kernels for the field layer: fused Montgomery multiplication.

The jnp path in algebra/field.py materializes every intermediate of the
~80-op Montgomery pipeline in HBM — measured HBM-bound on TPU.  This kernel
fuses the whole REDC pipeline in VMEM with a *limb-plane* layout:

    HBM layout: (L, N)  — limb index in sublanes, elements in lanes.

With limbs as the leading axis, every per-limb operation is an unrolled
Python loop over (1, T) vector rows: the convolution is L^2 lane-parallel
multiply-accumulates, and the Kogge-Stone carry network is pure list
manipulation — no in-register shuffles or gathers at all.

Dispatch: field.mul consults `use_pallas()` (TPU backend + flag) and routes
(..., L) arrays through a transpose + this kernel.  Correctness contract is
identical to field.mul (inputs [0,2p) canonical digits, output [0,2p)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..algebra import field as F

LIMB_BITS = F.LIMB_BITS
MASK = F.MASK
B = F.B


def _mont_mul_rows(spec, a_rows, b_rows):
    """Montgomery product on lists of (1, T) uint32 limb rows (values in
    [0, 2p), canonical digits).  Mirrors field.mul's single-scan REDC."""
    L = spec.L
    np_ = spec.nprime_limbs
    pp = spec.p_limbs

    def conv(x_rows, y_rows, y_const=None, n_out=None):
        """Full product accumulation with hi/lo split; y may be a constant
        numpy limb vector instead of rows."""
        K = n_out if n_out is not None else len(x_rows) + L
        acc = [None] * K
        for i, xi in enumerate(x_rows):
            for j in range(L):
                k = i + j
                if k >= K and k + 1 >= K:
                    continue
                if y_const is not None:
                    c = int(y_const[j])
                    if c == 0:
                        continue
                    p = xi * np.uint32(c)
                else:
                    p = xi * y_rows[j]
                lo = p & MASK
                hi = p >> LIMB_BITS
                if k < K:
                    acc[k] = lo if acc[k] is None else acc[k] + lo
                if k + 1 < K:
                    acc[k + 1] = hi if acc[k + 1] is None else acc[k + 1] + hi
        zero = jnp.zeros_like(x_rows[0])
        return [zero if a is None else a for a in acc]

    def relax2(rows, n_out):
        for _ in range(2):
            out = []
            carry = None
            for r in rows[:n_out]:
                v = r & MASK
                if carry is not None:
                    v = v + carry
                out.append(v)
                carry = r >> LIMB_BITS
            rows = out
        return rows

    def carry_scan(rows):
        """Kogge-Stone exact carry resolution; digits <= 2B-2 required."""
        K = len(rows)
        g = [(r >= B).astype(jnp.uint32) for r in rows]
        p = [(r == (B - 1)).astype(jnp.uint32) for r in rows]
        d = 1
        while d < K:
            ng = list(g)
            npr = list(p)
            for k in range(K - 1, d - 1, -1):
                ng[k] = g[k] | (p[k] & g[k - d])
                npr[k] = p[k] & p[k - d]
            g, p = ng, npr
            d <<= 1
        out = []
        for k in range(K):
            v = rows[k]
            if k > 0:
                v = v + g[k - 1]
            out.append(jnp.where(v >= B, v - B, v).astype(jnp.uint32))
        return out

    # T = a*b (2L redundant rows)
    T_rows = conv(a_rows, b_rows)
    # m = (T mod R) * N' mod R
    t_low = relax2(T_rows[:L], L)
    m = relax2(conv(t_low, None, y_const=np_, n_out=L), L)
    # S = T + m*p ; one relax + scan; result = high L digits
    S = conv(m, None, y_const=pp)
    S = [s + t for s, t in zip(S, T_rows)]
    # relax once (digits < 2^23 -> <= 2B-2)
    relaxed = []
    carry = None
    for r in S:
        v = r & MASK
        if carry is not None:
            v = v + carry
        relaxed.append(v)
        carry = r >> LIMB_BITS
    # the final carry out of limb 2L-1 is guaranteed zero (S < B^{2L})
    digits = carry_scan(relaxed)
    return digits[L : 2 * L]


def _carry_scan_rows(rows):
    """Kogge-Stone exact carry resolution on (1,T) rows; digits <= 2B-2.
    Returns (digit rows, carry_out_row)."""
    K = len(rows)
    g = [(r >= B).astype(jnp.uint32) for r in rows]
    p = [(r == (B - 1)).astype(jnp.uint32) for r in rows]
    d = 1
    while d < K:
        ng = list(g)
        npr = list(p)
        for k in range(K - 1, d - 1, -1):
            ng[k] = g[k] | (p[k] & g[k - d])
            npr[k] = p[k] & p[k - d]
        g, p = ng, npr
        d <<= 1
    out = []
    for k in range(K):
        v = rows[k]
        if k > 0:
            v = v + g[k - 1]
        out.append(jnp.where(v >= B, v - B, v).astype(jnp.uint32))
    return out, g[K - 1]


def _ge_sub_rows(spec, rows, const_limbs):
    """rows (canonical digits, value < 2*const) minus const if >=."""
    comp = [np.uint32(MASK - int(c)) for c in const_limbs]
    t = [r + c for r, c in zip(rows, comp)]
    t[0] = t[0] + np.uint32(1)
    # relax once, capturing the top limb's high bits (part of carry-out)
    relaxed = []
    carry = None
    for r in t:
        v = r & MASK
        if carry is not None:
            v = v + carry
        relaxed.append(v)
        carry = r >> LIMB_BITS
    top_hi = carry
    d, co = _carry_scan_rows(relaxed)
    take = ((top_hi | co) != 0)
    return [jnp.where(take, x, orig) for x, orig in zip(d, rows)]


def _add_rows(spec, a_rows, b_rows):
    s = [x + y for x, y in zip(a_rows, b_rows)]
    d, _ = _carry_scan_rows(s)
    return _ge_sub_rows(spec, d, spec.twop_limbs)


def _sub_rows(spec, a_rows, b_rows):
    twop = spec.twop_limbs
    t = [
        x + (np.uint32(MASK) - y) + np.uint32(int(c))
        for x, y, c in zip(a_rows, b_rows, twop)
    ]
    t[0] = t[0] + np.uint32(1)
    relaxed = []
    carry = None
    for r in t:
        v = r & MASK
        if carry is not None:
            v = v + carry
        relaxed.append(v)
        carry = r >> LIMB_BITS  # top carry dropped: mod B^L
    d, _ = _carry_scan_rows(relaxed)
    return _ge_sub_rows(spec, d, twop)


@functools.lru_cache(maxsize=None)
def _binop_kernel_grid(spec, op: str, n_tiles: int, T: int):
    L = spec.L
    row_fn = {"add": _add_rows, "sub": _sub_rows, "mul": _mont_mul_rows}[op]

    def kernel(a_ref, b_ref, o_ref):
        a_rows = [a_ref[i : i + 1, :] for i in range(L)]
        b_rows = [b_ref[i : i + 1, :] for i in range(L)]
        out = row_fn(spec, a_rows, b_rows)
        for i in range(L):
            o_ref[i : i + 1, :] = out[i]

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n_tiles * T), jnp.uint32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.VMEM),
    )
    return jax.jit(fn)


SMALL_TILE = 512


def binop_flat(spec, op: str, a, b):
    """Dispatch an (..., L) binary field op through the fused kernels.

    Lane counts are quantized to exactly TWO tile shapes (SMALL_TILE for
    small batches, TILE-multiples for large) so the whole framework compiles
    only two Mosaic kernel variants per op/field — per-size kernels would
    cost minutes of compile each."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape).reshape(-1, spec.L)
    b = jnp.broadcast_to(b, shape).reshape(-1, spec.L)
    n = a.shape[0]
    t = SMALL_TILE if n <= SMALL_TILE else TILE
    pad = (-n) % t
    if pad:
        a = jnp.pad(a, ((0, pad), (0, 0)))
        b = jnp.pad(b, ((0, pad), (0, 0)))
    m = a.shape[0]
    out = _binop_kernel_grid(spec, op, m // t, t)(a.T, b.T).T
    if pad:
        out = out[:n]
    return out.reshape(shape)


@functools.lru_cache(maxsize=None)
def _mul_kernel(spec, T: int):
    L = spec.L

    def kernel(a_ref, b_ref, o_ref):
        a_rows = [a_ref[i : i + 1, :] for i in range(L)]
        b_rows = [b_ref[i : i + 1, :] for i in range(L)]
        out = _mont_mul_rows(spec, a_rows, b_rows)
        for i in range(L):
            o_ref[i : i + 1, :] = out[i]

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, T), jnp.uint32),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((L, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _mul_kernel_grid(spec, n_tiles: int, T: int):
    L = spec.L

    def kernel(a_ref, b_ref, o_ref):
        a_rows = [a_ref[i : i + 1, :] for i in range(L)]
        b_rows = [b_ref[i : i + 1, :] for i in range(L)]
        out = _mont_mul_rows(spec, a_rows, b_rows)
        for i in range(L):
            o_ref[i : i + 1, :] = out[i]

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n_tiles * T), jnp.uint32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.VMEM),
    )
    return jax.jit(fn)


TILE = 2048


def mul_planes(spec, aT, bT):
    """(L, N) x (L, N) -> (L, N) Montgomery product via the fused kernel.
    N must be a multiple of 128; tiles of TILE lanes."""
    L, N = aT.shape
    if N % TILE == 0:
        return _mul_kernel_grid(spec, N // TILE, TILE)(aT, bT)
    return _mul_kernel(spec, N)(aT, bT)


def mul_flat(spec, a, b):
    """(..., L) inputs -> fused kernel with transposes at the boundary."""
    return binop_flat(spec, "mul", a, b)


def add_flat(spec, a, b):
    return binop_flat(spec, "add", a, b)


def sub_flat(spec, a, b):
    return binop_flat(spec, "sub", a, b)
