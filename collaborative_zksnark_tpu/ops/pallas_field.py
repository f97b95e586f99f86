"""Pallas TPU kernels for the field layer: fused Montgomery multiplication.

v2 design — CIOS-broadcast formulation on (L, S, T) blocks:

  * HBM layout: (L, S, n_tiles*T) — limb index leading, elements split over
    S sublanes x T lanes per tile.  Every vector op inside a kernel touches
    (L, S, T) or (S, T) slabs, so all 8 VPU sublanes are busy.
  * Montgomery REDC is the CIOS recurrence with the INNER limb loop expressed
    as ONE broadcast multiply (a_i (1,S,T) * b (L,S,T)), and the accumulator
    shifted one limb per outer step with static slices.  The outer loop is
    unrolled (L iterations x ~16 vector ops) — the Mosaic body is a few
    hundred ops instead of the ~10,000 of the schoolbook row formulation,
    which is the difference between seconds and >10 minutes of kernel
    compile per width variant (round-2 finding: the unrolled row kernels
    made every new MSM/scan width a 10-minute Mosaic compile).
  * Carries stay deferred: digits accumulate redundantly (< 2^23) and are
    resolved once at the end with a relax + Kogge-Stone scan along the limb
    axis.  Invariant matches algebra/field.py: canonical base-2^16 digits,
    value in [0, 2p).

The in-kernel helpers (`k_mul`, `k_add`, `k_sub`, `k_is_zero`, `k_select`)
are pure functions on (L, S, T) jnp values, reused by the fused curve
kernels (ops/pallas_curve.py).

Reference semantics: ark-ff Montgomery arithmetic (SURVEY.md §2.2,
algebra/ff fork); this file is the TPU "ff-asm" analog.
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
U32 = jnp.uint32

# CZTPU_PALLAS_INTERPRET=1 runs every pallas_call in interpreter mode so the
# full kernel path (incl. the plane-resident MSM scan) is exercisable on the
# CPU backend in tests; field._pallas_ok() honours the same flag.
import os as _os

INTERPRET = _os.environ.get("CZTPU_PALLAS_INTERPRET", "0") == "1"

# Tile geometry: elements per tile = S * T.
S_SUB = 8
T_BIG = 512
T_SMALL = 128
TILE_ELEMS = S_SUB * T_BIG          # 4096
SMALL_ELEMS = S_SUB * T_SMALL       # 1024


# ---------------------------------------------------------------------------
# In-kernel field algebra on (L, S, T) values
# ---------------------------------------------------------------------------

def _pad_axis0(x, lo, hi, const=0):
    pads = [(lo, hi)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pads, constant_values=const)


def _row(x, i):
    """x[i] along axis 0 via static slice + squeeze: jnp integer indexing
    lowers to dynamic_slice, which has no Pallas TPU lowering."""
    if i < 0:
        i += x.shape[0]
    return jnp.squeeze(jax.lax.slice_in_dim(x, i, i + 1, axis=0), 0)


def _shift_up1(x):
    """x -> [0, x_0, ..., x_{K-2}] along axis 0 (pad top, drop last).
    jnp.pad/concat instead of .at[].add — scatter-add has no Pallas TPU
    lowering."""
    return _pad_axis0(x[:-1], 1, 0)


def _add_at0(x, v):
    """x with v added to limb 0 only (concat form; no scatter)."""
    return jnp.concatenate([x[0:1] + v, x[1:]], axis=0)


def _ks_carry(acc, K_out=None):
    """Redundant digits (< 2^31 each) -> canonical digits (< 2^16), value
    preserved mod B^K.  Relax twice, then Kogge-Stone generate/propagate
    along axis 0.  Returns (digits, carry_out_of_top)."""
    top = jnp.zeros_like(_row(acc, 0))
    for _ in range(2):
        lo = acc & MASK
        hi = acc >> LIMB_BITS
        acc = lo + _shift_up1(hi)
        top = top | _row(hi, -1)
    K = acc.shape[0]
    g = (acc >= B).astype(U32)
    p = (acc == (B - 1)).astype(U32)
    d = 1
    while d < K:
        gs = _pad_axis0(g[:-d], d, 0)
        ps = _pad_axis0(p[:-d], d, 0, const=1)
        g = g | (p & gs)
        p = p & ps
        d <<= 1
    carry_in = _pad_axis0(g[:-1], 1, 0)
    out = acc + carry_in
    out = jnp.where(out >= B, out - B, out).astype(U32)
    if K_out is not None:
        out = out[:K_out]
    return out, (_row(g, -1) | top)


def _const_col(limbs, like):
    """limb vector -> (L,) + like.shape[1:] constant, built from SCALAR
    literals (per-limb full + concat) rather than one array constant:
    Pallas kernels may not capture array-valued constants ("captures
    constants [...]: you should pass them as inputs"), scalar literals
    inline into the traced jaxpr, and Mosaic cannot broadcast (L,1,1)
    vectors along minor dims — so each limb is materialized at the full
    trailing shape directly (scalar->vector broadcast, which Mosaic
    supports)."""
    one = (1,) + like.shape[1:]
    return jnp.concatenate(
        [jnp.full(one, int(c), U32) for c in limbs], axis=0
    )


def _ge_sub_const(spec, a, const_limbs):
    """Canonical a (value < 2*const) -> a - const if a >= const else a."""
    comp = _const_col([MASK - int(c) for c in const_limbs], a)
    t = _add_at0(a + comp, 1)
    # one relax round; capture the top limb's high bits (part of carry-out)
    lo = t & MASK
    hi = t >> LIMB_BITS
    top_hi = _row(hi, -1)
    t = lo + _shift_up1(hi)
    d, co = _ks_carry(t)
    take = (top_hi | co) != 0
    return jnp.where(take[None], d, a)


def k_add(spec, a, b):
    """(L, S, T) + (L, S, T), values in [0,2p) -> [0,2p)."""
    s = a + b
    d, _ = _ks_carry(s)
    return _ge_sub_const(spec, d, spec.twop_limbs)


def k_sub(spec, a, b):
    """a - b + 2p (complement addition mod B^L), then conditional -2p."""
    twop = _const_col(spec.twop_limbs, a)
    t = _add_at0(a + (MASK - b) + twop, 1)
    # mod B^L: two relax rounds DROP the top carry (complement arithmetic)
    for _ in range(2):
        lo = t & MASK
        hi = t >> LIMB_BITS
        t = lo + _shift_up1(hi)
    d, _ = _ks_carry(t)
    return _ge_sub_const(spec, d, spec.twop_limbs)


def k_dbl(spec, a):
    return k_add(spec, a, a)


def k_mul(spec, a, b, unroll: bool = True):
    """Montgomery product REDC(a*b) via CIOS: inputs/outputs canonical
    digits with values in [0, 2p).

    Digit-growth bound: each outer step adds lo+hi of a_i*b and of m*p
    (each pair <= 2(B-1)) to a position, and a position survives at most L
    shifts -> digits < 4*B*L < 2^23; u32-safe, one final carry resolution.
    """
    L = spec.L
    rest = a.shape[1:]
    np0 = np.uint32(int(spec.nprime_limbs[0]))
    p_col = _const_col(spec.p_limbs, a)
    zero_row = jnp.zeros((1,) + rest, U32)

    def step(ai, acc):
        prod = ai * b                                   # (L, S, T): all j
        t0 = (_row(acc, 0) + (_row(prod, 0) & MASK)) & MASK  # low 16 bits —
        m = (t0 * np0) & MASK                           # the product is u32-safe
        mp = m[None] * p_col                            # (L, S, T)
        lo = (prod & MASK) + (mp & MASK)
        hi = (prod >> LIMB_BITS) + (mp >> LIMB_BITS)
        acc = acc + _pad_axis0(lo, 0, 1) + _pad_axis0(hi, 1, 0)
        carry = _row(acc, 0) >> LIMB_BITS               # acc[0] % B == 0
        acc = jnp.concatenate([acc[1:], zero_row], axis=0)
        return _add_at0(acc, carry)

    acc = jnp.zeros((L + 1,) + rest, U32)
    if unroll:
        for i in range(L):
            acc = step(a[i : i + 1], acc)
    else:
        def fbody(i, acc):
            ai = jax.lax.dynamic_slice_in_dim(a, i, 1, axis=0)
            return step(ai, acc)

        acc = jax.lax.fori_loop(0, L, fbody, acc)
    out, _ = _ks_carry(acc, K_out=L)
    return out


def k_sqr(spec, a, unroll: bool = True):
    return k_mul(spec, a, a, unroll)


def k_mul_small(spec, a, k: int):
    """Multiply by a small public constant via double-and-add."""
    assert k >= 1
    acc = None
    base = a
    while k:
        if k & 1:
            acc = base if acc is None else k_add(spec, acc, base)
        k >>= 1
        if k:
            base = k_add(spec, base, base)
    return acc


def k_is_zero(spec, a):
    """Value-zero test under the [0,2p) representation: digits all zero or
    equal to p.  Returns (S, T) bool."""
    p_col = _const_col(spec.p_limbs, a)
    return jnp.all(a == 0, axis=0) | jnp.all(a == p_col, axis=0)


def k_select(mask, a, b):
    """mask: (S, T) bool; a, b: (L, S, T)."""
    return jnp.where(mask[None], a, b)


def k_one(spec, like):
    return _const_col(spec.one_mont, like)


# ---------------------------------------------------------------------------
# Kernel factories + dispatch
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _binop_kernel(spec, op: str, n_tiles: int, T: int):
    L = spec.L
    impl = {
        "add": lambda a, b: k_add(spec, a, b),
        "sub": lambda a, b: k_sub(spec, a, b),
        "mul": lambda a, b: k_mul(spec, a, b, unroll=True),
    }[op]

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:, :, :] = impl(a_ref[:, :, :], b_ref[:, :, :])

    bs = lambda: pl.BlockSpec(
        (L, S_SUB, T), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, S_SUB, n_tiles * T), U32),
        grid=(n_tiles,),
        in_specs=[bs(), bs()],
        out_specs=bs(),
        interpret=INTERPRET,
    )
    return jax.jit(fn)


def to_planes(spec, flat):
    """(n, L) element-major (n = n_tiles*S*T) -> (L, S, n_tiles*T) planes."""
    n = flat.shape[0]
    if n <= SMALL_ELEMS:
        T = T_SMALL
    else:
        T = T_BIG
    n_tiles = n // (S_SUB * T)
    x = flat.reshape(n_tiles, S_SUB, T, spec.L)
    return x.transpose(3, 1, 0, 2).reshape(spec.L, S_SUB, n_tiles * T), T


def from_planes(spec, planes, n, T):
    """(L, S, n_tiles*T) -> (n, L)."""
    L = spec.L
    cols = planes.shape[2]
    n_tiles = cols // T
    x = planes.reshape(L, S_SUB, n_tiles, T).transpose(2, 1, 3, 0)
    return x.reshape(n_tiles * S_SUB * T, L)[:n]


def _padded_len(n: int) -> int:
    """Quantize batch sizes to powers of two (min one small tile).

    Each distinct (n_tiles, T) pair is a separate Mosaic kernel compile
    (10-70 s each on the tunnel).  The MSM prefix scans touch ~log2(N)
    distinct widths per size; pow2 quantization collapses them to one
    variant per octave, shared across scan levels AND across MSM sizes —
    at most 2x padding waste, zero when sizes are powers of two."""
    if n <= SMALL_ELEMS:
        return SMALL_ELEMS
    return max(TILE_ELEMS, 1 << (n - 1).bit_length())


def binop_flat(spec, op: str, a, b):
    """Dispatch an (..., L) binary field op through the fused kernels.

    Lane counts quantize to TWO tile classes (one (8,128) tile for small
    batches; a grid of (8,512) tiles for large) so the framework compiles
    only two Mosaic variants per op/field."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape).reshape(-1, spec.L)
    b = jnp.broadcast_to(b, shape).reshape(-1, spec.L)
    n = a.shape[0]
    m = _padded_len(n)
    if m != n:
        a = jnp.pad(a, ((0, m - n), (0, 0)))
        b = jnp.pad(b, ((0, m - n), (0, 0)))
    ap, T = to_planes(spec, a)
    bp, _ = to_planes(spec, b)
    out = _binop_kernel(spec, op, ap.shape[2] // T, T)(ap, bp)
    return from_planes(spec, out, n, T).reshape(shape)


@functools.lru_cache(maxsize=None)
def _butterfly_kernel(spec, n_tiles: int, T: int):
    """(lo, hi, tw) -> (lo + hi*tw, lo - hi*tw): one launch per NTT stage
    instead of three (mul, add, sub) — a Cooley-Tukey butterfly is the NTT
    hot loop (ref algebra/poly/src/domain/radix2/fft.rs butterflies)."""
    L = spec.L

    def kernel(lo_ref, hi_ref, tw_ref, a_ref, b_ref):
        h = k_mul(spec, hi_ref[:, :, :], tw_ref[:, :, :], unroll=True)
        lo = lo_ref[:, :, :]
        a_ref[:, :, :] = k_add(spec, lo, h)
        b_ref[:, :, :] = k_sub(spec, lo, h)

    bs = lambda: pl.BlockSpec(
        (L, S_SUB, T), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    fn = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, S_SUB, n_tiles * T), U32) for _ in range(2)
        ),
        grid=(n_tiles,),
        in_specs=[bs(), bs(), bs()],
        out_specs=tuple(bs() for _ in range(2)),
        interpret=INTERPRET,
    )
    return jax.jit(fn)


def butterfly_flat(spec, lo, hi, tw):
    """Batched butterfly on (..., L) arrays (tw broadcastable to hi)."""
    shape = jnp.broadcast_shapes(lo.shape, hi.shape, tw.shape)
    lo = jnp.broadcast_to(lo, shape).reshape(-1, spec.L)
    hi = jnp.broadcast_to(hi, shape).reshape(-1, spec.L)
    tw = jnp.broadcast_to(tw, shape).reshape(-1, spec.L)
    n = lo.shape[0]
    m = _padded_len(n)
    if m != n:
        pad = lambda x: jnp.pad(x, ((0, m - n), (0, 0)))
        lo, hi, tw = pad(lo), pad(hi), pad(tw)
    lp, T = to_planes(spec, lo)
    hp, _ = to_planes(spec, hi)
    tp, _ = to_planes(spec, tw)
    a, b = _butterfly_kernel(spec, lp.shape[2] // T, T)(lp, hp, tp)
    return (
        from_planes(spec, a, n, T).reshape(shape),
        from_planes(spec, b, n, T).reshape(shape),
    )


def mul_flat(spec, a, b):
    return binop_flat(spec, "mul", a, b)


def add_flat(spec, a, b):
    return binop_flat(spec, "add", a, b)


def sub_flat(spec, a, b):
    return binop_flat(spec, "sub", a, b)
