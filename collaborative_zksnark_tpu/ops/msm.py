"""Multi-scalar multiplication (MSM) kernels.

TPU-native replacements for the reference's Pippenger MSM
(ref: algebra/ec/src/msm/variable_base.rs:11-110) and its fixed-base usage
in setup.  Because secret shares are linear, an MSM of *public bases* by
*shared scalars* is a purely local MSM on each party's scalar shares
(ref: mpc-algebra/src/wire/pairing.rs:746-800, share/add.rs:256-260) — so
these kernels are used unchanged by the MPC layer.

Design notes (vector-machine re-formulation):
  * No scalar loops over points.  Bucket accumulation is: sort points by
    window digit (integer argsort), then a *segmented* Hillis-Steele
    shift-add scan over the sorted batch — each of the log2(N) levels is one
    full-batch branchless point addition, driven by a fori_loop so only ONE
    point-add is traced (compile-time friendly).
  * The classic sum_b b*S_b reduction runs as a reverse fori over buckets
    (2 adds/step, 2^c steps — negligible).
  * Window results combine with c doublings + 1 add per window.

Implementations:
  * `msm_bitserial`  — reference implementation (double-and-add over bits,
    masked reduction per bit); used for tiny N.
  * `msm_pippenger`  — the hot path described above.
  * `fixed_base_msm` — windowed-table method for many scalars against one
    base (setup / SRS generation), table built with a lax.scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra import field as F
from ..algebra.field import FR
from .curve import (
    FQ_OPS,
    FQ2_OPS,
    JacPoint,
    _shift_points,
    point_add,
    point_double,
    point_select,
    reduce_points,
    zero_point,
)

FR_BITS = 253


def _scalar_bits_standard(scalars_mont):
    """Montgomery-form Fr scalars (N, L) -> canonical standard-form limbs."""
    return F.from_mont(FR, scalars_mont)


def _scalar_zero_point(fld, like: JacPoint) -> JacPoint:
    z = zero_point(fld, like)
    return JacPoint(z.x[0], z.y[0], z.z[0])


def msm_bitserial(fld, points: JacPoint, scalars_mont) -> JacPoint:
    """sum_i scalars[i] * points[i]; scalars in Montgomery form (N, L)."""
    sc = _scalar_bits_standard(scalars_mont)
    zero_scalar = _scalar_zero_point(fld, points)
    zero_batch = zero_point(fld, points)

    def body(i, acc):
        acc = point_double(fld, acc)
        t = FR_BITS - 1 - i
        limb = jax.lax.dynamic_index_in_dim(
            sc, t // F.LIMB_BITS, axis=1, keepdims=False
        )
        bit = (limb >> (t % F.LIMB_BITS).astype(jnp.uint32)) & 1
        masked = point_select(fld, bit == 1, points, zero_batch)
        contrib = reduce_points(fld, masked)
        return point_add(fld, acc, contrib)

    return jax.lax.fori_loop(0, FR_BITS, body, zero_scalar)


# ---------------------------------------------------------------------------
# Pippenger (sorted-bucket segmented-scan formulation)
# ---------------------------------------------------------------------------

def _window_digits(sc_std, c: int, n_windows: int):
    """(N, L) standard-form limbs -> (n_windows, N) int32 digits of c bits.
    Windows may straddle limb boundaries (any c <= 16)."""
    L = sc_std.shape[1]
    mask = (1 << c) - 1
    digs = []
    for w in range(n_windows):
        bit_lo = w * c
        li = bit_lo // F.LIMB_BITS
        off = bit_lo % F.LIMB_BITS
        val = sc_std[:, li] >> off
        if off + c > F.LIMB_BITS and li + 1 < L:
            val = val | (sc_std[:, li + 1] << (F.LIMB_BITS - off))
        digs.append((val & mask).astype(jnp.int32))
    return jnp.stack(digs, axis=0)


def _segmented_scan_points(fld, pts: JacPoint, seg_start):
    """Inclusive segmented prefix-sum of points along axis 0.
    seg_start: int32 (N,), 1 where a new segment begins.

    Two implementations:
      * TPU (Pallas field kernels): work-efficient lax.associative_scan
        (~2N point-adds) — the per-add graph is small enough to trace at
        every scan site.
      * CPU/jnp fallback: Hillis-Steele with ONE traced point_add inside a
        fori_loop (N log N work but compile-light).
    """
    if F._pallas_ok():
        def comb(a, b):
            ax, ay, az, af = a
            bx, by, bz, bf = b
            merged = point_add(fld, JacPoint(ax, ay, az), JacPoint(bx, by, bz))
            keep_b = bf == 1
            out = point_select(fld, keep_b, JacPoint(bx, by, bz), merged)
            return (out.x, out.y, out.z, af | bf)

        sx, sy, sz, _ = jax.lax.associative_scan(
            comb, (pts.x, pts.y, pts.z, seg_start), axis=0
        )
        return JacPoint(sx, sy, sz)
    return _segmented_scan_points_hs(fld, pts, seg_start)


def _segmented_scan_points_hs(fld, pts: JacPoint, seg_start):
    n = pts.x.shape[0]
    levels = max(1, (n - 1).bit_length())
    zero_batch = zero_point(fld, pts)

    def body(d, st):
        x, y, z, f = st
        s = jnp.left_shift(1, d)
        prev = _shift_points(JacPoint(x, y, z), s)
        # shifted-in flags act as boundaries (block accumulation)
        fpad = jnp.concatenate([jnp.ones_like(f), f], axis=0)
        fprev = jax.lax.dynamic_slice_in_dim(fpad, n - s, n, axis=0)
        blocked = f == 1
        prev = point_select(fld, blocked, zero_batch, prev)
        added = point_add(fld, JacPoint(x, y, z), prev)
        return (added.x, added.y, added.z, f | fprev)

    x, y, z, _ = jax.lax.fori_loop(
        0, levels, body, (pts.x, pts.y, pts.z, seg_start)
    )
    return JacPoint(x, y, z)


def _bucket_sums(fld, pts_sorted: JacPoint, digs_sorted, n_buckets):
    """Points sorted by digit -> per-bucket sums (n_buckets, ...); bucket 0
    is forced to the identity (digit 0 contributes nothing)."""
    n = digs_sorted.shape[0]
    seg_start = jnp.concatenate(
        [
            jnp.ones((1,), jnp.int32),
            (digs_sorted[1:] != digs_sorted[:-1]).astype(jnp.int32),
        ]
    )
    scan = _segmented_scan_points(fld, pts_sorted, seg_start)
    is_last = jnp.concatenate(
        [(digs_sorted[1:] != digs_sorted[:-1]), jnp.ones((1,), jnp.bool_)]
    )
    # scatter segment totals into buckets; non-last rows and digit-0 rows go
    # to a trash slot
    target = jnp.where(is_last & (digs_sorted > 0), digs_sorted, n_buckets)
    zero1 = zero_point(fld, JacPoint(scan.x[:1], scan.y[:1], scan.z[:1]))
    bshape = lambda a: (n_buckets + 1,) + a.shape[1:]
    bx = jnp.broadcast_to(zero1.x[0], bshape(scan.x)).at[target].set(scan.x)
    by = jnp.broadcast_to(zero1.y[0], bshape(scan.y)).at[target].set(scan.y)
    bz = jnp.broadcast_to(zero1.z[0], bshape(scan.z)).at[target].set(scan.z)
    return JacPoint(bx[:n_buckets], by[:n_buckets], bz[:n_buckets])


def _weighted_bucket_total(fld, buckets: JacPoint) -> JacPoint:
    """sum_{b>=1} b * S_b.

    TPU path: reversed inclusive associative scan (suffix sums) + batched
    reduction — log-depth, fully batched over the vmapped window axis.
    CPU path: the classic running/total reverse fori (2 adds per bucket)."""
    nb = buckets.x.shape[0]
    if F._pallas_ok():
        def comb(a, b):
            out = point_add(fld, JacPoint(*a), JacPoint(*b))
            return (out.x, out.y, out.z)

        rx = jnp.flip(buckets.x, axis=0)
        ry = jnp.flip(buckets.y, axis=0)
        rz = jnp.flip(buckets.z, axis=0)
        sx, sy, sz = jax.lax.associative_scan(comb, (rx, ry, rz), axis=0)
        # sum of suffix(b) for b=1..nb-1 == sum_b b*S_b: all entries except
        # the last (= suffix(0))
        total = reduce_points(fld, JacPoint(sx[:-1], sy[:-1], sz[:-1]))
        return total
    zero1 = zero_point(fld, JacPoint(buckets.x[:1], buckets.y[:1], buckets.z[:1]))
    zero_s = JacPoint(zero1.x[0], zero1.y[0], zero1.z[0])

    def body(i, st):
        running, total = st
        b = nb - 1 - i
        e = JacPoint(buckets.x[b], buckets.y[b], buckets.z[b])
        running = point_add(fld, running, e)
        total = point_add(fld, total, running)
        return (running, total)

    _, total = jax.lax.fori_loop(0, nb - 1, body, (zero_s, zero_s))
    return total


def _pippenger_window(fld, points: JacPoint, digs_w, c: int) -> JacPoint:
    """One Pippenger window: returns sum_i digit_i * P_i (a scalar point)."""
    n_buckets = 1 << c
    order = jnp.argsort(digs_w)
    digs_sorted = jnp.take(digs_w, order, axis=0)
    pts_sorted = JacPoint(
        jnp.take(points.x, order, axis=0),
        jnp.take(points.y, order, axis=0),
        jnp.take(points.z, order, axis=0),
    )
    buckets = _bucket_sums(fld, pts_sorted, digs_sorted, n_buckets)
    return _weighted_bucket_total(fld, buckets)


def msm_pippenger(fld, points: JacPoint, scalars_mont, c: int = 8) -> JacPoint:
    """Windowed bucket MSM.  ALL windows are processed simultaneously (vmap
    over the window axis — sorts, segmented scans and the bucket reduction
    all batch across the ~253/c windows, keeping the VPU full); window
    results are then combined with a c-doublings + add ladder."""
    return _pippenger_kernel(fld, c)(points, scalars_mont)


@functools.lru_cache(maxsize=None)
def _pippenger_kernel(fld, c):
    n_windows = (FR_BITS + c - 1) // c

    def f(points, scalars_mont):
        sc = _scalar_bits_standard(scalars_mont)
        digs = _window_digits(sc, c, n_windows)            # (W, N)
        window = lambda d: _pippenger_window(fld, points, d, c)
        results = jax.vmap(window)(digs)                   # (W, ...)

        def body(i, acc):
            w = n_windows - 2 - i

            def dbl(_, Q):
                return point_double(fld, Q)

            acc = jax.lax.fori_loop(0, c, dbl, acc)
            wres = JacPoint(results.x[w], results.y[w], results.z[w])
            return point_add(fld, acc, wres)

        top = JacPoint(results.x[-1], results.y[-1], results.z[-1])
        return jax.lax.fori_loop(0, n_windows - 1, body, top)

    return jax.jit(f)


def _pad_pow2(fld, points: JacPoint, scalars_mont):
    """Pad to the next power of two with identity points / zero scalars so
    different problem sizes share one compiled kernel."""
    n = points.x.shape[0]
    m = 1 << max(0, (n - 1).bit_length())
    if m == n:
        return points, scalars_mont
    padp = lambda a: jnp.concatenate(
        [a, jnp.zeros((m - n,) + a.shape[1:], a.dtype)], axis=0
    )
    return (
        JacPoint(padp(points.x), padp(points.y), padp(points.z)),
        padp(scalars_mont),
    )


@functools.lru_cache(maxsize=None)
def _bitserial_kernel(fld):
    return jax.jit(lambda p, s: msm_bitserial(fld, p, s))


def msm(fld, points: JacPoint, scalars_mont, c: int = None) -> JacPoint:
    """Dispatcher: native CPU Pippenger (FFI) on the CPU backend; the
    vector-machine sort/scan Pippenger (with a size-tuned window) on TPU;
    bit-serial for tiny N.  Inputs are padded to a power of two for
    compile-cache reuse on the kernel paths."""
    from ..algebra import ffi_field

    if ffi_field.HAVE_FFI and jax.default_backend() == "cpu":
        ox, oy, oz = ffi_field.msm(
            fld is FQ2_OPS, points.x, points.y, points.z, scalars_mont
        )
        return JacPoint(ox, oy, oz)
    points, scalars_mont = _pad_pow2(fld, points, scalars_mont)
    n = points.x.shape[0]
    if n <= 16:
        return _bitserial_kernel(fld)(points, scalars_mont)
    if c is None:
        c = 8 if n >= (1 << 12) else 4
    return msm_pippenger(fld, points, scalars_mont, c=c)


# ---------------------------------------------------------------------------
# Fixed-base MSM (one base, many scalars) — used by setup / SRS generation
# ---------------------------------------------------------------------------

def fixed_base_msm(fld, host_curve, base_host, scalars_mont, c: int = 8):
    """[s_0 * G, s_1 * G, ...] for one affine base G (host int coords).

    Windowed table method: T[w][d] = d * 2^(c w) G built on device with one
    lax.scan; each output gathers one table entry per window and accumulates
    over windows with a fori loop.
    Ref analog: arkworks FixedBaseMSM (used by generator.rs / KZG setup).
    """
    n_windows = (FR_BITS + c - 1) // c
    bases = []
    cur = base_host
    for w in range(n_windows):
        bases.append(cur)
        for _ in range(c):
            cur = host_curve.double(cur)
    from_host = _from_host_fn(fld)
    base_pts = from_host(bases)  # (W, ...)

    sc = jax.jit(_scalar_bits_standard)(scalars_mont)
    digs = jax.jit(functools.partial(_window_digits, c=c, n_windows=n_windows))(sc)

    return _fixed_base_kernel(fld, c, n_windows)(base_pts, digs)


def _from_host_fn(fld):
    from . import curve as curve_mod

    if fld is FQ_OPS:
        return curve_mod.g1_from_host
    return curve_mod.g2_from_host


@functools.lru_cache(maxsize=None)
def _fixed_base_kernel(fld, c, n_windows):
    n_buckets = 1 << c

    def f(base_pts: JacPoint, digs):
        # table[w, d] = d * base_w via a scan: row_d = row_{d-1} + base
        def step(carry, _):
            nxt = point_add(fld, carry, base_pts)
            return nxt, nxt

        _, rows = jax.lax.scan(step, base_pts, None, length=n_buckets - 2)
        zrow = zero_point(fld, base_pts)
        stack = lambda z, b, r: jnp.concatenate(
            [z[None], b[None], r], axis=0
        )  # (2^c, W, ...) indexed [digit, window]
        table = JacPoint(
            stack(zrow.x, base_pts.x, rows.x),
            stack(zrow.y, base_pts.y, rows.y),
            stack(zrow.z, base_pts.z, rows.z),
        )

        n = digs.shape[1]
        zero1 = zero_point(fld, JacPoint(table.x[0, :1], table.y[0, :1], table.z[0, :1]))
        acc0 = JacPoint(
            jnp.broadcast_to(zero1.x[0], (n,) + zero1.x.shape[1:]).astype(jnp.uint32),
            jnp.broadcast_to(zero1.y[0], (n,) + zero1.y.shape[1:]).astype(jnp.uint32),
            jnp.broadcast_to(zero1.z[0], (n,) + zero1.z.shape[1:]).astype(jnp.uint32),
        )

        def body(w, acc):
            d = digs[w]
            entry = JacPoint(
                table.x[:, w][d], table.y[:, w][d], table.z[:, w][d]
            )
            return point_add(fld, acc, entry)

        return jax.lax.fori_loop(0, n_windows, body, acc0)

    return jax.jit(f)
