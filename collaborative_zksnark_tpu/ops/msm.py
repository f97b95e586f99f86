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
import os as _os

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
    jac_to_proj,
    point_add,
    point_add_proj,
    point_double,
    point_neg,
    point_select,
    proj_to_jac,
    proj_zero,
    reduce_points,
    zero_point,
)


class _PointStrat:
    """Coordinate-system strategy for the Pippenger internals.  proj=True
    (G1) uses the COMPLETE projective add (RCB16, 12 muls, no selects) —
    ~2x lighter than the branchless Jacobian add that must evaluate both
    the add and double paths; proj=False (G2/Fq2) keeps Jacobian."""

    def __init__(self, fld, proj: bool):
        self.fld = fld
        self.proj = proj

    def add(self, P, Q):
        if self.proj:
            return point_add_proj(self.fld, P, Q)
        return point_add(self.fld, P, Q)

    def double(self, P):
        if self.proj:
            return point_add_proj(self.fld, P, P)
        return point_double(self.fld, P)

    def neg(self, P):
        return point_neg(self.fld, P)

    def zero(self, like):
        if self.proj:
            return proj_zero(self.fld, like)
        return zero_point(self.fld, like)

    def select(self, mask, P, Q):
        return point_select(self.fld, mask, P, Q)

    def enter(self, P):
        """Jacobian inputs -> working coords (once, at MSM entry)."""
        return jac_to_proj(self.fld, P) if self.proj else P

    def exit(self, P):
        """Working coords -> Jacobian (once, on the final point)."""
        return proj_to_jac(self.fld, P) if self.proj else P

from ..algebra import params as _C

FR_BITS = _C.FR_BITS  # scalar bit width of the ACTIVE curve (253 BLS / 254 BN)

# Cap on flat (window-group x points) slots held live by one Pippenger
# group — bounds peak HBM (~288 B/slot for G1 + scan temporaries).
# Tests shrink this to force multi-group execution.
_CHUNK_SLOTS = 1 << 22
# Variable-base MSM chunk cap (elements per single XLA program); see msm().
_CHUNK = 1 << int(_os.environ.get("CZTPU_MSM_CHUNK_LOG2", "18"))


def _scalar_bits_standard(scalars_mont, spec=None):
    """Montgomery-form Fr scalars (N, L) -> canonical standard-form limbs."""
    return F.from_mont(spec if spec is not None else FR, scalars_mont)


def _sspec(fld):
    """Scalar-field spec of a device curve-ops object (BLS Fr default;
    BN254 ops carry their own — see ops/bn_device.py)."""
    return getattr(fld, "scalar_spec", FR)


def _sbits(fld):
    return getattr(fld, "scalar_bits", FR_BITS)


def _scalar_zero_point(fld, like: JacPoint) -> JacPoint:
    z = zero_point(fld, like)
    return JacPoint(z.x[0], z.y[0], z.z[0])


def msm_bitserial(fld, points: JacPoint, scalars_mont) -> JacPoint:
    """sum_i scalars[i] * points[i]; scalars in Montgomery form (N, L)."""
    sc = _scalar_bits_standard(scalars_mont, _sspec(fld))
    n_bits = _sbits(fld)
    zero_scalar = _scalar_zero_point(fld, points)
    zero_batch = zero_point(fld, points)

    def body(i, acc):
        acc = point_double(fld, acc)
        t = n_bits - 1 - i
        limb = jax.lax.dynamic_index_in_dim(
            sc, t // F.LIMB_BITS, axis=1, keepdims=False
        )
        bit = (limb >> (t % F.LIMB_BITS).astype(jnp.uint32)) & 1
        masked = point_select(fld, bit == 1, points, zero_batch)
        contrib = reduce_points(fld, masked)
        return point_add(fld, acc, contrib)

    return jax.lax.fori_loop(0, n_bits, body, zero_scalar)


# ---------------------------------------------------------------------------
# Pippenger (flat sort + BLOCKED prefix scan + prefix-difference buckets)
#
# Vector-machine formulation, v3:
#   * ALL windows are flattened into ONE array of W*N (window, digit) keys,
#     sorted together — one big sort instead of W vmapped sorts.
#   * Bucket sums come from an inclusive prefix scan of the sorted points
#     followed by prefix DIFFERENCES at bucket boundaries (searchsorted +
#     gather).  Points subtract by negating y, so S_b = prefix[end(b)] -
#     prefix[end(b-1)] needs no segment flags and no scatter.
#   * v3 (round-2 fix): the prefix is BLOCKED — the sorted stream reshapes
#     to (R rows, K consecutive elements), a lax.scan walks the K positions
#     with ONE width-R fused point-add per step (within-row prefixes), and a
#     small associative_scan over the R row totals supplies the cross-row
#     offsets.  prefix[e] = within[e] + row_excl[e // K].  This does ~F adds
#     (vs 2F for the flat associative_scan) and, decisively, traces ONE add
#     for the whole F-sized phase: the v2 flat associative_scan at F = 2^21
#     unrolled ~21 levels of giant slice/concat graphs whose XLA compile was
#     SIGKILLed (OOM) on the remote TPU compile helper.
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


def _prefix_scan_points(strat, pts: JacPoint) -> JacPoint:
    """Plain (unsegmented) inclusive prefix sum of points along axis 0 —
    work-efficient associative scan (~2N adds), each add the fused Pallas
    kernel on TPU.  Used only for SMALL axes (row totals, bucket axes);
    the F-sized phase uses _blocked_prefix."""

    def comb(a, b):
        out = strat.add(JacPoint(*a), JacPoint(*b))
        return (out.x, out.y, out.z)

    sx, sy, sz = jax.lax.associative_scan(comb, (pts.x, pts.y, pts.z), axis=0)
    return JacPoint(sx, sy, sz)


def _broadcast_point(z1: JacPoint, n: int) -> JacPoint:
    b = lambda a: jnp.broadcast_to(a, (n,) + a.shape[1:])
    return JacPoint(b(z1.x), b(z1.y), b(z1.z))


def _blocked_prefix(strat, pts: JacPoint, R: int):
    """Inclusive prefix sums of `pts` along axis 0 in BLOCKED form.

    The F-element stream is laid out as R rows of K = ceil(F/R) consecutive
    elements (padded with identity points).  Returns
      ys       — (K*R, ...) within-row inclusive prefixes, flat index k*R + r
      row_excl — (R, ...) exclusive prefix of the row totals
      K        — row length
    so prefix[e] = ys[(e % K)*R + (e // K)] + row_excl[e // K].
    ONE fused point-add is traced for the scan body (width R), keeping the
    XLA graph small regardless of F."""
    F = pts.x.shape[0]
    K = -(-F // R)
    pad = K * R - F
    if pad:
        z1 = strat.zero(JacPoint(pts.x[:1], pts.y[:1], pts.z[:1]))
        zp = _broadcast_point(z1, pad)
        cat = lambda a, za: jnp.concatenate([a, za], axis=0)
        pts = JacPoint(cat(pts.x, zp.x), cat(pts.y, zp.y), cat(pts.z, zp.z))
    # (K, R, ...): step k touches element k of every row
    resh = lambda a: jnp.moveaxis(a.reshape((R, K) + a.shape[1:]), 1, 0)
    px, py, pz = resh(pts.x), resh(pts.y), resh(pts.z)
    z_row = strat.zero(JacPoint(px[0], py[0], pz[0]))

    def step(carry, xs):
        out = strat.add(JacPoint(*carry), JacPoint(*xs))
        return (out.x, out.y, out.z), (out.x, out.y, out.z)

    (tx, ty, tz), (yx, yy, yz) = jax.lax.scan(
        step, (z_row.x, z_row.y, z_row.z), (px, py, pz)
    )
    flat = lambda a: a.reshape((K * R,) + a.shape[2:])
    ys = JacPoint(flat(yx), flat(yy), flat(yz))
    row_tot = JacPoint(tx, ty, tz)
    incl = _prefix_scan_points(strat, row_tot)
    z1 = strat.zero(JacPoint(incl.x[:1], incl.y[:1], incl.z[:1]))
    sh = lambda a, za: jnp.concatenate([za, a[:-1]], axis=0)
    row_excl = JacPoint(sh(incl.x, z1.x), sh(incl.y, z1.y), sh(incl.z, z1.z))
    return ys, row_excl, K


def _gather_point(pts: JacPoint, idx) -> JacPoint:
    return JacPoint(
        jnp.take(pts.x, idx, axis=0),
        jnp.take(pts.y, idx, axis=0),
        jnp.take(pts.z, idx, axis=0),
    )


# ---------------------------------------------------------------------------
# Plane-resident blocked prefix (G1 / complete-projective, TPU only)
#
# v4: the F-sized scan keeps coordinates in the Pallas (L, 8, C) plane
# layout for ALL K steps — the element-major path re-transposes every coord
# (9 arrays) to planes and back on EVERY step, which costs ~2x the fused
# kernel's own HBM traffic in pure relayout.  Here the gathered stream is
# transposed ONCE into (K, L, 8, C) stacks, the scan body is the raw
# projective-add Pallas call, and bucket-boundary prefixes are read back by
# direct (step, sublane, column) indexing into the stacked planes.
# ---------------------------------------------------------------------------


def _to_kplanes(a, R: int, K: int, m: int, T: int, L: int):
    """(K*R, L) element-major stream (row r = stream indices r*K..r*K+K-1)
    -> (K, L, 8, C) per-step plane stacks (module-level so the layout math
    is unit-testable without Pallas)."""
    from . import pallas_field as PF

    nt = m // (PF.S_SUB * T)
    a = jnp.moveaxis(a.reshape(R, K, L), 1, 0)  # (K, R, L)
    if m != R:
        a = jnp.pad(a, ((0, 0), (0, m - R), (0, 0)))
    x = a.reshape(K, nt, PF.S_SUB, T, L)
    return x.transpose(0, 4, 2, 1, 3).reshape(K, L, PF.S_SUB, nt * T)


def _blocked_prefix_planes(pts: JacPoint, R: int):
    """Plane-resident analog of `_blocked_prefix` for the G1 path.

    Returns (ys_planes, row_excl, K, T) where ys_planes is a 3-tuple of
    (K, L, 8, C) stacks (within-row inclusive prefixes; element (k, r) is
    flat stream index r*K + k) and row_excl is an element-major JacPoint of
    the R row-total exclusive prefixes."""
    from ..algebra.field import FQ
    from . import pallas_curve as PC
    from . import pallas_field as PF

    strat = _PointStrat(FQ_OPS, True)
    Fsz = pts.x.shape[0]
    K = -(-Fsz // R)
    pad = K * R - Fsz
    if pad:
        z1 = strat.zero(JacPoint(pts.x[:1], pts.y[:1], pts.z[:1]))
        zp = _broadcast_point(z1, pad)
        cat = lambda a, za: jnp.concatenate([a, za], axis=0)
        pts = JacPoint(cat(pts.x, zp.x), cat(pts.y, zp.y), cat(pts.z, zp.z))
    m = PF._padded_len(R)
    T = PF.T_SMALL if m <= PF.SMALL_ELEMS else PF.T_BIG
    nt = m // (PF.S_SUB * T)
    L = FQ.L

    def to_kplanes(a):
        return _to_kplanes(a, R, K, m, T, L)

    pxk, pyk, pzk = to_kplanes(pts.x), to_kplanes(pts.y), to_kplanes(pts.z)
    kern = PC._proj_add_kernel(nt, T)
    # projective identity (0 : 1 : 0) in plane form
    zx = jnp.zeros((L, PF.S_SUB, nt * T), jnp.uint32)
    one_col = jnp.asarray(np.asarray(FQ.one_mont, np.uint32)).reshape(L, 1, 1)
    zy = jnp.broadcast_to(one_col, (L, PF.S_SUB, nt * T)).astype(jnp.uint32)
    zz = zx

    def step(carry, xs):
        out = kern(carry[0], carry[1], carry[2], xs[0], xs[1], xs[2])
        return out, out

    (tx, ty, tz), (yx, yy, yz) = jax.lax.scan(step, (zx, zy, zz), (pxk, pyk, pzk))
    row_tot = JacPoint(
        PF.from_planes(FQ, tx, R, T),
        PF.from_planes(FQ, ty, R, T),
        PF.from_planes(FQ, tz, R, T),
    )
    incl = _prefix_scan_points(strat, row_tot)
    z1 = strat.zero(JacPoint(incl.x[:1], incl.y[:1], incl.z[:1]))
    sh = lambda a, za: jnp.concatenate([za, a[:-1]], axis=0)
    row_excl = JacPoint(sh(incl.x, z1.x), sh(incl.y, z1.y), sh(incl.z, z1.z))
    return (yx, yy, yz), row_excl, K, T


def _gather_kplanes(ys_planes, e, K, T):
    """Element-major (Q, L) gather of stream indices `e` from the stacked
    (K, L, 8, C) within-row prefixes: stream index e = r*K + k lives at
    step k, sublane (r//T)%8, column (r//(8T))*T + r%T."""
    yx, yy, yz = ys_planes
    k = e % K
    r = e // K
    s = (r // T) % 8
    col = (r // (8 * T)) * T + r % T
    g = lambda a: a[k, :, s, col]
    return JacPoint(g(yx), g(yy), g(yz))


def _bucket_sums_blocked(strat, prefix_at, keys_sorted, n_windows, c):
    """Per-(window, bucket) sums from the blocked prefix structures:
    S_{w,b} = prefix[last index with key <= (w<<c)+b]
            - prefix[last index with key <= (w<<c)+b-1]
    (point subtraction = add the y-negated point; empty buckets give
    P - P = identity through the add's inverse-pair path).  The flat query
    keys w*2^c + b enumerate 0..W*2^c-1 CONSECUTIVELY, so the lower boundary
    of query q is the upper boundary of q-1: one composed prefix per query
    plus one subtract, instead of two independent lookups.

    `prefix_at(e)` returns the inclusive stream prefix at flat index e as an
    element-major JacPoint (layout-specific: blocked element-major or the
    plane-resident stacks)."""
    n_buckets = 1 << c
    qkeys = jnp.arange(n_windows * n_buckets, dtype=jnp.int32)
    e = jnp.searchsorted(keys_sorted, qkeys, side="right") - 1
    e_c = jnp.clip(e, 0)
    P = prefix_at(e_c)
    zero = strat.zero(P)
    P = strat.select(e < 0, zero, P)
    z1 = strat.zero(JacPoint(P.x[:1], P.y[:1], P.z[:1]))
    sh = lambda a, za: jnp.concatenate([za, a[:-1]], axis=0)
    P_prev = JacPoint(sh(P.x, z1.x), sh(P.y, z1.y), sh(P.z, z1.z))
    S = strat.add(P, strat.neg(P_prev))
    return JacPoint(
        S.x.reshape((n_windows, n_buckets) + S.x.shape[1:]),
        S.y.reshape((n_windows, n_buckets) + S.y.shape[1:]),
        S.z.reshape((n_windows, n_buckets) + S.z.shape[1:]),
    )


def _weighted_bucket_totals(strat, buckets: JacPoint) -> JacPoint:
    """sum_{b>=1} b * S_{w,b} for every window w, batched:
    reversed inclusive scan along the bucket axis (suffix sums) + pairwise
    tree reduction.  buckets: (W, 2^c, ...) -> (W, ...)."""

    def comb(a, b):
        out = strat.add(JacPoint(*a), JacPoint(*b))
        return (out.x, out.y, out.z)

    rx = jnp.flip(buckets.x, axis=1)
    ry = jnp.flip(buckets.y, axis=1)
    rz = jnp.flip(buckets.z, axis=1)
    sx, sy, sz = jax.lax.associative_scan(comb, (rx, ry, rz), axis=1)
    # suffix(b) for b >= 1 lives at positions :-1; sum them pairwise
    P = JacPoint(sx[:, :-1], sy[:, :-1], sz[:, :-1])
    m = P.x.shape[1]
    # pad bucket axis to a power of two with identities
    mp = 1 << max(0, (m - 1).bit_length())
    if mp != m:
        z1 = strat.zero(JacPoint(P.x[:, :1], P.y[:, :1], P.z[:, :1]))
        padb = lambda a, pz: jnp.concatenate(
            [a, jnp.broadcast_to(pz, (a.shape[0], mp - m) + a.shape[2:])], axis=1
        )
        P = JacPoint(padb(P.x, z1.x[:, :1]), padb(P.y, z1.y[:, :1]), padb(P.z, z1.z[:, :1]))
    while mp > 1:
        h = mp // 2
        P = strat.add(
            JacPoint(P.x[:, :h], P.y[:, :h], P.z[:, :h]),
            JacPoint(P.x[:, h : 2 * h], P.y[:, h : 2 * h], P.z[:, h : 2 * h]),
        )
        mp = h
    return JacPoint(P.x[:, 0], P.y[:, 0], P.z[:, 0])


def msm_pippenger(
    fld, points: JacPoint, scalars_mont, c: int = 8, proj: bool = None
) -> JacPoint:
    """Windowed bucket MSM over flattened (window, digit) keys — see the
    section comment above.  Window results combine with a c-doublings + add
    ladder (ref ec/src/msm/variable_base.rs:84-110).  G1 runs on COMPLETE
    projective adds (enter/exit conversions at the boundary); Jacobian
    coordinates in and out either way."""
    if proj is None:
        proj = fld is FQ_OPS
    return _pippenger_kernel(fld, c, proj)(points, scalars_mont)


@functools.lru_cache(maxsize=None)
def _pippenger_kernel(fld, c, proj=False):
    n_windows = (_sbits(fld) + c - 1) // c
    strat = _PointStrat(fld, proj)

    def f(points, scalars_mont):
        n = points.x.shape[0]
        points = strat.enter(points)
        sc = _scalar_bits_standard(scalars_mont, _sspec(fld))
        digs = _window_digits(sc, c, n_windows)            # (W, N)

        # Window chunking bounds peak HBM: the flat gathered+scanned point
        # arrays are (G*N, ...) per group (~288 B/slot for G1), so cap
        # G*N at ~2^22 slots (~1.2 GB live, ~3 GB with scan temporaries).
        G = max(1, min(n_windows, _CHUNK_SLOTS // max(n, 1)))
        groups = -(-n_windows // G)

        def run_group(digs_g, w_count):
            keys = digs_g + (jnp.arange(w_count, dtype=jnp.int32)[:, None] << c)
            order = jnp.argsort(keys.reshape(-1))          # (G*N,)
            keys_sorted = jnp.take(keys.reshape(-1), order)
            pts_sorted = _gather_point(points, order % n)
            Fsz = pts_sorted.x.shape[0]
            # row width: keep the per-step add wide (VPU-efficient) while
            # K = F/R stays small enough that the scan dominates no latency
            R = 1 << max(8, min(13, Fsz.bit_length() - 5))
            if _os.environ.get("CZTPU_MSM_R_LOG2"):  # bisect override
                R = 1 << int(_os.environ["CZTPU_MSM_R_LOG2"])
            # plane path hard-codes FQ constants + the G1 projective-add
            # kernel — gate on the field, not just proj
            if proj and fld is FQ_OPS and F._pallas_ok():
                ys_planes, row_excl, K, T = _blocked_prefix_planes(pts_sorted, R)
                prefix_at = lambda e: strat.add(
                    _gather_kplanes(ys_planes, e, K, T),
                    _gather_point(row_excl, e // K),
                )
            else:
                ys, row_excl, K = _blocked_prefix(strat, pts_sorted, R)
                prefix_at = lambda e: strat.add(
                    _gather_point(ys, (e % K) * R + e // K),
                    _gather_point(row_excl, e // K),
                )
            buckets = _bucket_sums_blocked(
                strat, prefix_at, keys_sorted, w_count, c
            )
            return _weighted_bucket_totals(strat, buckets)   # (G, ...)

        parts = []
        for g in range(groups):
            lo = g * G
            w_count = min(G, n_windows - lo)
            parts.append(run_group(digs[lo : lo + w_count], w_count))
        results = JacPoint(
            jnp.concatenate([p.x for p in parts], axis=0),
            jnp.concatenate([p.y for p in parts], axis=0),
            jnp.concatenate([p.z for p in parts], axis=0),
        )                                                  # (W, ...)

        def body(i, acc):
            w = n_windows - 2 - i

            def dbl(_, Q):
                return strat.double(Q)

            acc = jax.lax.fori_loop(0, c, dbl, acc)
            wres = JacPoint(results.x[w], results.y[w], results.z[w])
            return strat.add(acc, wres)

        top = JacPoint(results.x[-1], results.y[-1], results.z[-1])
        out = jax.lax.fori_loop(0, n_windows - 1, body, top)
        return strat.exit(out)

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

    # native kernels are compiled for the BLS12-377 constants only
    if ffi_field.HAVE_FFI and jax.default_backend() == "cpu" and _sspec(fld) is FR:
        ox, oy, oz = ffi_field.msm(
            fld is FQ2_OPS, points.x, points.y, points.z, scalars_mont
        )
        return JacPoint(ox, oy, oz)
    if jax.default_backend() == "cpu":
        # No native kernel for this curve: stay on the bit-serial kernel.
        # XLA:CPU takes tens of minutes (and LLVM OOMs) compiling the
        # Pippenger program that the TPU compile server handles; the CPU
        # backend is the test/fallback path, never the production MSM.
        points, scalars_mont = _pad_pow2(fld, points, scalars_mont)
        return _bitserial_kernel(fld)(points, scalars_mont)
    n = points.x.shape[0]
    if n <= _CHUNK:
        # pad only WITHIN a chunk: padding before chunking doubles the
        # work for sizes just over a power of two (e.g. m = 2^20 + 2)
        points, scalars_mont = _pad_pow2(fld, points, scalars_mont)
        n = points.x.shape[0]
    if n <= 16:
        return _bitserial_kernel(fld)(points, scalars_mont)
    if n > _CHUNK:
        # HBM cap: one 2^20 Pippenger program OOMs the 16 GB chip (plane
        # stacks + XLA copies hit 73% fragmentation — observed at the
        # Groth16 2^20 prove).  Split into _CHUNK-sized sub-MSMs that all
        # share ONE compiled kernel and fold the partials; extra cost is
        # W window-adds per chunk (~10% adds at 2^20), peak memory is one
        # chunk's program.  Ref analog: arkworks chunks by CPU cores
        # (ec/src/msm/variable_base.rs:36); here the chunk is sized by HBM.
        from . import curve as cv

        acc = None
        for lo in range(0, n, _CHUNK):
            part = msm(
                fld,
                JacPoint(
                    points.x[lo : lo + _CHUNK],
                    points.y[lo : lo + _CHUNK],
                    points.z[lo : lo + _CHUNK],
                ),
                scalars_mont[lo : lo + _CHUNK],
                c=c,
            )
            acc = part if acc is None else cv.point_add(fld, acc, part)
        return acc
    if c is None:
        # v3 cost model: total adds ~ W*(N + 4*2^c) with W = 253/c
        # (blocked scan ~ W*N, bucket sums + weighted totals ~ 4*W*2^c);
        # 2^c ~ N/16 balances the bucket side at a few % of the scan.
        logn = n.bit_length() - 1
        c = max(4, min(_c_cap(fld), logn - 5))
    return msm_pippenger(fld, points, scalars_mont, c=c)


def chosen_window(fld, n: int) -> int:
    """The window c the dispatcher picks for an n-point Pippenger MSM on
    the TPU path (exposed so roofline accounting — bench.py — derives its
    cost model from the live tuning instead of restating constants)."""
    logn = max(1, int(n).bit_length() - 1)
    return max(4, min(_c_cap(fld), logn - 5))


def scalar_bits(fld) -> int:
    """Bit width of the active curve's scalar field (roofline accounting)."""
    return _sbits(fld)


def _c_cap(fld) -> int:
    """Max Pippenger window per field.  The Jacobian (G2) path is capped
    at c=11: at c=13 with the window-grouping split active, the TPU
    executable returns a WRONG result (known-answer tests at 2^18/2^20,
    scripts/tpu_g2_matrix.py) while the identical trace is correct on the
    CPU backend and correct on TPU with c<=11 or a single group — an
    XLA:TPU miscompile we exclude by window choice (cost: ~15% more adds
    on G2, which is a small slice of a prove)."""
    return 13 if fld is FQ_OPS else 11


# ---------------------------------------------------------------------------
# Fixed-base MSM (one base, many scalars) — used by setup / SRS generation
# ---------------------------------------------------------------------------

def fixed_base_msm_ints(fld, host_curve, base_host, scalar_ints, c: int = 8):
    """[s * G for s in scalar_ints] with host int scalars.

    Prefers the NATIVE host kernel (native/fieldops.cpp fixed_base_run:
    windowed affine table + mixed adds, OpenMP) on any backend — setup/SRS
    generation is host work; the points ship to the device once.  This is
    what kills the TPU fixed-base compile wall (round-2: 198 s setup @2^14
    was almost entirely device fixed-base kernel compiles).  z is rebuilt
    on-device from the identity mask (native outputs are affine-normalized)
    so only 2 of 3 coordinates cross the (slow) host->device link.
    Falls back to the device windowed-table kernel.
    Ref analog: arkworks FixedBaseMSM (generator.rs / kzg10 setup)."""
    from ..algebra import ffi_field

    sspec = _sspec(fld)
    scalar_ints = [int(v) % sspec.p for v in scalar_ints]
    if not scalar_ints:
        return _from_host_fn(fld)([])
    # the native kernels are compiled for the BLS12-377 constants only
    if ffi_field.HAVE_FFI and sspec is FR:
        R = 1 << (F.LIMB_BITS * FR.L)
        sc_np = F.ints_to_limbs([v * R % sspec.p for v in scalar_ints], FR.L)
        ox, oy, oz = ffi_field.fixed_base_host(fld is FQ2_OPS, base_host, sc_np)
        # ONE device transfer for all three coordinates (per-query where/
        # broadcast device ops were a remote compile per shape; oz is
        # already {0, Montgomery-one} from the kernel's normalization)
        big = jnp.asarray(np.stack([ox, oy, oz]))
        return JacPoint(big[0], big[1], big[2])
    return fixed_base_msm(
        fld, host_curve, base_host, sspec.to_device(scalar_ints), c=c
    )


def fixed_base_msm(fld, host_curve, base_host, scalars_mont, c: int = 8):
    """[s_0 * G, s_1 * G, ...] for one affine base G (host int coords).

    Windowed table method: T[w][d] = d * 2^(c w) G built on device with one
    lax.scan; each output gathers one table entry per window and accumulates
    over windows with a fori loop.
    Ref analog: arkworks FixedBaseMSM (used by generator.rs / KZG setup).
    """
    n_windows = (_sbits(fld) + c - 1) // c
    bases = []
    cur = base_host
    for w in range(n_windows):
        bases.append(cur)
        for _ in range(c):
            cur = host_curve.double(cur)
    from_host = _from_host_fn(fld)
    base_pts = from_host(bases)  # (W, ...)

    sc = jax.jit(functools.partial(_scalar_bits_standard, spec=_sspec(fld)))(scalars_mont)
    digs = jax.jit(functools.partial(_window_digits, c=c, n_windows=n_windows))(sc)

    return _fixed_base_kernel(fld, c, n_windows)(base_pts, digs)


def _from_host_fn(fld):
    from . import curve as curve_mod

    if hasattr(fld, "from_host"):  # non-default curves (ops/bn_device.py)
        return fld.from_host
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
