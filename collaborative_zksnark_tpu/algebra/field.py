"""Device (JAX/TPU) prime-field arithmetic: limb-decomposed Montgomery form.

This is the TPU-native substrate for the prover hot loops — the analog of the
reference's `algebra/ff` (ark-ff fork) field arithmetic, re-designed for a
vector machine:

  * A field element is a little-endian vector of L base-2^16 digits ("limbs")
    stored as uint32, shape (..., L).  Fr (253-bit) uses L=16 (R = 2^256);
    Fq (377-bit) uses L=24 (R = 2^384) — the same Montgomery R as arkworks'
    64-bit-word representation, so Montgomery-form values agree numerically.
  * All ops are batched over the leading axes and are pure jnp — they run
    under jit/vmap/shard_map/pallas alike.  There is NO sequential carry
    loop: products are accumulated in redundant (up to 2^31 per digit) form
    and carries are resolved with a single relax round followed by a
    Kogge-Stone (generate/propagate) prefix scan of depth log2(L).
  * Montgomery multiplication = schoolbook convolution (unrolled over L,
    each step a full-batch VPU op) + REDC.  A fused Pallas kernel variant
    lives in ops/pallas_field.py and is used on TPU for the hot paths.

Reference semantics mirrored here (see SURVEY.md §2.2):
  - ark_ff `Field`/`PrimeField`/`FftField` ops: add/sub/neg/mul/square/inv,
    batch inversion (algebra/ff/src/fields/mod.rs), two-adic roots of unity.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 16
B = 1 << LIMB_BITS  # limb radix
MASK = B - 1
U32 = jnp.uint32


def int_to_limbs(x: int, n_limbs: int) -> np.ndarray:
    """Little-endian base-2^16 digits of a nonnegative int, as uint32."""
    assert x >= 0
    out = np.zeros((n_limbs,), dtype=np.uint32)
    for i in range(n_limbs):
        out[i] = x & MASK
        x >>= LIMB_BITS
    assert x == 0, "int does not fit in n_limbs"
    return out


def ints_to_limbs(xs, n_limbs: int) -> np.ndarray:
    """Vectorized int_to_limbs: list of ints -> (len, n_limbs) uint32.

    Uses int.to_bytes + frombuffer so conversion of 2^20-element twiddle /
    SRS tables stays in the milliseconds."""
    nbytes = n_limbs * 2
    buf = b"".join(int(x).to_bytes(nbytes, "little") for x in xs)
    u16 = np.frombuffer(buf, dtype="<u2").reshape(len(xs), n_limbs)
    return u16.astype(np.uint32)


def limbs_to_int(arr) -> int:
    arr = np.asarray(arr)
    assert arr.ndim == 1
    x = 0
    for i in range(arr.shape[0] - 1, -1, -1):
        x = (x << LIMB_BITS) | int(arr[i])
    return x


def limbs_to_ints(arr):
    arr = np.asarray(arr)
    flat = arr.reshape(-1, arr.shape[-1])
    return [limbs_to_int(row) for row in flat]


@dataclasses.dataclass(frozen=True, eq=False)
class FieldSpec:
    """Static description + precomputed constants of a prime field.
    eq=False keeps identity hashing (instances are singletons via `make`),
    so specs can key lru_caches of jitted kernels."""

    name: str
    p: int          # modulus
    L: int          # number of base-2^16 limbs; R = 2^(16 L)
    # numpy constants (uint32 limb vectors)
    p_limbs: np.ndarray
    twop_limbs: np.ndarray     # 2p (lazy-reduction bound)
    nprime_limbs: np.ndarray   # -p^{-1} mod R
    r2_limbs: np.ndarray       # R^2 mod p (to_mont multiplier)
    one_mont: np.ndarray       # R mod p (the unit in Montgomery form)
    zero: np.ndarray

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def make(name: str, p: int, L: int) -> "FieldSpec":
        Rint = 1 << (LIMB_BITS * L)
        assert p < Rint // 4, "need >= 2 spare bits so that 2p < R"
        nprime = (-pow(p, -1, Rint)) % Rint
        return FieldSpec(
            name=name,
            p=p,
            L=L,
            p_limbs=int_to_limbs(p, L),
            twop_limbs=int_to_limbs(2 * p, L),
            nprime_limbs=int_to_limbs(nprime, L),
            r2_limbs=int_to_limbs(Rint * Rint % p, L),
            one_mont=int_to_limbs(Rint % p, L),
            zero=np.zeros((L,), dtype=np.uint32),
        )

    # -- host-side conversions (Montgomery-form device arrays <-> ints) -----
    def to_device(self, xs) -> jnp.ndarray:
        """ints (any nesting) -> Montgomery-form uint32 limb array."""
        xs_arr = np.asarray(xs, dtype=object)
        flat = [int(v) % self.p for v in xs_arr.reshape(-1)]
        Rint = 1 << (LIMB_BITS * self.L)
        mont = [(v * Rint) % self.p for v in flat]
        out = ints_to_limbs(mont, self.L).reshape(xs_arr.shape + (self.L,))
        return jnp.asarray(out)

    def to_host(self, arr) -> np.ndarray:
        """Montgomery-form limb array -> numpy object array of ints."""
        arr = np.asarray(arr)
        Rinv = pow(1 << (LIMB_BITS * self.L), -1, self.p)
        vals = [v * Rinv % self.p for v in limbs_to_ints(arr)]
        out = np.empty((len(vals),), dtype=object)
        out[:] = vals
        return out.reshape(arr.shape[:-1])


# The two fields of the active curve (BLS12-377 default; see params.py).
from . import params as _C  # noqa: E402


def _limbs_for(p: int) -> int:
    """Smallest limb count with >= 2 spare bits (2p < R), as FieldSpec.make
    asserts: BLS12-377 Fr/Fq -> 16/24, BN254 Fr/Fq -> 16/16."""
    return -(-(p.bit_length() + 2) // LIMB_BITS)


FR = FieldSpec.make(f"{_C.CURVE}_fr", _C.R_MOD, _limbs_for(_C.R_MOD))
FQ = FieldSpec.make(f"{_C.CURVE}_fq", _C.Q_MOD, _limbs_for(_C.Q_MOD))


# ---------------------------------------------------------------------------
# Carry machinery
# ---------------------------------------------------------------------------

def _carry_scan(c):
    """Exact digit normalization of a redundant limb vector.

    Input: uint32 digits c with every digit <= 2B-2 (i.e. < 2^17 - 1).
    Output: (digits < B, carry_out) where carry_out is the carry out of the
    top limb.  Carries are resolved with a Kogge-Stone generate/propagate
    associative scan along the limb axis (depth log2 L) instead of a
    sequential ripple — fully parallel on the VPU.
    """
    G = (c >= B).astype(U32)        # generates carry even with no carry-in
    Pp = (c == (B - 1)).astype(U32)  # propagates an incoming carry
    # manual Kogge-Stone: fewer primitives than lax.associative_scan
    K = c.shape[-1]
    d = 1
    pad_cfg = [(0, 0)] * (c.ndim - 1)
    while d < K:
        Gs = jnp.pad(G[..., :-d], pad_cfg + [(d, 0)])                  # shift, fill 0
        Ps = jnp.pad(Pp[..., :-d], pad_cfg + [(d, 0)], constant_values=1)
        G = G | (Pp & Gs)
        Pp = Pp & Ps
        d <<= 1
    carry_in = jnp.pad(G[..., :-1], pad_cfg + [(1, 0)])
    d = c + carry_in
    d = jnp.where(d >= B, d - B, d)
    return d.astype(U32), G[..., -1]


def _relax(c, extra_limb=True):
    """One redistribution round: digits < 2^31  ->  digits <= B-1 + 2^15."""
    lo = c & MASK
    hi = c >> LIMB_BITS
    if extra_limb:
        lo = jnp.pad(lo, [(0, 0)] * (c.ndim - 1) + [(0, 1)])
    else:
        hi = hi[..., :-1]
    return lo.at[..., 1:].add(hi)


def normalize(c, n_out: int):
    """Redundant digits (each < 2^31) -> exact canonical digits mod B^n_out."""
    c = _relax(c)
    d, _ = _carry_scan(c)
    K = d.shape[-1]
    if K < n_out:
        d = jnp.pad(d, [(0, 0)] * (d.ndim - 1) + [(0, n_out - K)])
    return d[..., :n_out]


def _ge_sub(a, b_limbs_const):
    """Given canonical a (value < 2*b possibly) and constant b: return
    (a - b if a >= b else a).  Branchless: adds the two's-complement of b and
    selects on the carry-out."""
    K = a.shape[-1]
    comp = (MASK - b_limbs_const).astype(np.uint32)  # per-limb complement
    t = a + jnp.asarray(comp)[(None,) * (a.ndim - 1)]
    t = t.at[..., 0].add(1)  # +1 completes the two's complement
    # Digits can be up to 2B-1; one relax restores the _carry_scan bound.
    # The top limb's high bits are part of the overall carry-out (a >= b):
    # capture them before truncating to K limbs (mod B^K).
    lo = t & MASK
    hi = t >> LIMB_BITS
    top_hi = hi[..., -1]
    t = lo.at[..., 1:].add(hi[..., :-1])
    d, carry = _carry_scan(t)
    # carry-out == 1  <=>  a >= b  (no borrow)
    take = ((top_hi | carry) != 0)[..., None]
    return jnp.where(take, d, a)


# ---------------------------------------------------------------------------
# Schoolbook convolution (redundant output)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _conv_mats(La: int, Lb: int, K: int):
    """One-hot anti-diagonal scatter matrices for limb convolution."""
    m_lo = np.zeros((La * Lb, K), np.uint32)
    m_hi = np.zeros((La * Lb, K), np.uint32)
    for i in range(La):
        for j in range(Lb):
            if i + j < K:
                m_lo[i * Lb + j, i + j] = 1
            if i + j + 1 < K:
                m_hi[i * Lb + j, i + j + 1] = 1
    return m_lo, m_hi  # numpy (constants are materialized per-trace)


def _conv(a, b, n_out=None):
    """c_k = sum_{i+j=k} a_i b_j with deferred carries.

    a: (..., La), b: (..., Lb) canonical uint32 digits (< 2^16).
    Output (..., n_out or La+Lb) redundant digits < 2^23 (safe for
    normalize).

    Two formulations, chosen by backend at trace time:
      * TPU: outer product + two one-hot matmuls — 4 XLA ops regardless of
        L, and the matmuls ride the MXU.  (The Pallas kernel path replaces
        this on TPU hot loops anyway.)
      * CPU: shift-add schoolbook — XLA:CPU lowers integer matmuls to naive
        scalar loops (La*Lb*K mul-adds/element, ~50 us/element for Fq); the
        unrolled slice-add form is ~La*Lb vector ops and ~25x faster.
    """
    La = a.shape[-1]
    Lb = b.shape[-1]
    K = La + Lb if n_out is None else n_out
    outer = a[..., :, None] * b[..., None, :]   # u32 products, exact
    if jax.default_backend() == "cpu":
        lo = outer & MASK                       # (..., La, Lb) < 2^16
        hi = outer >> LIMB_BITS                 # < 2^16
        c = jnp.zeros(outer.shape[:-2] + (K,), U32)
        for i in range(La):
            wl = min(Lb, K - i)
            if wl > 0:
                c = c.at[..., i : i + wl].add(lo[..., i, :wl])
            wh = min(Lb, K - i - 1)
            if wh > 0:
                c = c.at[..., i + 1 : i + 1 + wh].add(hi[..., i, :wh])
        return c
    lo = (outer & MASK).reshape(outer.shape[:-2] + (La * Lb,))
    hi = (outer >> LIMB_BITS).reshape(outer.shape[:-2] + (La * Lb,))
    m_lo, m_hi = _conv_mats(La, Lb, K)
    return lo @ jnp.asarray(m_lo) + hi @ jnp.asarray(m_hi)


# ---------------------------------------------------------------------------
# Field ops.
#
# Lazy-reduction invariant: a stored element is a canonical little-endian
# digit vector (every digit < 2^16) whose VALUE lies in [0, 2p) — i.e. we do
# not reduce below p after Montgomery REDC (REDC output is < 2p whenever its
# inputs are, since p < R/4).  add/sub conditionally subtract 2p to stay
# closed.  Equality / zero tests and host conversion account for the p-offset
# ambiguity.  This keeps Montgomery multiplication at a SINGLE carry scan,
# which dominates both HLO-size (compile time) and latency.
# ---------------------------------------------------------------------------

def _relax2(c, n_out: int):
    """Redundant digits (< 2^31) -> digits <= B (note: <= B, not < B), value
    preserved mod B^n_out.  Cheaper than a full carry scan; output is a valid
    *convolution input* (products still fit in uint32 when the other operand
    is canonical)."""
    for _ in range(2):
        lo = c & MASK
        hi = c >> LIMB_BITS
        c = lo.at[..., 1:].add(hi[..., :-1])
    return c[..., :n_out]


def _ffi_suffix(spec: FieldSpec):
    """Native CPU backend routing: non-None iff the FFI library is loaded,
    the default backend is CPU, and the spec is one of the two baked-in
    BLS12-377 fields."""
    from . import ffi_field

    if not ffi_field.HAVE_FFI or jax.default_backend() != "cpu":
        return None
    return {"bls12_377_fr": "fr", "bls12_377_fq": "fq"}.get(spec.name)


def _add_impl(spec: FieldSpec, a, b):
    sfx = _ffi_suffix(spec)
    if sfx is not None:
        from . import ffi_field

        return ffi_field.binop(sfx, "add", a, b)
    s = a + b  # digits <= 2B-2; value < 4p < B^L
    d, _ = _carry_scan(s)
    return _ge_sub(d, spec.twop_limbs)


def _sub_impl(spec: FieldSpec, a, b):
    sfx = _ffi_suffix(spec)
    if sfx is not None:
        from . import ffi_field

        return ffi_field.binop(sfx, "sub", a, b)
    # a - b + 2p  (in (0, 4p)), via complement addition mod B^L
    comp = (MASK - b) + jnp.asarray(spec.twop_limbs)[(None,) * (b.ndim - 1)]
    t = a + comp
    t = t.at[..., 0].add(1)
    t = _relax(t, extra_limb=False)  # mod B^L: drops the +B^L from complement
    d, _ = _carry_scan(t)
    return _ge_sub(d, spec.twop_limbs)


@functools.lru_cache(maxsize=None)
def _op_kernel(spec: FieldSpec, name: str, sa, sb):
    """Shape-cached jitted binary field op.  Eagerly dispatching the ~30-op
    limb graphs costs ~10 ms per call on CPU; the jitted executable costs
    ~0.1 ms — this wrapper is THE difference between a usable and an
    unusable CPU test suite."""
    impl = {"add": _add_impl, "sub": _sub_impl, "mul": _mul_impl}[name]
    return jax.jit(functools.partial(impl, spec))


def _dispatch(spec: FieldSpec, name: str, a, b):
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if isinstance(a, jax.core.Tracer) or isinstance(b, jax.core.Tracer):
        # Already under a trace (kernel body): inline directly — nested-jit
        # wrappers would only add per-call tracing machinery.
        return {"add": _add_impl, "sub": _sub_impl, "mul": _mul_impl}[name](
            spec, a, b
        )
    return _op_kernel(spec, name, a.shape, b.shape)(a, b)


def add(spec: FieldSpec, a, b):
    if _route_pallas(a, b):
        from ..ops import pallas_field

        return pallas_field.add_flat(spec, a, b)
    return _dispatch(spec, "add", a, b)


def sub(spec: FieldSpec, a, b):
    if _route_pallas(a, b):
        from ..ops import pallas_field

        return pallas_field.sub_flat(spec, a, b)
    return _dispatch(spec, "sub", a, b)


def neg(spec: FieldSpec, a):
    zero = jnp.zeros_like(a)
    return sub(spec, zero, a)


import os as _os

_PALLAS_FLAG = _os.environ.get("CZTPU_PALLAS", "1") != "0"
_PALLAS_INTERPRET = _os.environ.get("CZTPU_PALLAS_INTERPRET", "0") == "1"


def _pallas_ok():
    if not _PALLAS_FLAG:
        return False
    if _PALLAS_INTERPRET:
        return True  # interpreter-mode kernels run on any backend (tests)
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _route_pallas(a, b):
    # On TPU every batched field op goes through the fused kernels — small
    # batches pad to one 128-lane tile; keeping ALL sites on the kernel path
    # keeps traced graphs uniformly tiny (scans/loops trace many sites).
    return _pallas_ok()


def mul(spec: FieldSpec, a, b):
    """Montgomery product REDC(a*b): single-carry-scan formulation.

    Inputs in [0, 2p) => T = a*b < 4p^2, S = T + m*p < 4p^2 + R*p < R^2
    (p < R/4), and the result S/R < 4p^2/R + p < 2p — closed, no final
    conditional subtraction needed.

    On TPU, large batches route through the fused Pallas kernel
    (ops/pallas_field.py) — same contract, VMEM-resident pipeline.
    """
    if _route_pallas(a, b):
        from ..ops import pallas_field

        return pallas_field.mul_flat(spec, a, b)
    return _dispatch(spec, "mul", a, b)


def _mul_impl(spec: FieldSpec, a, b):
    sfx = _ffi_suffix(spec)
    if sfx is not None:
        from . import ffi_field

        return ffi_field.binop(sfx, "mul", a, b)
    L = spec.L
    T = _conv(a, b)                                 # 2L redundant digits
    t_low = _relax2(T[..., :L], L)                  # T mod B^L, digits <= B
    m = _relax2(
        _conv(t_low, jnp.asarray(spec.nprime_limbs), n_out=L), L
    )                                               # digits <= B
    S = _conv(m, jnp.asarray(spec.p_limbs)) + T     # redundant, 2L digits
    Sn = normalize(S, 2 * L)                        # ONE carry scan
    return Sn[..., L:]                              # (T + m p)/R  in [0, 2p)


def canon(spec: FieldSpec, a):
    """[0,2p) -> fully reduced [0,p) (for comparisons / serialization)."""
    return _ge_sub(a, spec.p_limbs)


def sqr(spec: FieldSpec, a):
    return mul(spec, a, a)


def double(spec: FieldSpec, a):
    return add(spec, a, a)


def mul_small(spec: FieldSpec, a, k: int):
    """Multiply by a small public integer constant via repeated doubling."""
    assert k >= 0
    if k == 0:
        return jnp.zeros_like(a)
    acc = None
    base = a
    while k:
        if k & 1:
            acc = base if acc is None else add(spec, acc, base)
        k >>= 1
        if k:
            base = add(spec, base, base)
    return acc


def is_zero(spec: FieldSpec, a):
    # value in [0, 2p): zero iff digits are all-0 or equal p
    pl = jnp.asarray(spec.p_limbs)
    return jnp.all(a == 0, axis=-1) | jnp.all(a == pl, axis=-1)


def eq(spec: FieldSpec, a, b):
    return is_zero(spec, sub(spec, a, b))


def select(mask, a, b):
    """mask ? a : b — mask shape broadcastable to a.shape[:-1]."""
    return jnp.where(jnp.asarray(mask)[..., None], a, b)


def pow_int(spec: FieldSpec, a, e: int):
    """a^e for a host-known nonnegative int exponent, via fori_loop over the
    bits (traced once — jaxpr size independent of e)."""
    if e == 0:
        return jnp.broadcast_to(jnp.asarray(spec.one_mont), a.shape).astype(U32)
    nbits = e.bit_length()
    bits = jnp.asarray(
        np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], np.uint32)
    )

    def body(i, acc):
        acc = sqr(spec, acc)
        with_mul = mul(spec, acc, a)
        return select(bits[i] == 1, with_mul, acc)

    one = jnp.broadcast_to(jnp.asarray(spec.one_mont), a.shape).astype(U32)
    # first bit is always 1: start from a
    return jax.lax.fori_loop(1, nbits, body, a) if nbits > 1 else a


def inv(spec: FieldSpec, a):
    """Field inverse via Fermat (a^(p-2)); inv(0) = 0."""
    r = pow_int(spec, a, spec.p - 2)
    return select(is_zero(spec, a), jnp.zeros_like(a), r)


def batch_inv(spec: FieldSpec, a):
    """Montgomery batch inversion over the second-to-last axis.

    a: (..., N, L).  Zeros map to zeros (matching ark_ff::batch_inversion
    semantics, ref algebra/ff/src/fields/mod.rs).
    Cost: 2 prefix scans of muls + ONE field inversion.
    """
    one = jnp.asarray(spec.one_mont)
    zmask = is_zero(spec, a)
    safe = select(zmask, jnp.broadcast_to(one, a.shape), a)

    mulf = lambda x, y: mul(spec, x, y)
    prefix = jax.lax.associative_scan(mulf, safe, axis=-2)       # inclusive
    rev = jnp.flip(safe, axis=-2)
    suffix = jnp.flip(jax.lax.associative_scan(mulf, rev, axis=-2), axis=-2)
    total = prefix[..., -1, :]
    tinv = inv(spec, total)[..., None, :]

    # a_i^{-1} = prefix_{i-1} * suffix_{i+1} * total^{-1}
    sh = safe.shape
    ones_row = jnp.broadcast_to(one, sh[:-2] + (1, sh[-1])).astype(U32)
    pre_excl = jnp.concatenate([ones_row, prefix[..., :-1, :]], axis=-2)
    suf_excl = jnp.concatenate([suffix[..., 1:, :], ones_row], axis=-2)
    out = mul(spec, mul(spec, pre_excl, suf_excl), tinv)
    return select(zmask, jnp.zeros_like(a), out)


def fold_sum(spec: FieldSpec, arr, axis: int = -2):
    """Field-sum along `axis` by pairwise halving (log2 N batched adds)."""
    arr = jnp.moveaxis(arr, axis, 0)
    n = arr.shape[0]
    m = 1
    while m < n:
        m <<= 1
    if m != n:
        arr = jnp.concatenate(
            [arr, jnp.zeros((m - n,) + arr.shape[1:], arr.dtype)], axis=0
        )
    while m > 1:
        half = m // 2
        arr = add(spec, arr[:half], arr[half:])
        m = half
    return arr[0]


def to_mont(spec: FieldSpec, a_std):
    return mul(spec, a_std, jnp.asarray(spec.r2_limbs))


def from_mont(spec: FieldSpec, a):
    """Montgomery -> standard form, fully reduced (canonical < p)."""
    one_std = np.zeros((spec.L,), np.uint32)
    one_std[0] = 1
    return canon(spec, mul(spec, a, jnp.asarray(one_std)))


def rand(spec: FieldSpec, rng: np.random.Generator, shape=()):
    """Host-side uniform field elements, returned in Montgomery device form."""
    n = int(np.prod(shape)) if shape else 1
    out = []
    for _ in range(n):
        v = 0
        for _ in range((spec.p.bit_length() + 59) // 60):
            v = (v << 60) | int(rng.integers(0, 1 << 60))
        out.append(v % spec.p)
    arr = ints_to_limbs([(v << (LIMB_BITS * spec.L)) % spec.p for v in out], spec.L)
    return jnp.asarray(arr.reshape(shape + (spec.L,)))
