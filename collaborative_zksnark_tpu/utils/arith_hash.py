"""Device-friendly collision-resistant hashing over Fr (MiMC-style).

The reference's atomic broadcast commits with SHA-256 on the host
(ref mpc-algebra/src/channel.rs:50-75,88-92).  Inside jit/shard_map a
bit-oriented hash is not expressible, so the TPU-native redesign commits
with an ALGEBRAIC hash: the MiMC_x^d block cipher in Davies-Meyer mode,
folded over the payload with a binary Merkle tree so every level is one
batched field power — O(log N) sequential depth, fully vectorized.

MiMC (Albrecht et al., AC'16): E_k(x) = r_R where r_0 = x and
r_{i+1} = (r_i + k + c_i)^d, with d the smallest exponent coprime to
r - 1 (d = 11 for BLS12-377 Fr, where gcd(3,5,7 , r-1) != 1) and
R = ceil(log_d r) rounds.  Compression: H(a, b) = E_b(a) + a + b
(Davies-Meyer / Miyaguchi-Preneel flavor).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra import params as C
from ..algebra import field as F
from ..algebra.field import FR

P = C.R_MOD


@functools.lru_cache(maxsize=None)
def _params():
    d = 3
    while True:
        from math import gcd

        if gcd(d, P - 1) == 1:
            break
        d += 2
    # rounds: ceil(log_d(P))
    rounds = 1
    acc = d
    while acc < P:
        acc *= d
        rounds += 1
    rng = np.random.default_rng(0x4D694D43)  # fixed public constants
    consts = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(rounds)]
    Rint = 1 << (F.LIMB_BITS * FR.L)
    mont = F.ints_to_limbs([v * Rint % P for v in consts], FR.L)
    return d, rounds, mont  # numpy (host) — safe to cache across traces


def _pow_d(x, d: int):
    """x^d with a short addition chain (d is small and odd)."""
    result = None
    base = x
    e = d
    while e:
        if e & 1:
            result = base if result is None else F.mul(FR, result, base)
        e >>= 1
        if e:
            base = F.mul(FR, base, base)
    return result


def mimc_compress(a, b):
    """H(a, b) for (..., L) Montgomery field arrays (batched)."""
    d, rounds, consts = _params()
    r = a
    for i in range(rounds):
        t = F.add(FR, F.add(FR, r, b), consts[i])
        r = _pow_d(t, d)
    return F.add(FR, F.add(FR, r, a), b)


def pack_stream(raw, batch_dims: int = 0):
    """Pack an arbitrary uint32 digit stream (entries < 2^16, e.g. field
    limb arrays of ANY limb count) into (..., M, L) Fr elements: 8 digits
    (128 bits) per element — injective, value < 2^128 < r."""
    lead = raw.shape[:batch_dims]
    flat = raw.reshape(lead + (-1,))
    k = flat.shape[-1]
    m = -(-k // 8)
    pad = [(0, 0)] * len(lead) + [(0, m * 8 - k)]
    flat = jnp.pad(flat, pad)
    els = flat.reshape(lead + (m, 8))
    return jnp.pad(els, [(0, 0)] * (len(lead) + 1) + [(0, FR.L - 8)])


def _tree_hash_impl(vec, salt):
    x = vec
    n = x.shape[-2]
    while n > 1:
        if n % 2 == 1:
            pad = [(0, 0)] * x.ndim
            pad[-2] = (0, 1)
            x = jnp.pad(x, pad)
            n += 1
        h = n // 2
        x = mimc_compress(x[..., 0::2, :], x[..., 1::2, :])
        n = h
    return mimc_compress(x[..., 0, :], salt)


@functools.lru_cache(maxsize=None)
def _tree_hash_jit(shape_v, shape_s):
    return jax.jit(_tree_hash_impl)


def tree_hash(vec, salt):
    """One Fr digest of a (..., N, L) payload with a leading (..., L) salt.

    Binary-tree fold (log2 N batched compressions), then a final
    compression with the salt — the 32-byte-salt commit of the reference
    (channel.rs:56-58) in algebraic form.

    Eager call sites run a shape-cached jitted tree (the ~log2(N) x 74-round
    MiMC pipeline is thousands of ops — per-op dispatch made SPDZ's atomic
    broadcast the dominant prover cost); traced call sites inline."""
    if isinstance(vec, jax.core.Tracer) or isinstance(salt, jax.core.Tracer):
        return _tree_hash_impl(vec, salt)
    return _tree_hash_jit(vec.shape, salt.shape)(vec, salt)
