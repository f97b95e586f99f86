"""Raw VPU op-throughput probe on the axon TPU.

Measures, via long in-kernel chains (fori_loop body = one op class), the
per-op cost of the primitive classes the Montgomery kernels are built from:
  * u32 multiply            (the CIOS product ops)
  * u32 add / and / shift   (carry bookkeeping)
  * f32 multiply-add        (candidate 8-bit-limb schoolbook formulation)
  * axis-0 shift (pad+slice relayout of an (L, 8, 512) slab)
and the production k_mul for FR/FQ, all at the same (L, 8, 512) geometry.

Run: python scripts/vpu_probe.py  (needs the axon TPU)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.ops import pallas_field as PF

CHAIN = int(__import__("os").environ.get("CHAIN", 512))
L, S, T = 24, 8, 512  # Fq-sized slab


def timed(name, fn, *args, reps=3, work_ops=1):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])[:1]
    dt = (time.perf_counter() - t0) / reps / CHAIN
    per_op = dt / work_ops
    lanes = S * T
    print(
        f"{name:28s} {dt*1e6:9.2f} us/iter  {per_op*1e9:8.2f} ns/op "
        f"-> {lanes/per_op/1e9:8.2f} G lane-ops/s",
        flush=True,
    )
    return per_op


def chain_kernel(body, n_ops, dtype=jnp.uint32, shape=(L, S, T)):
    """pallas kernel: out = body applied CHAIN times to (a, b)."""

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]

        def step(_, x):
            return body(x, b)

        o_ref[...] = jax.lax.fori_loop(0, CHAIN, step, a)

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.jit(fn), n_ops


def f32_cios_mul(spec, a16, b16):
    """Candidate formulation: Montgomery CIOS in base 2^8 with f32 FMAs.

    Inputs/outputs in the production format: (L16, S, T) u32 planes of
    16-bit limbs, values canonical in [0, 2p).  Internally: 8-bit limbs as
    f32 (exact: every digit stays < 2^23, every product < 2^16, so all FMA
    adds are exact integer arithmetic in f32's 24-bit mantissa).
    Per-step cost is 2 FMA row-ops per limb row + O(1) scalar-row fixups —
    about 2*L8^2 FMAs total vs the u32 kernel's ~9*L16^2 mixed ops.
    """
    L16 = spec.L
    L8 = 2 * L16
    # u16 limbs -> interleaved 8-bit f32 limbs
    # mosaic has no u32<->f32 cast; hop through i32 (values < 2^16, exact)
    lo = (a16 & 0xFF).astype(jnp.int32).astype(jnp.float32)
    hi = (a16 >> 8).astype(jnp.int32).astype(jnp.float32)
    af = jnp.stack([lo, hi], axis=1).reshape((L8,) + a16.shape[1:])
    lo = (b16 & 0xFF).astype(jnp.int32).astype(jnp.float32)
    hi = (b16 >> 8).astype(jnp.int32).astype(jnp.float32)
    bf = jnp.stack([lo, hi], axis=1).reshape((L8,) + b16.shape[1:])

    p_limbs8 = []
    p_int = spec.p
    for _ in range(L8):
        p_limbs8.append(p_int & 0xFF)
        p_int >>= 8
    np0 = (-pow(spec.p, -1, 1 << 8)) % (1 << 8)
    one = (1,) + af.shape[1:]
    p_col = jnp.concatenate(
        [jnp.full(one, float(c), jnp.float32) for c in p_limbs8], axis=0
    )

    zero_row = jnp.zeros(one, jnp.float32)
    acc = jnp.zeros((L8 + 1,) + af.shape[1:], jnp.float32)
    inv256 = jnp.float32(1.0 / 256.0)
    c256 = jnp.float32(256.0)
    npf = jnp.float32(float(np0))
    for i in range(L8):
        ai = jax.lax.slice_in_dim(af, i, i + 1, axis=0)
        acc = acc + jnp.concatenate([ai * bf, zero_row], axis=0)
        t0 = jax.lax.slice_in_dim(acc, 0, 1, axis=0)
        t0m = t0 - jnp.floor(t0 * inv256) * c256
        tm = t0m * npf
        m = tm - jnp.floor(tm * inv256) * c256
        acc = acc + jnp.concatenate([m * p_col, zero_row], axis=0)
        carry = jnp.floor(jax.lax.slice_in_dim(acc, 0, 1, axis=0) * inv256)
        acc = jnp.concatenate(
            [jax.lax.slice_in_dim(acc, 1, L8 + 1, axis=0), zero_row], axis=0
        )
        acc = jnp.concatenate(
            [jax.lax.slice_in_dim(acc, 0, 1, axis=0) + carry,
             jax.lax.slice_in_dim(acc, 1, L8 + 1, axis=0)], axis=0
        )
    # float carry resolution: digits < 2^23 -> < 2^8
    for _ in range(3):
        hi = jnp.floor(acc * inv256)
        acc = acc - hi * c256 + jnp.concatenate([zero_row, hi[:-1]], axis=0)
    # NOTE: value may still be >= 2p (redundant top digit); the production
    # version would fold the top and conditionally subtract — omitted here,
    # the probe measures cost, and correctness is checked mod 2^(8*L8) only.
    d = jax.lax.slice_in_dim(acc, 0, L8, axis=0).astype(jnp.int32).astype(jnp.uint32)
    d = d.reshape((L16, 2) + a16.shape[1:])
    ev = jnp.squeeze(jax.lax.slice_in_dim(d, 0, 1, axis=1), 1)
    od = jnp.squeeze(jax.lax.slice_in_dim(d, 1, 2, axis=1), 1)
    return ev + (od << 8)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    a32 = jnp.asarray(rng.integers(0, 1 << 16, (L, S, T)), jnp.uint32)
    b32 = jnp.asarray(rng.integers(1, 1 << 16, (L, S, T)), jnp.uint32)
    af = jnp.asarray(rng.random((L, S, T)), jnp.float32)
    bf = jnp.asarray(rng.random((L, S, T)), jnp.float32) + 1.0
    a16 = a32.astype(jnp.uint16)
    b16 = b32.astype(jnp.uint16)

    # raw op classes (L rows per iter -> work_ops=L row-ops)
    f, n = chain_kernel(lambda x, b: x * b, L)
    timed("u32 mul", f, a32, b32, work_ops=n)
    f, n = chain_kernel(lambda x, b: x * b + b, L)
    timed("u32 mul+add", f, a32, b32, work_ops=n)
    f, n = chain_kernel(lambda x, b: x + b, L)
    timed("u32 add", f, a32, b32, work_ops=n)
    f, n = chain_kernel(lambda x, b: (x >> 8) ^ b, L)
    timed("u32 shr+xor", f, a32, b32, work_ops=n)
    f, n = chain_kernel(lambda x, b: x * b + b, L, jnp.float32)
    timed("f32 fma", f, af, bf, work_ops=n)
    f, n = chain_kernel(
        lambda x, b: x * b - jnp.floor(x * b * (1.0 / 256.0)) * 256.0,
        L,
        jnp.float32,
    )
    timed("f32 mulmod256 (3op)", f, af, bf, work_ops=n)
    f, n = chain_kernel(lambda x, b: x.astype(jnp.uint32).astype(jnp.uint16) + b, L, jnp.uint16)
    timed("u16 roundtrip add", f, a16, b16, work_ops=n)

    # axis-0 shift relayout (pad top, drop last) — the CIOS acc shift
    f, n = chain_kernel(lambda x, b: PF._shift_up1(x) + b, L)
    timed("axis0 shift + add", f, a32, b32, work_ops=n)

    # production Montgomery muls
    for name, spec in (("FR", F.FR), ("FQ", F.FQ)):
        l = spec.L
        aa = jnp.asarray(rng.integers(0, 1 << 16, (l, S, T)), jnp.uint32)
        bb = jnp.asarray(rng.integers(1, 1 << 16, (l, S, T)), jnp.uint32)

        def kern(a_ref, b_ref, o_ref, spec=spec):
            a = a_ref[...]
            b = b_ref[...]

            def step(_, x):
                return PF.k_mul(spec, x, b)

            o_ref[...] = jax.lax.fori_loop(0, CHAIN, step, a)

        fn = jax.jit(
            pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((l, S, T), jnp.uint32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
        )
        per = timed(f"k_mul {name} (L={l})", fn, aa, bb)
        print(
            f"  -> {S*T/per/1e6:.1f} M {name}-muls/s/core-chain",
            flush=True,
        )

        def kern_f32(a_ref, b_ref, o_ref, spec=spec):
            a = a_ref[...]
            b = b_ref[...]

            def step(_, x):
                return f32_cios_mul(spec, x, b)

            o_ref[...] = jax.lax.fori_loop(0, CHAIN, step, a)

        fnf = jax.jit(
            pl.pallas_call(
                kern_f32,
                out_shape=jax.ShapeDtypeStruct((l, S, T), jnp.uint32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
        )
        per = timed(f"f32cios {name} (L8={2*l})", fnf, aa, bb)
        print(
            f"  -> {S*T/per/1e6:.1f} M {name}-muls/s/core-chain (f32 CIOS)",
            flush=True,
        )


if __name__ == "__main__":
    main()
