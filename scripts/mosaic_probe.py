"""Mosaic capability probe for the fused digit-NTT kernel design.

Checks, each as a tiny standalone pallas_call on the real TPU:
  1. minor-dim transpose (rows, 128, 16) u32 -> (rows, 16, 128)   [limb load]
  2. off-lane transpose/reshape of 4-D int8 (lanes untouched)      [stage regroup]
  3. dot_general int8 x int8 -> int32 (2-D operands)               [MXU butterfly]
  4. sublane-ish axis-0 slices/pads on (46, S, 128) int32          [relax/KS]
  5. int8 state updated in VMEM scratch across two matmul rounds   [multi-stage]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        fn()
        print(f"PASS {name}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)


def t1_minor_transpose():
    def kern(x_ref, o_ref):
        o_ref[:, :, :] = jnp.transpose(x_ref[:, :, :], (0, 2, 1))

    x = jnp.arange(8 * 128 * 16, dtype=jnp.uint32).reshape(8, 128, 16)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 16, 128), jnp.uint32),
    )(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x).transpose(0, 2, 1))


def t2_offlane_transpose():
    def kern(x_ref, o_ref):
        v = x_ref[:, :, :, :]                      # (4, 8, 16, 128) int8
        o_ref[:, :, :, :] = jnp.transpose(v, (2, 0, 1, 3))

    x = jnp.arange(4 * 8 * 16 * 128, dtype=jnp.int32).astype(jnp.int8).reshape(
        4, 8, 16, 128
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((16, 4, 8, 128), jnp.int8),
    )(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x).transpose(2, 0, 1, 3))


def t3_int8_matmul():
    def kern(a_ref, b_ref, o_ref):
        o_ref[:, :] = jax.lax.dot_general(
            a_ref[:, :], b_ref[:, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-80, 80, (688, 736), dtype=np.int8))
    b = jnp.asarray(rng.integers(-80, 80, (736, 1024), dtype=np.int8))
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((688, 1024), jnp.int32)
    )(a, b)
    exp = np.asarray(a, np.int32) @ np.asarray(b, np.int32)
    np.testing.assert_array_equal(np.asarray(out), exp)


def t4_axis0_relax():
    def kern(x_ref, o_ref):
        x = x_ref[:, :, :]
        for _ in range(3):
            lo = x & 63
            hi = x >> 6
            x = lo + jnp.pad(hi[:-1], ((1, 0), (0, 0), (0, 0)))
        o_ref[:, :, :] = x

    x = jnp.asarray(
        np.random.default_rng(1).integers(0, 1 << 22, (46, 32, 128), np.int32)
    )
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((46, 32, 128), jnp.int32)
    )(x)
    ex = np.asarray(x)
    for _ in range(3):
        lo = ex & 63
        hi = ex >> 6
        ex = lo + np.pad(hi[:-1], ((1, 0), (0, 0), (0, 0)))
    np.testing.assert_array_equal(np.asarray(out), ex)


def t5_scratch_state():
    A1 = np.random.default_rng(2).integers(-3, 4, (64, 64), np.int8)
    A2 = np.random.default_rng(3).integers(-3, 4, (64, 64), np.int8)

    def kern(x_ref, a1_ref, a2_ref, o_ref, st_ref):
        st_ref[:, :] = x_ref[:, :]
        y = jax.lax.dot_general(
            a1_ref[:, :], st_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        st_ref[:, :] = (y & 15).astype(jnp.int8)
        y = jax.lax.dot_general(
            a2_ref[:, :], st_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        o_ref[:, :] = y

    x = jnp.asarray(
        np.random.default_rng(4).integers(-3, 4, (64, 256), np.int8)
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((64, 256), jnp.int32),
        scratch_shapes=[pltpu.VMEM((64, 256), jnp.int8)],
    )(x, jnp.asarray(A1), jnp.asarray(A2))
    ex = A2.astype(np.int32) @ (
        (A1.astype(np.int32) @ np.asarray(x, np.int32)) & 15
    )
    np.testing.assert_array_equal(np.asarray(out), ex)


def t6_manual_dma():
    def kern(x_hbm, o_ref, scratch, sem):
        dma = pltpu.make_async_copy(x_hbm.at[:, 0:128], scratch, sem)
        dma.start()
        dma.wait()
        o_ref[:, :] = scratch[:, :] + 1

    x = jnp.arange(32 * 256, dtype=jnp.int32).reshape(32, 256)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        scratch_shapes=[
            pltpu.VMEM((32, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[:, :128] + 1)


def t7_int8_sublane_pad_concat():
    # (16, 43, C) int32 -> pad axis 1 to 46, swap axes 0/1 (off-lane)
    def kern(x_ref, o_ref):
        v = x_ref[:, :, :]
        v = jnp.pad(v, ((0, 0), (0, 3), (0, 0)))
        o_ref[:, :, :] = jnp.transpose(v, (1, 0, 2)).astype(jnp.int8)

    x = jnp.asarray(
        np.random.default_rng(5).integers(0, 64, (16, 43, 128), np.int32)
    )
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((46, 16, 128), jnp.int8)
    )(x)
    ex = np.pad(np.asarray(x), ((0, 0), (0, 3), (0, 0))).transpose(1, 0, 2)
    np.testing.assert_array_equal(np.asarray(out), ex.astype(np.int8))


if __name__ == "__main__":
    run("t1_minor_transpose_u32_128x16", t1_minor_transpose)
    run("t2_offlane_transpose_int8_4d", t2_offlane_transpose)
    run("t3_int8_matmul_688x736", t3_int8_matmul)
    run("t4_axis0_relax_int32", t4_axis0_relax)
    run("t5_scratch_state_two_matmuls", t5_scratch_state)
    run("t6_manual_dma_hbm_slice", t6_manual_dma)
    run("t7_pad_swap_int32_to_int8", t7_int8_sublane_pad_concat)


def t8_lane_transpose_int8():
    # pass-1 boundary write: (48, 256, 128) int8 -> (48, 128, 256)
    def kern(x_ref, o_ref):
        o_ref[:, :, :] = jnp.transpose(x_ref[:, :, :], (0, 2, 1))

    x = jnp.asarray(
        np.random.default_rng(6).integers(-80, 81, (48, 256, 128), np.int8)
    )
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((48, 128, 256), jnp.int8)
    )(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x).transpose(0, 2, 1))


def t9_stage_regroup_6d():
    # stage regroup on (48, 256, 128): (48, b, u, rhi, rlo, 128) transposes
    def kern(x_ref, o_ref):
        v = x_ref[:, :, :]                       # (48, 256, 128)
        v = v.reshape(48, 1, 16, 4, 4, 128)      # b=1, u=16, rhi=4, rlo=4
        v = jnp.transpose(v, (2, 4, 0, 1, 3, 5)) # (u, rlo, 48, b, rhi, 128)
        o_ref[:, :, :] = v.reshape(16 * 4, 48, 128)

    x = jnp.asarray(
        np.random.default_rng(7).integers(-80, 81, (48, 256, 128), np.int8)
    )
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((64, 48, 128), jnp.int8)
    )(x)
    ex = (
        np.asarray(x)
        .reshape(48, 1, 16, 4, 4, 128)
        .transpose(2, 4, 0, 1, 3, 5)
        .reshape(64, 48, 128)
    )
    np.testing.assert_array_equal(np.asarray(out), ex)


def t10_batched_dot_general():
    # tw1-style batched matmul: batch (16,4), lhs (16,4,43,48), rhs (16,4,48,128)
    rng = np.random.default_rng(8)
    A = rng.integers(-63, 64, (16, 4, 43, 48), np.int8)
    X = rng.integers(-80, 81, (16, 4, 48, 128), np.int8)

    def kern(a_ref, x_ref, o_ref):
        o_ref[:, :, :, :] = jax.lax.dot_general(
            a_ref[:, :, :, :], x_ref[:, :, :, :],
            (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32,
        )

    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((16, 4, 43, 128), jnp.int32)
    )(jnp.asarray(A), jnp.asarray(X))
    ex = np.einsum("budl,bulc->budc", A.astype(np.int64), X.astype(np.int64))
    np.testing.assert_array_equal(np.asarray(out), ex.astype(np.int32))

import sys as _s
if "t8" in _s.argv:
    run("t8_lane_transpose_int8", t8_lane_transpose_int8)
    run("t9_stage_regroup_6d", t9_stage_regroup_6d)
    run("t10_batched_dot_general", t10_batched_dot_general)
