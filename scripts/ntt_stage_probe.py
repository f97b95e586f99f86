"""Decompose the NTT's per-stage 3.7 ms @2^20: how much is the butterfly
kernel itself (VPU multiply floor) vs XLA-level relayout/pairing traffic?

Measures, on the real chip:
  1. chained butterfly kernel on FIXED (L,8,C) planes (no pairing, no
     relayout) — the pure per-stage kernel floor;
  2. chained k_mul-only kernel (the mul component alone);
  3. dom.fft reference (the production loop).

Also compile-probes the in-kernel lane-manipulation primitives the fused
multi-stage kernel would need (lane-dim reshape, strided slice, roll).
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), file=sys.stderr)

from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.algebra.field import FR
from collaborative_zksnark_tpu.ops import ntt
from collaborative_zksnark_tpu.ops import pallas_field as PF

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
n = 1 << 20
HALF = n // 2  # butterfly width per stage

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, reps=3):
    y = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(y)[0]).reshape(-1)[:1]
    t0 = time.perf_counter()
    out = args
    y = fn(*args)
    for _ in range(reps - 1):
        y = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(y)[0].reshape(-1)[:1])
    return (time.perf_counter() - t0) / reps


# ---- 1. pure butterfly chain (no relayout) --------------------------------
lo = F.rand(FR, rng, (HALF,))
lop, T = PF.to_planes(FR, lo)
hip, _ = PF.to_planes(FR, F.rand(FR, rng, (HALF,)))
twp, _ = PF.to_planes(FR, F.rand(FR, rng, (HALF,)))
nt = lop.shape[2] // T
kern = PF._butterfly_kernel(FR, nt, T)


@jax.jit
def chain_butterfly(lo, hi, tw):
    for _ in range(10):
        lo, hi = kern(lo, hi, tw)
    return lo, hi


dt = timeit(chain_butterfly, lop, hip, twp)
log(f"1. butterfly kernel (no relayout): {dt/10*1e3:.2f} ms/stage "
    f"-> {HALF/(dt/10)/1e6:.0f} M muls/s")

# ---- 2. mul-only chain ------------------------------------------------------
mk = PF._binop_kernel(FR, "mul", nt, T)


@jax.jit
def chain_mul(a, b):
    for _ in range(10):
        a = mk(a, b)
    return a


dt = timeit(chain_mul, lop, twp)
log(f"2. k_mul only: {dt/10*1e3:.2f} ms/half-stage-width "
    f"-> {HALF/(dt/10)/1e6:.0f} M muls/s")

# ---- 3. production fft ------------------------------------------------------
dom = ntt.get_radix2_domain(n)
big = F.rand(FR, rng, (n,))
dt = timeit(dom.fft, big)
log(f"3. dom.fft 2^20: {dt*1e3:.1f} ms ({dt/20*1e3:.2f} ms/stage)")

# ---- 4. Mosaic lane-manipulation probes ------------------------------------
L = FR.L


def probe(name, body):
    def kernel(x_ref, o_ref):
        o_ref[:, :, :] = body(x_ref[:, :, :])

    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, 8, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        x = jnp.arange(L * 8 * 128, dtype=jnp.uint32).reshape(L, 8, 128)
        y = np.asarray(jax.jit(fn)(x))
        log(f"4. {name}: OK")
        return y
    except Exception as e:
        log(f"4. {name}: FAIL — {type(e).__name__}: {str(e)[:200]}")
        return None


probe("lane reshape split (L,8,128)->(L,8,2,64)->swap-> back",
      lambda x: x.reshape(L, 8, 2, 64)[:, :, ::-1].reshape(L, 8, 128))
probe("lane strided slice x[..., 0::2] tiled back",
      lambda x: jnp.concatenate([x[..., 0::2], x[..., 1::2]], axis=-1))
probe("lane roll by 32",
      lambda x: jnp.roll(x, 32, axis=-1))
probe("sublane reshape (L,8,128)->(L,2,4,128) swap",
      lambda x: x.reshape(L, 2, 4, 128)[:, ::-1].reshape(L, 8, 128))
probe("5D reshape (L,8,4,2,16) swap pairs",
      lambda x: x.reshape(L, 8, 4, 2, 16)[:, :, :, ::-1].reshape(L, 8, 128))
