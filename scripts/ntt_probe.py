"""Where do the NTT 2^20 milliseconds go?  Times, on the real TPU:
  * full dom.fft at 2^20
  * 20x butterfly_flat on (2^19, L) element-major inputs (kernel + relayout)
  * 20x the bare _butterfly_kernel on pre-planed arrays (kernel only)
  * 20x the to_planes/from_planes relayout alone
Run: python scripts/ntt_probe.py
"""

import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("JAX_PLATFORMS", "tpu")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu"),
)

from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.ops import ntt
from collaborative_zksnark_tpu.ops import pallas_field as PF

FR = F.FR
rng = np.random.default_rng(0)
n = 1 << 20
h = n // 2

STAGES = 20


def land(out):
    """Materialize a TINY dependent slice (tunnel transfer must stay small)."""
    leaf = jax.tree.leaves(out)[0]
    sl = leaf[(slice(0, 1),) * leaf.ndim]
    np.asarray(sl)


def timeit(name, f, *args, reps=3):
    out = f(*args)
    land(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    land(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.1f} ms")
    return dt


# full fft
dom = ntt.get_radix2_domain(n)
big = F.rand(FR, rng, (n,))
timeit("fft 2^20 (full)", dom.fft, big)

lo = F.rand(FR, rng, (h,))
hi = F.rand(FR, rng, (h,))
tw = F.rand(FR, rng, (h,))


@jax.jit
def chain_butterfly(lo, hi, tw):
    for _ in range(STAGES):
        lo, hi = PF.butterfly_flat(FR, lo, hi, tw)
    return lo, hi


timeit(f"{STAGES}x butterfly_flat (kernel+relayout)", chain_butterfly, lo, hi, tw)

lp, T = PF.to_planes(FR, lo)
hp, _ = PF.to_planes(FR, hi)
tp, _ = PF.to_planes(FR, tw)
kern = PF._butterfly_kernel(FR, lp.shape[2] // T, T)


@jax.jit
def chain_kernel(lp, hp, tp):
    for _ in range(STAGES):
        lp, hp = kern(lp, hp, tp)
    return lp, hp


timeit(f"{STAGES}x bare butterfly kernel (planes)", chain_kernel, lp, hp, tp)


@jax.jit
def chain_relayout(x):
    for _ in range(STAGES):
        p, T2 = PF.to_planes(FR, x)
        x = PF.from_planes(FR, p, x.shape[0], T2)
    return x


timeit(f"{STAGES}x to/from_planes roundtrip", chain_relayout, lo)

# stage-structure overhead: reshape/slice/concat as in _butterflies, no math
@jax.jit
def chain_stageglue(x):
    nn = x.shape[0]
    for s in range(1, 21):
        m = 1 << s
        hh = m >> 1
        xb = x.reshape((nn // m, m, FR.L))
        a, b = xb[:, :hh], xb[:, hh:]
        x = jnp.concatenate([a, b], axis=1).reshape((nn, FR.L))
    return x


timeit("20-stage slice/concat glue (no math)", chain_stageglue, big)
