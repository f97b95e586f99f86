"""Quick TPU profiling of the MSM/NTT hot paths (status-quo breakdown)."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "tpu"
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
print("devices:", jax.devices(), file=sys.stderr, flush=True)

import jax.numpy as jnp
import numpy as np

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.algebra import hostfield as H
from collaborative_zksnark_tpu.ops import curve as cv
from collaborative_zksnark_tpu.ops import msm as msm_mod
from collaborative_zksnark_tpu.ops import ntt

P = C.R_MOD
rng = np.random.default_rng(0)


def timeit(label, fn, reps=3):
    fn()  # compile+warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt*1e3:.2f} ms", file=sys.stderr, flush=True)
    return dt


# ---- field op costs at 2^16 x 24 limbs (Fq) ------------------------------
n = 1 << 16
aq = F.rand(F.FQ, rng, (n,))
bq = F.rand(F.FQ, rng, (n,))
timeit("fq_mul 2^16", jax.jit(lambda: F.mul(F.FQ, aq, bq)))
timeit("fq_add 2^16", jax.jit(lambda: F.add(F.FQ, aq, bq)))

# ---- point add cost at 2^16 ----------------------------------------------
sc0 = F.rand(F.FR, rng, (n,))
pts = msm_mod.fixed_base_msm(cv.FQ_OPS, H.G1, H.G1_GEN, sc0, c=8)
jax.block_until_ready(pts.x)
print("points built", file=sys.stderr, flush=True)
pts2 = cv.JacPoint(jnp.roll(pts.x, 1, 0), jnp.roll(pts.y, 1, 0), jnp.roll(pts.z, 1, 0))
timeit("g1_add 2^16", jax.jit(lambda: cv.point_add(cv.FQ_OPS, pts, pts2).x))

# ---- MSM sub-phases at 2^16, c=8 ----------------------------------------
sc = F.rand(F.FR, rng, (n,))
c = 8
n_windows = (253 + c - 1) // c

f_std = jax.jit(lambda s: msm_mod._scalar_bits_standard(s))
timeit("from_mont scalars", lambda: f_std(sc))
sc_std = f_std(sc)

f_dig = jax.jit(lambda s: msm_mod._window_digits(s, c, n_windows))
timeit("window digits", lambda: f_dig(sc_std))
digs = f_dig(sc_std)

f_sort = jax.jit(lambda d: jax.vmap(jnp.argsort)(d))
timeit("argsort WxN", lambda: f_sort(digs))
order = f_sort(digs)

seg = jnp.concatenate(
    [jnp.ones((n_windows, 1), jnp.int32),
     (jnp.take_along_axis(digs, order, 1)[:, 1:] != jnp.take_along_axis(digs, order, 1)[:, :-1]).astype(jnp.int32)],
    axis=1,
)


def gather_pts(o):
    return cv.JacPoint(
        jnp.take(pts.x, o, axis=0), jnp.take(pts.y, o, axis=0), jnp.take(pts.z, o, axis=0)
    )


f_gather = jax.jit(lambda o: gather_pts(o).x)
timeit("gather points WxN", lambda: f_gather(order))

f_scan = jax.jit(
    lambda o, s: jax.vmap(lambda oo, ss: msm_mod._segmented_scan_points(cv.FQ_OPS, gather_pts(oo), ss).x)(o, s)
)
timeit("segscan WxN", lambda: f_scan(order, seg), reps=1)

# full MSM
timeit("MSM 2^16 c=8 full", lambda: msm_mod.msm_pippenger(cv.FQ_OPS, pts, sc, c=8).x, reps=1)

# ---- NTT 2^20 -------------------------------------------------------------
m = 1 << 20
dom = ntt.get_radix2_domain(m)
big = F.rand(F.FR, rng, (m,))
timeit("NTT 2^20", lambda: dom.fft(big), reps=2)
