"""Chunk-level bisect of the G2 MSM mismatch at padded-2^20 (logn=19 pk).

  python scripts/bisect_g2msm.py tpu   # TPU pippenger per-chunk + edge cases
  python scripts/bisect_g2msm.py cpu   # native per-chunk reference

Loads /tmp/bisect_19.npz (from bisect_prove.py gen 19).
"""
import os, sys

mode = sys.argv[1]
if mode == "cpu":
    os.environ.pop("JAX_PLATFORMS", None)
else:
    os.environ["JAX_PLATFORMS"] = "tpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

if mode == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 f".jax_cache_{mode}"),
)
import numpy as np
import jax.numpy as jnp

log = lambda *a: print(*a, file=sys.stderr, flush=True)
log("devices:", jax.devices())

from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.ops import curve as cv, msm as msm_mod

d = np.load("/tmp/bisect_19.npz")
q = cv.JacPoint(
    jnp.asarray(d["pk_b_g2_query_x"]), jnp.asarray(d["pk_b_g2_query_y"]),
    jnp.asarray(d["pk_b_g2_query_z"]),
)
z = jnp.asarray(d["z"])
n = q.x.shape[0]
log(f"n = {n}")

pts, sc = msm_mod._pad_pow2(cv.FQ2_OPS, q, z)
N = pts.x.shape[0]
CH = msm_mod._CHUNK
log(f"padded N = {N}, chunk = {CH}")


def aff(res):
    j = cv.JacPoint(res.x[None], res.y[None], res.z[None])
    return cv.g2_to_host(j)[0]


for lo in range(0, N, CH):
    part = msm_mod.msm(
        cv.FQ2_OPS,
        cv.JacPoint(pts.x[lo:lo+CH], pts.y[lo:lo+CH], pts.z[lo:lo+CH]),
        sc[lo:lo+CH],
    )
    print(f"chunk {lo>>18}: {aff(part)}", flush=True)

if mode == "tpu":
    # edge cases on the REAL points of chunk 0
    p0 = cv.JacPoint(pts.x[:CH], pts.y[:CH], pts.z[:CH])
    zero_sc = jnp.zeros_like(sc[:CH])
    r0 = msm_mod.msm(cv.FQ2_OPS, p0, zero_sc)
    print(f"all-zero scalars: {aff(r0)}", flush=True)
    one_sc = zero_sc.at[0].set(jnp.asarray(np.asarray(F.FR.one_mont, np.uint32)))
    r1 = msm_mod.msm(cv.FQ2_OPS, p0, one_sc)
    print(f"e_0 scalar: {aff(r1)}", flush=True)
    print(f"point[0]:   {cv.g2_to_host(cv.JacPoint(p0.x[:1], p0.y[:1], p0.z[:1]))[0]}",
          flush=True)
