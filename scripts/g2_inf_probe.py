"""Minimal TPU probe: does the XLA G2 Pippenger mishandle points at
infinity (z=0 rows) in the input stream?  Builds [k*G2] points, replaces
two rows with infinity (garbage x/y, z=0 — exactly how cached queries
encode them), and compares against the host sum excluding those rows.
Usage: python scripts/g2_inf_probe.py [logn] [cpu|tpu]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logn = int(sys.argv[1]) if len(sys.argv) > 1 else 10
mode = sys.argv[2] if len(sys.argv) > 2 else "tpu"
if mode == "cpu":
    os.environ.pop("JAX_PLATFORMS", None)
else:
    os.environ["JAX_PLATFORMS"] = "tpu"
import jax
if mode == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 f".jax_cache{'_tpu' if mode == 'tpu' else ''}"))
import numpy as np
import jax.numpy as jnp
log = lambda *a: print(*a, file=sys.stderr, flush=True)
log("devices:", jax.devices())
from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F, hostfield as H
from collaborative_zksnark_tpu.ops import curve as cv, msm as M

n = 1 << logn
P = C.R_MOD
rng = np.random.default_rng(3)
pts = M.fixed_base_msm_ints(cv.FQ2_OPS, H.G2, H.G2_GEN, list(range(1, n + 1)))
ints = [int.from_bytes(rng.bytes(32), "little") % P for _ in range(n)]
sc = F.FR.to_device(ints)

INF = (1, n - 2)  # rows to blank
# garbage x/y (arbitrary nonsense limbs), z = 0 — the cached-query encoding
gx = jnp.asarray(np.full((2, 24), 0x1234, np.uint32))
px = pts.x.at[jnp.asarray(INF), :].set(gx[None])
py = pts.y.at[jnp.asarray(INF), :].set(gx[None])
pz = pts.z.at[jnp.asarray(INF), :].set(0)
pts2 = cv.JacPoint(px, py, pz)

acc = sum((i + 1) * s for i, s in enumerate(ints) if i not in INF) % P
exp = H.G2.scalar_mul(H.G2_GEN, acc)

t0 = time.time()
res = M.msm_pippenger(cv.FQ2_OPS, pts2, sc, c=max(4, min(11, logn - 5)), proj=False)
got = cv.g2_to_host(cv.JacPoint(res.x[None], res.y[None], res.z[None]))[0]
log(f"[{'ok' if got == exp else 'WRONG'}] G2 msm with infinity rows "
    f"(n=2^{logn}, {time.time()-t0:.1f}s)")
# control: all-finite
t0 = time.time()
res = M.msm_pippenger(cv.FQ2_OPS, pts, sc, c=max(4, min(11, logn - 5)), proj=False)
got = cv.g2_to_host(cv.JacPoint(res.x[None], res.y[None], res.z[None]))[0]
accf = sum((i + 1) * s for i, s in enumerate(ints)) % P
expf = H.G2.scalar_mul(H.G2_GEN, accf)
log(f"[{'ok' if got == expf else 'WRONG'}] control all-finite "
    f"({time.time()-t0:.1f}s)")
