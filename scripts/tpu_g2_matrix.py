"""G2 Pippenger config matrix on the real chip (one process, points built
once): isolates which kernel configuration breaks at 2^18.
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
import numpy as np

log = lambda *a: print(*a, file=sys.stderr, flush=True)

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.algebra import hostfield as H
from collaborative_zksnark_tpu.ops import curve as cv, msm as msm_mod

P = C.R_MOD
logn = int(sys.argv[1]) if len(sys.argv) > 1 else 18
n = 1 << logn
rng = np.random.default_rng(5)
a_ints = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]
t0 = time.perf_counter()
pts = msm_mod.fixed_base_msm_ints(cv.FQ2_OPS, H.G2, H.G2_GEN, a_ints)
s_ints = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]
sc = F.FR.to_device(s_ints)
np.asarray(pts.x[0]); np.asarray(sc[0])
log(f"points built+landed: {time.perf_counter()-t0:.1f}s")

# transfer integrity: read back a few points and compare to host truth
idxs = [0, 1, 12345, n - 1]
sl = cv.JacPoint(*(np.array([np.asarray(c_[i]) for i in idxs])
                   for c_ in (pts.x, pts.y, pts.z)))
back = cv.g2_to_host(cv.JacPoint(*[np.stack([np.asarray(c_[i]) for i in idxs])
                                   for c_ in (pts.x, pts.y, pts.z)]))
t_ok = all(back[j] == H.G2.scalar_mul(H.G2_GEN, a_ints[i])
           for j, i in enumerate(idxs))
log(f"device transfer spot-check: {'OK' if t_ok else 'CORRUPTED'}")

tot = 0
for a, s in zip(a_ints, s_ints):
    tot = (tot + a * s) % P
exp = H.G2.scalar_mul(H.G2_GEN, tot)

configs = [
    ("c=13 default", 13, None, None),
    ("c=13 R=2^11", 13, 11, None),
    ("c=13 1group", 13, None, 1 << 30),
    ("c=11 default", 11, None, None),
    ("c=13 R=2^9", 13, 9, None),
]
for tag, c_win, r_log2, slots in configs:
    if r_log2 is None:
        os.environ.pop("CZTPU_MSM_R_LOG2", None)
    else:
        os.environ["CZTPU_MSM_R_LOG2"] = str(r_log2)
    old_slots = msm_mod._CHUNK_SLOTS
    if slots:
        msm_mod._CHUNK_SLOTS = slots
    msm_mod._pippenger_kernel.cache_clear()
    t0 = time.perf_counter()
    try:
        res = msm_mod.msm_pippenger(cv.FQ2_OPS, pts, sc, c=c_win)
        got = cv.g2_to_host(
            cv.JacPoint(res.x[None], res.y[None], res.z[None]))[0]
        ok = got == exp
        log(f"{tag}: {'OK' if ok else 'WRONG'} "
            f"({time.perf_counter()-t0:.1f}s)")
    except Exception as e:
        log(f"{tag}: ERROR {type(e).__name__}: {e}")
    msm_mod._CHUNK_SLOTS = old_slots
