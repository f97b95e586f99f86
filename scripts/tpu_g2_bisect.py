"""Bisect the G2 MSM miscomputation on the real chip.

Known-answer G2 MSM at a configurable size/config; points a_i * G2 with
known a_i so the expected result is (sum a_i s_i) * G2 (host-computable).

Usage: python scripts/tpu_g2_bisect.py LOGN [C] [SLOTS_LOG2]
Env: CZTPU_MSM_R_LOG2 to override the blocked-prefix row width.
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
c_win = int(sys.argv[2]) if len(sys.argv) > 2 else 13
if len(sys.argv) > 3:
    msm_mod._CHUNK_SLOTS = 1 << int(sys.argv[3])
n = 1 << logn
rng = np.random.default_rng(5)
a_ints = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]
t0 = time.perf_counter()
pts = msm_mod.fixed_base_msm_ints(cv.FQ2_OPS, H.G2, H.G2_GEN, a_ints)
s_ints = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]
sc = F.FR.to_device(s_ints)
np.asarray(pts.x[0]); np.asarray(sc[0])
log(f"points built+landed: {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
res = msm_mod.msm_pippenger(cv.FQ2_OPS, pts, sc, c=c_win)
got = cv.g2_to_host(cv.JacPoint(res.x[None], res.y[None], res.z[None]))[0]
log(f"msm: {time.perf_counter()-t0:.1f}s")
tot = 0
for a, s in zip(a_ints, s_ints):
    tot = (tot + a * s) % P
exp = H.G2.scalar_mul(H.G2_GEN, tot)
ok = got == exp
log(f"G2 2^{logn} c={c_win} slots=2^{(msm_mod._CHUNK_SLOTS).bit_length()-1} "
    f"R_env={os.environ.get('CZTPU_MSM_R_LOG2')}: {'OK' if ok else 'WRONG'}")
sys.exit(0 if ok else 1)
