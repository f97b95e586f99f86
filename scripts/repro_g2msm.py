"""Minimal repro of the TPU G2 Pippenger mismatch (round-3 open bug).

Usage: python scripts/repro_g2msm.py {cpu|tpu} [logn] [c] [chunk_log]
Recreates the failing structure (G=16 window groups, window blocks aligned
to blocked-prefix rows) at any size by shrinking _CHUNK_SLOTS.
"""
import os, sys, time

mode = sys.argv[1] if len(sys.argv) > 1 else ""
if mode not in ("cpu", "tpu"):
    sys.exit(f"usage: {sys.argv[0]} {{cpu|tpu}} [logn] [c] [chunk_log]")
logn = int(sys.argv[2]) if len(sys.argv) > 2 else 10
c = int(sys.argv[3]) if len(sys.argv) > 3 else 13
chunk_log = int(sys.argv[4]) if len(sys.argv) > 4 else logn + 4

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

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.algebra import hostfield as H
from collaborative_zksnark_tpu.ops import curve as cv, msm as M

M._CHUNK_SLOTS = 1 << chunk_log
n = 1 << logn
P = C.R_MOD
rng = np.random.default_rng(42)

# distinct G2 points: [k * G2 for k in 1..n] via native fixed-base
t0 = time.perf_counter()
pts = M.fixed_base_msm_ints(cv.FQ2_OPS, H.G2, H.G2_GEN, list(range(1, n + 1)))
log(f"points built: {time.perf_counter()-t0:.1f}s")
p_host = cv.g2_to_host(cv.JacPoint(pts.x[:4], pts.y[:4], pts.z[:4]))
# independent check of the fixed-base path itself: slot k holds (k+1)*G2
assert p_host[0] == H.G2_GEN and p_host[1] == H.G2.scalar_mul(H.G2_GEN, 2), \
    "native fixed-base output wrong — case expectations below would be bogus"

def run(name, sc_limbs, expect_host):
    t0 = time.perf_counter()
    res = M.msm_pippenger(cv.FQ2_OPS, pts, sc_limbs, c=c, proj=False)
    got = cv.g2_to_host(cv.JacPoint(res.x[None], res.y[None], res.z[None]))[0]
    ok = got == expect_host
    log(f"[{' ok ' if ok else 'FAIL'}] {name}  ({time.perf_counter()-t0:.1f}s)")
    if not ok:
        log(f"  got:    {str(got)[:100]}")
        log(f"  expect: {str(expect_host)[:100]}")
    return ok

# case 1: e_0 -> P0
sc = jnp.zeros((n, F.FR.L), jnp.uint32)
sc = sc.at[0].set(jnp.asarray(np.asarray(F.FR.one_mont, np.uint32)))
ok1 = run("scalars=e_0 -> P0", sc, p_host[0])

# case 2: random scalars, reference = host naive (sum s_i * i * G2)
ints = [int.from_bytes(rng.bytes(32), "little") % P for _ in range(n)]
acc = sum((i + 1) * s for i, s in enumerate(ints)) % P
exp = H.G2.scalar_mul(H.G2_GEN, acc)
sc2 = F.FR.to_device(ints)  # to_device applies Montgomery form
ok2 = run("random scalars", sc2, exp)

sys.exit(0 if (ok1 and ok2) else 1)
