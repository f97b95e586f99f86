"""Known-answer bisect of the 2^20 prove pipeline on the real chip.

The 2^20 local prove produced verified=False (round-3 code) while 2^14
verified — this isolates which kernel breaks at 2^20 shapes:
  * G1 MSM at 2^20 (chunked 2^18 Pippenger, R=2^13, multi-group) against
    a host-computable known answer: points a_i * G with known a_i, so
    msm(points, s) must equal (sum a_i s_i mod r) * G.
  * G2 MSM likewise.
  * NTT round-trips at 2^20: ifft(fft(x)) == x, coset_ifft(coset_fft(x))
    == x, plus a 4-point spot check of fft against the CPU backend result
    (precomputed into /tmp/ntt20_expect.npz by scripts/cpu_ntt20_ref.py).
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache_tpu")
import numpy as np

log = lambda *a: print(*a, file=sys.stderr, flush=True)
log("devices:", jax.devices())

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.algebra import hostfield as H
from collaborative_zksnark_tpu.ops import curve as cv, msm as msm_mod, ntt

P = C.R_MOD
rng = np.random.default_rng(42)
n = 1 << 20

which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "ntt"):
    coeffs_ints = [int.from_bytes(rng.bytes(40), "little") % P
                   for _ in range(16)]
    # sparse input: x[j] = c_j for j < 16 else 0 — fft is then a tiny host
    # polynomial evaluation at each domain element (exact known answer)
    x = np.zeros((n,), object)
    for j, cj in enumerate(coeffs_ints):
        x[j] = cj
    dom = ntt.get_radix2_domain(n)
    xd = F.FR.to_device(list(x))
    t0 = time.perf_counter()
    y = dom.fft(xd)
    y_host = [int(v) for v in F.FR.to_host(
        np.asarray(jax.device_get(y[:4])))]
    log(f"fft 2^20: {time.perf_counter()-t0:.1f}s")
    els = None
    w = dom.omega
    for i in range(4):
        wi = pow(w, i, P)
        exp = 0
        for j in reversed(range(16)):
            exp = (exp * wi + coeffs_ints[j]) % P
        ok = (exp == y_host[i])
        log(f"  fft[{i}] known-answer: {ok}")
        assert ok, (i, exp, y_host[i])
    # round trips
    t0 = time.perf_counter()
    back = dom.ifft(y)
    b_host = [int(v) for v in F.FR.to_host(np.asarray(jax.device_get(back[:16])))]
    ok = b_host == coeffs_ints
    log(f"ifft(fft(x)) == x: {ok} ({time.perf_counter()-t0:.1f}s)")
    assert ok
    yc = dom.coset_fft(xd)
    backc = dom.coset_ifft(yc)
    bc_host = [int(v) for v in F.FR.to_host(np.asarray(jax.device_get(backc[:16])))]
    ok = bc_host == coeffs_ints
    log(f"coset_ifft(coset_fft(x)) == x: {ok}")
    assert ok
    # coset known answer: coset_fft evaluates at g*w^i
    g = dom.coset_gen if hasattr(dom, "coset_gen") else None
    log("ntt block done")

if which in ("all", "msm", "msm_g1"):
    a_ints = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]
    t0 = time.perf_counter()
    pts = msm_mod.fixed_base_msm_ints(cv.FQ_OPS, H.G1, H.G1_GEN, a_ints)
    log(f"g1 known points built: {time.perf_counter()-t0:.1f}s")
    s_ints = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]
    sc = F.FR.to_device(s_ints)
    np.asarray(pts.x[0]); np.asarray(sc[0])
    t0 = time.perf_counter()
    res = msm_mod.msm(cv.FQ_OPS, pts, sc)
    got = cv.g1_to_host(cv.JacPoint(res.x[None], res.y[None], res.z[None]))[0]
    log(f"g1 msm 2^20: {time.perf_counter()-t0:.1f}s")
    tot = 0
    for a, s in zip(a_ints, s_ints):
        tot = (tot + a * s) % P
    exp = H.G1.scalar_mul(H.G1_GEN, tot)
    log(f"  msm g1 2^20 known-answer: {got == exp}")
    assert got == exp

if which in ("all", "msm_g2"):
    nn = n
    a_ints = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(nn)]
    t0 = time.perf_counter()
    pts = msm_mod.fixed_base_msm_ints(cv.FQ2_OPS, H.G2, H.G2_GEN, a_ints)
    log(f"g2 known points built: {time.perf_counter()-t0:.1f}s")
    s_ints = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(nn)]
    sc = F.FR.to_device(s_ints)
    np.asarray(pts.x[0]); np.asarray(sc[0])
    t0 = time.perf_counter()
    res = msm_mod.msm(cv.FQ2_OPS, pts, sc)
    got = cv.g2_to_host(cv.JacPoint(res.x[None], res.y[None], res.z[None]))[0]
    log(f"g2 msm 2^20: {time.perf_counter()-t0:.1f}s")
    tot = 0
    for a, s in zip(a_ints, s_ints):
        tot = (tot + a * s) % P
    exp = H.G2.scalar_mul(H.G2_GEN, tot)
    log(f"  msm g2 2^20 known-answer: {got == exp}")
    assert got == exp

log("ALL OK")
