"""Fused digit-domain NTT (ops/ntt_fused.py) on the real TPU: correctness
vs the production Radix2Domain, then wall times at 2^16..2^20.

Usage: python scripts/ntt_fused_bench.py [logn ...]   (default: 14 16 20)
"""
import os, sys, time

os.environ.setdefault("JAX_PLATFORMS", "tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"),
)
log = lambda *a: print(*a, file=sys.stderr, flush=True)
log("devices:", jax.devices())

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.ops import ntt, ntt_fused as NF

P = C.R_MOD
logns = [int(a) for a in sys.argv[1:]] or [14, 16, 20]
rng = np.random.default_rng(0)


def rand_dev(n):
    return F.FR.to_device(
        [int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]
    )


def timeit(fn, x, reps=3):
    y = fn(x)
    np.asarray(y[0])  # land
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(y)
    np.asarray(y[0])
    return (time.perf_counter() - t0) / reps


for logn in logns:
    n = 1 << logn
    dom = ntt.get_radix2_domain(n)
    xd = rand_dev(n)

    # correctness: fused fwd vs production ladder (canonical values)
    plan = NF.get_fused_plan(n, "fwd", dom.omega)
    t0 = time.perf_counter()
    got = NF.transform(plan, xd)
    log(f"2^{logn} fused fwd cold (incl compile): {time.perf_counter()-t0:.1f}s")
    exp = dom.fft(xd)
    gv = F.FR.to_host(np.asarray(got))
    ev = F.FR.to_host(np.asarray(exp))
    ok = np.array_equal(gv, ev)
    log(f"2^{logn} fwd match: {ok}")
    if not ok:
        bad = np.nonzero(gv != ev)[0]
        log(f"  first mismatches: {bad[:5]} of {bad.size}")
        continue

    # inverse roundtrip
    ninv = pow(n, P - 2, P)
    iplan = NF.get_fused_plan(n, "inv", dom.omega_inv, ninv)
    rt = NF.transform(iplan, got)
    ok_i = np.array_equal(F.FR.to_host(np.asarray(rt)), F.FR.to_host(np.asarray(xd)))
    log(f"2^{logn} inv roundtrip: {ok_i}")

    # coset variants
    gp = NF.get_fused_plan(n, "coset_fwd", dom.omega, coset_g=C.FR_GENERATOR)
    gc = NF.transform(gp, xd)
    ok_c = np.array_equal(
        F.FR.to_host(np.asarray(gc)), F.FR.to_host(np.asarray(dom.coset_fft(xd)))
    )
    gpi = NF.get_fused_plan(n, "coset_inv", dom.omega_inv, ninv,
                            coset_g=C.FR_GENERATOR)
    gci = NF.transform(gpi, gc)
    ok_ci = np.array_equal(
        F.FR.to_host(np.asarray(gci)), F.FR.to_host(np.asarray(xd))
    )
    log(f"2^{logn} coset fwd/inv: {ok_c}/{ok_ci}")

    t_f = timeit(lambda v: NF.transform(plan, v), xd)
    t_l = timeit(dom.fft, xd)
    log(f"2^{logn}: fused {t_f*1e3:.1f} ms  vs ladder {t_l*1e3:.1f} ms "
        f"({t_l/t_f:.2f}x)")
