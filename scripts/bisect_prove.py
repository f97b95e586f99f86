"""Bisect the Groth16 verified=False at domain >= 2^20 on TPU.

Two phases sharing an .npz of inputs + CPU(native)-computed reference
values for every prover stage:

  python scripts/bisect_prove.py gen [logn]    # CPU + native FFI (trusted)
  python scripts/bisect_prove.py tpu [logn]    # TPU; reports first mismatch

Stage list (witness map then MSMs then assembly) mirrors snark/groth16.py
prove().  Comparisons are on canonical residues (F.canon) / affine points,
so representative differences ([0,2p) slack, Jacobian Z) can't false-alarm.
"""
import os, sys, time

logn = int(sys.argv[2]) if len(sys.argv) > 2 else 19
mode = sys.argv[1]
NPZ = f"/tmp/bisect_{logn}.npz"

if mode == "gen":
    # the ambient axon plugin overrides the env var; jax.config is respected
    os.environ.pop("JAX_PLATFORMS", None)
else:
    os.environ["JAX_PLATFORMS"] = "tpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

if mode == "gen":
    jax.config.update("jax_platforms", "cpu")

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 f".jax_cache_{'cpu' if mode == 'gen' else 'tpu'}"),
)
import numpy as np
import jax.numpy as jnp

log = lambda *a: print(*a, file=sys.stderr, flush=True)
log("devices:", jax.devices())

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.algebra import hostfield as H
from collaborative_zksnark_tpu.ops import curve as cv, msm as msm_mod, ntt
from collaborative_zksnark_tpu.relations import r1cs
from collaborative_zksnark_tpu.snark import groth16

P = C.R_MOD
FR = F.FR


def canon_np(x):
    return np.asarray(F.canon(FR, x))


def aff(pt_single, g2=False):
    """single Jacobian device point -> affine host tuple (or 'inf')."""
    j = cv.JacPoint(pt_single.x[None], pt_single.y[None], pt_single.z[None])
    h = (cv.g2_to_host if g2 else cv.g1_to_host)(j)[0]
    return h


t0 = time.perf_counter()
cs, assign = r1cs.squaring_circuit(1 << logn)
inst, wit = assign(12345)
log(f"circuit: {time.perf_counter()-t0:.1f}s")

if mode == "gen":
    t0 = time.perf_counter()
    pk, vk = groth16.setup(cs, seed=3)
    log(f"setup: {time.perf_counter()-t0:.1f}s")
    z = FR.to_device(inst + wit)
    rng = np.random.default_rng(7)
    r_m = F.rand(FR, rng, ())
    s_m = F.rand(FR, rng, ())

    # reference stages (CPU + native FFI field/MSM)
    a_rows, _, _ = cs.padded_rows()
    domain = ntt.get_radix2_domain(len(a_rows))
    mats = cs.device_matrices(domain.n)
    t0 = time.perf_counter()
    a_ev = r1cs.sparse_matvec(mats[0], z)
    b_ev = r1cs.sparse_matvec(mats[1], z)
    c_ev = r1cs.sparse_matvec(mats[2], z)
    a_poly = domain.ifft(a_ev)
    a_cos = domain.coset_fft(a_poly)
    b_cos = domain.coset_fft(domain.ifft(b_ev))
    c_cos = domain.coset_fft(domain.ifft(c_ev))
    ab = F.mul(FR, a_cos, b_cos)
    num = F.sub(FR, ab, c_cos)
    zinv = domain.vanishing_on_coset_inv()
    h_cos = F.mul(FR, num, zinv[None])
    h = domain.coset_ifft(h_cos)[: domain.n - 1]
    log(f"witness map: {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    ninst = cs.num_instance
    stages = dict(
        z=np.asarray(z), r=np.asarray(r_m), s=np.asarray(s_m),
        a_ev=canon_np(a_ev), a_poly=canon_np(a_poly), a_cos=canon_np(a_cos),
        ab=canon_np(ab), h=canon_np(h),
    )
    # MSM reference results (affine coords as object-free int arrays)
    msms = dict(
        h_acc=(cv.FQ_OPS, pk.h_query, h, False),
        l_acc=(cv.FQ_OPS, pk.l_query, z[ninst:], False),
        a_acc=(cv.FQ_OPS, pk.a_query, z, False),
        b1_acc=(cv.FQ_OPS, pk.b_g1_query, z, False),
        b2_acc=(cv.FQ2_OPS, pk.b_g2_query, z, True),
    )
    for name, (fld, q, sc, g2) in msms.items():
        res = msm_mod.msm(fld, q, sc)
        a = aff(res, g2)
        stages[name] = np.array([repr(a)], dtype=object) if False else np.frombuffer(
            repr(a).encode(), dtype=np.uint8
        )
    log(f"reference MSMs: {time.perf_counter()-t0:.1f}s")

    # full reference proof
    pf = groth16.prove(pk, cs, z, r_m, s_m)
    hp = groth16.reveal_proof(pf)
    ok = groth16.verify(vk, hp, inst[1:])
    log(f"reference prove verified={ok}")
    stages["proof_a"] = np.frombuffer(repr(hp.a).encode(), np.uint8)
    stages["proof_b"] = np.frombuffer(repr(hp.b).encode(), np.uint8)
    stages["proof_c"] = np.frombuffer(repr(hp.c).encode(), np.uint8)

    # proving key arrays (so the TPU side skips the 270 s setup)
    for qn in ("a_query", "b_g1_query", "b_g2_query", "h_query", "l_query"):
        q = getattr(pk, qn)
        stages[f"pk_{qn}_x"] = np.asarray(q.x)
        stages[f"pk_{qn}_y"] = np.asarray(q.y)
        stages[f"pk_{qn}_z"] = np.asarray(q.z)
    for sn in ("alpha_g1", "beta_g1", "beta_g2", "delta_g1", "delta_g2"):
        q = getattr(pk, sn)
        stages[f"pk_{sn}_x"] = np.asarray(q.x)
        stages[f"pk_{sn}_y"] = np.asarray(q.y)
        stages[f"pk_{sn}_z"] = np.asarray(q.z)
    np.savez(NPZ, **stages)
    log(f"saved {NPZ}")
    sys.exit(0)

# ---- tpu phase -----------------------------------------------------------
d = np.load(NPZ)
z = jnp.asarray(d["z"])
r_m = jnp.asarray(d["r"])
s_m = jnp.asarray(d["s"])


def report(name, got, kind="arr", g2=False):
    if kind == "arr":
        ref = d[name]
        g = canon_np(got)
        ok = np.array_equal(g, ref)
        if not ok:
            bad = np.nonzero((g != ref).any(axis=-1))[0]
            log(f"[FAIL] {name}: {bad.size} rows differ, first {bad[:5]}")
        else:
            log(f"[ ok ] {name}")
        return ok
    ref = bytes(d[name]).decode()
    g = repr(aff(got, g2))
    ok = g == ref
    log(f"[{' ok ' if ok else 'FAIL'}] {name}")
    if not ok:
        log(f"   got {g[:120]}...\n   ref {ref[:120]}...")
    return ok


a_rows, _, _ = cs.padded_rows()
domain = ntt.get_radix2_domain(len(a_rows))
mats = cs.device_matrices(domain.n)
t0 = time.perf_counter()
a_ev = r1cs.sparse_matvec(mats[0], z)
report("a_ev", a_ev)
a_poly = domain.ifft(a_ev)
report("a_poly", a_poly)
a_cos = domain.coset_fft(a_poly)
report("a_cos", a_cos)
b_cos = domain.coset_fft(domain.ifft(r1cs.sparse_matvec(mats[1], z)))
c_cos = domain.coset_fft(domain.ifft(r1cs.sparse_matvec(mats[2], z)))
ab = F.mul(FR, a_cos, b_cos)
report("ab", ab)
num = F.sub(FR, ab, c_cos)
zinv = domain.vanishing_on_coset_inv()
h_cos = F.mul(FR, num, zinv[None])
h = domain.coset_ifft(h_cos)[: domain.n - 1]
report("h", h)
log(f"witness map: {time.perf_counter()-t0:.1f}s")

pkq = {}
for qn in ("a_query", "b_g1_query", "b_g2_query", "h_query", "l_query"):
    pkq[qn] = cv.JacPoint(
        jnp.asarray(d[f"pk_{qn}_x"]), jnp.asarray(d[f"pk_{qn}_y"]),
        jnp.asarray(d[f"pk_{qn}_z"]),
    )
ninst = cs.num_instance
t0 = time.perf_counter()
for name, (fld, q, sc, g2) in dict(
    h_acc=(cv.FQ_OPS, pkq["h_query"], h, False),
    l_acc=(cv.FQ_OPS, pkq["l_query"], z[ninst:], False),
    a_acc=(cv.FQ_OPS, pkq["a_query"], z, False),
    b1_acc=(cv.FQ_OPS, pkq["b_g1_query"], z, False),
    b2_acc=(cv.FQ2_OPS, pkq["b_g2_query"], z, True),
).items():
    res = msm_mod.msm(fld, q, sc)
    report(name, res, kind="pt", g2=g2)
log(f"MSMs: {time.perf_counter()-t0:.1f}s")
