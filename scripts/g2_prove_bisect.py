"""Bisect the wrong G2 proof element at 2^14: check (a) shipped
b_g2_query values, (b) the G2 MSM alone, (c) _scalar_mul_inline(G2),
(d) the assembly adds — each vs host ground truth."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "tpu")
import jax
jax.config.update("jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu"))
import numpy as np
import jax.numpy as jnp
log = lambda *a: print(*a, file=sys.stderr, flush=True)
log("devices:", jax.devices())
from collaborative_zksnark_tpu.algebra import field as F, hostfield as H
from collaborative_zksnark_tpu.ops import curve as cv, msm as M
from collaborative_zksnark_tpu.relations import r1cs
from collaborative_zksnark_tpu.snark import groth16, keycache

logn, seed = 14, 1
cs, assign = r1cs.squaring_circuit(1 << logn)
pk, vk = keycache.load_groth16(keycache.path_for("groth16", logn, seed))
inst, wit = assign(12345)
z = F.FR.to_device(inst + wit)
rng = np.random.default_rng(1)
r_m = F.rand(F.FR, rng, ()); s_m = F.rand(F.FR, rng, ())

# (a) spot-check shipped b_g2_query rows (incl. around infinity rows)
zfile = np.load(keycache.path_for("groth16", logn, seed))
bz = zfile["b_g2_query_z"]; flat = bz.reshape(bz.shape[0], -1)
inf_rows = np.flatnonzero(~flat.any(axis=1))
log("infinity rows in b_g2_query:", inf_rows[:10], "count", inf_rows.size)
check_rows = sorted(set(r for r in ([0, 1, 5, bz.shape[0]-1] + [int(r) for r in inf_rows[:3]] + [int(r)+1 for r in inf_rows[:3]]) if r < bz.shape[0]))
got_x = np.asarray(pk.b_g2_query.x[np.array(check_rows)])
got_z = np.asarray(pk.b_g2_query.z[np.array(check_rows)])
exp_x = zfile["b_g2_query_x"][check_rows].astype(np.uint32)
ok_x = (got_x == exp_x).all()
# z rows: one or zero
onerow = zfile["a_query_z"][0].astype(np.uint32)
exp_z = np.stack([np.zeros_like(got_z[0]) if r in inf_rows else
                  np.stack([onerow, np.zeros_like(onerow)]) for r in check_rows])
ok_z = (got_z == exp_z).all()
log(f"(a) shipped b_g2_query x match: {ok_x}  z match: {ok_z}")

# host G2 values for the few rows we need
bx = zfile["b_g2_query_x"]; by = zfile["b_g2_query_y"]
def host_pt(i):
    if i in inf_rows: return None
    tolim = lambda a: sum(int(v) << (16*k) for k, v in enumerate(a))
    Rinv = pow(1 << (16*24), -1, H.Q)
    fx = (tolim(bx[i][0]) * Rinv % H.Q, tolim(bx[i][1]) * Rinv % H.Q)
    fy = (tolim(by[i][0]) * Rinv % H.Q, tolim(by[i][1]) * Rinv % H.Q)
    return (fx, fy)

# (c) scalar_mul_inline on G2: s_m * delta_g2
t0 = time.time()
smi = jax.jit(lambda P, k: groth16._scalar_mul_kernel(cv.FQ2_OPS)(P, k)) if hasattr(groth16, "_scalar_mul_kernel") else None
s_delta = groth16._scalar_mul_inline(cv.FQ2_OPS, pk.delta_g2, s_m)
sd_host = cv.g2_to_host(cv.JacPoint(s_delta.x[None], s_delta.y[None], s_delta.z[None]))[0]
s_int = int(F.FR.to_host(s_m[None])[0])
delta_host = cv.g2_to_host(cv.JacPoint(pk.delta_g2.x[None], pk.delta_g2.y[None], pk.delta_g2.z[None]))[0]
exp_sd = H.G2.scalar_mul(delta_host, s_int)
log(f"(c) _scalar_mul_inline G2: {'OK' if sd_host == exp_sd else 'WRONG'} ({time.time()-t0:.1f}s)")

# (b) the G2 MSM alone over b_g2_query with z (the f2 core)
t0 = time.time()
b2_acc = M.msm(cv.FQ2_OPS, pk.b_g2_query, z)
b2_host = cv.g2_to_host(cv.JacPoint(b2_acc.x[None], b2_acc.y[None], b2_acc.z[None]))[0]
log(f"    msm ran in {time.time()-t0:.1f}s")
# host expected: sum z_i * P_i -- using Python ints (16K scalar muls, ~min)
t0 = time.time()
zints = [int(v) for v in F.FR.to_host(z)]
acc = None
for i, zi in enumerate(zints):
    p = host_pt(i)
    if p is None or zi == 0: continue
    t = H.G2.scalar_mul(p, zi)
    acc = t if acc is None else H.G2.add(acc, t)
log(f"(b) G2 MSM vs host: {'OK' if b2_host == acc else 'WRONG'} ({time.time()-t0:.0f}s host)")

# (d) full f2 assembly
beta_host = cv.g2_to_host(cv.JacPoint(pk.beta_g2.x[None], pk.beta_g2.y[None], pk.beta_g2.z[None]))[0]
exp_b = H.G2.add(H.G2.add(beta_host, acc), exp_sd)
g2b = cv.point_add(cv.FQ2_OPS, cv.point_add(cv.FQ2_OPS, pk.beta_g2, b2_acc), s_delta)
g2b_host = cv.g2_to_host(cv.JacPoint(g2b.x[None], g2b.y[None], g2b.z[None]))[0]
log(f"(d) eager assembly: {'OK' if g2b_host == exp_b else 'WRONG'}")

# (e) the actual f2 jitted program
a_rows, _, _ = cs.padded_rows()
from collaborative_zksnark_tpu.ops import ntt
domain = ntt.get_radix2_domain(len(a_rows))
mats = cs.device_matrices(domain.n)
kshape = tuple(int(mt[0].shape[1]) for mt in mats)
_, k2 = groth16._fused_prove_kernel(domain.n, cs.num_variables, cs.num_instance, kshape, M._CHUNK)
f2_out = k2(pk.b_g2_query, pk.beta_g2, pk.delta_g2, z, s_m)
f2_host = cv.g2_to_host(cv.JacPoint(f2_out.x[None], f2_out.y[None], f2_out.z[None]))[0]
log(f"(e) f2 jitted program: {'OK' if f2_host == exp_b else 'WRONG'}")
