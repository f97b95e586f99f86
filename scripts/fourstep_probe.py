"""Four-step NTT prototype vs the flat 20-stage radix-2 at 2^20.

X[k1 + A*k2] = NTT_B over e2 of ( W^(k1*e2) * NTT_A over e1 of x[e1*B+e2] )
with W_A = W^B, W_B = W^A; output lands in natural order after ONE
transpose (the step-2 transform consumes the transposed matrix directly).

Run: python scripts/fourstep_probe.py  (TPU)
"""

import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("JAX_PLATFORMS", "tpu")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu"),
)

from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.ops import ntt

FR = F.FR
P = FR.p
rng = np.random.default_rng(0)

LOGN = int(os.environ.get("LOGN", "20"))
n = 1 << LOGN
la = LOGN // 2
A, B = 1 << la, 1 << (LOGN - la)

dom = ntt.get_radix2_domain(n)
domA = ntt.get_radix2_domain(A)
domB = ntt.get_radix2_domain(B)

# twiddle table W^(k1*e2), Montgomery limbs, shape (A, B, L)
t0 = time.perf_counter()
pw = ntt._pow_table(dom.omega, n, P)
idx = (np.arange(A, dtype=np.int64)[:, None] * np.arange(B, dtype=np.int64)[None, :]) % n
tbl = ntt._to_mont_limbs(FR, [pw[i] for i in idx.reshape(-1)])
tw4 = jnp.asarray(tbl.reshape(A, B, FR.L))
print(f"host table build: {time.perf_counter()-t0:.1f} s", flush=True)


@jax.jit
def four_step(x):
    M = x.reshape(A, B, FR.L)
    M = jnp.take(M, domA._perm, axis=0)
    M = domA._butterflies(M, domA._tw_fwd)
    M = F.mul(FR, M, tw4)
    M = jnp.moveaxis(M, 0, 1)
    M = jnp.take(M, domB._perm, axis=0)
    M = domB._butterflies(M, domB._tw_fwd)
    return M.reshape(n, FR.L)


def land(out):
    np.asarray(out[:1, :1])


big = F.rand(FR, rng, (n,))

# correctness vs the flat path
ref = dom.fft(big)
got = four_step(big)
ok = bool(jnp.all(F.from_mont(FR, ref[:4096]) == F.from_mont(FR, got[:4096])))
print("match(first 4096):", ok, flush=True)


def timeit(name, f, *args, reps=5):
    out = f(*args)
    land(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    land(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)


timeit(f"flat fft 2^{LOGN}", dom.fft, big)
timeit(f"four-step fft 2^{LOGN} (A=2^{la})", four_step, big)

# where does the remainder go? time the pieces
@jax.jit
def step1_only(x):
    M = x.reshape(A, B, FR.L)
    M = jnp.take(M, domA._perm, axis=0)
    return domA._butterflies(M, domA._tw_fwd)


@jax.jit
def bitrev_only(x):
    return jnp.take(x, dom._perm, axis=0)


timeit("  step1 (10 stages, batched)", step1_only, big)
timeit("  flat bit-reverse gather alone", bitrev_only, big)
