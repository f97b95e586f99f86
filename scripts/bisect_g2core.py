"""Stage-level bisect of the TPU G2 Pippenger at n=2^18, c=13 with the
minimal failing input: scalars = e_0 (so every intermediate has a known
closed form).  Run: python scripts/bisect_g2core.py [logn] [c]
"""
import os, sys, functools, time

os.environ["JAX_PLATFORMS"] = "tpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"),
)
import numpy as np
import jax.numpy as jnp

log = lambda *a: print(*a, file=sys.stderr, flush=True)
log("devices:", jax.devices())

from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.algebra import hostfield as H
from collaborative_zksnark_tpu.ops import curve as cv, msm as M

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 18
c = int(sys.argv[2]) if len(sys.argv) > 2 else 13
n = 1 << logn

d = np.load("/tmp/bisect_19.npz")
pts = cv.JacPoint(
    jnp.asarray(d["pk_b_g2_query_x"][:n]),
    jnp.asarray(d["pk_b_g2_query_y"][:n]),
    jnp.asarray(d["pk_b_g2_query_z"][:n]),
)
sc = jnp.zeros((n, F.FR.L), jnp.uint32)
sc = sc.at[0].set(jnp.asarray(np.asarray(F.FR.one_mont, np.uint32)))

fld = cv.FQ2_OPS
strat = M._PointStrat(fld, False)
n_windows = (M.FR_BITS + c - 1) // c

p0_host = cv.g2_to_host(cv.JacPoint(pts.x[:1], pts.y[:1], pts.z[:1]))[0]
log("P0 =", str(p0_host)[:80])


def aff(res_raw):
    """(x,y,z) raw single-point coords -> host affine."""
    x, y, z = res_raw
    return cv.g2_to_host(cv.JacPoint(x[None], y[None], z[None]))[0]


# ---- sanity: batch add + tree sum vs host ---------------------------------
@jax.jit
def batch_add(p):
    half = p.x.shape[0] // 2
    a = cv.JacPoint(p.x[:half], p.y[:half], p.z[:half])
    b = cv.JacPoint(p.x[half:], p.y[half:], p.z[half:])
    return cv.point_add(fld, a, b)


t0 = time.perf_counter()
s = batch_add(pts)
idxs = [0, 1, 5, 1000, n // 2 - 1]
got = cv.g2_to_host(cv.JacPoint(s.x[jnp.asarray(idxs)], s.y[jnp.asarray(idxs)],
                                s.z[jnp.asarray(idxs)]))
hx = d["pk_b_g2_query_x"]; hy = d["pk_b_g2_query_y"]; hz = d["pk_b_g2_query_z"]
ok_all = True
for j, i in enumerate(idxs):
    A = cv.g2_to_host(cv.JacPoint(hx[i:i+1], hy[i:i+1], hz[i:i+1]))[0]
    B = cv.g2_to_host(cv.JacPoint(hx[n//2+i:n//2+i+1], hy[n//2+i:n//2+i+1],
                                  hz[n//2+i:n//2+i+1]))[0]
    exp = H.G2.add(A, B)
    ok = got[j] == exp
    ok_all &= ok
    if not ok:
        log(f"[FAIL] batch_add idx {i}")
log(f"[{' ok ' if ok_all else 'FAIL'}] batch G2 add ({time.perf_counter()-t0:.1f}s)")


# ---- pippenger stages ------------------------------------------------------
@jax.jit
def stage_digs(scal):
    scs = M._scalar_bits_standard(scal)
    digs = M._window_digits(scs, c, n_windows)
    return digs.sum(), (digs != 0).sum(), digs[0, :4]


t0 = time.perf_counter()
dsum, dnz, d04 = stage_digs(sc)
log(f"digs: sum={dsum} nonzeros={dnz} first={d04}  "
    f"(expect sum=1 nz=1 first=[1 0 0 0])  ({time.perf_counter()-t0:.1f}s)")

G = max(1, min(n_windows, M._CHUNK_SLOTS // n))
groups = -(-n_windows // G)
log(f"G={G} groups={groups}")


def make_group_fn(w_count):
    @jax.jit
    def fn(points, scal):
        scs = M._scalar_bits_standard(scal)
        digs = M._window_digits(scs, c, n_windows)
        return_list = []
        digs_g = digs[:w_count]
        keys = digs_g + (jnp.arange(w_count, dtype=jnp.int32)[:, None] << c)
        order = jnp.argsort(keys.reshape(-1))
        keys_sorted = jnp.take(keys.reshape(-1), order)
        pts_sorted = M._gather_point(points, order % n)
        Fsz = pts_sorted.x.shape[0]
        R = 1 << max(8, min(13, Fsz.bit_length() - 5))
        ys, row_excl, K = M._blocked_prefix(strat, pts_sorted, R)
        prefix_at = lambda e: strat.add(
            M._gather_point(ys, (e % K) * R + e // K),
            M._gather_point(row_excl, e // K),
        )
        buckets = M._bucket_sums_blocked(strat, prefix_at, keys_sorted,
                                         w_count, c)
        # identity counts per window over buckets b>=1
        nonid = (~fld.is_zero(buckets.z)).astype(jnp.int32)[:, 1:].sum(axis=1)
        S01 = (buckets.x[0, 1], buckets.y[0, 1], buckets.z[0, 1])
        totals = M._weighted_bucket_totals(strat, buckets)
        # the full-stream prefix (last element) = sum of ALL points in group
        last = prefix_at(jnp.asarray([Fsz - 1]))
        return nonid, S01, totals, (last.x[0], last.y[0], last.z[0])
    return fn


# group 0 (contains window 0 -> bucket 1 = P0)
t0 = time.perf_counter()
nonid, S01, totals, last = make_group_fn(min(G, n_windows))(pts, sc)
log(f"group0 non-identity bucket counts per window: {np.asarray(nonid)}")
log(f"  (expect [1 0 0 ...])   ({time.perf_counter()-t0:.1f}s)")
log(f"S_(w=0,b=1) affine: {str(aff(S01))[:90]}")
log(f"  == P0: {aff(S01) == p0_host}")
tot0 = aff((totals.x[0], totals.y[0], totals.z[0]))
log(f"window-0 total == P0: {tot0 == p0_host}")
for w in range(1, min(G, n_windows)):
    tw = aff((totals.x[w], totals.y[w], totals.z[w]))
    if tw is not None:
        log(f"[FAIL] window {w} total nonzero: {str(tw)[:80]}")
log("group0 totals for w>=1 all identity checked")

# full-stream sum: group-0 last prefix = w_count * (sum of all points)
log(f"last-prefix (= {min(G, n_windows)} * sum(all pts)) affine: "
    f"{str(aff(last))[:80]}")
