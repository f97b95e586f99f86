"""Kernel layout lab: measure Montgomery-mul variants on the real TPU.

Hypothesis: the production kernels' (1, T) limb rows use 1/8 of the VPU
sublanes; an (S, T) plane layout (limb i occupies rows i*S..(i+1)*S) should
recover most of the idle sublane throughput with the same row algebra.

Run:  python scripts/kernel_lab.py  (needs the axon TPU)
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.ops import pallas_field as PF

FR, FQ = F.FR, F.FQ


CHAIN = 256


def chain_jit(fn):
    """One jit that applies fn CHAIN times — measures the in-chain per-op
    cost (what MSM/NTT loops actually see), hiding per-dispatch tunnel
    latency (~8 ms/call on axon)."""

    @jax.jit
    def f(a, b):
        def body(_, x):
            return fn(x, b)

        return jax.lax.fori_loop(0, CHAIN, body, a)

    return f


def timeit(fn, a, b, reps=3):
    f = chain_jit(fn)
    out = f(a, b)
    np.asarray(out[:1, :1])  # land the compile + first run
    t0 = time.perf_counter()
    x = a
    for _ in range(reps):
        x = f(x, b)
    np.asarray(x[:1, :1])
    return (time.perf_counter() - t0) / (reps * CHAIN)


@functools.lru_cache(maxsize=None)
def mul_kernel_S(spec, S: int, n_tiles: int, T: int):
    """(L*S, n_tiles*T) planes; limb i = rows [i*S, (i+1)*S)."""
    L = spec.L

    def kernel(a_ref, b_ref, o_ref):
        a_rows = [a_ref[i * S : (i + 1) * S, :] for i in range(L)]
        b_rows = [b_ref[i * S : (i + 1) * S, :] for i in range(L)]
        out = PF._mont_mul_rows(spec, a_rows, b_rows)
        for i in range(L):
            o_ref[i * S : (i + 1) * S, :] = out[i]

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L * S, n_tiles * T), jnp.uint32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((L * S, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L * S, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L * S, T), lambda i: (0, i), memory_space=pltpu.VMEM),
    )
    return jax.jit(fn)


def main():
    import os

    os.environ.setdefault("JAX_PLATFORMS", "tpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache_tpu"),
    )
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    N = 1 << 16

    for spec, nm in ((FR, "Fr"), (FQ, "Fq")):
        a = F.rand(spec, rng, (N,))
        b = F.rand(spec, rng, (N,))
        aT, bT = a.T, b.T  # (L, N)

        t = timeit(lambda x, y: PF.mul_planes(spec, x, y), aT, bT)
        print(f"{nm} mul S=1 (prod) 2^16: {t*1e3:8.2f} ms  "
              f"({N/t/1e6:6.1f} M elt/s)")

        for S in (4, 8, 16):
            for T in (128, 512):
                n_el_tile = S * T
                n_tiles = N // n_el_tile
                ap = a.reshape(n_tiles, S, T, spec.L).transpose(3, 1, 0, 2
                    ).reshape(spec.L * S, n_tiles * T)
                bp = ap  # values don't matter for timing; reuse layout
                k = mul_kernel_S(spec, S, n_tiles, T)
                t = timeit(k, ap, bp)
                print(f"{nm} mul S={S:2d} T={T:4d} 2^16: {t*1e3:8.2f} ms  "
                      f"({N/t/1e6:6.1f} M elt/s)")




# ---------------------------------------------------------------------------
# Part 2: fused G1 point-add variants + transpose cost
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def add_kernel_S(S: int, n_tiles: int, T: int):
    from collaborative_zksnark_tpu.ops import pallas_curve as PC
    L = FQ.L

    def rows(ref):
        return [ref[i * S : (i + 1) * S, :] for i in range(L)]

    def kernel(px, py, pz, qx, qy, qz, ox, oy, oz):
        outs = PC._point_add_rows(
            FQ, rows(px), rows(py), rows(pz), rows(qx), rows(qy), rows(qz)
        )
        for ref, rws in zip((ox, oy, oz), outs):
            for i in range(L):
                ref[i * S : (i + 1) * S, :] = rws[i]

    spec = lambda: pl.BlockSpec((L * S, T), lambda i: (0, i), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((L * S, n_tiles * T), jnp.uint32) for _ in range(3)
        ),
        grid=(n_tiles,),
        in_specs=[spec() for _ in range(6)],
        out_specs=tuple(spec() for _ in range(3)),
    )
    return jax.jit(fn)


def timeit_add(f, coords, reps=2, chain=32):
    @jax.jit
    def g(px, py, pz):
        def body(_, st):
            return f(st[0], st[1], st[2], st[0], st[1], st[2])
        return jax.lax.fori_loop(0, chain, body, (px, py, pz))

    out = g(*coords)
    np.asarray(out[0][:1, :1])
    t0 = time.perf_counter()
    st = coords
    for _ in range(reps):
        st = g(*st)
    np.asarray(st[0][:1, :1])
    return (time.perf_counter() - t0) / (reps * chain)


def part2():
    from collaborative_zksnark_tpu.ops import curve as cv
    from collaborative_zksnark_tpu.ops import pallas_curve as PC
    from collaborative_zksnark_tpu.algebra import hostfield as H

    rng = np.random.default_rng(1)
    N = 1 << 16
    # distinct-ish points: tile 64 host points
    host_pts = [H.G1.scalar_mul(H.G1_GEN, int(rng.integers(1, 1 << 62)))
                for _ in range(64)]
    p1 = cv.g1_from_host(host_pts)
    reps_t = N // 64
    pts = [jnp.tile(c, (reps_t, 1)) for c in (p1.x, p1.y, p1.z)]

    # (a) production point_add path ((N, L) coords, whatever it routes to)
    @jax.jit
    def prod_chain(px, py, pz):
        def body(_, st):
            P = cv.JacPoint(*st)
            out = cv.point_add(cv.FQ_OPS, P, P)
            return (out.x, out.y, out.z)
        return jax.lax.fori_loop(0, 32, body, (px, py, pz))

    out = prod_chain(*pts)
    np.asarray(out[0][:1, :1])
    t0 = time.perf_counter()
    st = tuple(pts)
    for _ in range(2):
        st = prod_chain(*st)
    np.asarray(st[0][:1, :1])
    t = (time.perf_counter() - t0) / 64
    print(f"G1 add prod-path 2^16:    {t*1e3:8.2f} ms ({N/t/1e6:6.1f} M pt/s)")

    # (b) fused kernel variants on plane layout
    for S, T in ((1, 1024), (4, 256), (8, 128), (8, 256), (8, 512)):
        n_el = S * T
        n_tiles = N // n_el
        planes = []
        for c in pts:
            planes.append(
                c.reshape(n_tiles, S, T, FQ.L).transpose(3, 1, 0, 2)
                .reshape(FQ.L * S, n_tiles * T)
            )
        k = add_kernel_S(S, n_tiles, T)
        t = timeit_add(k, tuple(planes))
        print(f"G1 add fused S={S} T={T:4d}:  {t*1e3:8.2f} ms ({N/t/1e6:6.1f} M pt/s)")




# ---------------------------------------------------------------------------
# Part 3: MSM stage breakdown at 2^16, c=8 (W=32)
# ---------------------------------------------------------------------------

def _bench_stage(name, jfn, args, n_work, reps=2):
    out = jfn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[0])
    t = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {t*1e3:8.1f} ms")
    return t


def part3():
    from collaborative_zksnark_tpu.ops import curve as cv
    from collaborative_zksnark_tpu.ops import msm as M
    from collaborative_zksnark_tpu.algebra import hostfield as H

    rng = np.random.default_rng(2)
    N = 1 << 16
    c = 8
    W = (253 + c - 1) // c
    host_pts = [H.G1.scalar_mul(H.G1_GEN, int(rng.integers(1, 1 << 62)))
                for _ in range(64)]
    p1 = cv.g1_from_host(host_pts)
    pts = cv.JacPoint(*[jnp.tile(cc, (N // 64, 1)) for cc in (p1.x, p1.y, p1.z)])
    sc = F.rand(FR, rng, (N,))

    digs = jax.jit(lambda s: M._window_digits(
        M._scalar_bits_standard(s), c, W))(sc)
    np.asarray(digs[0, 0])

    # stage 1: sort + gather (per window, vmapped)
    @jax.jit
    def sort_take(digs, px, py, pz):
        def one(d):
            order = jnp.argsort(d)
            return (jnp.take(d, order), jnp.take(px, order, axis=0),
                    jnp.take(py, order, axis=0), jnp.take(pz, order, axis=0))
        return jax.vmap(one)(digs)
    ds, sx, sy, sz = sort_take(digs, pts.x, pts.y, pts.z)
    _bench_stage("sort+gather (32 windows)", sort_take,
                 (digs, pts.x, pts.y, pts.z), N * W)

    # stage 2: segmented scan
    @jax.jit
    def seg_scan(ds, sx, sy, sz):
        def one(d, x, y, z):
            seg = jnp.concatenate([jnp.ones((1,), jnp.int32),
                                   (d[1:] != d[:-1]).astype(jnp.int32)])
            s = M._segmented_scan_points(cv.FQ_OPS, cv.JacPoint(x, y, z), seg)
            return s.x, s.y, s.z
        return jax.vmap(one)(ds, sx, sy, sz)
    _bench_stage("segmented scan (32 windows)", seg_scan, (ds, sx, sy, sz), 0)

    # stage 3: bucket extract + weighted totals
    scx, scy, scz = seg_scan(ds, sx, sy, sz)
    @jax.jit
    def buckets_total(ds, scx, scy, scz):
        def one(d, x, y, z):
            b = M._bucket_sums(cv.FQ_OPS, cv.JacPoint(x, y, z), d, 1 << c)
            t = M._weighted_bucket_total(cv.FQ_OPS, b)
            return t.x, t.y, t.z
        return jax.vmap(one)(ds, scx, scy, scz)
    _bench_stage("buckets+weighted total", buckets_total, (ds, scx, scy, scz), 0)

    # stage 4: window combine ladder
    rx, ry, rz = buckets_total(ds, scx, scy, scz)
    @jax.jit
    def ladder(rx, ry, rz):
        res = cv.JacPoint(rx, ry, rz)
        def body(i, acc):
            w = W - 2 - i
            def dbl(_, Q):
                return cv.point_double(cv.FQ_OPS, Q)
            acc = jax.lax.fori_loop(0, c, dbl, acc)
            return cv.point_add(cv.FQ_OPS, acc,
                                cv.JacPoint(res.x[w], res.y[w], res.z[w]))
        top = cv.JacPoint(res.x[-1], res.y[-1], res.z[-1])
        return jax.lax.fori_loop(0, W - 1, body, top)
    _bench_stage("window combine ladder", ladder, (rx, ry, rz), 0)


if __name__ == "__main__":
    part3()
