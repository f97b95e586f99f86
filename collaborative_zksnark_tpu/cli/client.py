"""`client` driver — the analog of the reference's mpc-snarks `client`
binary (ref mpc-snarks/src/client.rs:34-63): a matrix of small MPC
computations used as integration smoke tests, each checked against a plain
recomputation.

    python -m collaborative_zksnark_tpu.cli.client <computation> \
        --alg {hbc,spdz,gsz} --parties K --size N

Computations: sum, product, pproduct, inv, dh, groupops, msm, fft, polydiv,
kzg, groth16, plonk.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser("client")
    ap.add_argument("computation")
    ap.add_argument("--alg", choices=["hbc", "spdz", "gsz", "local"], default="hbc")
    ap.add_argument("--parties", type=int, default=2)
    ap.add_argument("--size", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    os.environ.pop("JAX_PLATFORMS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".jax_cache",
        ),
    )

    import numpy as np

    from ..algebra import bls12_377 as C
    from ..algebra import field as F
    from ..algebra import hostfield as H
    from ..mpc import wire
    from ..mpc.context import MpcContext
    from ..ops import curve as cv
    from ..ops import msm as msm_mod
    from ..parallel.net import StackedNet

    P = C.R_MOD
    rng = np.random.default_rng(args.seed)
    net = StackedNet(args.parties)
    ctx = MpcContext(net, seed=args.seed)
    sch = wire.make_scheme(args.alg, ctx)
    xs = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(args.size)]
    sh = sch.king_share(F.FR.to_device(xs))
    comp = args.computation

    def check(got, expect, label):
        assert got == expect, (label, got, expect)
        print(f"{label}: OK")

    if comp == "sum":
        total = sch.reveal(sh)
        got = int(F.FR.to_host(F.fold_sum(F.FR, total, axis=-2))[()])
        check(got, sum(xs) % P, "sum")
    elif comp == "product":
        y = sch.mul(sh, sh)
        got = [int(v) for v in F.FR.to_host(sch.reveal(y))]
        check(got, [x * x % P for x in xs], "product")
    elif comp == "pproduct":
        y = sch.partial_products(sh)
        got = [int(v) for v in F.FR.to_host(sch.reveal(y))]
        exp = []
        acc = 1
        for x in xs:
            acc = acc * x % P
            exp.append(acc)
        check(got, exp, "pproduct")
    elif comp == "inv":
        y = sch.inv(sh)
        got = [int(v) for v in F.FR.to_host(sch.reveal(y))]
        check(got, [pow(x, P - 2, P) for x in xs], "inv")
    elif comp == "fft":
        from ..ops import ntt

        dom = ntt.get_radix2_domain(args.size)
        y = sch.lin_map(lambda a: (jax.vmap(dom.fft)(a) if a.ndim == 3 else dom.fft(a)), sh)
        got = [int(v) for v in F.FR.to_host(sch.reveal(y))]
        exp = [
            sum(c * pow(w, i, P) for i, c in enumerate(xs)) % P
            for w in dom.elements()
        ]
        check(got, exp, "fft (local on shares)")
    elif comp == "dh":
        # shared-scalar Diffie-Hellman-ish: reveal g^(x0*x1)
        a = sch.lin_map(lambda t: t[..., 0, :], sh)
        b = sch.lin_map(lambda t: t[..., 1, :], sh)
        ab = sch.mul(a, b)
        gen = cv.g1_from_host([H.G1_GEN])
        gen1 = cv.JacPoint(gen.x[0], gen.y[0], gen.z[0])
        res = sch.g_from_scalar_mul(cv.FQ_OPS, gen1, ab)
        pt = sch.g_reveal(cv.FQ_OPS, res)
        got = cv.g1_to_host(cv.JacPoint(pt.x[None], pt.y[None], pt.z[None]))[0]
        check(got, H.G1.scalar_mul(H.G1_GEN, xs[0] * xs[1] % P), "dh")
    elif comp == "msm":
        pts = [
            H.G1.scalar_mul(H.G1_GEN, int.from_bytes(rng.bytes(40), "little") % P)
            for _ in range(args.size)
        ]
        Pd = cv.g1_from_host(pts)
        res_sh = sch.g_msm(cv.FQ_OPS, Pd, sh)
        pt = sch.g_reveal(cv.FQ_OPS, res_sh)
        got = cv.g1_to_host(cv.JacPoint(pt.x[None], pt.y[None], pt.z[None]))[0]
        exp = None
        for k, p in zip(xs, pts):
            exp = H.G1.add(exp, H.G1.scalar_mul(p, k))
        check(got, exp, "msm (pub base x shared scalars)")
    elif comp == "kzg":
        from ..snark import kzg as kzgmod

        srs = kzgmod.setup(args.size, seed=args.seed + 1)
        cmt = kzgmod.commit_and_reveal(sch, srs, sh)
        xpt = int.from_bytes(rng.bytes(40), "little") % P
        y, pf = kzgmod.open_share(sch, srs, sh, xpt)
        assert kzgmod.host_verify(srs, cmt, xpt, y, pf)
        exp = sum(c * pow(xpt, i, P) for i, c in enumerate(xs)) % P
        check(y, exp, "kzg commit/open/verify")
    else:
        raise SystemExit(f"unknown computation {comp}")

    ctx.assert_checks()
    print(f"stats: {net.stats.as_dict()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
