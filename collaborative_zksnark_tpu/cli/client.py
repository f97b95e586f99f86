"""`client` driver — the analog of the reference's mpc-snarks `client`
binary (ref mpc-snarks/src/client.rs:34-63): a matrix of small MPC
computations used as integration smoke tests, each checked against a plain
recomputation.

    python -m collaborative_zksnark_tpu.cli.client <computation> \
        --alg {hbc,spdz,gsz} --parties K --size N

Computations (every one named here is implemented; ref client.rs:34-63 —
the FULL 25-entry enum, including the entries the reference declares but
leaves commented-out/todo!: Commit, NaiveMsm, PcTwoCom):
  field:    sum, product, pproduct, inv, fft, polydiv, polyeval, commit
  group:    dh, groupops, msm, naivemsm
  pairing:  pairingdh, pairingprod, pairingdiv    (hbc/spdz/gsz GT shares)
  poly-commit: kzg, kzgzk, kzgzkbatch, marlinpc, marlinpcbatch, pctwocom
  snark:    groth16, plonk, marlin
  hash:     merkle, fri
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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    from ..algebra import params as C
    from ..algebra import field as F
    from ..algebra import hostapi as H
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
    elif comp == "kzgzk":
        # hiding commitment + zk opening (ref client.rs KzgZk)
        from ..snark import kzg as kzgmod

        srs = kzgmod.setup(args.size + 4, seed=args.seed + 1, hiding=True)
        cm, rand = kzgmod.commit_labeled(sch, srs, sh, hiding_bound=2)
        xpt = int.from_bytes(rng.bytes(40), "little") % P
        y, pf = kzgmod.open_share(sch, srs, sh, xpt, rand=rand)
        assert pf.random_v is not None, "zk opening must carry random_v"
        assert kzgmod.host_verify(srs, cm.comm, xpt, y, pf)
        exp = sum(c * pow(xpt, i, P) for i, c in enumerate(xs)) % P
        check(y, exp, "kzgzk hiding commit/open/verify")
    elif comp == "kzgzkbatch":
        # two hiding commits, two openings, ONE batched pairing check
        # (ref client.rs KzgZkBatch -> kzg10 batch_check)
        from ..snark import kzg as kzgmod

        srs = kzgmod.setup(args.size + 4, seed=args.seed + 1, hiding=True)
        ys = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(args.size)]
        sh2 = sch.king_share(F.FR.to_device(ys))
        checks = []
        for coeffs, shx in ((xs, sh), (ys, sh2)):
            cm, rand = kzgmod.commit_labeled(sch, srs, shx, hiding_bound=2)
            xpt = int.from_bytes(rng.bytes(40), "little") % P
            y, pf = kzgmod.open_share(sch, srs, shx, xpt, rand=rand)
            exp = sum(c * pow(xpt, i, P) for i, c in enumerate(coeffs)) % P
            assert y == exp
            checks.append((cm.comm, xpt, y, pf))
        assert kzgmod.batch_check(srs, checks, seed=args.seed)
        check(True, True, "kzgzkbatch")
    elif comp in ("marlinpc", "marlinpcbatch"):
        # MarlinKZG10: degree-bound + hiding commit, combined opening with
        # opening challenges (ref client.rs MarlinPc / MarlinPcBatch)
        from ..snark import kzg as kzgmod

        srs = kzgmod.setup(args.size + 6, seed=args.seed + 1, hiding=True)
        dbound = args.size + 2
        labeled = []
        items = []
        polys = [(xs, sh)]
        if comp == "marlinpcbatch":
            ys = [
                int.from_bytes(rng.bytes(40), "little") % P
                for _ in range(args.size)
            ]
            polys.append((ys, sch.king_share(F.FR.to_device(ys))))
        xpt = int.from_bytes(rng.bytes(40), "little") % P
        for coeffs, shx in polys:
            cm, rand = kzgmod.commit_labeled(
                sch, srs, shx, hiding_bound=2, degree_bound=dbound
            )
            y = sum(c * pow(xpt, i, P) for i, c in enumerate(coeffs)) % P
            labeled.append((shx, rand, dbound))
            items.append((cm, y))
        opening_challenge = int.from_bytes(rng.bytes(16), "little")
        pf = kzgmod.open_combined(sch, srs, labeled, xpt, opening_challenge)
        assert kzgmod.check_combined(srs, items, xpt, pf, opening_challenge)
        check(True, True, comp)
    elif comp == "groupops":
        # ((g*a + g - g) * 4 == g * (4a) (ref client.rs GroupOps)
        a_sh = sch.lin_map(lambda t: t[..., 0, :], sh)
        gen = cv.g1_from_host([H.G1_GEN])
        gen1 = cv.JacPoint(gen.x[0], gen.y[0], gen.z[0])
        ga = sch.g_from_scalar_mul(cv.FQ_OPS, gen1, a_sh)
        gshift = sch.g_shift(cv.FQ_OPS, ga, gen1)
        gsub = sch.g_shift(cv.FQ_OPS, gshift, cv.point_neg(cv.FQ_OPS, gen1))
        # * 4 == two share-local doublings (scale by a public int)
        r1_sh = sch.g_add(cv.FQ_OPS, gsub, gsub)
        r1_sh = sch.g_add(cv.FQ_OPS, r1_sh, r1_sh)
        r1 = sch.g_reveal(cv.FQ_OPS, r1_sh)
        got = cv.g1_to_host(cv.JacPoint(r1.x[None], r1.y[None], r1.z[None]))[0]
        check(got, H.G1.scalar_mul(H.G1_GEN, 4 * xs[0] % P), "groupops")
    elif comp == "polydiv":
        # shared p(X) divided by public (X + 1) (ref client.rs PolyDiv)
        from ..snark import poly_share as ps

        q_sh, r_sh = ps.univariate_div_qr(sch, sh, [1, 1])
        q = [int(v) for v in F.FR.to_host(sch.reveal(q_sh))]
        r = [int(v) for v in F.FR.to_host(sch.reveal(r_sh))]
        # host long division
        c = [x % P for x in xs]
        qh = [0] * (len(c) - 1)
        for i in range(len(c) - 2, -1, -1):
            qh[i] = c[i + 1]
            c[i] = (c[i] - qh[i]) % P
            c[i + 1] = 0
        check(q, qh, "polydiv quotient")
        check(r[0], c[0], "polydiv remainder")
    elif comp == "polyeval":
        # shared p(X) evaluated at public x = 2 (ref client.rs:654-659
        # run_uv_poly PolyEval)
        from ..snark import poly_share as ps

        y_sh = ps.eval_at(sch, sh, 2)
        got = int(F.FR.to_host(sch.reveal(y_sh))[()])
        exp = sum(c * pow(2, i, P) for i, c in enumerate(xs)) % P
        check(got, exp, "polyeval")
    elif comp == "commit":
        # transcript-commit to the share vector and derive a joint challenge
        # (ref client.rs:710-722 Commit — commented out upstream because it
        # serializes secrets into the transcript; here the commitment round
        # exchanges SALTED algebraic digests of the shares instead, so no
        # share material leaks beyond the commit-then-open broadcast)
        from ..utils import fs as fsmod

        gathered, ok = net.atomic_gather(sh if args.alg != "spdz" else sh.sh)
        ctx.push_check("commit_open", ok)
        t = fsmod.FiatShamir(b"commit")
        t.absorb(bytes(np.asarray(gathered).tobytes()[:256]))
        c = t.gen_fr()
        check(c != 0, True, "commit (commit-then-open + joint challenge)")
    elif comp == "naivemsm":
        # the NaiveMsm strategy: per-element scalar muls + sum, checked
        # against the Pippenger path (ref share/msm.rs:13-27 NaiveMsm;
        # client.rs NaiveMsm is todo!() upstream)
        import jax.numpy as jnp

        pts = [
            H.G1.scalar_mul(H.G1_GEN, int.from_bytes(rng.bytes(40), "little") % P)
            for _ in range(args.size)
        ]
        Pd = cv.g1_from_host(pts)

        def naive(arr):
            """Per-element scalar muls + pairwise sum (the NaiveMsm
            strategy), applied per party row when a party axis exists."""
            if arr.ndim == 3:
                outs = [naive(arr[i]) for i in range(arr.shape[0])]
                return cv.JacPoint(
                    jnp.stack([o.x for o in outs]),
                    jnp.stack([o.y for o in outs]),
                    jnp.stack([o.z for o in outs]),
                )
            scaled = cv.point_scale_batch(cv.FQ_OPS, Pd, arr)
            return cv.reduce_points(cv.FQ_OPS, scaled)

        if hasattr(sh, "sh"):  # spdz container: share + MAC rows
            from ..mpc.spdz import SpdzGroupShare

            res_sh = SpdzGroupShare(naive(sh.sh), naive(sh.mac))
        else:
            res_sh = naive(sh)
        pt = sch.g_reveal(cv.FQ_OPS, res_sh)
        got = cv.g1_to_host(cv.JacPoint(pt.x[None], pt.y[None], pt.z[None]))[0]
        exp = None
        for k, p in zip(xs, pts):
            exp = H.G1.add(exp, H.G1.scalar_mul(p, k))
        check(got, exp, "naivemsm")
    elif comp == "pctwocom":
        # two-polynomial commitment: two labeled commits, ONE combined
        # opening proof checked jointly (ref client.rs:59 PcTwoCom — never
        # dispatched upstream; realized here as the 2-poly MarlinKZG path)
        from ..snark import kzg as kzgmod

        srs = kzgmod.setup(args.size + 6, seed=args.seed + 1, hiding=True)
        ys = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(args.size)]
        sh2 = sch.king_share(F.FR.to_device(ys))
        xpt = int.from_bytes(rng.bytes(40), "little") % P
        labeled, items = [], []
        for coeffs, shx in ((xs, sh), (ys, sh2)):
            cm, rand = kzgmod.commit_labeled(sch, srs, shx, hiding_bound=2)
            y = sum(c * pow(xpt, i, P) for i, c in enumerate(coeffs)) % P
            labeled.append((shx, rand, None))
            items.append((cm, y))
        chal = int.from_bytes(rng.bytes(16), "little")
        pf = kzgmod.open_combined(sch, srs, labeled, xpt, chal)
        assert kzgmod.check_combined(srs, items, xpt, pf, chal)
        check(True, True, "pctwocom")
    elif comp in ("pairingdh", "pairingprod", "pairingdiv"):
        from ..mpc import pairing_share as pgs

        if args.alg not in ("hbc", "spdz", "gsz"):
            raise SystemExit(f"{comp} needs GT shares (hbc/spdz/gsz)")
        gen1h, gen2h = H.G1_GEN, H.G2_GEN
        g1d = cv.g1_from_host([gen1h])
        g2d = cv.g2_from_host([gen2h])
        g1 = cv.JacPoint(g1d.x[0], g1d.y[0], g1d.z[0])
        g2 = cv.JacPoint(g2d.x[0], g2d.y[0], g2d.z[0])

        def pair_shared(u, v):
            us = sch.g_from_scalar_mul(
                cv.FQ_OPS, g1, sch.lin_map(lambda t: t[..., u, :], sh)
            )
            vs = sch.g_from_scalar_mul(
                cv.FQ2_OPS, g2, sch.lin_map(lambda t: t[..., v, :], sh)
            )
            return pgs.pairing_shared(sch, us, vs)

        def host_pair(u, v):
            return H.pairing(
                H.G1.scalar_mul(gen1h, xs[u]), H.G2.scalar_mul(gen2h, xs[v])
            )

        if comp == "pairingdh":
            got = pgs.gt_reveal(sch, pair_shared(0, 1))
            check(got == host_pair(0, 1), True, "pairingdh")
        elif comp == "pairingprod":
            lhs = pgs.gt_mul(pair_shared(0, 2), pair_shared(1, 2))
            rhs = H.fq12_mul(host_pair(0, 2), host_pair(1, 2))
            check(pgs.gt_reveal(sch, lhs) == rhs, True, "pairingprod")
        else:
            lhs = pgs.gt_div(pair_shared(0, 2), pair_shared(1, 2))
            rhs = H.fq12_mul(host_pair(0, 2), H.fq12_inv(host_pair(1, 2)))
            check(pgs.gt_reveal(sch, lhs) == rhs, True, "pairingdiv")
    elif comp == "groth16":
        from ..relations import r1cs as r1csmod
        from ..snark import groth16

        cs, assign = r1csmod.squaring_circuit(max(args.size, 2))
        pk, vk = groth16.setup(cs, seed=args.seed + 1)
        inst, wit = assign(3)
        if args.alg == "local":
            proof = groth16.prove(
                pk, cs, F.FR.to_device(inst + wit), ctx.rand_fr(()), ctx.rand_fr(())
            )
        else:
            z_sh = sch.king_share(F.FR.to_device(inst + wit))
            proof = groth16.prove_mpc(
                pk, cs, sch, z_sh, wire.rand_share(sch), wire.rand_share(sch)
            )
        hp = groth16.reveal_proof(proof)
        check(groth16.verify(vk, hp, inst[1:]), True, "groth16")
    elif comp == "plonk":
        from ..relations.plonk_circuit import CircuitLayout, PlonkCircuit
        from ..snark import plonk as plonkmod

        circ = PlonkCircuit.squaring(max(args.size, 2), start=3)
        layout = CircuitLayout.from_circuit(circ)
        srs = plonkmod.universal_setup(layout.n_gates, seed=args.seed + 1)
        pk, vk = plonkmod.circuit_setup(srs, layout)
        out = next(
            circ.values[v] for v, nm in circ.pub_vars.items() if nm == "out"
        )
        if args.alg == "local":
            vals_in = F.FR.to_device(circ.values)
        else:
            vals_in = sch.king_share(F.FR.to_device(circ.values))
        pf = plonkmod.Prover(sch, pk).prove(vals_in, {"out": out})
        check(plonkmod.verify(vk, pf, {"out": out}), True, "plonk")
    elif comp == "marlin":
        from ..relations import r1cs as r1csmod
        from ..snark import marlin as marlinmod

        cs, assign = r1csmod.squaring_circuit(max(args.size, 2))
        srs = marlinmod.universal_setup(
            marlinmod.max_degree_for(cs), seed=args.seed + 1
        )
        pk, vk = marlinmod.index(cs, srs)
        inst, wit = assign(3)
        if args.alg == "local":
            wit_in = F.FR.to_device(wit)
        else:
            wit_in = sch.king_share(F.FR.to_device(wit))
        pf = marlinmod.prove(pk, sch, inst, wit_in)
        check(marlinmod.verify(vk, inst[1:], pf), True, "marlin")
    elif comp == "merkle":
        # 2-party Merkle vector commitment over share hashes
        # (ref com.rs:37-123 + client.rs:722-738)
        from ..mpc import com as commod
        from ..utils import fs as fsmod

        key, cm = commod.commit(sch, sh)
        t = fsmod.FiatShamir(b"merkle")
        for root in cm:
            t.absorb(root)
        i = t.gen_fr() % args.size
        value, pf = commod.open_at(sch, sh, key, i)
        assert commod.check_opening(cm, pf, i, value)
        check(value, xs[i], "merkle commit/open/verify")
    elif comp == "fri":
        # FRI low-degree test over shares (ref client.rs:739-841)
        from ..mpc import com as commod

        rounds, alphas, const, t = commod.fri_commit(sch, sh)
        assert commod.fri_chain_check(sch, rounds, alphas, const, t)
        check(True, True, "fri commit + chain check")
    else:
        raise SystemExit(f"unknown computation {comp}")

    ctx.assert_checks()
    print(f"stats: {net.stats.as_dict()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
