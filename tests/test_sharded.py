"""Data-axis sharding (SURVEY.md §5.7) on the virtual 8-device CPU mesh:
4-step sharded NTT variants (inverse/coset, self-chaining colshard layout),
sharded MSM, the sharded QAP witness map, and the fully data-sharded
Groth16 prove (must be bit-identical to the unsharded prover)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as Pspec

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.algebra.field import FR
from collaborative_zksnark_tpu.mpc.local import LocalScheme
from collaborative_zksnark_tpu.ops import curve as cv
from collaborative_zksnark_tpu.ops import msm as msm_mod
from collaborative_zksnark_tpu.ops import ntt
from collaborative_zksnark_tpu.ops import ntt_sharded as nsh
from collaborative_zksnark_tpu.parallel import sharded as shd
from collaborative_zksnark_tpu.relations import r1cs
from collaborative_zksnark_tpu.snark import groth16

P = C.R_MOD


def _data_mesh(S):
    return Mesh(np.array(jax.devices()[:S]), ("data",))


def _run_colshard(vec, n1, n2, S, fn):
    """Drive fn(local_cols) under shard_map; vec replicated in, out gathered
    along the colshard axis (axis 1 of the local result)."""
    mesh = _data_mesh(S)

    @partial(shard_map, mesh=mesh, in_specs=(Pspec(),),
             out_specs=Pspec(None, "data"), check_rep=False)
    def step(v):
        local = nsh.colshard_slice(v, n1, n2, "data", S)
        return fn(local)

    with mesh:
        return jax.jit(step)(vec)


def test_transform_colshard_chain_matches_local():
    """ifft -> coset_fft chain (no relayout between transforms) and the
    coset-ifft must match the single-device domain ops exactly."""
    rng = np.random.default_rng(8)
    n, S = 64, 4
    n1, n2 = groth16._split_dims(n, S)
    dom = ntt.get_radix2_domain(n)
    x = F.rand(FR, rng, (n,))

    def chain(local):
        t = nsh.transform_colshard(local, n1, n2, "data", S, inverse=True)
        return nsh.transform_colshard(t, n2, n1, "data", S, coset="fwd")

    got = _run_colshard(x, n1, n2, S, chain)  # (n1, n2) colshard-gathered
    ref = dom.coset_fft(dom.ifft(x))
    # colshard layout: element (j1, j2) = vec[j1*n2 + j2]; compare as field
    # VALUES (lazy [0, 2p) representatives differ with op order)
    ref_m = ref.reshape(n1, n2, FR.L)
    assert bool(jnp.all(F.eq(FR, got, ref_m)))

    # coset interpolation: odd chain ends in the transposed-dims layout
    mesh = _data_mesh(S)

    @partial(shard_map, mesh=mesh, in_specs=(Pspec(),),
             out_specs=Pspec("data"), check_rep=False)
    def step_inv(v):
        local = nsh.colshard_slice(v, n1, n2, "data", S)
        out = nsh.transform_colshard(
            local, n1, n2, "data", S, inverse=True, coset="inv"
        )  # (n2, n1/S, L)
        return out.reshape(-1, FR.L)  # flatten per shard

    with mesh:
        got2 = jax.jit(step_inv)(x).reshape(-1, FR.L)
    ref2 = np.asarray(dom.coset_ifft(x))
    imap = nsh.colshard_index_map(n1, n2, S).reshape(-1)
    assert bool(jnp.all(F.eq(FR, got2, jnp.asarray(ref2[imap]))))


def test_msm_data_sharded_matches():
    from collaborative_zksnark_tpu.algebra import hostfield as H

    rng = np.random.default_rng(9)
    n, S = 24, 4
    pts_h = [H.G1.scalar_mul(H.G1_GEN, i + 3) for i in range(n)]
    pts = cv.g1_from_host(pts_h)
    sc = F.rand(FR, rng, (n,))
    imap = shd.block_index_map(n, S)
    blocks = shd.block_points(pts, imap)
    n_loc = imap.shape[1]
    sc_pad = jnp.pad(sc, ((0, S * n_loc - n), (0, 0)))
    mesh = _data_mesh(S)

    @partial(shard_map, mesh=mesh,
             in_specs=(Pspec(),
                       cv.JacPoint(Pspec("data"), Pspec("data"), Pspec("data"))),
             out_specs=cv.JacPoint(Pspec(), Pspec(), Pspec()),
             check_rep=False)
    def step(s_full, pb):
        pb = cv.JacPoint(pb.x[0], pb.y[0], pb.z[0])
        didx = jax.lax.axis_index("data")
        s_loc = jax.lax.dynamic_slice_in_dim(s_full, didx * n_loc, n_loc, 0)
        return shd.msm_data_sharded(cv.FQ_OPS, pb, s_loc, "data")

    with mesh:
        got = jax.jit(step)(sc_pad, blocks)
    ref = msm_mod.msm(cv.FQ_OPS, pts, sc)
    g = cv.g1_to_host(cv.JacPoint(got.x[None], got.y[None], got.z[None]))[0]
    r = cv.g1_to_host(cv.JacPoint(ref.x[None], ref.y[None], ref.z[None]))[0]
    assert g == r


def test_witness_map_sharded_matches():
    rng = np.random.default_rng(10)
    cs, assign = r1cs.squaring_circuit(16)
    inst, wit = assign(5)
    z = FR.to_device(inst + wit)
    ref = np.asarray(groth16.witness_map(cs, z))
    S = 4
    a_rows, _, _ = cs.padded_rows()
    n = ntt.get_radix2_domain(len(a_rows)).n
    n1, n2 = groth16._split_dims(n, S)
    mesh = _data_mesh(S)
    local = LocalScheme()

    @partial(shard_map, mesh=mesh, in_specs=(Pspec(),),
             out_specs=Pspec("data"), check_rep=False)
    def step(zf):
        h_loc, _ = groth16.witness_map_sharded(cs, local, zf, "data", S)
        return h_loc.reshape(-1, FR.L)

    with mesh:
        got = np.asarray(jax.jit(step)(z))
    imap = nsh.colshard_index_map(n1, n2, S).reshape(-1)
    full = np.zeros((n, FR.L), np.uint32)
    full[imap] = got
    # compare the first n-1 coefficients (witness_map truncates)
    a = F.FR.to_host(jnp.asarray(full[: n - 1]))
    b = F.FR.to_host(jnp.asarray(ref))
    assert list(a) == list(b)


def test_prove_data_sharded_verifies():
    rng = np.random.default_rng(11)
    cs, assign = r1cs.squaring_circuit(16)
    pk, vk = groth16.setup(cs, seed=21)
    inst, wit = assign(9)
    z = FR.to_device(inst + wit)
    r_m = F.rand(FR, rng, ())
    s_m = F.rand(FR, rng, ())
    mesh = _data_mesh(4)
    proof = groth16.prove_data_sharded(pk, cs, z, r_m, s_m, mesh)
    hp = groth16.reveal_proof(proof)
    assert groth16.verify(vk, hp, inst[1:])
    # bit-identical to the unsharded prover under the same randomness
    ref = groth16.reveal_proof(groth16.prove(pk, cs, z, r_m, s_m))
    assert (hp.a, hp.b, hp.c) == (ref.a, ref.b, ref.c)
