"""Fused digit-domain NTT (ops/ntt_fused.py) numerics.

transform_xla is the bit-exact XLA emulation of the Pallas pipeline (same
block functions); these tests pin it against the production Radix2Domain
on CPU.  The Pallas path itself is exercised in interpreter mode behind
CZTPU_RUN_INTERPRET=1 (slow) and on the real TPU by scripts/ntt_fused_bench.
"""

import os

import numpy as np
import pytest

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.ops import ntt, ntt_fused as NF

P = C.R_MOD


def _vals(a):
    return [int(v) for v in F.FR.to_host(np.asarray(a))]


def _rand(rng, n):
    return [int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]


@pytest.mark.parametrize("n", [1 << 11, 1 << 12])
def test_fwd_matches_radix2(n):
    rng = np.random.default_rng(n)
    dom = ntt.get_radix2_domain(n)
    xs = _rand(rng, n)
    xd = F.FR.to_device(xs)
    d = dom._dev()
    exp = _vals(dom._fft_j(xd, d["perm"], d["twf"]))
    plan = NF.get_fused_plan(n, "fwd", dom.omega)
    assert _vals(NF.transform_xla(plan, xd)) == exp


def test_inv_and_coset_roundtrips():
    n = 1 << 11
    rng = np.random.default_rng(1)
    dom = ntt.get_radix2_domain(n)
    xs = _rand(rng, n)
    xd = F.FR.to_device(xs)
    ninv = pow(n, P - 2, P)
    plan = NF.get_fused_plan(n, "fwd", dom.omega)
    iplan = NF.get_fused_plan(n, "inv", dom.omega_inv, ninv)
    assert _vals(NF.transform_xla(iplan, NF.transform_xla(plan, xd))) == xs

    gp = NF.get_fused_plan(n, "coset_fwd", dom.omega, coset_g=C.FR_GENERATOR)
    exp_c = _vals(dom.coset_fft(xd))
    got_c = NF.transform_xla(gp, xd)
    assert _vals(got_c) == exp_c
    gpi = NF.get_fused_plan(n, "coset_inv", dom.omega_inv, ninv,
                            coset_g=C.FR_GENERATOR)
    assert _vals(NF.transform_xla(gpi, got_c)) == xs


def test_output_invariant():
    """Outputs must satisfy the field-layer invariant: canonical u16 limbs,
    value < 2p."""
    n = 1 << 11
    rng = np.random.default_rng(2)
    dom = ntt.get_radix2_domain(n)
    plan = NF.get_fused_plan(n, "fwd", dom.omega)
    out = np.asarray(NF.transform_xla(plan, F.FR.to_device(_rand(rng, n))))
    assert out.dtype == np.uint32 and int(out.max()) < (1 << 16)
    vals = [sum(int(l) << (16 * i) for i, l in enumerate(r)) for r in out]
    assert max(vals) < 2 * P


@pytest.mark.slow
def test_three_factor():
    n = 1 << 17
    rng = np.random.default_rng(3)
    dom = ntt.get_radix2_domain(n)
    xs = _rand(rng, n)
    xd = F.FR.to_device(xs)
    d = dom._dev()
    exp = _vals(dom._fft_j(xd, d["perm"], d["twf"]))
    plan = NF.get_fused_plan(n, "fwd", dom.omega)
    assert plan.factors == [256, 256, 2]
    assert _vals(NF.transform_xla(plan, xd)) == exp


@pytest.mark.skipif(
    os.environ.get("CZTPU_RUN_INTERPRET") != "1",
    reason="Pallas interpreter run is slow; opt-in via CZTPU_RUN_INTERPRET=1",
)
def test_pallas_interpret_matches_emulation():
    n = 1 << 11
    rng = np.random.default_rng(4)
    dom = ntt.get_radix2_domain(n)
    xd = F.FR.to_device(_rand(rng, n))
    plan = NF.get_fused_plan(n, "fwd", dom.omega)
    assert _vals(NF.transform(plan, xd)) == _vals(NF.transform_xla(plan, xd))
