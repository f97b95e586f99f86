"""Digit-matmul (MXU) NTT vs the radix-2 butterfly domain.

The MXU path re-derives the NTT as int8 matmuls (ops/ntt_mxu.py); these
tests pin its numerics — permutation, twiddle split, digit relax bounds,
and the final exact reduction to the [0,2p) limb invariant — against the
production Radix2Domain on the CPU backend (int8 dot_general runs on any
XLA backend, so the whole pipeline is testable without a TPU)."""

import numpy as np
import pytest

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.ops import ntt, ntt_mxu

P = C.R_MOD


def _rand_ints(rng, n):
    return [int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]


def _hostvals(x):
    return [int(v) for v in F.FR.to_host(np.asarray(x))]


@pytest.mark.parametrize("n", [64, 256, 8192])
def test_fft_matches_radix2(n):
    rng = np.random.default_rng(n)
    dom = ntt.get_radix2_domain(n)
    xs = _rand_ints(rng, n)
    xd = F.FR.to_device(xs)
    plan = ntt_mxu.get_plan(n, dom.omega)
    got = _hostvals(ntt_mxu.transform(plan, xd))
    exp = _hostvals(dom.fft(xd))
    assert got == exp


def test_limb_invariant():
    """Output limbs must satisfy the field-layer invariant: canonical
    base-2^16 digits, value < 2p."""
    rng = np.random.default_rng(7)
    n = 256
    dom = ntt.get_radix2_domain(n)
    plan = ntt_mxu.get_plan(n, dom.omega)
    out = np.asarray(ntt_mxu.transform(plan, F.FR.to_device(_rand_ints(rng, n))))
    assert out.dtype == np.uint32
    assert int(out.max()) < (1 << 16)
    vals = [
        sum(int(l) << (16 * i) for i, l in enumerate(row)) for row in out
    ]
    assert max(vals) < 2 * P


@pytest.mark.parametrize("n", [256, 4096])
def test_ifft_roundtrip(n):
    rng = np.random.default_rng(n + 1)
    dom = ntt.get_radix2_domain(n)
    xs = _rand_ints(rng, n)
    xd = F.FR.to_device(xs)
    fwd = ntt_mxu.get_plan(n, dom.omega)
    ninv = pow(n, P - 2, P)
    inv = ntt_mxu.get_plan(n, dom.omega_inv, scale=ninv)
    back = _hostvals(ntt_mxu.transform(inv, ntt_mxu.transform(fwd, xd)))
    assert back == _hostvals(xd)


def test_ifft_matches_domain():
    n = 4096
    rng = np.random.default_rng(3)
    dom = ntt.get_radix2_domain(n)
    xd = F.FR.to_device(_rand_ints(rng, n))
    ninv = pow(n, P - 2, P)
    inv = ntt_mxu.get_plan(n, dom.omega_inv, scale=ninv)
    assert _hostvals(ntt_mxu.transform(inv, xd)) == _hostvals(dom.ifft(xd))
