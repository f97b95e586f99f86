"""NTT/iNTT correctness vs. naive host evaluation.

Mirrors ark-poly's fft tests (algebra/poly/src/domain/radix2/fft.rs tests,
domain/mixed_radix.rs:466+): fft == pointwise polynomial evaluation over the
domain; ifft . fft == id; coset variants likewise.
"""

import numpy as np
import pytest

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.ops import ntt

P = C.R_MOD


def _host_eval(coeffs, x, p):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % p
    return acc


@pytest.mark.parametrize("n", [1, 2, 8, 32])
def test_radix2_fft_matches_naive(n):
    rng = np.random.default_rng(5)
    coeffs = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]
    dom = ntt.get_radix2_domain(n)
    evals = F.FR.to_host(dom.fft(F.FR.to_device(coeffs)))
    for i, x in enumerate(dom.elements()):
        assert evals[i] == _host_eval(coeffs, x, P), i


@pytest.mark.parametrize("n", [8, 64])
def test_radix2_ifft_roundtrip(n):
    rng = np.random.default_rng(6)
    coeffs = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]
    dom = ntt.get_radix2_domain(n)
    a = F.FR.to_device(coeffs)
    back = F.FR.to_host(dom.ifft(dom.fft(a)))
    assert list(back) == coeffs


@pytest.mark.parametrize("n", [8, 32])
def test_coset_fft(n):
    rng = np.random.default_rng(7)
    coeffs = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]
    dom = ntt.get_radix2_domain(n)
    a = F.FR.to_device(coeffs)
    evals = F.FR.to_host(dom.coset_fft(a))
    g = C.FR_GENERATOR
    for i, x in enumerate(dom.elements()):
        assert evals[i] == _host_eval(coeffs, g * x % P, P), i
    back = F.FR.to_host(dom.coset_ifft(dom.coset_fft(a)))
    assert list(back) == coeffs


@pytest.mark.parametrize("n", [3, 12, 48])
def test_mixed_radix_fft(n):
    rng = np.random.default_rng(8)
    coeffs = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]
    dom = ntt.get_mixed_domain(n)
    assert dom.n == n if n % 3 == 0 else dom.n >= n
    coeffs += [0] * (dom.n - n)
    a = F.FR.to_device(coeffs)
    evals = F.FR.to_host(dom.fft(a))
    for i, x in enumerate(dom.elements()):
        assert evals[i] == _host_eval(coeffs, x, P), i
    back = F.FR.to_host(dom.ifft(dom.fft(a)))
    assert list(back) == coeffs
    back2 = F.FR.to_host(dom.coset_ifft(dom.coset_fft(a)))
    assert list(back2) == coeffs
