"""Device field arithmetic vs. plain Python-int ground truth.

The analog of the reference's ark-ff unit tests (algebra/ff): every op is
checked element-wise against arbitrary-precision ints, including edge cases
(0, p-1, equal operands).
"""

import jax
import numpy as np
import pytest

from collaborative_zksnark_tpu.algebra import field as F

SPECS = [F.FR, F.FQ]


def _rand_ints(rng, p, n):
    xs = [int.from_bytes(rng.bytes(64), "little") % p for _ in range(n)]
    return xs


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_roundtrip(spec):
    rng = np.random.default_rng(1)
    xs = _rand_ints(rng, spec.p, 8) + [0, 1, spec.p - 1]
    a = spec.to_device(xs)
    assert list(spec.to_host(a)) == xs


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_ring_ops(spec):
    rng = np.random.default_rng(2)
    p = spec.p
    n = 32
    xs = _rand_ints(rng, p, n)
    ys = _rand_ints(rng, p, n)
    xs[0] = 0
    ys[1] = 0
    xs[2] = p - 1
    ys[2] = p - 1
    ys[3] = xs[3]
    a = spec.to_device(xs)
    b = spec.to_device(ys)

    @jax.jit
    def all_ops(a, b):
        return (
            F.add(spec, a, b),
            F.sub(spec, a, b),
            F.mul(spec, a, b),
            F.neg(spec, a),
            F.sqr(spec, a),
        )

    add, sub, mul, negv, sq = [spec.to_host(x) for x in all_ops(a, b)]
    for i in range(n):
        assert add[i] == (xs[i] + ys[i]) % p
        assert sub[i] == (xs[i] - ys[i]) % p
        assert mul[i] == (xs[i] * ys[i]) % p
        assert negv[i] == (-xs[i]) % p
        assert sq[i] == (xs[i] * xs[i]) % p


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_inverse(spec):
    rng = np.random.default_rng(3)
    p = spec.p
    n = 16
    xs = _rand_ints(rng, p, n)
    xs[0] = 0  # inv(0) = 0, matching ark_ff batch_inversion skipping zeros
    xs[1] = 1
    a = spec.to_device(xs)
    iv = spec.to_host(jax.jit(lambda a: F.inv(spec, a))(a))
    biv = spec.to_host(jax.jit(lambda a: F.batch_inv(spec, a))(a))
    for i in range(n):
        expect = 0 if xs[i] == 0 else pow(xs[i], p - 2, p)
        assert iv[i] == expect
        assert biv[i] == expect


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_pow(spec):
    rng = np.random.default_rng(4)
    xs = _rand_ints(rng, spec.p, 4)
    a = spec.to_device(xs)
    for e in (0, 1, 2, 12345, (1 << 64) + 5):
        pw = spec.to_host(jax.jit(lambda a: F.pow_int(spec, a, e))(a))
        for i, x in enumerate(xs):
            assert pw[i] == pow(x, e, spec.p), e


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mont_constants_match_arkworks_form(spec):
    # R = 2^(16 L) equals arkworks' R = 2^(64 * nwords) for these fields, so
    # Montgomery representations agree numerically with the reference.
    nwords = {16: 4, 24: 6}[spec.L]
    assert 16 * spec.L == 64 * nwords
