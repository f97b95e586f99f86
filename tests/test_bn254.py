"""BN254 second-curve coverage: constants, host pairing, device field/NTT/
MSM parity against independent Python-int ground truth, and (slow tier) a
full Groth16 prove+verify with the whole stack switched to BN254 via
CZTPU_CURVE (ref: curves/bn254/; the reference is generic over its
PairingEngine the same way, e.g. mpc-snarks binaries pick Bls12_377 as a
type parameter)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from collaborative_zksnark_tpu.algebra import bn254 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.algebra import hostbn as B
from collaborative_zksnark_tpu.ops import bn_device as D
from collaborative_zksnark_tpu.ops import msm as M
from collaborative_zksnark_tpu.ops import ntt


def test_constants_derive():
    # module import asserts the BN polynomial identities; spot-check sizes
    assert C.R_MOD.bit_length() == 254 and C.Q_MOD.bit_length() == 254
    assert pow(C.FR_TWO_ADIC_ROOT, 1 << C.FR_TWO_ADICITY, C.R_MOD) == 1
    assert pow(C.FR_TWO_ADIC_ROOT, 1 << (C.FR_TWO_ADICITY - 1), C.R_MOD) != 1


def test_host_curves():
    assert B.G1.is_on_curve(B.G1_GEN) and B.G2.is_on_curve(B.G2_GEN)
    assert B.G1.scalar_mul(B.G1_GEN, B.R) is None
    assert B.G2.scalar_mul(B.G2_GEN, B.R) is None


def test_pairing_bilinear():
    e = B.pairing(B.G1_GEN, B.G2_GEN)
    assert e != B.FQ12_ONE
    a, b = 123457, 987651
    lhs = B.pairing(
        B.G1.scalar_mul(B.G1_GEN, a), B.G2.scalar_mul(B.G2_GEN, b)
    )
    assert lhs == B.fq12_pow(e, a * b % B.R)
    assert B.fq12_pow(e, B.R) == B.FQ12_ONE


@pytest.mark.parametrize("spec", [D.FR_BN, D.FQ_BN], ids=["fr", "fq"])
def test_field_parity(spec):
    rng = np.random.default_rng(3)
    a_i = [int(rng.integers(1, 2**62)) * 7, -9, spec.p + 13]
    b_i = [23, spec.p - 4, 2**61]
    got = [
        int(v)
        for v in spec.to_host(
            F.mul(spec, spec.to_device(a_i), spec.to_device(b_i))
        )
    ]
    assert got == [(x % spec.p) * (y % spec.p) % spec.p for x, y in zip(a_i, b_i)]


def test_ntt_parity():
    n = 32
    omega = pow(
        C.FR_TWO_ADIC_ROOT, 1 << (C.FR_TWO_ADICITY - 5), C.R_MOD
    )
    dom = ntt.Radix2Domain(D.FR_BN, n, omega=omega)
    rng = np.random.default_rng(4)
    cf = [int(x) for x in rng.integers(0, 2**61, n)]
    y = [int(v) for v in D.FR_BN.to_host(dom.fft(D.FR_BN.to_device(cf)))]
    for k in (0, 1, 17, 31):
        w = pow(omega, k, C.R_MOD)
        acc = 0
        for c in reversed(cf):
            acc = (acc * w + c) % C.R_MOD
        assert y[k] == acc


@pytest.mark.parametrize("grp", ["g1", "g2"])
def test_msm_bitserial_parity(grp):
    """n <= 16 rides the bit-serial kernel (compile-light for CI)."""
    hg, gen, ops, fromh, toh = {
        "g1": (B.G1, B.G1_GEN, D.FQ_OPS_BN, D.g1_from_host, D.g1_to_host),
        "g2": (B.G2, B.G2_GEN, D.FQ2_OPS_BN, D.g2_from_host, D.g2_to_host),
    }[grp]
    rng = np.random.default_rng(5)
    npts = 16
    hpts = [hg.scalar_mul(gen, k + 1) for k in range(npts)]
    sc = [int(x) for x in rng.integers(1, 2**61, npts)]
    res = M.msm(ops, fromh(hpts), D.FR_BN.to_device(sc))
    got = toh(type(res)(res.x[None], res.y[None], res.z[None]))[0]
    acc = sum((k + 1) * s for k, s in enumerate(sc)) % C.R_MOD
    assert got == hg.scalar_mul(gen, acc)


@pytest.mark.slow
def test_msm_larger_parity():
    """n=200 through msm() (bit-serial on the CPU backend — the XLA
    Pippenger compiles only on the TPU compile server; see ops/msm.py)."""
    rng = np.random.default_rng(6)
    npts = 200
    hpts = [B.G1.scalar_mul(B.G1_GEN, k + 1) for k in range(npts)]
    sc = [int(x) for x in rng.integers(1, 2**61, npts)]
    res = M.msm(D.FQ_OPS_BN, D.g1_from_host(hpts), D.FR_BN.to_device(sc))
    got = D.g1_to_host(type(res)(res.x[None], res.y[None], res.z[None]))[0]
    acc = sum((k + 1) * s for k, s in enumerate(sc)) % C.R_MOD
    assert got == B.G1.scalar_mul(B.G1_GEN, acc)


def test_window_digits_254bit():
    """The BN-specific Pippenger risk is the 254-bit scalar decomposition
    (BLS is 253): check _window_digits covers the top bit exactly, against
    a Python-int reference, for both window sizes the dispatcher picks."""
    import jax

    rng = np.random.default_rng(8)
    ints = [C.R_MOD - 1, C.R_MOD - 2, 1, (1 << 253) + 12345] + [
        int(x) for x in rng.integers(1, 2**63, 4)
    ]
    sc = D.FR_BN.to_device(ints)
    bits = M._sbits(D.FQ_OPS_BN)
    assert bits == 254
    std = jax.jit(lambda s: M._scalar_bits_standard(s, D.FR_BN))(sc)
    for c in (4, 11, 13):
        n_win = (bits + c - 1) // c
        digs = np.asarray(
            jax.jit(lambda s: M._window_digits(s, c, n_win))(std)
        )
        for i, v in enumerate(ints):
            rec = sum(
                int(digs[w, i]) << (c * w) for w in range(n_win)
            )
            assert rec == v, (c, i)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["local", "spdz"])
def test_groth16_e2e_bn254(mode):
    """Whole-stack BN254: the proof CLI in a CZTPU_CURVE=bn254 subprocess
    (setup -> prove -> pairing verify, local and 2-party SPDZ)."""
    env = dict(os.environ)
    env["CZTPU_CURVE"] = "bn254"
    env.pop("JAX_PLATFORMS", None)
    args = [
        sys.executable, "-m", "collaborative_zksnark_tpu.cli.proof",
        "-p", "groth16", "--computation-size", "64",
    ]
    args += ["mpc", "--alg", "spdz", "--parties", "2"] if mode == "spdz" else ["local"]
    r = subprocess.run(
        args, env=env, capture_output=True, text=True, timeout=3000,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "verified: True" in r.stdout, r.stdout + r.stderr[-2000:]
