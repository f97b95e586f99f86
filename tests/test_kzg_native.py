"""KZG commit/open/verify over local and shared polynomials + native pairing
equivalence (ref: poly-commit kzg10 tests; client.rs kzg computations)."""

import numpy as np
import pytest

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.algebra import hostfield as H
from collaborative_zksnark_tpu.algebra import native
from collaborative_zksnark_tpu.mpc import wire
from collaborative_zksnark_tpu.mpc.context import MpcContext
from collaborative_zksnark_tpu.mpc.local import LocalScheme
from collaborative_zksnark_tpu.parallel.net import StackedNet
from collaborative_zksnark_tpu.snark import kzg

P = C.R_MOD


@pytest.fixture(scope="module")
def srs():
    return kzg.setup(16, seed=7)


@pytest.mark.parametrize("scheme_name", ["local", "hbc", "spdz"])
def test_kzg_commit_open_verify(srs, scheme_name):
    rng = np.random.default_rng(20)
    coeffs = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(8)]
    if scheme_name == "local":
        sch = LocalScheme()
    else:
        sch = wire.make_scheme(scheme_name, MpcContext(StackedNet(2), seed=3))
    sh = sch.king_share(F.FR.to_device(coeffs))
    cmt = kzg.commit_and_reveal(sch, srs, sh)
    x = int.from_bytes(rng.bytes(40), "little") % P
    y, pf = kzg.open_share(sch, srs, sh, x)
    assert y == sum(c * pow(x, i, P) for i, c in enumerate(coeffs)) % P
    assert kzg.host_verify(srs, cmt, x, y, pf)
    # wrong claimed value must fail
    assert not kzg.host_verify(srs, cmt, x, (y + 1) % P, pf)
    if scheme_name != "local":
        sch.ctx.assert_checks()


def test_native_pairing_matches_python():
    if not native.available():
        pytest.skip("native library not built")
    e1 = native.multi_pairing([(H.G1_GEN, H.G2_GEN)])
    e2 = H.final_exponentiation(H.miller_loop(H.G1_GEN, H.G2_GEN))
    assert e1 == e2
    # bilinearity through the native path
    p5 = H.G1.scalar_mul(H.G1_GEN, 5)
    assert native.multi_pairing([(p5, H.G2_GEN)]) == H.fq12_pow(e1, 5)
