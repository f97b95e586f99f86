"""ComField Merkle vector commitment + FRI over shares
(ref mpc-algebra/src/com.rs:14-123, client.rs:722-841)."""

import pytest

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.mpc import com
from collaborative_zksnark_tpu.mpc import wire
from collaborative_zksnark_tpu.mpc.context import MpcContext
from collaborative_zksnark_tpu.parallel.net import StackedNet

P = C.R_MOD


def _mk(alg, n=2):
    ctx = MpcContext(StackedNet(n), seed=21)
    return ctx, wire.make_scheme(alg, ctx)


@pytest.mark.parametrize("alg", ["hbc", "spdz"])
def test_merkle_commit_open(alg):
    ctx, sch = _mk(alg)
    xs = [11, 22, 33, 44, 55, 66, 77, 88]
    sh = sch.king_share(F.FR.to_device(xs))
    key, cm = com.commit(sch, sh)
    for i in (0, 3, 7):
        value, pf = com.open_at(sch, sh, key, i)
        assert value == xs[i]
        assert com.check_opening(cm, pf, i, value)
    # wrong value must not verify
    value, pf = com.open_at(sch, sh, key, 2)
    assert not com.check_opening(cm, pf, 2, (value + 1) % P)
    # wrong index must not verify (path mismatch)
    assert not com.check_opening(cm, pf, 3, value)


def test_merkle_tampered_share_fails():
    """A party substituting its share value post-commit breaks its path."""
    ctx, sch = _mk("hbc")
    xs = [5, 6, 7, 8]
    sh = sch.king_share(F.FR.to_device(xs))
    key, cm = com.commit(sch, sh)
    value, (shares_i, paths) = com.open_at(sch, sh, key, 1)
    bad = ((shares_i[0] + 1) % P, shares_i[1])
    # adjust claimed value so the sum check passes -> path check must fail
    assert not com.check_opening(cm, (list(bad), paths), 1, (value + 1) % P)


@pytest.mark.parametrize("alg", ["hbc", "spdz"])
def test_fri_chain(alg):
    ctx, sch = _mk(alg)
    xs = [3, 1, 4, 1, 5, 9, 2, 6]
    sh = sch.king_share(F.FR.to_device(xs))
    rounds, alphas, const, t = com.fri_commit(sch, sh)
    assert com.fri_chain_check(sch, rounds, alphas, const, t)
