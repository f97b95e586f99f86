"""Share-polynomial ops vs host big-int recomputation.

Covers the univariate_div_qr hook (ref mpc-algebra share/field.rs:184-193,
spdz.rs:210-240: division of a SHARED dividend by a PUBLIC divisor) across
local + SPDZ, non-monic divisors, and the constant-divisor edge."""

import numpy as np
import pytest

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.mpc import wire
from collaborative_zksnark_tpu.mpc.context import MpcContext
from collaborative_zksnark_tpu.parallel.net import StackedNet
from collaborative_zksnark_tpu.snark import poly_share as ps

P = C.R_MOD


def _host_divmod(a, d):
    """Schoolbook poly division over F_P (host ints, little-endian)."""
    a = list(a)
    m = len(d) - 1
    lead_inv = pow(d[-1], P - 2, P)
    q = [0] * max(1, len(a) - m)
    for i in range(len(a) - m - 1, -1, -1):
        qi = a[i + m] * lead_inv % P
        q[i] = qi
        for j in range(m + 1):
            a[i + j] = (a[i + j] - qi * d[j]) % P
    return q, a[:m] if m else [0]


def _mk(name, n):
    net = StackedNet(n)
    ctx = MpcContext(net, seed=11)
    return ctx, wire.make_scheme(name, ctx)


@pytest.mark.parametrize("name,n", [("local", 1), ("spdz", 2)])
@pytest.mark.parametrize("deg_a,deg_d", [(15, 3), (16, 1), (9, 9), (7, 0)])
def test_univariate_div_qr(name, n, deg_a, deg_d):
    rng = np.random.default_rng(deg_a * 31 + deg_d)
    a = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(deg_a + 1)]
    d = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(deg_d + 1)]
    if d[-1] == 0:
        d[-1] = 7  # non-monic but nonzero lead
    ctx, sch = _mk(name, n)
    a_sh = sch.king_share(F.FR.to_device(a))
    q_sh, r_sh = ps.univariate_div_qr(sch, a_sh, d)
    q = [int(v) for v in F.FR.to_host(sch.reveal(q_sh))]
    r = [int(v) for v in F.FR.to_host(sch.reveal(r_sh))]
    qh, rh = _host_divmod(a, d)
    assert q[: len(qh)] == qh and all(v == 0 for v in q[len(qh) :])
    assert r[: len(rh)] == rh and all(v == 0 for v in r[len(rh) :])
    # division identity: a == q*d + r exactly
    full = [0] * (len(qh) + len(d) - 1)
    for i, qv in enumerate(qh):
        for j, dv in enumerate(d):
            full[i + j] = (full[i + j] + qv * dv) % P
    for i, rv in enumerate(rh):
        full[i] = (full[i] + rv) % P
    assert full == [v % P for v in a[: len(full)]] + [0] * (len(full) - len(a))
    ctx.assert_checks()
