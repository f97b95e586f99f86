"""ComField: Merkle vector commitments over SHARE vectors + the FRI
low-degree-test experiment built on them.

The analog of the reference's ComField trait (ref mpc-algebra/src/com.rs:
14-123) and the Merkle / Fri client computations (ref mpc-snarks/src/
client.rs:722-841):

  * `commit`   — each party Merkle-hashes ITS OWN share vector (sha256 of
    canonical bytes); roots are exchanged (the 2-party `exchange_bytes`
    of ref com.rs:61-66, generalized to N parties); the commitment is the
    TUPLE of per-party roots.
  * `open_at`  — parties exchange the i-th share values (value = their
    sum) and their sibling paths (ref com.rs:69-96).
  * `check_opening` — verify every party's path against its committed
    root and that the exchanged shares sum to the claimed value
    (ref com.rs:97-123).
  * `fri_*`    — the FRI commit/fold/chain-check loop over shares
    (ref client.rs:739-841): per-round FFT on shares (device NTT,
    share-local), Merkle commit, public folding challenge, final constant
    publicized, and the x / -x / x^2 consistency chain.

Hashing and path logic are host-side (they are per-opening O(log N) sha256
calls, never device hot loops); the FFTs and folds run on device shares.
"""

from __future__ import annotations

import hashlib
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra import params as C
from ..algebra import field as F
from ..algebra.field import FR
from ..ops import ntt
from ..utils import fs as fsmod

P = C.R_MOD


def _sha(b: bytes) -> bytes:
    return hashlib.sha256(b).digest()


def _share_rows(scheme, vec_sh) -> List[List[int]]:
    """Per-party share values as host ints: rows[party][i]."""
    arr = vec_sh.sh if hasattr(vec_sh, "sh") else vec_sh
    host = FR.to_host(arr)
    if host.ndim == 1:  # no party axis (local scheme)
        return [[int(v) for v in host]]
    return [[int(v) for v in row] for row in host]


def _exchange_stats(scheme, nbytes: int):
    """Account a full pairwise exchange of nbytes (ref two.rs duplex
    exchange / channel.rs:95-125)."""
    st = scheme.net.stats
    n = scheme.net.n_parties()
    st.broadcasts += 1
    st.bytes_sent += nbytes * (n - 1)
    st.bytes_recv += nbytes * (n - 1)


def commit(scheme, vec_sh):
    """(key, commitment): key = per-party Merkle trees (levels of hashes),
    commitment = tuple of per-party roots (ref com.rs:37-67)."""
    rows = _share_rows(scheme, vec_sh)
    trees = []
    roots = []
    for row in rows:
        hashes = [_sha(fsmod.fr_to_bytes(v)) for v in row]
        assert len(hashes) & (len(hashes) - 1) == 0, "power-of-two vector"
        levels = []
        while len(hashes) > 1:
            levels.append(hashes)
            hashes = [
                _sha(hashes[2 * i] + hashes[2 * i + 1])
                for i in range(len(hashes) // 2)
            ]
        trees.append(levels)
        roots.append(hashes[0])
    _exchange_stats(scheme, 32)
    return trees, tuple(roots)


def open_at(scheme, vec_sh, key, i: int):
    """(revealed value, proof).  proof = (per-party share values at i,
    per-party sibling paths) — ref com.rs:69-96."""
    rows = _share_rows(scheme, vec_sh)
    shares_i = [row[i] for row in rows]
    value = sum(shares_i) % P
    paths = []
    for tree in key:
        j = i
        sibs = []
        for level in tree:
            sibs.append(level[j ^ 1])
            j //= 2
        paths.append(sibs)
    depth = len(key[0])
    _exchange_stats(scheme, 32 + 32 * depth)
    return value, (shares_i, paths)


def check_opening(commitment, proof, i: int, value: int) -> bool:
    """Verify every party's Merkle path and the share-sum (ref
    com.rs:97-123)."""
    shares_i, paths = proof
    if sum(shares_i) % P != value % P:
        return False
    for share, path, root in zip(shares_i, paths, commitment):
        h = _sha(fsmod.fr_to_bytes(share))
        for j, sib in enumerate(path):
            if (i >> j) & 1 == 0:
                h = _sha(h + sib)
            else:
                h = _sha(sib + h)
        if h != root:
            return False
    return True


# ---------------------------------------------------------------------------
# FRI over shares (ref client.rs:739-841)
# ---------------------------------------------------------------------------

def fri_commit(scheme, coeffs_sh):
    """Commit phase: per-round evaluate (share-local FFT on the doubled
    domain), Merkle-commit the evals, fold with the public transcript
    challenge.  Returns (rounds, alphas, constant, transcript)."""
    arr = coeffs_sh.sh if hasattr(coeffs_sh, "sh") else coeffs_sh
    n = arr.shape[-2]
    assert n & (n - 1) == 0
    k = n.bit_length() - 1
    l = k + 1

    t = fsmod.FiatShamir(b"cztpu-fri")
    cur = coeffs_sh
    rounds = []
    alphas = []
    for i in range(k):
        dom = ntt.get_radix2_domain(1 << (l - i))

        def padded_fft(a, dom=dom):
            pad = [(0, 0)] * a.ndim
            pad[-2] = (0, dom.n - a.shape[-2])
            return (
                jax.vmap(dom.fft)(jnp.pad(a, pad))
                if a.ndim == 3
                else dom.fft(jnp.pad(a, pad))
            )

        evals = scheme.lin_map(padded_fft, cur)
        key, com = commit(scheme, evals)
        rounds.append((evals, key, com))
        for root in com:
            t.absorb(root)
        alpha = t.gen_fr()
        alphas.append(alpha)
        # fold: f'(X) = f_even + alpha * f_odd  (coefficient pairs; linear)
        a_dev = FR.to_device([alpha])[0]

        def fold(a, a_dev=a_dev):
            ev = a[..., 0::2, :]
            od = a[..., 1::2, :]
            return F.add(FR, ev, F.mul(FR, od, a_dev[(None,) * (a.ndim - 1)]))

        cur = scheme.lin_map(fold, cur)
    const = int(FR.to_host(scheme.reveal(
        scheme.lin_map(lambda a: a[..., 0, :], cur)
    ))[()])
    t.absorb(fsmod.fr_to_bytes(const))
    return rounds, alphas, const, t


def fri_chain_check(scheme, rounds, alphas, const, t, iters: int = 1) -> bool:
    """Query phase: for random x, walk the fold chain checking
    f_{i+1}(x^2) == (f_i(x)+f_i(-x))/2 + alpha_i (f_i(x)-f_i(-x))/(2x)
    with Merkle-verified openings (ref client.rs:783-841)."""
    k = len(rounds)
    l = k + 1
    inv2 = pow(2, P - 2, P)
    for _ in range(iters):
        x_i = t.gen_fr() % (1 << l)
        for i in range(k):
            nn = 1 << (l - i)
            dom = ntt.get_radix2_domain(nn)
            omega = dom.omega
            x = pow(omega, x_i, P)
            neg_x_i = (nn // 2 + x_i) % nn
            x2_i = 2 * x_i % nn // 2
            evals, key, com = rounds[i]
            val, pf = open_at(scheme, evals, key, x_i)
            if not check_opening(com, pf, x_i, val):
                return False
            nval, npf = open_at(scheme, evals, key, neg_x_i)
            if not check_opening(com, npf, neg_x_i, nval):
                return False
            if i + 1 < k:
                nxt_evals, nxt_key, nxt_com = rounds[i + 1]
                nxt, nxt_pf = open_at(scheme, nxt_evals, nxt_key, x2_i)
                if not check_opening(nxt_com, nxt_pf, x2_i, nxt):
                    return False
            else:
                nxt = const
            # f_{i+1}(x^2) = (f_i(x)+f_i(-x))/2 + alpha (f_i(x)-f_i(-x))/(2x)
            want = (
                (val + nval) * inv2 + alphas[i] * (val - nval) % P * pow(2 * x % P, P - 2, P)
            ) % P
            if nxt % P != want:
                return False
            x_i = x2_i
    return True
