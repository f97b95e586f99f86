"""MPC execution context: party net + randomness + deferred runtime checks.

The reference aborts on MAC / degree-check failures at the point of opening
(ref spdz.rs:129 assert, gsz20/mod.rs:449-455).  Under jit we cannot raise
from device code, so every protocol check lands here as a (label, bool
device scalar) pair; `assert_checks()` materializes and raises on the host —
the analog of the reference's abort-on-cheat, preserving "detect malicious
behavior at/before reveal" semantics.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..algebra import params as C
from ..algebra import field as F
from ..algebra.field import FR


class MpcCheckError(AssertionError):
    """A protocol-level verification (MAC check, degree check, product
    check) failed — a party misbehaved or state is corrupt."""


class MpcContext:
    def __init__(self, net, seed: int = 0, debug: bool = False, party_id: int = 0):
        self.net = net
        # The reference distinguishes PUBLIC randomness (PubUniformRand —
        # identical on every party, used for post-opening public coins) from
        # ordinary randomness (dealer/party-private, used to sample shares and
        # blinding) — ref utils/src/rand_helper.rs:15-19.  Two streams:
        #   rng      — private/dealer stream, diverges per party in a real
        #              multi-process deployment (party_id folds into the seed)
        #   pub_rng  — common-coin stream, same seed on every party
        self.rng = np.random.default_rng([seed, 1 + party_id])
        self.pub_rng = np.random.default_rng([seed, 0])
        self.checks: List[Tuple[str, object]] = []
        # debug: run the cross-party `check_eq` consistency assert on every
        # reveal (ref wire/macros.rs:10-38 — debug-build-only upstream too)
        self.debug = debug

    @property
    def n(self) -> int:
        return self.net.n_parties()

    # -- randomness (host-driven; shapes are static) -----------------------
    @staticmethod
    def _ints_from(rng, n: int):
        return [int.from_bytes(rng.bytes(40), "little") % C.R_MOD for _ in range(n)]

    @staticmethod
    def _to_mont_device(vals, shape):
        arr = F.ints_to_limbs(
            [(v << (F.LIMB_BITS * FR.L)) % C.R_MOD for v in vals], FR.L
        )
        return jnp.asarray(arr.reshape(tuple(shape) + (FR.L,)))

    def rand_fr_ints(self, n: int):
        return self._ints_from(self.rng, n)

    def rand_fr(self, shape=()):
        """Uniform Fr elements in Montgomery device form (PRIVATE stream:
        dealing, share sampling, blinding — ark UniformRand)."""
        cnt = int(np.prod(shape)) if shape else 1
        return self._to_mont_device(self.rand_fr_ints(cnt), shape)

    def pub_rand_fr_ints(self, n: int):
        return self._ints_from(self.pub_rng, n)

    def pub_rand_fr(self, shape=()):
        """Uniform Fr elements every party derives IDENTICALLY (public
        coins — ref PubUniformRand, utils/src/rand_helper.rs:15-19)."""
        cnt = int(np.prod(shape)) if shape else 1
        return self._to_mont_device(self.pub_rand_fr_ints(cnt), shape)

    # -- deferred checks ---------------------------------------------------
    def push_check(self, label: str, ok_device_bool):
        self.checks.append((label, ok_device_bool))

    def assert_checks(self):
        """Materialize all queued checks; raise on any failure (the analog
        of the reference's abort-on-bad-MAC / bad-degree)."""
        failed = []
        for label, flag in self.checks:
            if not bool(np.all(np.asarray(flag))):
                failed.append(label)
        self.checks.clear()
        if failed:
            raise MpcCheckError(f"MPC runtime checks failed: {failed}")

    def checks_ok(self) -> bool:
        try:
            self.assert_checks()
            return True
        except MpcCheckError:
            return False
