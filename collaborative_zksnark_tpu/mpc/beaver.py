"""Beaver triple / inverse-pair sources.

Mirrors the reference's `BeaverSource` abstraction (ref share/mod.rs:18-43)
and its *dummy* instantiations: constant (1,1,1) triples "held by the king",
explicitly insecure and intended for benchmarking the online phase only
(ref wire/field.rs:34-77 DummyFieldTripleSource; Readme.md:5 "This
implementation is not secure; it exists for benchmarking").  A real
preprocessing phase (OT/HE-based triple generation) plugs in behind the same
interface.
"""

from __future__ import annotations


class DummyFieldTripleSource:
    """Triples (a, b, c=ab) = shares of (1, 1, 1); inverse pairs (1, 1)."""

    def __init__(self, scheme):
        self.scheme = scheme

    def triple(self, shape):
        one = self.scheme.ones_public(shape)
        a = self.scheme.from_public(one)
        b = self.scheme.from_public(one)
        c = self.scheme.from_public(one)
        return a, b, c

    def inv_pair(self, shape):
        one = self.scheme.ones_public(shape)
        return self.scheme.from_public(one), self.scheme.from_public(one)


class DummyGroupTripleSource:
    """Group triples (a: scalar share of 1, B: group share of identity,
    C = a*B = identity share) — ref wire/group.rs:35-72."""

    def __init__(self, scheme):
        self.scheme = scheme

    def triple(self, fld):
        a = self.scheme.from_public(self.scheme.ones_public(()))
        B = self.scheme.g_zero(fld)
        C = self.scheme.g_zero(fld)
        return a, B, C


class PanicBeaverSource:
    """Refuses to provide preprocessing (ref share/mod.rs:45-61)."""

    def triple(self, shape):
        raise RuntimeError("PanicBeaverSource: no triples available")

    def inv_pair(self, shape):
        raise RuntimeError("PanicBeaverSource: no inverse pairs available")
