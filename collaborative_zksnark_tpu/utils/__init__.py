"""Utilities: timers, Fiat-Shamir transcript, serialization."""
