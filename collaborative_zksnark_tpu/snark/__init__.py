"""Proof systems: Groth16, KZG10 commitments, Plonk, Marlin."""
