"""Algebra substrate: curve constants, host (int) algebra, device (limb) fields."""
