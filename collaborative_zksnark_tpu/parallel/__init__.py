"""Parallel/distribution layer: party nets, mesh sharding, collectives."""
