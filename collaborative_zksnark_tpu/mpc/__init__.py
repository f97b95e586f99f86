"""MPC layer: share schemes (additive / SPDZ / GSZ), Beaver sources, wire API.

Layer map (mirrors the reference's mpc-algebra crate, SURVEY.md §2.1):
  context.py  — MpcContext: net + rng + deferred-check registry
  beaver.py   — BeaverSource protocol + dummy (insecure, benchmarking) sources
  additive.py — n-party additive shares, honest-but-curious (ref share/add.rs)
  spdz.py     — SPDZ: additive shares + MAC shares, malicious majority
                (ref share/spdz.rs)
  gsz.py      — GSZ20: degree-tracked Shamir, honest majority (ref
                share/gsz20/mod.rs)
  wire.py     — scheme-dispatching functional API + the MPC hook inventory
                (ref wire/field.rs batch hooks)
"""
