"""collaborative_zksnark_tpu — a TPU-native collaborative-zkSNARK framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
alex-ozdemir/collaborative-zksnark (Ozdemir & Boneh, USENIX Security '22):
Groth16, Marlin and Plonk provers that run over secret-shared witnesses under
three MPC schemes (additive honest-but-curious, SPDZ malicious-majority,
GSZ20 honest-majority Shamir), with the hot numeric kernels (multi-limb
Montgomery field arithmetic, NTT, Pippenger MSM) implemented as vectorized
XLA / Pallas TPU programs and the MPC exchanges mapped onto `jax.lax`
collectives over a device mesh.

Layer map (mirrors SURVEY.md §1 of the reference):
  L0  parallel/net.py     — party collectives + traffic stats  (ref: mpc-net/)
  L1  parallel/channel.py — typed/committed broadcast          (ref: mpc-algebra/src/channel.rs)
  L2  mpc/{additive,spdz,gsz}.py — secret-share schemes        (ref: mpc-algebra/src/share/)
  L3  mpc/wire.py         — public/shared dispatch + hooks     (ref: mpc-algebra/src/wire/)
  L4  algebra/, ops/      — field/curve/FFT/MSM substrate      (ref: algebra/{ff,ec,poly})
  L5  snark/              — Groth16 / Plonk / Marlin / KZG     (ref: groth16/, mpc-plonk/, marlin/, poly-commit/)
  L6  cli/                — proof/client drivers + bench       (ref: mpc-snarks/)
"""

__version__ = "0.1.0"
