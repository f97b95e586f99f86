"""Active-curve constants: re-exports `bls12_377` (default) or `bn254`,
selected ONCE at import by CZTPU_CURVE.

The compute stack (field specs, curve ops, NTT domains, SNARKs, MPC) is
written against this module plus `hostapi`, so the whole framework runs on
either curve:

    CZTPU_CURVE=bn254 python -m collaborative_zksnark_tpu.cli.proof ...

Mirrors the reference's curve genericity (everything is generic over a
PairingEngine; the curve is chosen by a type parameter at the call site —
e.g. mpc-snarks/src/bin/proof.rs uses Bls12_377, curves/bn254 provides the
drop-in alternative).  A process-level switch (rather than threading a
curve object through every API) matches how the reference binaries pick
exactly one engine per process.

Native (C++) kernels are compiled for BLS12-377 only; `ffi_field` and
`native` disable themselves when another curve is active.
"""

import os

CURVE = os.environ.get("CZTPU_CURVE", "bls12_377")

if CURVE == "bn254":
    from .bn254 import *  # noqa: F401,F403
elif CURVE == "bls12_377":
    from .bls12_377 import *  # noqa: F401,F403
else:
    raise ValueError(f"CZTPU_CURVE={CURVE!r}: expected bls12_377 or bn254")
