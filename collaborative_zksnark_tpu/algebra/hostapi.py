"""Active-curve host algebra: re-exports `hostfield` (BLS12-377, default)
or `hostbn` (BN254) per CZTPU_CURVE — see `params.py` for the rationale.
Both modules expose the same surface: G1/G2 CurveOps, G1_GEN/G2_GEN, the
Fq2/Fq6/Fq12 tower, pairing / multi_pairing / final_exponentiation,
FQ12_ONE/FQ12_ZERO, untwist.
"""

import os

if os.environ.get("CZTPU_CURVE", "bls12_377") == "bn254":
    from .hostbn import *  # noqa: F401,F403
else:
    from .hostfield import *  # noqa: F401,F403
