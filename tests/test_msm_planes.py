"""Plane-resident Pippenger path (ops/msm.py v4) on the Pallas kernels.

The TPU-only plane-mode scan is exercised on the CPU backend through
CZTPU_PALLAS_INTERPRET=1 (pallas interpreter mode), in a subprocess so the
env is set before any module import.  Ground truth: host (Python-int)
arkworks-style scalar muls, same as tests/test_curve_msm.py.
"""

import os
import subprocess
import sys

import pytest

CODE = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["CZTPU_PALLAS_INTERPRET"] = "1"
import numpy as np

from collaborative_zksnark_tpu.algebra import bls12_377 as C
from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.algebra import hostfield as H
from collaborative_zksnark_tpu.ops import curve as cv
from collaborative_zksnark_tpu.ops import msm as msm_mod

assert F._pallas_ok()  # interpret mode forces the kernel path on CPU

R = C.R_MOD
rng = np.random.default_rng(77)
n = 32
pts = [H.G1.scalar_mul(H.G1_GEN, int.from_bytes(rng.bytes(40), "little") % R)
       for _ in range(n)]
pts[1] = None  # identity in the batch
ks = [int.from_bytes(rng.bytes(40), "little") % R for _ in range(n)]
ks[0] = 0
P = cv.g1_from_host(pts)
sc = F.FR.to_device(ks)
res = msm_mod.msm_pippenger(cv.FQ_OPS, P, sc, c=5)
got = cv.g1_to_host(cv.JacPoint(res.x[None], res.y[None], res.z[None]))[0]

exp = None
for p, k in zip(pts, ks):
    exp = H.G1.add(exp, H.G1.scalar_mul(p, k))
assert got == exp, (got, exp)
print("PLANE-MSM-OK")
"""


@pytest.mark.skipif(
    os.environ.get("CZTPU_RUN_INTERPRET", "0") != "1",
    reason="pallas interpreter-mode compile takes ~5-10 min on CPU; "
    "opt in with CZTPU_RUN_INTERPRET=1 (the TPU bench validates this "
    "path against host ground truth every round)",
)
def test_plane_msm_interpret_matches_host():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "-c", CODE],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
    )
    assert "PLANE-MSM-OK" in r.stdout, r.stderr[-4000:]
