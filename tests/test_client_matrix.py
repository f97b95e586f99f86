"""The client computation matrix is complete: all 25 reference computations
(ref mpc-snarks/src/client.rs:34-63) run per applicable scheme.  Heavy
entries (snarks, pairings, pc) are covered by their own suites; this file
smoke-runs the round-3 additions + enumerates the full matrix list."""

import pytest

from collaborative_zksnark_tpu.cli import client

ALL_25 = [
    "sum", "product", "pproduct", "inv", "fft", "polydiv", "polyeval",
    "commit", "dh", "groupops", "msm", "naivemsm",
    "pairingdh", "pairingprod", "pairingdiv",
    "kzg", "kzgzk", "kzgzkbatch", "marlinpc", "marlinpcbatch", "pctwocom",
    "groth16", "plonk", "marlin", "merkle",
]


def test_matrix_advertises_25():
    doc = client.__doc__
    for name in ALL_25:
        assert name in doc, name


@pytest.mark.parametrize("comp", ["polyeval", "commit", "naivemsm", "pctwocom"])
@pytest.mark.parametrize("alg,n", [("spdz", 2), ("gsz", 3)])
def test_new_computations(comp, alg, n):
    rc = client.main(
        [comp, "--alg", alg, "--parties", str(n), "--size", "8"]
    )
    assert rc == 0
