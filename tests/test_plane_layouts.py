"""Default-run (no Pallas) tests of the TPU plane-layout math.

The plane-resident MSM scan is the DEFAULT G1 MSM path on TPU and the NTT
plane loop is its opt-in analog; their layout transforms previously had no
coverage outside CZTPU_RUN_INTERPRET runs (advisor round-2 medium finding).
These tests pin:
  * to_planes/from_planes round-trips (both tile classes),
  * _to_kplanes/_gather_kplanes stream-index addressing,
  * the NTT plane-stage pairing/interleave vs the element-major loop,
using plain jnp on CPU — no Mosaic compile involved.
"""

import jax.numpy as jnp
import numpy as np

from collaborative_zksnark_tpu.algebra import field as F
from collaborative_zksnark_tpu.algebra.field import FQ, FR
from collaborative_zksnark_tpu.ops import msm as msm_mod
from collaborative_zksnark_tpu.ops import ntt
from collaborative_zksnark_tpu.ops import pallas_field as PF
from collaborative_zksnark_tpu.ops.curve import JacPoint


def test_to_from_planes_roundtrip():
    rng = np.random.default_rng(3)
    for n in (PF.SMALL_ELEMS, 2 * PF.S_SUB * PF.T_BIG):
        flat = jnp.asarray(
            rng.integers(0, 1 << 16, size=(n, FQ.L), dtype=np.uint32)
        )
        planes, T = PF.to_planes(FQ, flat)
        assert planes.shape[0] == FQ.L and planes.shape[1] == PF.S_SUB
        back = PF.from_planes(FQ, planes, n, T)
        assert np.array_equal(np.asarray(back), np.asarray(flat))


def test_kplanes_stream_addressing():
    """_gather_kplanes(to_kplanes(stream), e) must return stream[e] for the
    (step, sublane, column) addressing used by the MSM bucket lookups."""
    rng = np.random.default_rng(4)
    R = PF.SMALL_ELEMS  # = padded width m (no pad branch)
    K = 5
    L = FQ.L
    T = PF.T_SMALL
    stream = rng.integers(0, 1 << 16, size=(K * R, L), dtype=np.uint32)
    planes = msm_mod._to_kplanes(jnp.asarray(stream), R, K, R, T, L)
    ys = (planes, planes + 1, planes + 2)
    es = np.concatenate(
        [np.array([0, 1, K, K * R - 1]), rng.integers(0, K * R, size=32)]
    ).astype(np.int32)
    got = msm_mod._gather_kplanes(ys, jnp.asarray(es), K, T)
    assert np.array_equal(np.asarray(got.x), stream[es])
    assert np.array_equal(np.asarray(got.y), stream[es] + 1)
    assert np.array_equal(np.asarray(got.z), stream[es] + 2)
    # padded case: m > R
    R2 = PF.SMALL_ELEMS // 2
    planes2 = msm_mod._to_kplanes(
        jnp.asarray(stream[: K * R2]), R2, K, PF.SMALL_ELEMS, T, L
    )
    ys2 = (planes2, planes2, planes2)
    es2 = rng.integers(0, K * R2, size=16).astype(np.int32)
    got2 = msm_mod._gather_kplanes(ys2, jnp.asarray(es2), K, T)
    assert np.array_equal(np.asarray(got2.x), stream[: K * R2][es2])


def _emu_butterfly(lo, hi, tw):
    """Plain-jnp stand-in for the fused Pallas butterfly on (L, 8, C)
    planes: a = lo + hi*tw, b = lo - hi*tw."""
    mv = lambda a: jnp.moveaxis(a, 0, -1)
    back = lambda a: jnp.moveaxis(a, -1, 0)
    h = F.mul(FR, mv(hi), mv(tw))
    return back(F.add(FR, mv(lo), h)), back(F.sub(FR, mv(lo), h))


def test_ntt_plane_stage_pairing_matches_element_major():
    """The plane-resident stage loop (pairing + re-interleave reshapes on
    the fixed (L, 8, C) layout, incl. the cross-sublane top stages) must
    produce exactly the element-major butterfly loop's output."""
    rng = np.random.default_rng(5)
    n = 64
    dom = ntt.get_radix2_domain(n)
    x = F.rand(FR, rng, (n,))
    ref = dom._butterflies(x, dom._tw_fwd)
    planes = dom._butterflies_planes(x, dom._tw_fwd, kern=_emu_butterfly)
    assert np.array_equal(np.asarray(ref), np.asarray(planes))
