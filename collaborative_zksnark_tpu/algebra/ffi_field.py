"""Native CPU field-op backend: XLA FFI custom calls into
native/libczfieldops.so (CIOS Montgomery kernels, see native/fieldops.cpp).

Used by algebra/field.py as the CPU hot path — the jnp limb formulation
targets the TPU VPU/MXU and is ~100x slower than native CIOS on the CPU
backend, which is what the test suite and the virtual-device party meshes
run on.  Results are bit-identical to the jnp path (same [0,2p) lazy
Montgomery representatives), so the two paths mix freely.

Falls back silently (HAVE_FFI = False) if the library isn't built; set
CZTPU_FFI=0 to force the pure-jnp path.
"""

from __future__ import annotations

import ctypes
import os

import jax
import jax.numpy as jnp

_NAMES = ("cz_mul_fr", "cz_add_fr", "cz_sub_fr",
          "cz_mul_fq", "cz_add_fq", "cz_sub_fq",
          "cz_msm_g1", "cz_msm_g2")

HAVE_FFI = False

def _ensure_built(path: str) -> None:
    if os.path.exists(path):
        return
    import subprocess

    subprocess.run(
        ["make", "libczfieldops.so"],
        cwd=os.path.dirname(path),
        check=True,
        capture_output=True,
    )


if os.environ.get("CZTPU_FFI", "1") != "0":
    _lib_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
        "libczfieldops.so",
    )
    try:
        _ensure_built(_lib_path)
        _lib = ctypes.CDLL(_lib_path)
        for _n in _NAMES:
            _get = getattr(_lib, f"get_{_n}")
            _get.restype = ctypes.c_void_p
            _fn = ctypes.cast(
                _get(), ctypes.CFUNCTYPE(ctypes.c_void_p, ctypes.c_void_p)
            )
            jax.ffi.register_ffi_target(
                _n, jax.ffi.pycapsule(_fn), platform="cpu"
            )
        HAVE_FFI = True
    except Exception:
        HAVE_FFI = False


def msm(g2: bool, px, py, pz, scalars):
    """Native Pippenger MSM: Jacobian limb points (N, [2,] L) + Montgomery
    Fr scalars (N, 16) -> one Jacobian point ([2,] L).  CPU-only."""
    coord_shape = (2, 24) if g2 else (24,)
    outs = jax.ffi.ffi_call(
        "cz_msm_g2" if g2 else "cz_msm_g1",
        [jax.ShapeDtypeStruct(coord_shape, jnp.uint32)] * 3,
        vmap_method="sequential",
    )(px, py, pz, scalars)
    return outs


def binop(name_suffix: str, op: str, a, b):
    """Elementwise field op via FFI.  a, b: uint32 limb arrays (broadcastable
    shapes, last axis = L).  op in {mul, add, sub}; name_suffix in {fr, fq}."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    call = jax.ffi.ffi_call(
        f"cz_{op}_{name_suffix}",
        jax.ShapeDtypeStruct(shape, jnp.uint32),
        vmap_method="broadcast_all",
    )
    return call(a, b)
