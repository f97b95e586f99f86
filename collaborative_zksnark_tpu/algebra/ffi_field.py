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
import numpy as np

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


# the C++ kernels are compiled against the BLS12-377 constants
# (native/consts.h); disable under any other active curve (params.py)
if (os.environ.get("CZTPU_FFI", "1") != "0"
        and os.environ.get("CZTPU_CURVE", "bls12_377") == "bls12_377"):
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


def fixed_base_host(g2: bool, base_affine, scalars_mont_np):
    """Host-native windowed fixed-base batch scalar-mul (no XLA round trip).

    base_affine: ((x, y) ints) for G1 / (((x0,x1),(y0,y1))) for G2;
    scalars_mont_np: numpy (n, 16) uint32 Montgomery-form Fr limbs.
    Returns (ox, oy, oz) numpy Jacobian limb arrays with oz[i] == 0 for the
    identity and oz[i] == Montgomery-one otherwise (outputs are affine-
    normalized in the kernel, so z carries no information beyond the
    identity flag — callers may rebuild it on-device to skip the transfer).
    Ref analog: arkworks FixedBaseMSM (generator.rs / kzg10 setup).
    """
    assert HAVE_FFI
    from . import bls12_377 as C
    from . import field as F

    def mont_limbs(v):
        return F.ints_to_limbs([(v << 384) % C.Q_MOD], 24)[0]

    if g2:
        (x0, x1), (y0, y1) = base_affine
        gx = np.concatenate([mont_limbs(x0), mont_limbs(x1)])
        gy = np.concatenate([mont_limbs(y0), mont_limbs(y1)])
        L = 48
    else:
        x, y = base_affine
        gx, gy = mont_limbs(x), mont_limbs(y)
        L = 24
    sc = np.ascontiguousarray(scalars_mont_np, dtype=np.uint32)
    n = sc.shape[0]
    assert sc.shape == (n, 16)
    ox = np.empty((n, L), np.uint32)
    oy = np.empty((n, L), np.uint32)
    oz = np.empty((n, L), np.uint32)
    fn = _lib.cz_fixed_base_g2 if g2 else _lib.cz_fixed_base_g1
    u32p = ctypes.POINTER(ctypes.c_uint32)
    fn.argtypes = [u32p, u32p, u32p, ctypes.c_longlong, u32p, u32p, u32p]
    gx = np.ascontiguousarray(gx, np.uint32)
    gy = np.ascontiguousarray(gy, np.uint32)
    fn(
        gx.ctypes.data_as(u32p),
        gy.ctypes.data_as(u32p),
        sc.ctypes.data_as(u32p),
        n,
        ox.ctypes.data_as(u32p),
        oy.ctypes.data_as(u32p),
        oz.ctypes.data_as(u32p),
    )
    if g2:
        ox = ox.reshape(n, 2, 24)
        oy = oy.reshape(n, 2, 24)
        oz = oz.reshape(n, 2, 24)
    return ox, oy, oz


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
