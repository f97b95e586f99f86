"""ctypes loader for the native C++ host pairing (native/pairing.cpp).

Builds the shared library on first use (make in native/); falls back to the
pure-Python pairing in hostfield.py when unavailable.  The interface crosses
as little-endian 64-bit standard-form limb arrays.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from . import bls12_377 as C

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libczpairing.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-s"], cwd=_NATIVE_DIR, check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.cz_multi_pairing.argtypes = [
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint64),
        ]
        assert lib.cz_version() == 1
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    # the C++ pairing is compiled for BLS12-377 (native/consts.h)
    import os

    if os.environ.get("CZTPU_CURVE", "bls12_377") != "bls12_377":
        return False
    return _load() is not None


def _fp_words(x: int):
    return [(x >> (64 * i)) & ((1 << 64) - 1) for i in range(6)]


def multi_pairing(pairs):
    """prod e(P_i, Q_i) over host affine points; returns an Fq12 tuple in
    the same nested-tuple form as hostfield (or None if lib missing)."""
    lib = _load()
    if lib is None:
        return None
    n = len(pairs)
    g1 = np.zeros((n, 12), np.uint64)
    g2 = np.zeros((n, 24), np.uint64)
    i1 = np.zeros((n,), np.uint8)
    i2 = np.zeros((n,), np.uint8)
    for i, (p, q) in enumerate(pairs):
        if p is None:
            i1[i] = 1
        else:
            g1[i, :6] = _fp_words(p[0])
            g1[i, 6:] = _fp_words(p[1])
        if q is None:
            i2[i] = 1
        else:
            (x0, x1), (y0, y1) = q
            g2[i, 0:6] = _fp_words(x0)
            g2[i, 6:12] = _fp_words(x1)
            g2[i, 12:18] = _fp_words(y0)
            g2[i, 18:24] = _fp_words(y1)
    out = np.zeros((72,), np.uint64)
    lib.cz_multi_pairing(
        n,
        g1.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        i1.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        g2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        i2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )

    def words_to_int(ws):
        v = 0
        for w in reversed(ws):
            v = (v << 64) | int(w)
        return v

    fq2s = [
        (words_to_int(out[12 * i : 12 * i + 6]), words_to_int(out[12 * i + 6 : 12 * i + 12]))
        for i in range(6)
    ]
    return ((fq2s[0], fq2s[1], fq2s[2]), (fq2s[3], fq2s[4], fq2s[5]))
