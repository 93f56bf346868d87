"""ctypes bindings to the native ingest library (csrc/libcudasp_ingest.so).

The native path accelerates host-side packing (blob->limb re-limbing and
ragged-outputs chunking). Absent the .so, callers use the vectorized numpy
implementations in io.ingest — results are identical (tested)."""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "csrc", "libcudasp_ingest.so"),
]

_lib: Optional[ctypes.CDLL] = None
_checked = False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    for p in _LIB_PATHS:
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
            except OSError:
                continue
            i64p = ctypes.POINTER(ctypes.c_int64)
            i32p = ctypes.POINTER(ctypes.c_int32)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.cudasp_pack_points.argtypes = [u8p, ctypes.c_int64, i32p, i32p]
            lib.cudasp_pack_points.restype = None
            lib.cudasp_pack_outputs.argtypes = [
                i64p, i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
                i32p, i32p, u8p]
            lib.cudasp_pack_outputs.restype = None
            lib.cudasp_count_chunks.argtypes = [
                i64p, ctypes.c_int64, ctypes.c_int64, i64p]
            lib.cudasp_count_chunks.restype = ctypes.c_int64
            _lib = lib
            break
    return _lib


def available() -> bool:
    return load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def pack_points(tweak_blobs: np.ndarray):
    """(n, 64) uint8 -> (x_limbs, y_limbs) each (NLIMBS, n) int32."""
    from ..ops import field as F

    lib = load()
    blobs = np.ascontiguousarray(tweak_blobs, np.uint8)
    n = blobs.shape[0]
    out_x = np.empty((F.NLIMBS, n), np.int32)
    out_y = np.empty((F.NLIMBS, n), np.int32)
    lib.cudasp_pack_points(
        _ptr(blobs, ctypes.c_uint8), n,
        _ptr(out_x, ctypes.c_int32), _ptr(out_y, ctypes.c_int32))
    return out_x, out_y


def pack_outputs(flat, offsets, src, chunk, max_outputs):
    lib = load()
    flat = np.ascontiguousarray(flat, np.int64)
    offsets = np.ascontiguousarray(offsets, np.int64)
    src = np.ascontiguousarray(src, np.int64)
    chunk = np.ascontiguousarray(chunk, np.int64)
    nv = src.shape[0]
    hi = np.empty((nv, max_outputs), np.int32)
    lo = np.empty((nv, max_outputs), np.int32)
    valid = np.empty((nv, max_outputs), np.uint8)
    lib.cudasp_pack_outputs(
        _ptr(flat, ctypes.c_int64), _ptr(offsets, ctypes.c_int64),
        _ptr(src, ctypes.c_int64), _ptr(chunk, ctypes.c_int64),
        nv, max_outputs,
        _ptr(hi, ctypes.c_int32), _ptr(lo, ctypes.c_int32),
        _ptr(valid, ctypes.c_uint8))
    return hi, lo, valid.astype(bool)
