"""ctypes bindings to the native host data-path library (native/fastloader.cpp).

Loads ``native/libfastloader.so`` (built by ``make -C native``; auto-built on
first import if a compiler is available). Every entry point has a numpy
fallback so the framework works without the native library — the library just
makes the single-core host path faster (patch memcpy, overlap-add FMA,
one-hot, blank checks).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, "libfastloader.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

    lib.extract_patch_f32.argtypes = [f32p, f32p] + [i64] * 10
    lib.extract_patches_batch_f32.argtypes = [f32p, f32p, i64, i64, i64, i64,
                                              i64p, i64, i64, i64, i64]
    lib.overlap_add_f32.argtypes = [f32p, f32p, f32p, f32p] + [i64] * 10
    lib.one_hot_f32.argtypes = [f32p, f32p, f64p, i64, i64]
    lib.any_nonzero_f32.argtypes = [f32p, i64]
    lib.any_nonzero_f32.restype = ctypes.c_int32
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def extract_patch(data: np.ndarray, patch_shape, corner) -> Optional[np.ndarray]:
    """Native zero-padded patch extraction; None if the library is absent."""
    lib = _load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, np.float32)
    if data.ndim == 3:
        data = data[None]
    C, D, H, W = data.shape
    pd, ph, pw = (int(s) for s in patch_shape)
    out = np.empty((C, pd, ph, pw), np.float32)
    cd, ch, cw = (int(c) for c in corner)
    lib.extract_patch_f32(data, out, C, D, H, W, cd, ch, cw, pd, ph, pw)
    return out


def extract_patches_batch(data: np.ndarray, patch_shape,
                          corners: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, np.float32)
    if data.ndim == 3:
        data = data[None]
    C, D, H, W = data.shape
    pd, ph, pw = (int(s) for s in patch_shape)
    corners = np.ascontiguousarray(corners, np.int64)
    n = corners.shape[0]
    out = np.empty((n, C, pd, ph, pw), np.float32)
    lib.extract_patches_batch_f32(data, out, C, D, H, W, corners, n,
                                  pd, ph, pw)
    return out


def overlap_add(acc: np.ndarray, wsum: np.ndarray, patch: np.ndarray,
                weight: np.ndarray, corner) -> bool:
    lib = _load()
    if lib is None:
        return False
    C, D, H, W = acc.shape
    pd, ph, pw = patch.shape[-3:]
    cd, ch, cw = (int(c) for c in corner)
    lib.overlap_add_f32(acc, wsum,
                        np.ascontiguousarray(patch, np.float32),
                        np.ascontiguousarray(weight, np.float32),
                        C, D, H, W, cd, ch, cw, pd, ph, pw)
    return True


def any_nonzero(data: np.ndarray) -> Optional[bool]:
    lib = _load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, np.float32)
    return bool(lib.any_nonzero_f32(data.reshape(-1), data.size))
