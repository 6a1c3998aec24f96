"""ctypes binding for the native codec core (libpimlcodec.so).

Builds on demand with ``make`` if the shared library is missing; every entry
point has a pure-numpy fallback, so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libpimlcodec.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.piml_densify.restype = ctypes.c_int
    lib.piml_densify.argtypes = [
        f64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
        f32p, f32p, f32p, f32p, f32p, f32p,
    ]
    lib.piml_sparsify.restype = ctypes.c_int64
    lib.piml_sparsify.argtypes = [
        f32p, f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        f64p, i64p,
    ]
    lib.piml_shuffled_indices.restype = None
    lib.piml_shuffled_indices.argtypes = [ctypes.c_int64, ctypes.c_uint64, i64p]
    _lib = lib
    return _lib


def _ptr(arr, typ):
    return arr.ctypes.data_as(ctypes.POINTER(typ))


def densify(points: np.ndarray, offsets: np.ndarray, num_steps: int,
            num_peds: int, time_unit: float):
    """C++ densification; returns None if the native library is unavailable
    so callers fall back to the numpy path."""
    lib = load_library()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, np.float64)
    offsets = np.ascontiguousarray(offsets, np.int64)
    position = np.empty((num_steps, num_peds, 2), np.float32)
    velocity = np.empty_like(position)
    acceleration = np.empty_like(position)
    mask_p = np.empty((num_steps, num_peds), np.float32)
    mask_v = np.empty_like(mask_p)
    mask_a = np.empty_like(mask_p)
    rc = lib.piml_densify(
        _ptr(points, ctypes.c_double), _ptr(offsets, ctypes.c_int64),
        num_steps, num_peds, float(time_unit),
        _ptr(position, ctypes.c_float), _ptr(velocity, ctypes.c_float),
        _ptr(acceleration, ctypes.c_float), _ptr(mask_p, ctypes.c_float),
        _ptr(mask_v, ctypes.c_float), _ptr(mask_a, ctypes.c_float),
    )
    if rc != 0:
        raise ValueError(f"native densify failed with code {rc} "
                         "(gap in trajectory or frame out of range)")
    return dict(position=position, velocity=velocity,
                acceleration=acceleration, mask_p=mask_p, mask_v=mask_v,
                mask_a=mask_a)


def sparsify(position: np.ndarray, mask_p: np.ndarray):
    lib = load_library()
    if lib is None:
        return None
    position = np.ascontiguousarray(position, np.float32)
    mask_p = np.ascontiguousarray(mask_p, np.float32)
    T, N = mask_p.shape
    # Sized by the exact predicate the C++ side uses (>0), not a float sum
    # which can lose precision at large T*N; capacity is also bound-checked
    # inside piml_sparsify.
    total = int(np.count_nonzero(mask_p > 0))
    points = np.empty((total, 3), np.float64)
    offsets = np.empty(N + 1, np.int64)
    written = lib.piml_sparsify(
        _ptr(position, ctypes.c_float), _ptr(mask_p, ctypes.c_float),
        T, N, total,
        _ptr(points, ctypes.c_double), _ptr(offsets, ctypes.c_int64),
    )
    if written < 0:
        raise RuntimeError("native sparsify overflowed its output capacity")
    return points, offsets


def shuffled_indices(n: int, seed: int) -> Optional[np.ndarray]:
    lib = load_library()
    if lib is None:
        return None
    out = np.empty(n, np.int64)
    lib.piml_shuffled_indices(n, seed, _ptr(out, ctypes.c_int64))
    return out
