"""ctypes wrappers over the native mask ops (src/maskops.cpp).

Each function returns None when the native library is unavailable, so
callers (vltk_tpu/utils/adapters.py) keep their NumPy/PIL fallback."""

from __future__ import annotations

import ctypes
from typing import Optional, Sequence

import numpy as np

from vltk_tpu import native

_u8p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
_i64p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
_f64p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def rle_decode(counts: Sequence[int], height: int, width: int) -> Optional[np.ndarray]:
    lib = native.lib()
    if lib is None:
        return None
    c = np.ascontiguousarray(counts, np.int64)
    out = np.empty((height, width), np.uint8)
    lib.vltk_rle_decode(_i64p(c), c.size, _u8p(out), height, width)
    return out


def points_decode(points: Sequence[float], height: int, width: int) -> Optional[np.ndarray]:
    lib = native.lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(points, np.int64)
    out = np.empty(height * width, np.uint8)
    lib.vltk_points_decode(_i64p(p), p.size // 2, _u8p(out), height * width)
    return out.reshape(height, width)


def polygons_fill(
    polygons: Sequence[Sequence[float]], height: int, width: int
) -> Optional[np.ndarray]:
    lib = native.lib()
    if lib is None:
        return None
    sizes = np.asarray([len(p) for p in polygons], np.int64)
    if sizes.size == 0:
        return np.zeros((height, width), np.uint8)
    flat = np.ascontiguousarray(
        np.concatenate([np.asarray(p, np.float64).ravel() for p in polygons])
    )
    out = np.empty((height, width), np.uint8)
    lib.vltk_polygons_fill(
        _f64p(flat), _i64p(sizes), sizes.size, _u8p(out), height, width
    )
    return out
