"""ctypes bindings for the native host preprocessing library.

Compiles native/meshhost.cpp with g++ on first use (cached next to the
source); every entry point has a numpy fallback in geometry/, so the
framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "meshhost.cpp")
_LIB_PATH = os.path.join(_HERE, "libmeshhost.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            lib.half_edge_opposites.restype = ctypes.c_int
            lib.half_edge_opposites.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32)]
            lib.rasterize_texture_source.restype = None
            lib.rasterize_texture_source.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double)]
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def half_edge_opposites(triangles: np.ndarray) -> Optional[np.ndarray]:
    """Native half-edge pairing; None if the library is unavailable.

    Raises ValueError on duplicated directed half-edges (matching the numpy
    implementation's check).
    """
    lib = get_lib()
    if lib is None:
        return None
    tris = np.ascontiguousarray(triangles, np.int32)
    opp = np.empty(3 * len(tris), np.int32)
    rc = lib.half_edge_opposites(
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(tris),
        opp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        raise ValueError("mesh has duplicated directed half-edges "
                         "(non-manifold or inconsistently oriented)")
    return opp


def rasterize(face_uvs: np.ndarray, width: int, height: int,
              pad_radius: int) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native rasterization + dilation; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    uvs = np.ascontiguousarray(face_uvs, np.float64)
    tri = np.empty(width * height, np.int32)
    bary = np.empty((width * height, 2), np.float64)
    lib.rasterize_texture_source(
        uvs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(uvs),
        width, height, pad_radius,
        tri.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bary.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return tri, bary
