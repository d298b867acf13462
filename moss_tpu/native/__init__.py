"""ctypes bindings for the native host library (see src/moss_native.cc).

Builds on first use with g++ -O3 (cached next to the source); everything has a
pure-python/numpy fallback so the framework works without a toolchain. Exposes:

  * rasterize_cpu(...)  — exact sequential reference forward blend
  * mean_knn3_dist2(points) — grid-hash mean 3-NN squared distance
  * available() -> bool
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "moss_native.cc")
_LIB_PATH = os.path.join(_HERE, "_build", "libmoss_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
               _SRC, "-o", _LIB_PATH]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception as e:  # toolchain absent or broken
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.rasterize_cpu.argtypes = [
        f32p, f32p, f32p, f32p, f32p, i32p, u8p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, f32p, f32p, f32p,
    ]
    lib.rasterize_cpu.restype = None
    lib.mean_knn3_dist2.argtypes = [f32p, ctypes.c_int, f32p]
    lib.mean_knn3_dist2.restype = None
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        with _lock:
            if _lib is None and not _build_failed:
                _lib = _build()
    return _lib


def available() -> bool:
    return _get_lib() is not None


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rasterize_cpu(mean2d, conic, color, opacity, depth, radius, valid,
                  H: int, W: int, tile_h: int, tile_w: int, bg):
    """Exact sequential reference forward. Returns dict like the jnp oracle."""
    lib = _get_lib()
    mean2d = np.ascontiguousarray(mean2d, np.float32)
    conic = np.ascontiguousarray(conic, np.float32)
    color = np.ascontiguousarray(color, np.float32)
    opacity = np.ascontiguousarray(opacity, np.float32).reshape(-1)
    depth = np.ascontiguousarray(depth, np.float32)
    radius = np.ascontiguousarray(radius, np.int32)
    valid = np.ascontiguousarray(valid, np.uint8)
    bg = np.ascontiguousarray(bg, np.float32)
    P = mean2d.shape[0]
    out_c = np.zeros((H, W, 3), np.float32)
    out_d = np.zeros((H, W), np.float32)
    out_a = np.zeros((H, W), np.float32)
    out_T = np.zeros((H, W), np.float32)
    if lib is None:
        raise RuntimeError("native library unavailable (no toolchain); "
                           "use ops.rasterize_ref instead")
    lib.rasterize_cpu(
        _fp(mean2d), _fp(conic), _fp(color), _fp(opacity), _fp(depth),
        radius.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        P, H, W, tile_h, tile_w, _fp(bg),
        _fp(out_c), _fp(out_d), _fp(out_a), _fp(out_T),
    )
    return {"color": out_c, "depth": out_d, "alpha": out_a, "final_T": out_T}


def mean_knn3_dist2(points) -> np.ndarray:
    """Mean squared distance to the 3 nearest neighbours (numpy fallback:
    exact brute force)."""
    pts = np.ascontiguousarray(points, np.float32)
    N = pts.shape[0]
    lib = _get_lib()
    if lib is None:
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        return np.sort(d2, axis=1)[:, :3].mean(1)
    out = np.zeros(N, np.float32)
    lib.mean_knn3_dist2(_fp(pts), N, _fp(out))
    return out
