"""ctypes bindings for the native host-side data path (native/).

Loads native/libvod_native.so if present (build with `make -C native`),
building it on first use when a compiler is available; every entry point
has a NumPy fallback so the library is optional. The native path covers
the per-point host loops of the streaming pipeline: scan decode,
homogeneous transforms, ego compensation, OBB membership, and padding.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libvod_native.so")
_lib = None
_lib_tried = False

_F32P = ctypes.POINTER(ctypes.c_float)
_F64P = ctypes.POINTER(ctypes.c_double)
_U8P = ctypes.POINTER(ctypes.c_uint8)


def _try_build() -> bool:
    makefile = os.path.join(_REPO_ROOT, "native", "Makefile")
    if not os.path.exists(makefile):
        return False
    try:
        subprocess.run(["make", "-C", os.path.dirname(makefile)],
                       check=True, capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except (subprocess.SubprocessError, OSError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None when unavailable."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.vod_decode_scan.restype = ctypes.c_int
    lib.vod_decode_scan.argtypes = [ctypes.c_char_p, _F32P, ctypes.c_int,
                                    ctypes.c_int]
    lib.vod_transform_points.restype = None
    lib.vod_transform_points.argtypes = [_F32P, ctypes.c_int, _F64P, _F32P]
    lib.vod_compensate_ego.restype = None
    lib.vod_compensate_ego.argtypes = [_F32P, ctypes.c_int, _F64P, _F32P]
    lib.vod_points_in_obb.restype = ctypes.c_int
    lib.vod_points_in_obb.argtypes = [_F32P, ctypes.c_int, _F64P, _F64P,
                                      _F64P, ctypes.c_double, _U8P]
    lib.vod_pad_cloud.restype = ctypes.c_int
    lib.vod_pad_cloud.argtypes = [_F32P, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, _F32P, _U8P]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _f32(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, np.float32)


def _f64(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, np.float64)


def decode_scan(path: str, stride: int,
                max_pts: int = 1 << 20) -> np.ndarray:
    """Binary float32 scan file → (n, stride) array (np.fromfile fallback)."""
    lib = get_lib()
    if lib is None:
        return np.fromfile(path, np.float32).reshape(-1, stride)
    out = np.empty((max_pts, stride), np.float32)
    n = lib.vod_decode_scan(path.encode(), out.ctypes.data_as(_F32P),
                            max_pts, stride)
    if n == -1:
        raise FileNotFoundError(path)
    if n == -2:
        raise ValueError(f"{path}: size not a multiple of {stride} floats")
    return out[:n].copy()


def transform_points(points: np.ndarray, t: np.ndarray) -> np.ndarray:
    """(N,3) homogeneous transform (native or numpy)."""
    lib = get_lib()
    if lib is None:
        hom = np.concatenate([points, np.ones((points.shape[0], 1),
                                              points.dtype)], axis=1)
        return (t @ hom.T).T[:, :3].astype(np.float32)
    pts = _f32(points)
    out = np.empty_like(pts)
    lib.vod_transform_points(pts.ctypes.data_as(_F32P), pts.shape[0],
                             _f64(t).ctypes.data_as(_F64P),
                             out.ctypes.data_as(_F32P))
    return out


def compensate_ego(points: np.ndarray, ego_motion: np.ndarray) -> np.ndarray:
    """Reference ego compensation: (hom(p) @ inv(T.T))[:, :3]."""
    lib = get_lib()
    m = np.linalg.inv(np.asarray(ego_motion, np.float64).T)
    if lib is None:
        hom = np.concatenate([points, np.ones((points.shape[0], 1),
                                              points.dtype)], axis=1)
        return (hom @ m)[:, :3].astype(np.float32)
    pts = _f32(points)
    out = np.empty_like(pts)
    lib.vod_compensate_ego(pts.ctypes.data_as(_F32P), pts.shape[0],
                           _f64(m).ctypes.data_as(_F64P),
                           out.ctypes.data_as(_F32P))
    return out


def points_in_obb(points: np.ndarray, center: np.ndarray, rot: np.ndarray,
                  extent: np.ndarray, eps: float = 1e-9) -> np.ndarray:
    """(N,) bool closed in-box test (matches data.gt.points_in_obb)."""
    lib = get_lib()
    if lib is None:
        local = (points.astype(np.float64) - center) @ rot
        return np.all(np.abs(local) <= np.asarray(extent) / 2.0 + eps,
                      axis=1)
    pts = _f32(points)
    out = np.empty(pts.shape[0], np.uint8)
    lib.vod_points_in_obb(pts.ctypes.data_as(_F32P), pts.shape[0],
                          _f64(center).ctypes.data_as(_F64P),
                          _f64(rot).ctypes.data_as(_F64P),
                          _f64(extent).ctypes.data_as(_F64P),
                          ctypes.c_double(eps),
                          out.ctypes.data_as(_U8P))
    return out.astype(bool)


def pad_cloud(src: np.ndarray,
              n_max: int) -> Tuple[np.ndarray, np.ndarray, int]:
    """(n, c) → zero-padded (n_max, c) + bool mask + kept count."""
    lib = get_lib()
    if lib is None:
        n = min(src.shape[0], n_max)
        out = np.zeros((n_max,) + src.shape[1:], np.float32)
        out[:n] = src[:n]
        mask = np.zeros(n_max, bool)
        mask[:n] = True
        return out, mask, n
    s = _f32(src)
    c = s.shape[1]
    out = np.empty((n_max, c), np.float32)
    mask = np.empty(n_max, np.uint8)
    n = lib.vod_pad_cloud(s.ctypes.data_as(_F32P), s.shape[0], c, n_max,
                          out.ctypes.data_as(_F32P),
                          mask.ctypes.data_as(_U8P))
    return out, mask.astype(bool), n
