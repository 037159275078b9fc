"""ctypes bindings for the native host-runtime library (native/csrc).

Provides the reference-parity batched searchsorted (torchsearchsorted
analog), fast ray-bank construction, and COLMAP points3D parsing. Builds the
shared library on first use (g++ + OpenMP, no pip deps); every entry point
has a pure-numpy fallback so the framework never hard-requires the library.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libgbnerf_native.so"))
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64, i32, f32, f64, u8, cp = (ctypes.c_int64, ctypes.c_int32,
                                  ctypes.c_float, ctypes.c_double,
                                  ctypes.c_uint8, ctypes.c_char_p)
    P = ctypes.POINTER
    lib.searchsorted_f32.argtypes = [P(f32), i64, i64, P(f32), i64, i64,
                                     P(i32), ctypes.c_int]
    lib.build_rays_f32.argtypes = [P(f32), i64, i64, i64, f32, P(f32), P(f32)]
    lib.colmap_points3d_stats.argtypes = [cp, P(i64), P(i64)]
    lib.colmap_points3d_stats.restype = ctypes.c_int
    lib.colmap_read_points3d.argtypes = [cp, P(i64), P(f64), P(u8), P(f64),
                                         P(i64), P(i32), P(i32)]
    lib.colmap_read_points3d.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def searchsorted(a: np.ndarray, v: np.ndarray, side: str = "left") -> np.ndarray:
    """Batched row-wise searchsorted (reference torchsearchsorted contract:
    a [Ba, A] sorted rows, v [Bv, V], Ba ∈ {1, Bv})."""
    a = np.ascontiguousarray(a, np.float32)
    v = np.ascontiguousarray(v, np.float32)
    assert a.ndim == v.ndim == 2 and (a.shape[0] in (1, v.shape[0]))
    lib = _load()
    if lib is None:
        rows = [np.searchsorted(a[0 if a.shape[0] == 1 else i], v[i], side)
                for i in range(v.shape[0])]
        return np.stack(rows).astype(np.int32)
    out = np.empty(v.shape, np.int32)
    lib.searchsorted_f32(_ptr(a, ctypes.c_float), a.shape[0], a.shape[1],
                         _ptr(v, ctypes.c_float), v.shape[0], v.shape[1],
                         _ptr(out, ctypes.c_int32), 1 if side == "right" else 0)
    return out


def build_rays(poses: np.ndarray, H: int, W: int,
               focal: float) -> Tuple[np.ndarray, np.ndarray]:
    """[N, 3, 4] c2w → (rays_o, rays_d) each [N, H·W, 3]."""
    poses = np.ascontiguousarray(poses[:, :3, :4], np.float32)
    n = len(poses)
    lib = _load()
    if lib is None:
        from .rays_bank import _full_image_rays_np

        outs = [_full_image_rays_np(H, W, focal, p) for p in poses]
        return (np.stack([o.reshape(-1, 3) for o, _ in outs]),
                np.stack([d.reshape(-1, 3) for _, d in outs]))
    rays_o = np.empty((n, H * W, 3), np.float32)
    rays_d = np.empty((n, H * W, 3), np.float32)
    lib.build_rays_f32(_ptr(poses, ctypes.c_float), n, H, W,
                       ctypes.c_float(focal),
                       _ptr(rays_o, ctypes.c_float),
                       _ptr(rays_d, ctypes.c_float))
    return rays_o, rays_d


def read_points3d_arrays(path: str):
    """COLMAP points3D.bin → struct-of-arrays dict (native fast path)."""
    lib = _load()
    if lib is None:
        from .colmap import read_points3d_binary

        pts = read_points3d_binary(path)
        ids = np.array(sorted(pts.keys()), np.int64)
        return {
            "ids": ids,
            "xyz": np.stack([pts[i].xyz for i in ids]),
            "error": np.array([pts[i].error for i in ids]),
        }
    n_points = ctypes.c_int64()
    total_track = ctypes.c_int64()
    rc = lib.colmap_points3d_stats(path.encode(), ctypes.byref(n_points),
                                   ctypes.byref(total_track))
    if rc != 0:
        raise IOError(f"colmap_points3d_stats({path}) -> {rc}")
    n, t = n_points.value, total_track.value
    ids = np.empty(n, np.int64)
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    error = np.empty(n, np.float64)
    offsets = np.empty(n + 1, np.int64)
    timg = np.empty(t, np.int32)
    tp2d = np.empty(t, np.int32)
    rc = lib.colmap_read_points3d(
        path.encode(), _ptr(ids, ctypes.c_int64), _ptr(xyz, ctypes.c_double),
        _ptr(rgb, ctypes.c_uint8), _ptr(error, ctypes.c_double),
        _ptr(offsets, ctypes.c_int64), _ptr(timg, ctypes.c_int32),
        _ptr(tp2d, ctypes.c_int32))
    if rc != 0:
        raise IOError(f"colmap_read_points3d({path}) -> {rc}")
    return {"ids": ids, "xyz": xyz, "rgb": rgb, "error": error,
            "track_offsets": offsets, "track_image_ids": timg,
            "track_p2d": tp2d}
