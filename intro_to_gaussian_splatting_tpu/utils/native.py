"""ctypes bindings for the native C++ components (built by native/Makefile).

Auto-builds on first use when a compiler is available; every entry point has
a pure-Python fallback, so the package works without the native libs.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "_native")
_REPO_NATIVE = os.path.normpath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native"))


def _load(libname: str) -> Optional[ctypes.CDLL]:
    path = os.path.join(_NATIVE_DIR, libname)
    if not os.path.exists(path):
        try:
            subprocess.run(["make", "-C", _REPO_NATIVE, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None


class _OracleConfig(ctypes.Structure):
    _fields_ = [
        ("tile_size", ctypes.c_int),
        ("t_threshold", ctypes.c_float),
        ("alpha_clamp", ctypes.c_float),
        ("alpha_min", ctypes.c_float),
        ("pixel_bbox_test", ctypes.c_int),
        ("inclusive_tile_overlap", ctypes.c_int),
        ("skip_last_tile", ctypes.c_int),
    ]


_oracle_lib = None
_colmap_lib = None


def oracle_available() -> bool:
    global _oracle_lib
    if _oracle_lib is None:
        _oracle_lib = _load("libgsoracle.so") or False
    return bool(_oracle_lib)


def oracle_render(records: np.ndarray, valid: np.ndarray,
                  width: int, height: int, config) -> np.ndarray:
    """Golden-oracle render. records: (16, N) f32 depth-sorted; valid (N,)."""
    assert oracle_available(), "native oracle not built"
    lib = _oracle_lib
    records = np.ascontiguousarray(records, dtype=np.float32)
    valid = np.ascontiguousarray(valid, dtype=np.uint8)
    n = records.shape[1]
    image = np.zeros((height, width, 3), dtype=np.float32)
    cfg = _OracleConfig(
        tile_size=config.tile_size,
        t_threshold=config.t_threshold,
        alpha_clamp=config.alpha_clamp,
        alpha_min=config.alpha_min,
        pixel_bbox_test=int(config.compat.pixel_bbox_test),
        inclusive_tile_overlap=int(config.compat.inclusive_tile_overlap),
        skip_last_tile=int(config.compat.skip_last_tile),
    )
    lib.oracle_render(
        records.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n), ctypes.c_int(width), ctypes.c_int(height),
        ctypes.byref(cfg),
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return image


def colmap_available() -> bool:
    global _colmap_lib
    if _colmap_lib is None:
        _colmap_lib = _load("libgscolmap.so") or False
    return bool(_colmap_lib)


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def read_points3d_native(path: str):
    """Returns dict of flat arrays mirroring io.colmap.ColmapPoints fields."""
    assert colmap_available()
    lib = _colmap_lib
    buf = np.fromfile(path, dtype=np.uint8)
    bp = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    size = ctypes.c_int64(buf.size)
    total = ctypes.c_int64(0)
    null64 = ctypes.POINTER(ctypes.c_int64)()
    nulld = ctypes.POINTER(ctypes.c_double)()
    nullu8 = ctypes.POINTER(ctypes.c_uint8)()
    lib.colmap_read_points3d.restype = ctypes.c_int64
    n = lib.colmap_read_points3d(bp, size, 0, null64, nulld, nullu8, nulld,
                                 null64, null64, null64, ctypes.byref(total))
    if n < 0:
        raise ValueError(f"corrupt points3D file {path}")
    tt = total.value
    ids = np.empty(n, np.int64)
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    error = np.empty(n, np.float64)
    tl = np.empty(n, np.int64)
    tim = np.empty(tt, np.int64)
    tp2 = np.empty(tt, np.int64)
    n2 = lib.colmap_read_points3d(
        bp, size, 1, _i64p(ids),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        error.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        _i64p(tl), _i64p(tim), _i64p(tp2), ctypes.byref(total))
    assert n2 == n
    return dict(ids=ids, xyz=xyz, rgb=rgb, error=error, track_lengths=tl,
                track_image_ids=tim, track_point2D_idxs=tp2)


def read_images_native(path: str):
    """Returns dict of flat arrays for images.bin."""
    assert colmap_available()
    lib = _colmap_lib
    buf = np.fromfile(path, dtype=np.uint8)
    bp = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    size = ctypes.c_int64(buf.size)
    tp = ctypes.c_int64(0)
    tn = ctypes.c_int64(0)
    null32 = ctypes.POINTER(ctypes.c_int32)()
    null64 = ctypes.POINTER(ctypes.c_int64)()
    nulld = ctypes.POINTER(ctypes.c_double)()
    nullc = ctypes.POINTER(ctypes.c_char)()
    lib.colmap_read_images.restype = ctypes.c_int64
    n = lib.colmap_read_images(bp, size, 0, null32, nulld, nulld, null32,
                               null64, nullc, null64, nulld, null64,
                               ctypes.byref(tp), ctypes.byref(tn))
    if n < 0:
        raise ValueError(f"corrupt images file {path}")
    ids = np.empty(n, np.int32)
    qvec = np.empty((n, 4), np.float64)
    tvec = np.empty((n, 3), np.float64)
    cam_ids = np.empty(n, np.int32)
    name_lens = np.empty(n, np.int64)
    names = np.empty(tn.value, np.uint8)
    pt_counts = np.empty(n, np.int64)
    xys = np.empty((tp.value, 2), np.float64)
    p3d = np.empty(tp.value, np.int64)
    n2 = lib.colmap_read_images(
        bp, size, 1,
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        qvec.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        tvec.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cam_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _i64p(name_lens),
        names.ctypes.data_as(ctypes.POINTER(ctypes.c_char)),
        _i64p(pt_counts),
        xys.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        _i64p(p3d), ctypes.byref(tp), ctypes.byref(tn))
    assert n2 == n
    return dict(ids=ids, qvec=qvec, tvec=tvec, camera_ids=cam_ids,
                name_lengths=name_lens, names=names.tobytes(),
                pt_counts=pt_counts, xys=xys, point3d_ids=p3d)
