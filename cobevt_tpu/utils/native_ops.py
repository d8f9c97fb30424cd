"""ctypes bindings for the native C++ box kernels.

Builds `native/libbox_ops.so` on first use (g++, no external deps) and
falls back to the vectorized numpy implementations in
cobevt_tpu/geometry/boxes.py when no compiler is available.  Replaces the
reference's checked-in Cython extension
(opv2v/opencood/utils/box_overlaps.pyx, built by utils/setup.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbox_ops.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _build_failed = True
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.bbox_overlaps.argtypes = [f32, ctypes.c_int64, f32,
                                      ctypes.c_int64, f32]
        lib.bbox_intersections.argtypes = lib.bbox_overlaps.argtypes
        lib.rotated_iou.argtypes = [f64, ctypes.c_int64, f64,
                                    ctypes.c_int64, f64]
        lib.nms_rotated.argtypes = [f64, f64, ctypes.c_int64,
                                    ctypes.c_double, i64]
        lib.nms_rotated.restype = ctypes.c_int64
        _lib = lib
        return _lib


def bbox_overlaps(boxes, query_boxes):
    lib = get_lib()
    b = np.ascontiguousarray(boxes, np.float32)
    q = np.ascontiguousarray(query_boxes, np.float32)
    if lib is None:
        from cobevt_tpu.geometry.boxes import bbox_overlaps as np_impl
        return np_impl(b, q)
    out = np.zeros((len(b), len(q)), np.float32)
    lib.bbox_overlaps(b, len(b), q, len(q), out)
    return out


def bbox_intersections(boxes, query_boxes):
    lib = get_lib()
    b = np.ascontiguousarray(boxes, np.float32)
    q = np.ascontiguousarray(query_boxes, np.float32)
    if lib is None:
        from cobevt_tpu.geometry.boxes import bbox_intersections as np_impl
        return np_impl(b, q)
    out = np.zeros((len(b), len(q)), np.float32)
    lib.bbox_intersections(b, len(b), q, len(q), out)
    return out


def rotated_iou(corners_a, corners_b):
    lib = get_lib()
    a = np.ascontiguousarray(corners_a, np.float64)
    b = np.ascontiguousarray(corners_b, np.float64)
    if lib is None:
        from cobevt_tpu.geometry.boxes import rotated_iou as np_impl
        return np_impl(a, b)
    out = np.zeros((len(a), len(b)), np.float64)
    lib.rotated_iou(a, len(a), b, len(b), out)
    return out


def nms_rotated(corners, scores, threshold: float):
    lib = get_lib()
    c = np.ascontiguousarray(corners, np.float64)
    s = np.ascontiguousarray(scores, np.float64)
    if lib is None or len(c) == 0:
        from cobevt_tpu.geometry.boxes import nms_rotated as np_impl
        return np_impl(c, s, threshold)
    keep = np.zeros(len(c), np.int64)
    kept = lib.nms_rotated(c, s, len(c), float(threshold), keep)
    return keep[:kept].astype(np.int32)
