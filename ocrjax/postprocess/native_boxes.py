"""ctypes bindings for the native (C++) classic-DB postprocess.

Builds ocrjax/native/libocr_native.so lazily with the checked-in Makefile on
first use and falls back to the pure NumPy+cv2 implementation
(ocrjax.postprocess.host_boxes) if no compiler is available. Same output
contract as extract_boxes_host.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libocr_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        src = os.path.join(_NATIVE_DIR, "ocr_native.cpp")
        if not os.path.exists(_LIB_PATH) or (
                os.path.exists(src)
                and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)):
            try:
                subprocess.run(["make", "-B", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.occ_label.restype = ctypes.c_int32
        lib.occ_label.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32)]
        lib.occ_extract_boxes.restype = ctypes.c_int32
        lib.occ_extract_boxes.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float)]
        if hasattr(lib, "occ_pack_nibbles"):  # added after round 1
            lib.occ_pack_nibbles.restype = None
            lib.occ_pack_nibbles.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8)]
        if hasattr(lib, "occ_decode_canvas"):  # added round 3
            lib.occ_decode_canvas.restype = None
            lib.occ_decode_canvas.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def label_components_native(bitmap: np.ndarray) -> Tuple[np.ndarray, int]:
    """(H, W) bool/uint8 → (labels int32 with -1 bg, n_components)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    bm = np.ascontiguousarray(bitmap.astype(np.uint8))
    H, W = bm.shape
    labels = np.empty((H, W), np.int32)
    n = lib.occ_label(
        bm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return labels, int(n)


def extract_boxes_native(
    prob: np.ndarray,
    thresh: float = 0.3,
    box_thresh: float = 0.6,
    unclip_ratio: float = 1.5,
    max_candidates: int = 256,
    min_box_size: int = 3,
) -> Tuple[np.ndarray, np.ndarray]:
    """Classic DB postprocess in C++; falls back to host_boxes without a
    toolchain. → (boxes (N, 4, 2) float32, scores (N,) float32)."""
    lib = _load()
    if lib is None:
        from ocrjax.postprocess.host_boxes import extract_boxes_host
        return extract_boxes_host(prob, thresh, box_thresh, unclip_ratio,
                                  max_candidates, min_box_size)
    p = np.ascontiguousarray(prob.astype(np.float32))
    H, W = p.shape
    boxes = np.empty((max_candidates, 4, 2), np.float32)
    scores = np.empty((max_candidates,), np.float32)
    n = lib.occ_extract_boxes(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), H, W,
        ctypes.c_float(thresh), ctypes.c_float(box_thresh),
        ctypes.c_float(unclip_ratio), ctypes.c_float(min_box_size),
        max_candidates,
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return boxes[:n].copy(), scores[:n].copy()
