"""ctypes loader for the native evaluation kernels (native/fastmatch.cpp).

Builds the shared library on first use with g++ (no pybind11 in this image;
plain C ABI + ctypes keeps the toolchain dependency-free). Falls back to the
pure-numpy implementations if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libfastmatch.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "fastmatch.cpp")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", _SO_PATH,
                        _SRC_PATH], check=True, capture_output=True,
                       timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        if not os.path.exists(_SRC_PATH) or not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    lib.greedy_match.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8)]
    lib.coco_match.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    _lib = lib
    return _lib


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def greedy_match(pred_boxes: np.ndarray, pred_img: np.ndarray,
                 gt_boxes: np.ndarray, gt_offsets: np.ndarray,
                 iou_thr: float):
    """Native greedy TP/FP matching; returns (tp, fp) uint8 arrays or None
    if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    nd = len(pred_boxes)
    pred_boxes = np.ascontiguousarray(pred_boxes, np.float32)
    pred_img = np.ascontiguousarray(pred_img, np.int32)
    gt_boxes = np.ascontiguousarray(gt_boxes, np.float32)
    gt_offsets = np.ascontiguousarray(gt_offsets, np.int64)
    tp = np.zeros(nd, np.uint8)
    fp = np.zeros(nd, np.uint8)
    lib.greedy_match(_ptr(pred_boxes, ctypes.c_float),
                     _ptr(pred_img, ctypes.c_int32), nd,
                     _ptr(gt_boxes, ctypes.c_float),
                     _ptr(gt_offsets, ctypes.c_int64),
                     len(gt_offsets) - 1, iou_thr,
                     _ptr(tp, ctypes.c_uint8), _ptr(fp, ctypes.c_uint8))
    return tp, fp


def coco_match(dets: np.ndarray, gts: np.ndarray, gt_ignore: np.ndarray,
               iou_thrs: np.ndarray):
    """Native per-image COCO matching; returns dt_match (T, D) int64 or None."""
    lib = get_lib()
    if lib is None:
        return None
    D, G, T = len(dets), len(gts), len(iou_thrs)
    dets = np.ascontiguousarray(dets, np.float64)
    gts = np.ascontiguousarray(gts, np.float64)
    gt_ignore = np.ascontiguousarray(gt_ignore, np.uint8)
    iou_thrs = np.ascontiguousarray(iou_thrs, np.float64)
    out = np.full((T, D), -1, np.int64)
    lib.coco_match(_ptr(dets, ctypes.c_double), D,
                   _ptr(gts, ctypes.c_double),
                   _ptr(gt_ignore, ctypes.c_uint8), G,
                   _ptr(iou_thrs, ctypes.c_double), T,
                   _ptr(out, ctypes.c_int64))
    return out
