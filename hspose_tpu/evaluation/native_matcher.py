"""ctypes bindings for the native greedy matchers (native/matcher.cpp).

Auto-builds ``libmatcher.so`` with g++ on first use (cached); every call site
falls back to the numpy implementation when the toolchain or library is missing,
so the native path is a pure accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "matcher.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "build", "libmatcher.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    try:
        subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        dptr = ctypes.POINTER(ctypes.c_double)
        lib.greedy_iou_matches.argtypes = [dptr, ctypes.c_int, ctypes.c_int, dptr,
                                           ctypes.c_int, dptr, dptr]
        lib.greedy_pose_matches.argtypes = [dptr, ctypes.c_int, ctypes.c_int, dptr,
                                            ctypes.c_int, dptr, ctypes.c_int, dptr,
                                            dptr]
        _lib = lib
        return _lib


def _as_c(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def greedy_iou_matches_native(overlaps: np.ndarray, thresholds: np.ndarray
                              ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    P, G = overlaps.shape
    T = len(thresholds)
    overlaps = np.ascontiguousarray(overlaps, np.float64)
    thr = np.ascontiguousarray(thresholds, np.float64)
    gt_m = np.empty((T, G), np.float64)
    pred_m = np.empty((T, P), np.float64)
    lib.greedy_iou_matches(_as_c(overlaps), P, G, _as_c(thr), T, _as_c(gt_m),
                           _as_c(pred_m))
    return gt_m, pred_m


def greedy_pose_matches_native(errors: np.ndarray, degree_thresholds: Sequence[float],
                               shift_thresholds: Sequence[float]
                               ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    P, G = errors.shape[:2]
    deg = np.ascontiguousarray(degree_thresholds, np.float64)
    cm = np.ascontiguousarray(shift_thresholds, np.float64)
    D, S = len(deg), len(cm)
    errors = np.ascontiguousarray(errors, np.float64)
    gt_m = np.empty((D, S, G), np.float64)
    pred_m = np.empty((D, S, P), np.float64)
    lib.greedy_pose_matches(_as_c(errors), P, G, _as_c(deg), D, _as_c(cm), S,
                            _as_c(gt_m), _as_c(pred_m))
    return gt_m, pred_m
