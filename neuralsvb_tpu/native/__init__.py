"""Native (C++) host kernels, built on demand with g++ and bound via ctypes."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False


def _build_lib() -> str | None:
    src = os.path.join(_HERE, "dtw.cpp")
    out = os.path.join(_HERE, "libnsvb_native.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    # portable flags by default (the .so is never checked in; a committed
    # -march=native binary could SIGILL on a different host). Opt into
    # host-specific codegen with NSVB_NATIVE_MARCH=native.
    march = os.environ.get("NSVB_NATIVE_MARCH", "")
    extra = [f"-march={march}"] if march else []
    cmd = ["g++", "-O3", *extra, "-shared", "-fPIC", "-std=c++17", src, "-o", out]
    try:
        subprocess.check_call(cmd)
        return out
    except (OSError, subprocess.CalledProcessError):
        return None


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _BUILD_FAILED
    with _LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        path = _build_lib()
        if path is None:
            _BUILD_FAILED = True
            return None
        lib = ctypes.CDLL(path)
        lib.dtw_align.restype = ctypes.c_double
        lib.dtw_align.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.pitch_viterbi.restype = None
        lib.pitch_viterbi.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
        return _LIB


def dtw_align_native(cost: np.ndarray):
    """C++ DTW DP + backtrace. cost: [rows, cols] float. Returns
    (path [rows] int32, total cost) or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    cost = np.ascontiguousarray(cost, dtype=np.float32)
    rows, cols = cost.shape
    path = np.zeros(rows, dtype=np.int32)
    total = lib.dtw_align(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(rows), ctypes.c_int64(cols),
        path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return path, total


def pitch_viterbi_native(freqs: np.ndarray, strengths: np.ndarray,
                         octave_jump_cost: float, vuv_cost: float):
    """C++ Viterbi for the pitch tracker. freqs/strengths: [T, K] float.
    Returns path [T] int32 or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    freqs = np.ascontiguousarray(freqs, dtype=np.float32)
    strengths = np.ascontiguousarray(strengths, dtype=np.float32)
    T, K = freqs.shape
    path = np.zeros(T, dtype=np.int32)
    lib.pitch_viterbi(
        freqs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        strengths.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(T), ctypes.c_int64(K),
        ctypes.c_double(octave_jump_cost), ctypes.c_double(vuv_cost),
        path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return path
