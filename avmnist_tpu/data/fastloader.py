"""ctypes bindings + on-demand build for the native batch-gather kernels
(csrc/fastloader.c). Falls back to numpy silently when no C compiler is available;
``AVMNIST_FASTLOADER=0`` disables it."""
from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _csrc_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "fastloader.c")


def _build_dir() -> str:
    d = os.path.join(os.path.expanduser("~"), ".cache", "avmnist_tpu")
    os.makedirs(d, exist_ok=True)
    return d


def load_library() -> Optional[ctypes.CDLL]:
    """Build (once) and load libfastloader; None when unavailable/disabled."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("AVMNIST_FASTLOADER", "1") == "0":
        return None
    src = os.path.abspath(_csrc_path())
    if not os.path.exists(src):
        return None
    so = os.path.join(_build_dir(), "libfastloader.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            cc = os.environ.get("CC", "cc")
            subprocess.run([cc, "-O3", "-shared", "-fPIC", "-o", so, src],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.gather_u8.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_int64, ctypes.c_void_p]
        lib.gather_f64_to_f32.argtypes = lib.gather_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p]
        lib.gather_u8_normalize.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_void_p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def gather_rows(src: np.ndarray, idx: np.ndarray, out_dtype=None) -> np.ndarray:
    """dst[i] = src[idx[i]] with optional dtype conversion, via the C kernels when
    loaded, else numpy fancy indexing."""
    lib = load_library()
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    n = len(idx)
    row_shape = src.shape[1:]
    row_elems = int(np.prod(row_shape))
    out_dtype = np.dtype(out_dtype or src.dtype)
    if lib is not None and src.flags["C_CONTIGUOUS"]:
        if src.dtype == np.uint8 and out_dtype == np.uint8:
            dst = np.empty((n, *row_shape), np.uint8)
            lib.gather_u8(_ptr(src), _ptr(idx), n, row_elems, _ptr(dst))
            return dst
        if src.dtype == np.float64 and out_dtype == np.float32:
            dst = np.empty((n, *row_shape), np.float32)
            lib.gather_f64_to_f32(_ptr(src), _ptr(idx), n, row_elems, _ptr(dst))
            return dst
        if src.dtype == np.float32 and out_dtype == np.float32:
            dst = np.empty((n, *row_shape), np.float32)
            lib.gather_f32(_ptr(src), _ptr(idx), n, row_elems, _ptr(dst))
            return dst
    return np.ascontiguousarray(src[idx], dtype=out_dtype)
