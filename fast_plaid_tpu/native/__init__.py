"""Native (C++) host kernels with transparent numpy fallbacks.

Compiles fastplaid_native.cpp on first import (g++, cached as
_fastplaid_native.so next to the source). Every entry point has a pure
numpy fallback, so the package works without a toolchain; ``AVAILABLE``
reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

__all__ = ["AVAILABLE", "build_ivf_native", "gather_windows_u8"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastplaid_native.cpp")
_SO = os.path.join(_HERE, "_fastplaid_native.so")
_lock = threading.Lock()
_lib = None
AVAILABLE = False


def _compile() -> bool:
    try:
        cmd = [
            "g++",
            "-O3",
            "-march=native",
            "-shared",
            "-fPIC",
            "-std=c++17",
            "-pthread",
            _SRC,
            "-o",
            _SO + ".tmp",
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception as exc:  # no toolchain / compile error -> numpy fallback
        print(f"fastplaid_native: build skipped ({exc})", file=sys.stderr)
        return False


def _load():
    global _lib, AVAILABLE
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.fp_build_ivf.restype = ctypes.c_int64
        lib.fp_build_ivf.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.fp_gather_windows_u8.restype = None
        lib.fp_gather_windows_u8.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        _lib = lib
        AVAILABLE = True
        return lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def build_ivf_native(
    codes: np.ndarray, doc_lengths: np.ndarray, n_partitions: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """C++ IVF build; returns None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.int32)
    doc_lengths = np.ascontiguousarray(doc_lengths, dtype=np.int64)
    n_docs = int(len(doc_lengths))
    t = int(codes.shape[0])
    n_pairs = lib.fp_build_ivf(
        _ptr(codes), t, _ptr(doc_lengths), n_docs, int(n_partitions), None, None
    )
    ivf = np.empty(int(n_pairs), dtype=np.int32)
    ivf_lengths = np.empty(int(n_partitions), dtype=np.int64)
    lib.fp_build_ivf(
        _ptr(codes),
        t,
        _ptr(doc_lengths),
        n_docs,
        int(n_partitions),
        _ptr(ivf),
        _ptr(ivf_lengths),
    )
    return ivf, ivf_lengths


def gather_windows_u8(
    src: np.ndarray,
    indices: np.ndarray,
    lengths: np.ndarray,
    doc_cap: int,
) -> np.ndarray | None:
    """Threaded jagged window gather: src [T, PD] u8 -> [W, doc_cap, PD] u8.

    Returns None when the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src)
    if src.dtype != np.uint8:
        src = src.view(np.uint8).reshape(src.shape[0], -1)
    indices = np.ascontiguousarray(indices, dtype=np.int64).reshape(-1)
    lengths = np.ascontiguousarray(lengths, dtype=np.int32).reshape(-1)
    w = int(indices.shape[0])
    row_bytes = int(src.shape[1])
    out = np.empty((w, int(doc_cap), row_bytes), dtype=np.uint8)
    lib.fp_gather_windows_u8(
        _ptr(src),
        int(src.shape[0]),
        row_bytes,
        _ptr(indices),
        _ptr(lengths),
        w,
        int(doc_cap),
        _ptr(out),
    )
    return out
