"""Native (C++) runtime components with graceful Python fallback.

The compute path is JAX/XLA/Pallas; the host runtime around it uses C++
where throughput matters — currently the dataset EXR decode path, which is
multithreaded across scanline blocks and across files. Built on first use
with g++ (no pybind11 in this environment; plain C ABI via ctypes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_LOCK = threading.Lock()
_LIB = None
_LIB_FAILED = False


def _build() -> str:
    src = os.path.join(_HERE, "exr_native.cpp")
    out = os.path.join(_HERE, "_exr_native.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           src, "-o", out, "-lz"]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _LIB_FAILED
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        try:
            lib = ctypes.CDLL(_build())
        except (OSError, subprocess.CalledProcessError):
            _LIB_FAILED = True
            return None
        lib.exr_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
        lib.exr_probe.restype = ctypes.c_int
        lib.exr_read_rgb.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_float)]
        lib.exr_read_rgb.restype = ctypes.c_int
        lib.exr_read_rgb_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.exr_read_rgb_batch.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def read_exr_rgb_native(path: str) -> np.ndarray | None:
    """(H, W, 3) float32, or None if the native path is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.exr_probe(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), dtype=np.float32)
    rc = lib.exr_read_rgb(path.encode(),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if rc == 0 else None


def read_exr_rgb_batch_native(paths: list[str], height: int, width: int) -> np.ndarray | None:
    """Parallel decode of same-sized EXRs -> (N, H, W, 3), or None."""
    lib = get_lib()
    if lib is None or not paths:
        return None
    out = np.empty((len(paths), height, width, 3), dtype=np.float32)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    failures = lib.exr_read_rgb_batch(
        arr, len(paths), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out[0].size)
    return out if failures == 0 else None
