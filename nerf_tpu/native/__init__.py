"""ctypes bindings for the native C++ data-loading runtime (native/dataio.cpp).

The shared library is built lazily with g++ on first use and cached next to
the source; any failure (no compiler, no libpng, bad build) degrades to the
PIL-based Python loader, which remains the correctness oracle
(tests/test_native.py compares the two).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "dataio.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "libdataio.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           os.path.abspath(_SRC), "-o", os.path.abspath(_LIB), "-lpng", "-lz",
           "-pthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the library; None when unavailable."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        src_ok = os.path.exists(_SRC)
        if not os.path.exists(_LIB) or (
            src_ok and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not (src_ok and _build()):
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(os.path.abspath(_LIB))
        except OSError:
            _lib_failed = True
            return None
        lib.dataio_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.dataio_probe.restype = ctypes.c_int
        lib.dataio_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.dataio_decode_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_images(paths: Sequence[str], ratio: float = 1.0,
                  white_bkg: bool = False,
                  n_threads: int = 0) -> Optional[np.ndarray]:
    """Decode PNGs to (N, H, W, 3) float32 in [0, 1]; None if unavailable.

    All images must share one post-resize size (Blender-synthetic datasets
    do). white_bkg composites alpha over white after the resize, matching
    the Python loader (data/blender.py).
    """
    lib = _load()
    if lib is None or not paths:
        return None
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.dataio_probe(paths[0].encode(), ratio, ctypes.byref(h),
                        ctypes.byref(w)) != 0:
        return None
    out = np.empty((len(paths), h.value, w.value, 3), np.float32)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    rc = lib.dataio_decode_batch(
        arr, len(paths), ratio, int(white_bkg), h.value, w.value,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
    if rc != 0:
        return None
    return out
