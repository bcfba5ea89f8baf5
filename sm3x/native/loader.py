"""ctypes binding for the native decode/letterbox loader (loader.cpp)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cpp")
_SO = os.path.join(_DIR, "libsm3x_loader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC,
           "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.sm3x_decode_letterbox_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int,
                np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                ctypes.c_int,
            ]
            lib.sm3x_decode_letterbox_batch.restype = None
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_loader_available() -> bool:
    return _load() is not None


def decode_letterbox_batch(paths: Sequence[str], cache_size: int,
                           crop_amount: int, workers: int = 8
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode JPEGs into (canvases (N,S,S,3) u8, valid_hw (N,2) i32,
    ok (N,) bool). Non-JPEG/unreadable entries come back ok=False — the
    caller decodes those via the Python path."""
    lib = _load()
    n = len(paths)
    canvases = np.zeros((n, cache_size, cache_size, 3), np.uint8)
    hw = np.zeros((n, 2), np.int32)
    ok = np.zeros((n,), np.int32)
    if lib is None or n == 0:
        return canvases, hw, ok.astype(bool)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.sm3x_decode_letterbox_batch(
        arr, n, cache_size, crop_amount, canvases, hw.reshape(-1), ok, workers)
    return canvases, hw, ok.astype(bool)
