"""ctypes bindings for the native host-side decoder (decoder.cpp).

Self-bootstrapping: compiles the shared library with g++ on first import if
missing (cached next to the source). Falls back gracefully — callers check
``available()`` and use PIL otherwise, so environments without a toolchain or
libpng/libjpeg still work.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "decoder.cpp")
_SO = os.path.join(_HERE, "libmcseg_decoder.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO, "-lpng", "-ljpeg", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
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
        except OSError:
            return None
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.mcseg_decode_rgb.argtypes = [ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int]
        lib.mcseg_decode_gray.argtypes = [ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int]
        lib.mcseg_decode_depth16.argtypes = [
            ctypes.c_char_p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ]
        lib.mcseg_decode_rgb_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, u8p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.mcseg_decode_gray_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, u8p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.mcseg_decode_depth16_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, f32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ]
        for fn in ("mcseg_decode_rgb", "mcseg_decode_gray",
                   "mcseg_decode_depth16", "mcseg_decode_rgb_batch",
                   "mcseg_decode_gray_batch", "mcseg_decode_depth16_batch"):
            getattr(lib, fn).restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None and os.environ.get("MCSEG_NO_NATIVE") != "1"


def decode_rgb(path: str, h: int, w: int) -> np.ndarray:
    lib = _load()
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.mcseg_decode_rgb(path.encode(), out, h, w)
    if rc:
        raise IOError(f"native decode failed ({rc}) for {path}")
    return out


def decode_gray(path: str, h: int, w: int) -> np.ndarray:
    lib = _load()
    out = np.empty((h, w), np.uint8)
    rc = lib.mcseg_decode_gray(path.encode(), out, h, w)
    if rc:
        raise IOError(f"native decode failed ({rc}) for {path}")
    return out


def decode_depth16(path: str, h: int, w: int, scale: float = 0.001) -> np.ndarray:
    lib = _load()
    out = np.empty((h, w), np.float32)
    rc = lib.mcseg_decode_depth16(path.encode(), out, h, w, scale)
    if rc:
        raise IOError(f"native decode failed ({rc}) for {path}")
    return out


def _auto_threads(n_threads: int) -> int:
    if n_threads <= 0:
        n_threads = min(max(os.cpu_count() or 1, 1), 8)
    return n_threads


def decode_rgb_batch(paths: Sequence[str], h: int, w: int,
                     n_threads: int = 0) -> np.ndarray:
    lib = _load()
    n = len(paths)
    out = np.empty((n, h, w, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.mcseg_decode_rgb_batch(arr, n, out, h, w, _auto_threads(n_threads))
    if rc:
        raise IOError(f"native batch decode failed ({rc})")
    return out


def decode_gray_batch(paths: Sequence[str], h: int, w: int,
                      n_threads: int = 0) -> np.ndarray:
    lib = _load()
    n = len(paths)
    out = np.empty((n, h, w), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.mcseg_decode_gray_batch(arr, n, out, h, w, _auto_threads(n_threads))
    if rc:
        raise IOError(f"native batch decode failed ({rc})")
    return out


def decode_depth16_batch(paths: Sequence[str], h: int, w: int,
                         scale: float = 0.001, n_threads: int = 0) -> np.ndarray:
    lib = _load()
    n = len(paths)
    out = np.empty((n, h, w), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.mcseg_decode_depth16_batch(arr, n, out, h, w, scale,
                                        _auto_threads(n_threads))
    if rc:
        raise IOError(f"native batch decode failed ({rc})")
    return out
