"""FLAC decode via the native C++ decoder (native/flac_decoder.cpp).

The shared library is built on demand with the repo Makefile (g++ is part
of the toolchain); the ctypes surface is one call returning interleaved
int32 PCM which we normalize to float32 like the WAV reader.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from os import path
from typing import Optional, Tuple

import numpy as np

_lib_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None

_REPO_ROOT = path.dirname(path.dirname(path.dirname(path.abspath(__file__))))
_LIB_PATH = path.join(_REPO_ROOT, "native", "build", "libttsnative.so")


def _load_lib() -> ctypes.CDLL:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", path.join(_REPO_ROOT, "native")],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.flac_decode_file.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.flac_decode_file.restype = ctypes.c_int
        lib.flac_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return lib


def read_flac(filepath: str, mono: bool = True) -> Tuple[np.ndarray, int]:
    """Decode a FLAC file -> (float32 samples in [-1, 1], sample_rate)."""
    if not path.exists(filepath):
        raise FileNotFoundError(filepath)
    lib = _load_lib()
    samples = ctypes.POINTER(ctypes.c_int32)()
    n_frames = ctypes.c_int64()
    channels = ctypes.c_int()
    rate = ctypes.c_int()
    bits = ctypes.c_int()
    rc = lib.flac_decode_file(
        filepath.encode(), ctypes.byref(samples), ctypes.byref(n_frames),
        ctypes.byref(channels), ctypes.byref(rate), ctypes.byref(bits),
    )
    if rc != 0:
        raise ValueError(f"FLAC decode failed for {filepath} (code {rc})")
    try:
        total = n_frames.value * channels.value
        arr = np.ctypeslib.as_array(samples, shape=(total,)).copy()
    finally:
        lib.flac_free(samples)
    arr = arr.reshape(n_frames.value, channels.value).astype(np.float32)
    arr /= float(1 << (bits.value - 1))
    if mono and channels.value > 1:
        arr = arr.mean(axis=1)
    else:
        arr = arr[:, 0] if mono else arr
    return np.ascontiguousarray(arr), rate.value
