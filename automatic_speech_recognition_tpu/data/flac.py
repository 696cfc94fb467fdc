"""FLAC decoding via the native C++ decoder (native/flacdec.cpp).

The reference reads FLAC through soundfile/libsndfile (reference
preprocess.py:9, :69); this wrapper exposes the framework's own decoder
with the same contract as read_wav: float64 mono signal in [-1, 1) plus
the sample rate.  The shared library is built on first use with the
repo-local Makefile (g++ is part of the toolchain).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libflacdec.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(["make", "-C", _NATIVE_DIR, "libflacdec.so"],
                   check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.flac_decode.restype = ctypes.c_int
        lib.flac_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.flac_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return lib


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    """Decode a FLAC file -> (float64 mono signal in [-1, 1), sample_rate)."""
    lib = _load()
    with open(path, "rb") as f:
        data = f.read()
    samples = ctypes.POINTER(ctypes.c_int32)()
    n = ctypes.c_int64()
    rate = ctypes.c_int()
    channels = ctypes.c_int()
    bps = ctypes.c_int()
    rc = lib.flac_decode(data, len(data), ctypes.byref(samples),
                         ctypes.byref(n), ctypes.byref(rate),
                         ctypes.byref(channels), ctypes.byref(bps))
    if rc != 0:
        raise ValueError(f"FLAC decode failed (code {rc}): {path}")
    try:
        count = n.value * channels.value
        pcm = np.ctypeslib.as_array(samples, shape=(count,)).astype(np.int64)
    finally:
        lib.flac_free(samples)
    sig = pcm.astype(np.float64) / float(1 << (bps.value - 1))
    if channels.value > 1:
        sig = sig.reshape(-1, channels.value).mean(axis=1)
    return sig, rate.value
