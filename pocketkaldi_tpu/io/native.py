"""ctypes bindings for the native host-runtime library (native/pktpu_io.cc).

Auto-builds ``libpktpu_io.so`` on first use (make + g++); every entry point
has a pure-Python fallback, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

from ..errors import CorruptionError, PkIOError

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpktpu_io.so")

_lib = None
_lib_tried = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.pktpu_read_wav_16k_mono.restype = ctypes.c_int64
    lib.pktpu_read_wav_16k_mono.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
    lib.pktpu_free.restype = None
    lib.pktpu_free.argtypes = [ctypes.c_void_p]
    lib.pktpu_traceback_batch.restype = ctypes.c_int32
    lib.pktpu_traceback_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int32)] * 6 + [ctypes.c_int32] * 5 + [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load_lib() is not None


def read_wav_16k_mono(filename: str) -> np.ndarray:
    """Native strict WAV read; raises like the Python reader on bad input."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    n = lib.pktpu_read_wav_16k_mono(filename.encode(), ctypes.byref(out))
    if n == -1:
        raise PkIOError(f"unable to open {filename}")
    if n < 0:
        raise CorruptionError(f"bad WAV file ({n}): {filename}")
    try:
        arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.pktpu_free(out)
    return arr


def _as_i32_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def traceback_batch(prev: np.ndarray, word: np.ndarray,
                    init_prev: np.ndarray, init_word: np.ndarray,
                    slots: np.ndarray, num_frames: np.ndarray,
                    max_words: int = 4096) -> List[List[int]]:
    """Batched traceback over (B,T,G,K) records; returns word lists."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    prev = np.ascontiguousarray(prev, dtype=np.int32)
    word = np.ascontiguousarray(word, dtype=np.int32)
    init_prev = np.ascontiguousarray(init_prev, dtype=np.int32)
    init_word = np.ascontiguousarray(init_word, dtype=np.int32)
    slots = np.ascontiguousarray(slots, dtype=np.int32)
    num_frames = np.ascontiguousarray(num_frames, dtype=np.int32)
    b, t, g, k = prev.shape
    g0 = init_prev.shape[1]
    out_words = np.zeros((b, max_words), dtype=np.int32)
    out_counts = np.zeros(b, dtype=np.int32)
    rc = lib.pktpu_traceback_batch(
        _as_i32_ptr(prev), _as_i32_ptr(word), _as_i32_ptr(init_prev),
        _as_i32_ptr(init_word), _as_i32_ptr(slots), _as_i32_ptr(num_frames),
        b, t, g, g0, k, _as_i32_ptr(out_words), max_words,
        _as_i32_ptr(out_counts))
    if rc != 0:
        raise PkIOError("traceback overflow: word sequence exceeds "
                        f"max_words={max_words}")
    return [out_words[i, :out_counts[i]].tolist() for i in range(b)]
