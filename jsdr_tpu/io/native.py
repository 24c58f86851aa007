"""ctypes bindings for the native IO library (native/jsdr_io.cpp).

Auto-builds with the in-tree Makefile on first use if a compiler is
available; every entry point has a numpy fallback so the package works
without the native library (e.g. on a bare wheel install).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_NAME = "libjsdr_io.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    so = _NATIVE_DIR / _LIB_NAME
    if not so.exists() and (_NATIVE_DIR / "Makefile").exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not so.exists():
        return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.jsdr_s16le_iq_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int16, ctypes.c_int16,
            ctypes.c_void_p]
        lib.jsdr_s16le_mono_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int16, ctypes.c_void_p]
        lib.jsdr_f32_to_s16le.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p]
        _lib = lib
    except OSError:
        return None
    return _lib


def available() -> bool:
    return _load() is not None


def s16le_to_complex_native(samples: np.ndarray, channels: int = 2,
                            i_corr: int = 0,
                            q_corr: int = 0) -> Optional[np.ndarray]:
    """Native conversion; returns None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    s = np.ascontiguousarray(samples, dtype="<i2")
    n_frames = len(s) // channels
    out = np.empty(2 * n_frames, dtype=np.float32)
    if channels == 2:
        lib.jsdr_s16le_iq_to_f32(
            s.ctypes.data, n_frames, i_corr & 0xFFFF, q_corr & 0xFFFF,
            out.ctypes.data)
    else:
        lib.jsdr_s16le_mono_to_f32(
            s.ctypes.data, n_frames, i_corr & 0xFFFF, out.ctypes.data)
    return out.view(np.complex64)


def complex_to_s16le_native(iq: np.ndarray) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    f = np.ascontiguousarray(iq, dtype=np.complex64).view(np.float32)
    out = np.empty(len(f), dtype="<i2")
    lib.jsdr_f32_to_s16le(f.ctypes.data, len(f) // 2, out.ctypes.data)
    return out.tobytes()


def flac_decode_native(data: bytes, channels: int,
                       total: int) -> Optional[np.ndarray]:
    """Native FLAC decode (native/flac_dec.cpp) -> int32 interleaved
    [total*channels], or None when the library lacks the symbol or the
    stream needs the Python fallback (e.g. unknown total_samples)."""
    lib = _load()
    if lib is None or total <= 0:
        return None
    try:
        fn = lib.jsdr_flac_decode
    except AttributeError:
        return None
    fn.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
                   ctypes.c_longlong]
    fn.restype = ctypes.c_longlong
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(total * channels, np.int32)
    got = fn(buf.ctypes.data, len(data), out.ctypes.data, total)
    if got != total:
        return None
    return out
