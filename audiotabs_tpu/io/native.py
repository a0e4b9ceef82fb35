"""ctypes bindings for the C++ audio library (native/audiotabs_native.cpp).

Fast host-side WAV decode + resampling. Auto-builds the shared library on
first use when a compiler is available; every entry point has a pure-Python
fallback (io/wav.py, io/resample.py), so the package works without a
toolchain too.
"""

from __future__ import annotations

import ctypes
import logging
import math
import os
import subprocess
from pathlib import Path

import numpy as np

_LOG = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libaudiotabs_native.so"
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    src = _NATIVE_DIR / "audiotabs_native.cpp"
    if not src.exists():
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB_PATH), str(src)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception as exc:
        _LOG.info("native build unavailable: %s", exc)
        return False


def get_lib() -> ctypes.CDLL | None:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("AUDIOTABS_DISABLE_NATIVE"):
        return None
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.atn_read_wav.restype = ctypes.c_int
        lib.atn_read_wav.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.atn_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.atn_resample.restype = ctypes.c_int64
        lib.atn_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ]
        lib.atn_peak_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float
        ]
        _lib = lib
    except OSError as exc:
        _LOG.info("native lib load failed: %s", exc)
        _lib = None
    return _lib


def read_wav_native(path: str | os.PathLike, mono: bool = True):
    """→ (float32 array, sample_rate) or None when the native lib is absent
    or the format is unsupported."""
    lib = get_lib()
    if lib is None:
        return None
    data = Path(path).read_bytes()
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    ch = ctypes.c_int32()
    sr = ctypes.c_int32()
    rc = lib.atn_read_wav(data, len(data), 1 if mono else 0, ctypes.byref(out),
                          ctypes.byref(n), ctypes.byref(ch), ctypes.byref(sr))
    if rc != 0:
        return None
    try:
        count = n.value * ch.value
        arr = np.ctypeslib.as_array(out, shape=(count,)).copy()
    finally:
        lib.atn_free(out)
    if not mono and ch.value > 1:
        arr = arr.reshape(n.value, ch.value)
    return arr, int(sr.value)


def resample_native(x: np.ndarray, sr_in: int, sr_out: int, taps_per_phase: int = 24):
    """Polyphase resample via the native lib, or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    g = math.gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    if up > 1024 or down > 1024:
        return None  # absurd ratio; let scipy handle it
    x = np.ascontiguousarray(x, dtype=np.float32)
    n_out = len(x) * up // down + 8
    out = np.empty(n_out, dtype=np.float32)
    written = lib.atn_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), up, down,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), taps_per_phase,
    )
    return out[:written]
