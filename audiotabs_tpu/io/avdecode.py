"""Any-container audio decode via the native FFmpeg-library shim.

Binds native/libaudiotabs_decode.so (built by native/build.sh against the
system libavformat/libavcodec/libswresample), giving the same container
coverage as the reference's ffmpeg subprocess (reference:
backend/app/services/audio.py:7-16) without forking a process or writing a
temp WAV. Absent the shim, callers fall back to the format-specific
decoders (WAV native, MP3 via libmpg123) and finally an ffmpeg binary.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_lib: ctypes.CDLL | None = None
_lib_checked = False


def _load_lib() -> ctypes.CDLL | None:
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    native_dir = Path(__file__).resolve().parent.parent.parent / "native"
    so = native_dir / "libaudiotabs_decode.so"
    if not so.exists():
        # best-effort on-demand build, like io/native.py
        import subprocess

        try:
            subprocess.run(
                ["sh", str(native_dir / "build.sh")], capture_output=True, timeout=120
            )
        except Exception:
            return None
    if not so.exists():
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.at_decode_audio.restype = ctypes.c_int
    lib.at_decode_audio.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.at_free.restype = None
    lib.at_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return _lib


def av_available() -> bool:
    return _load_lib() is not None


def decode_any(path: str | os.PathLike) -> tuple[np.ndarray, int]:
    """Decode any container's first audio stream → (mono float32, rate)."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("libaudiotabs_decode unavailable")
    buf = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_longlong(0)
    sr = ctypes.c_int(0)
    ret = lib.at_decode_audio(str(path).encode(), ctypes.byref(buf), ctypes.byref(n), ctypes.byref(sr))
    if ret != 0:
        raise RuntimeError(f"decode failed for {path} (code {ret})")
    try:
        out = np.ctypeslib.as_array(buf, shape=(n.value,)).astype(np.float32, copy=True)
    finally:
        lib.at_free(buf)
    return out, int(sr.value)
