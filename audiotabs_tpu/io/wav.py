"""Host-side audio I/O.

The reference shells out to ffmpeg and reads WAVs through libsndfile
(reference: backend/app/services/audio.py:7-26). Neither exists in this
environment, so this module implements a self-contained RIFF/WAVE codec in
numpy (PCM 8/16/24/32-bit and IEEE float 32/64), with an optional
C++ fast path (native/audiotabs_native) and an optional ffmpeg subprocess
for non-WAV containers when the binary is present.
"""

from __future__ import annotations

import os
import shutil
import struct
import subprocess
from pathlib import Path

import numpy as np

_WAVE_FORMAT_PCM = 0x0001
_WAVE_FORMAT_IEEE_FLOAT = 0x0003
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def read_wav(path: str | os.PathLike) -> tuple[np.ndarray, int]:
    """Read a RIFF/WAVE file → (float32 array [samples, channels], sample_rate)."""
    data = Path(path).read_bytes()
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE file: {path}")
    pos = 12
    fmt = None
    raw = None
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is not None and raw is not None:
            break
    if fmt is None or raw is None:
        raise ValueError(f"WAV missing fmt/data chunk: {path}")
    audio_format, channels, sample_rate, _, block_align, bits = fmt
    if audio_format == _WAVE_FORMAT_EXTENSIBLE:
        # true format lives in the extension's SubFormat GUID first 2 bytes
        # (offset 24 within the fmt chunk body)
        fmt_body = None
        pos2 = 12
        while pos2 + 8 <= n:
            cid = data[pos2 : pos2 + 4]
            (size,) = struct.unpack_from("<I", data, pos2 + 4)
            if cid == b"fmt ":
                fmt_body = data[pos2 + 8 : pos2 + 8 + size]
                break
            pos2 += 8 + size + (size & 1)
        if fmt_body is not None and len(fmt_body) >= 26:
            (audio_format,) = struct.unpack_from("<H", fmt_body, 24)

    if audio_format == _WAVE_FORMAT_PCM:
        if bits == 16:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        elif bits == 8:
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8)
            usable = (len(b) // 3) * 3
            b = b[:usable].reshape(-1, 3)
            val = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            val = np.where(val >= 1 << 23, val - (1 << 24), val)
            x = val.astype(np.float32) / float(1 << 23)
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_format == _WAVE_FORMAT_IEEE_FLOAT:
        if bits == 32:
            x = np.frombuffer(raw, dtype="<f4").astype(np.float32)
        elif bits == 64:
            x = np.frombuffer(raw, dtype="<f8").astype(np.float32)
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
    else:
        raise ValueError(f"unsupported WAVE format tag 0x{audio_format:04x}")

    channels = max(1, channels)
    usable = (len(x) // channels) * channels
    return x[:usable].reshape(-1, channels), int(sample_rate)


def write_wav(path: str | os.PathLike, x: np.ndarray, sr: int, *, pcm16: bool = False) -> None:
    """Write float32 (or int16) audio as a WAV. x is [samples] or [samples, ch]."""
    x = np.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    channels = x.shape[1]
    if pcm16:
        body = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2").tobytes()
        fmt_tag, bits = _WAVE_FORMAT_PCM, 16
    else:
        body = x.astype("<f4").tobytes()
        fmt_tag, bits = _WAVE_FORMAT_IEEE_FLOAT, 32
    byte_rate = sr * channels * bits // 8
    block_align = channels * bits // 8
    hdr = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, fmt_tag, channels, sr, byte_rate, block_align, bits)
    hdr += b"data" + struct.pack("<I", len(body))
    Path(path).write_bytes(hdr + body)


def load_wav(path: str | os.PathLike, mono: bool = True) -> tuple[np.ndarray, int]:
    """Load WAV as float32; downmix to mono by mean (reference: audio.py:18-22).

    Uses the C++ decoder (native/audiotabs_native.cpp) when built, falling
    back to the pure-Python codec.
    """
    try:
        from .native import read_wav_native

        native = read_wav_native(path, mono=mono)
        if native is not None:
            return native
    except Exception:
        pass
    x, sr = read_wav(path)
    if mono and x.shape[1] > 1:
        x = x.mean(axis=1)
    elif mono:
        x = x[:, 0]
    return np.ascontiguousarray(x, dtype=np.float32), sr


def peak_normalize(x: np.ndarray, peak: float = 0.95) -> np.ndarray:
    """Scale so max |x| == peak (reference: audio.py:24-26)."""
    m = float(np.max(np.abs(x))) if x.size else 0.0
    if m <= 1e-9:
        return x
    return (x * (peak / m)).astype(np.float32)


def decode_mono(input_path: str | os.PathLike) -> tuple[np.ndarray, int] | None:
    """Decode a WAV/MP3/FFmpeg-supported container to mono at its NATIVE
    rate, or None when no in-process decoder recognizes the bytes."""
    input_path = Path(input_path)
    if input_path.suffix.lower() in (".wav", ".wave") or _looks_like_wav(input_path):
        return load_wav(input_path, mono=True)

    from .mp3 import decode_mp3, looks_like_mp3, mp3_available

    if (input_path.suffix.lower() == ".mp3" or looks_like_mp3(input_path)) and mp3_available():
        x, sr = decode_mp3(input_path, mono=True)
        return x.astype(np.float32), sr

    from .avdecode import av_available, decode_any

    if av_available():
        try:
            x, sr = decode_any(input_path)
        except RuntimeError:
            return None
        if x is not None and x.size:
            return x.astype(np.float32), sr
    return None


def decode_for_analysis(
    input_path: str | os.PathLike,
    out_path: str | os.PathLike,
    analysis_sr: int,
) -> tuple[np.ndarray, int, "threading.Thread | None", tuple[np.ndarray, int]]:
    """Decode to mono at ``analysis_sr`` with ONE resample from the native
    rate; the mono-44.1k work artifact (reference: audio.py:7-16 writes it
    via ffmpeg) is produced on a daemon thread so its resample + 5 MB disk
    write overlap the device work instead of sitting on the critical path.
    Returns (audio, analysis_sr, writer_thread | None, (native_audio,
    native_sr)) — join the thread before relying on out_path. The native
    audio feeds detectors that need the full band (strum onsets use the
    >11 kHz pick transients, accompaniment/strum.py)."""
    import threading

    from .resample import resample_poly_host

    decoded = decode_mono(input_path)
    if decoded is None:
        # fall back to the ffmpeg-binary path (also writes out_path)
        x44, sr44 = decode_to_mono_44k(input_path, out_path)
        return resample_poly_host(x44, sr44, analysis_sr), analysis_sr, None, (x44, sr44)
    x, sr = decoded
    y = resample_poly_host(x, sr, analysis_sr) if sr != analysis_sr else x

    def _write_artifact():
        try:
            x44 = resample_poly_host(x, sr, 44100) if sr != 44100 else x
            write_wav(out_path, x44, 44100)
        except Exception as exc:  # surfaced by the caller after join()
            t.error = exc

    t = threading.Thread(target=_write_artifact, daemon=True)
    t.error = None  # type: ignore[attr-defined]
    t.start()
    return y, analysis_sr, t, (x, sr)


def decode_to_mono_44k(input_path: str | os.PathLike, out_path: str | os.PathLike) -> tuple[np.ndarray, int]:
    """Decode any input to mono 44.1 kHz WAV at out_path, returning the audio.

    WAV inputs are handled natively (decode + polyphase resample); other
    containers require ffmpeg (reference: audio.py:7-16) and raise a clear
    error when the binary is absent.
    """
    input_path = Path(input_path)
    target_sr = 44100
    if input_path.suffix.lower() in (".wav", ".wave") or _looks_like_wav(input_path):
        x, sr = load_wav(input_path, mono=True)
        if sr != target_sr:
            from .resample import resample_poly_host

            x = resample_poly_host(x, sr, target_sr)
        write_wav(out_path, x, target_sr)
        return x, target_sr

    from .mp3 import decode_mp3, looks_like_mp3, mp3_available

    if (input_path.suffix.lower() == ".mp3" or looks_like_mp3(input_path)) and mp3_available():
        x, sr = decode_mp3(input_path, mono=True)
        if sr != target_sr:
            from .resample import resample_poly_host

            x = resample_poly_host(x, sr, target_sr)
        x = x.astype(np.float32)
        write_wav(out_path, x, target_sr)
        return x, target_sr

    # any other container (ogg/flac/m4a/...) through the FFmpeg-library shim
    from .avdecode import av_available, decode_any

    if av_available():
        try:
            x, sr = decode_any(input_path)
        except RuntimeError:
            x = None
        if x is not None and x.size:
            if sr != target_sr:
                from .resample import resample_poly_host

                x = resample_poly_host(x, sr, target_sr)
            x = x.astype(np.float32)
            write_wav(out_path, x, target_sr)
            return x, target_sr

    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError(
            f"cannot decode {input_path.name}: not a WAV and no ffmpeg binary available"
        )
    subprocess.run(
        [ffmpeg, "-y", "-i", str(input_path), "-ac", "1", "-ar", str(target_sr), str(out_path)],
        check=True,
        capture_output=True,
    )
    return load_wav(out_path, mono=True)


def _looks_like_wav(path: Path) -> bool:
    try:
        with open(path, "rb") as f:
            hdr = f.read(12)
        return hdr[:4] == b"RIFF" and hdr[8:12] == b"WAVE"
    except OSError:
        return False
