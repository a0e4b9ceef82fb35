"""STFT/ISTFT and framing primitives, jit-first.

Replaces librosa.stft/istft usage throughout the reference's DSP layer
(reference: backend/app/services/chords/template.py:88-101,
analysis/content_classifier.py:118-133, accompaniment/strum.py:96-123).

Design: framing is a reshape/gather with static shapes; the DFT itself is
jnp.fft.rfft, which XLA lowers to an efficient TPU FFT. Centered padding is
reflective like librosa so frame indices line up with the reference's
feature clocks (100 fps beats, 10 fps chroma).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def hann_window(n: int, periodic: bool = True) -> np.ndarray:
    """Hann window (periodic matches librosa/scipy sym=False)."""
    m = n if periodic else n - 1
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / max(m, 1))
    return w.astype(np.float32)


def num_frames(n_samples: int, frame_length: int, hop: int, center: bool = True) -> int:
    if center:
        return n_samples // hop + 1
    return max(0, 1 + (n_samples - frame_length) // hop)


def frame(x, frame_length: int, hop: int, center: bool = True, pad_mode: str = "reflect"):
    """Slice a signal [..., T] into frames [..., n_frames, frame_length].

    Implemented as a stack of static strided slices (a polyphase view)
    instead of an index gather: on TPU the gather lowering dominated the
    spectral front end (~10× slower than slicing for 4096-long frames at
    hop 220)."""
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(frame_length // 2, frame_length // 2)]
        x = jnp.pad(x, pad, mode=pad_mode)
    n = x.shape[-1]
    nf = 1 + (n - frame_length) // hop
    rows = -(-frame_length // hop)  # hop-sized phases covering one frame
    need = (nf - 1 + rows) * hop  # samples consumed by the phase matrix
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, max(0, need - n))])
    phases = xp[..., : (nf - 1 + rows) * hop]
    mat = phases.reshape(phases.shape[:-1] + (nf - 1 + rows, hop))
    # frame i = rows i..i+rows-1 of the phase matrix, cropped to frame_length
    stacked = jnp.stack([mat[..., i : i + nf, :] for i in range(rows)], axis=-2)
    return stacked.reshape(x.shape[:-1] + (nf, rows * hop))[..., :frame_length]


def stft(
    x,
    n_fft: int = 2048,
    hop: int = 512,
    win_length: int | None = None,
    center: bool = True,
    window: np.ndarray | None = None,
    pad_mode: str = "reflect",
):
    """STFT → complex [..., n_fft//2+1, n_frames] (librosa axis order).

    ``pad_mode`` controls the center padding; librosa 0.10.x defaults to
    "constant" — consumers that need bit-level librosa parity (the strum
    onset envelope) pass that explicitly, everything else keeps "reflect"
    (the trained checkpoints' operating point)."""
    win_length = win_length or n_fft
    w = window if window is not None else hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        w = np.pad(np.asarray(w), (lpad, n_fft - win_length - lpad))
    frames = frame(x, n_fft, hop, center=center, pad_mode=pad_mode)  # [..., nf, n_fft]
    spec = jnp.fft.rfft(frames * jnp.asarray(w, dtype=frames.dtype), axis=-1)
    return jnp.swapaxes(spec, -1, -2)  # [..., freq, time]


def istft(
    spec,
    hop: int = 512,
    win_length: int | None = None,
    center: bool = True,
    length: int | None = None,
):
    """Inverse STFT with Hann overlap-add and window-square normalization."""
    spec = jnp.swapaxes(spec, -1, -2)  # [..., time, freq]
    n_fft = 2 * (spec.shape[-1] - 1)
    win_length = win_length or n_fft
    w = jnp.asarray(hann_window(win_length), dtype=jnp.float32)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        w = jnp.pad(w, (lpad, n_fft - win_length - lpad))
    frames = jnp.fft.irfft(spec, axis=-1) * w  # [..., nf, n_fft]
    nf = frames.shape[-2]
    out_len = n_fft + hop * (nf - 1)

    if n_fft % hop == 0:
        # overlap-add as R = n_fft/hop static slice-adds: frame f's hop-sized
        # chunk c lands exactly on block f+c, so the whole OLA is R
        # dynamic-update-slices — the index-map scatter below lowers to a
        # generic (sort-based) scatter on TPU and dominated istft's runtime
        R = n_fft // hop
        chunks = frames.reshape(frames.shape[:-1] + (R, hop))
        sig2 = jnp.zeros(frames.shape[:-2] + (nf + R - 1, hop), dtype=frames.dtype)
        wc = (w * w).reshape(R, hop)
        ws2 = jnp.zeros((nf + R - 1, hop), dtype=jnp.float32)
        for c in range(R):
            sig2 = sig2.at[..., c : c + nf, :].add(chunks[..., :, c, :])
            ws2 = ws2.at[c : c + nf, :].add(jnp.broadcast_to(wc[c], (nf, hop)))
        sig = sig2.reshape(frames.shape[:-2] + (out_len,))
        wsum = ws2.reshape(-1)
    else:
        # overlap-add via scatter-add on a frame-index map
        idx = (jnp.arange(nf)[:, None] * hop + jnp.arange(n_fft)[None, :]).reshape(-1)
        flat = frames.reshape(frames.shape[:-2] + (-1,))
        sig = jnp.zeros(frames.shape[:-2] + (out_len,), dtype=frames.dtype)
        sig = sig.at[..., idx].add(flat)
        wsum = jnp.zeros((out_len,), dtype=jnp.float32).at[idx].add(jnp.tile(w * w, nf))
    sig = sig / jnp.maximum(wsum, 1e-8)

    if center:
        sig = sig[..., n_fft // 2 :]
        if length is not None:
            sig = sig[..., :length]
        else:
            sig = sig[..., : out_len - n_fft]
    elif length is not None:
        sig = sig[..., :length]
    return sig


def power_to_db(S, ref: float = 1.0, amin: float = 1e-10, top_db: float | None = 80.0):
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, S)) - 10.0 * jnp.log10(jnp.maximum(amin, ref))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec


def magnitude_db(spec, top_db: float | None = 80.0):
    return power_to_db(jnp.abs(spec) ** 2, top_db=top_db)
