"""Frame-level spectral features: mel, RMS, centroid, rolloff.

Replaces the librosa feature calls in the reference's analysis layer
(reference: backend/app/services/analysis/audio_quality.py:84-93,
accompaniment/strum.py:96-123).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .spectral import frame, stft


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


@lru_cache(maxsize=8)
def mel_filterbank(sr: int, n_fft: int, n_mels: int = 128, fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """Triangular mel filterbank [n_mels, n_fft//2+1] (HTK mel scale, area-normalized)."""
    fmax = fmax or sr / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fb = np.zeros((n_mels, n_freqs), dtype=np.float32)
    for i in range(n_mels):
        lo, ctr, hi = hz_pts[i], hz_pts[i + 1], hz_pts[i + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-9)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-9)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        norm = 2.0 / max(hi - lo, 1e-9)
        fb[i] *= norm
    return fb


@partial(jax.jit, static_argnames=("sr", "n_fft", "hop", "n_mels", "power"))
def melspectrogram(y, sr: int, n_fft: int = 2048, hop: int = 512, n_mels: int = 128, power: float = 2.0):
    S = jnp.abs(stft(y, n_fft=n_fft, hop=hop)) ** power  # [..., F, T]
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))
    return jnp.einsum("mf,...ft->...mt", fb, S)


@partial(jax.jit, static_argnames=("frame_length", "hop"))
def rms(y, frame_length: int = 2048, hop: int = 512):
    frames = frame(y, frame_length, hop, center=True)  # [..., nf, L]
    return jnp.sqrt(jnp.mean(frames**2, axis=-1))


@partial(jax.jit, static_argnames=("sr", "n_fft", "hop"))
def spectral_centroid(y, sr: int, n_fft: int = 2048, hop: int = 512):
    S = jnp.abs(stft(y, n_fft=n_fft, hop=hop))  # [..., F, T]
    freqs = jnp.linspace(0.0, sr / 2.0, S.shape[-2])
    w = S / jnp.maximum(jnp.sum(S, axis=-2, keepdims=True), 1e-10)
    return jnp.einsum("f,...ft->...t", freqs, w)


@partial(jax.jit, static_argnames=("sr", "n_fft", "hop", "roll_percent"))
def spectral_rolloff(y, sr: int, n_fft: int = 2048, hop: int = 512, roll_percent: float = 0.85):
    S = jnp.abs(stft(y, n_fft=n_fft, hop=hop))
    freqs = jnp.linspace(0.0, sr / 2.0, S.shape[-2])
    cum = jnp.cumsum(S, axis=-2)
    thresh = roll_percent * cum[..., -1:, :]
    over = cum >= thresh
    # first frequency index where cumulative energy crosses the threshold
    idx = jnp.argmax(over, axis=-2)
    return freqs[idx]
