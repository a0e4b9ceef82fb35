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


_SLANEY_LOGSTEP = np.log(6.4) / 27.0


def _hz_to_mel_slaney(f):
    """Slaney-scale mel (librosa's default): linear below 1 kHz, log above."""
    f = np.asarray(f, dtype=np.float64)
    return np.where(
        f >= 1000.0,
        15.0 + np.log(np.maximum(f, 1e-9) / 1000.0) / _SLANEY_LOGSTEP,
        f / (200.0 / 3.0),
    )


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    return np.where(
        m >= 15.0, 1000.0 * np.exp(_SLANEY_LOGSTEP * (m - 15.0)), m * (200.0 / 3.0)
    )


@lru_cache(maxsize=8)
def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: float | None = None,
    scale: str = "htk",
) -> np.ndarray:
    """Triangular mel filterbank [n_mels, n_fft//2+1], area-normalized.

    ``scale`` selects HTK (2595·log10) or Slaney (librosa default: linear
    below 1 kHz) band placement — band edges differ most in the low range
    where the guitar lives, so envelope-shape-sensitive consumers (the
    strum detector) must use "slaney" to match librosa's behavior."""
    fmax = fmax or sr / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_freqs)
    h2m, m2h = (
        (_hz_to_mel_slaney, _mel_to_hz_slaney) if scale == "slaney" else (_hz_to_mel, _mel_to_hz)
    )
    mel_pts = np.linspace(h2m(fmin), h2m(fmax), n_mels + 2)
    hz_pts = m2h(mel_pts)
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
