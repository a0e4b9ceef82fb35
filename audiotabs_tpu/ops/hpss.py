"""Harmonic/percussive source separation by median filtering.

Replaces librosa.effects.harmonic / librosa.decompose.hpss
(reference: backend/app/services/pipeline.py:1669, chords/template.py:94,
analysis/content_classifier.py:118-133). Median filters are expressed as a
gather of the sliding window plus a sort along the window axis — fully
vectorized, no data-dependent shapes. TODO(pallas): a fused median kernel
to cut the window materialization once this shows up in profiles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .spectral import stft, istft


def _median_filter_lastaxis(x, win: int):
    """Median filter along the last axis with edge replication."""
    half = win // 2
    pad = [(0, 0)] * (x.ndim - 1) + [(half, half)]
    xp = jnp.pad(x, pad, mode="edge")
    idx = jnp.arange(x.shape[-1])[:, None] + jnp.arange(win)[None, :]
    windows = xp[..., idx]  # [..., T, win]
    return jnp.median(windows, axis=-1)


def hpss_masks(S_mag, kernel_harm: int = 31, kernel_perc: int = 31, power: float = 2.0, use_pallas: bool | None = None):
    """Soft harmonic/percussive masks from a magnitude spectrogram [..., F, T].

    On TPU the medians run through the fused Pallas kernel
    (ops/pallas_median.py — exact, ~20× the XLA sort lowering); elsewhere
    the XLA gather+sort path is used. Pass use_pallas=False from vmapped
    contexts (the kernel's ANY-space blocks don't batch).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and S_mag.ndim == 2 and kernel_harm % 2 == 1 and kernel_perc % 2 == 1:
        from .pallas_median import median_filter_lastaxis_pallas

        harm = median_filter_lastaxis_pallas(S_mag, kernel_harm)
        perc = median_filter_lastaxis_pallas(S_mag.T, kernel_perc).T
    else:
        harm = _median_filter_lastaxis(S_mag, kernel_harm)  # median over time
        perc = jnp.swapaxes(
            _median_filter_lastaxis(jnp.swapaxes(S_mag, -1, -2), kernel_perc), -1, -2
        )  # median over frequency
    hp = harm**power
    pp = perc**power
    tot = hp + pp
    safe = tot > 1e-10
    mask_h = jnp.where(safe, hp / jnp.where(safe, tot, 1.0), 0.5)
    return mask_h, 1.0 - mask_h


@partial(jax.jit, static_argnames=("n_fft", "hop", "kernel", "power", "use_pallas"))
def hpss(y, n_fft: int = 2048, hop: int = 512, kernel: int = 31, power: float = 2.0, use_pallas: bool | None = None):
    """Split a waveform into (harmonic, percussive) components."""
    S = stft(y, n_fft=n_fft, hop=hop)
    mag = jnp.abs(S)
    mh, mp = hpss_masks(mag, kernel, kernel, power, use_pallas)
    length = y.shape[-1]
    yh = istft(S * mh, hop=hop, length=length)
    yp = istft(S * mp, hop=hop, length=length)
    return yh, yp


@partial(jax.jit, static_argnames=("n_fft", "hop", "kernel", "power", "use_pallas"))
def harmonic(y, n_fft: int = 2048, hop: int = 512, kernel: int = 31, power: float = 2.0, use_pallas: bool | None = None):
    """Harmonic component only (reference: librosa.effects.harmonic)."""
    S = stft(y, n_fft=n_fft, hop=hop)
    mag = jnp.abs(S)
    mh, _ = hpss_masks(mag, kernel, kernel, power, use_pallas)
    return istft(S * mh, hop=hop, length=y.shape[-1])
