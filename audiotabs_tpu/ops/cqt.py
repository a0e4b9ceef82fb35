"""Constant-Q transform as a single GEMM (MXU-native NDFT).

Replaces librosa.cqt / chroma_cqt / the Basic Pitch harmonic-CQT front end
(reference: backend/app/services/chords/template.py:88-101,
services/amt/basic_pitch.py:55-71). Instead of librosa's recursive
per-octave resampling (host-unfriendly, dynamic shapes), the whole filter
bank is materialized as one [K, 2*n_bins] real matrix of windowed complex
exponentials; the CQT of a song is then `framed_audio @ bank`, which XLA
tiles straight onto the MXU. This is the GEMM-NDFT formulation (cf. the
MelT/nnAudio line of work referenced in PAPERS.md).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .spectral import frame


@lru_cache(maxsize=8)
def cqt_kernel_bank(
    sr: int,
    fmin: float = 32.70319566257483,  # C1
    n_bins: int = 84,
    bins_per_octave: int = 12,
    filter_scale: float = 1.0,
    max_kernel_len: int | None = None,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Build the CQT kernel bank.

    Returns (bank [K, 2*n_bins] float32 with real|imag halves, freqs [n_bins],
    K). Kernels are hann-windowed complex exponentials of per-bin length
    Nk = Q*sr/f_k, centered in a common buffer of length K (next multiple of
    128 ≥ max Nk for MXU tiling), L1-normalized so a unit complex sinusoid at
    the bin frequency returns magnitude ≈ 1.
    """
    q = filter_scale / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    if freqs[-1] > sr / 2:
        raise ValueError(f"CQT top bin {freqs[-1]:.1f} Hz exceeds Nyquist {sr/2}")
    lengths = np.ceil(q * sr / freqs).astype(int)
    k_max = int(lengths.max())
    K = ((k_max + 127) // 128) * 128
    if max_kernel_len is not None:
        K = min(K, ((max_kernel_len + 127) // 128) * 128)

    bank = np.zeros((K, 2 * n_bins), dtype=np.float32)
    for b in range(n_bins):
        nk = min(int(lengths[b]), K)
        n = np.arange(nk) - nk / 2.0
        win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(nk) / nk)
        kern = win * np.exp(2j * np.pi * freqs[b] * n / sr)
        kern /= win.sum()
        start = (K - nk) // 2
        bank[start : start + nk, b] = kern.real
        bank[start : start + nk, n_bins + b] = kern.imag
    return bank, freqs.astype(np.float32), K


@partial(jax.jit, static_argnames=("sr", "hop", "fmin", "n_bins", "bins_per_octave", "filter_scale", "magnitude"))
def cqt(
    x,
    sr: int,
    hop: int = 512,
    fmin: float = 32.70319566257483,
    n_bins: int = 84,
    bins_per_octave: int = 12,
    filter_scale: float = 1.0,
    magnitude: bool = True,
):
    """CQT of x [..., T] → [..., n_bins, n_frames] (magnitude or complex)."""
    bank_np, _, K = cqt_kernel_bank(sr, fmin, n_bins, bins_per_octave, filter_scale)
    bank = jnp.asarray(bank_np)
    frames = frame(x, K, hop, center=True)  # [..., nf, K]
    proj = frames @ bank  # [..., nf, 2*n_bins]
    re, im = proj[..., :n_bins], proj[..., n_bins:]
    if magnitude:
        out = jnp.sqrt(re * re + im * im + 1e-20)
    else:
        out = re + 1j * im
    return jnp.swapaxes(out, -1, -2)  # [..., n_bins, nf]


def hybrid_cqt(
    x,
    sr: int,
    hop: int = 512,
    fmin: float = 32.70319566257483,
    n_bins: int = 84,
    bins_per_octave: int = 12,
    harmonics: tuple[float, ...] = (0.5, 1, 2, 3, 4, 5, 6, 7),
):
    """Harmonically-stacked CQT [..., H, n_bins, n_frames].

    The Basic Pitch front end stacks CQTs sampled at harmonic multiples of
    each bin frequency (reference model N4 in SURVEY.md §2a). Computed here
    by widening the bank: one GEMM with sub-banks at fmin*h, then a gather.
    Bins outside Nyquist are zero.
    """
    outs = []
    for h in harmonics:
        f0 = fmin * h
        n_valid = n_bins
        # drop bins above Nyquist for this harmonic
        top = f0 * 2.0 ** ((n_bins - 1) / bins_per_octave)
        nyq = sr / 2.0
        if top > nyq:
            import math

            n_valid = max(1, int(math.floor(bins_per_octave * math.log2(nyq / f0))) )
        c = cqt(x, sr, hop, f0, n_valid, bins_per_octave)
        if n_valid < n_bins:
            pad = [(0, 0)] * (c.ndim - 2) + [(0, n_bins - n_valid), (0, 0)]
            c = jnp.pad(c, pad)
        outs.append(c)
    return jnp.stack(outs, axis=-3)
