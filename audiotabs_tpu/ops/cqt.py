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


@partial(
    jax.jit,
    static_argnames=("sr", "hop", "fmin", "n_bins", "bins_per_octave", "filter_scale", "magnitude", "max_kernel_len"),
)
def cqt(
    x,
    sr: int,
    hop: int = 512,
    fmin: float = 32.70319566257483,
    n_bins: int = 84,
    bins_per_octave: int = 12,
    filter_scale: float = 1.0,
    magnitude: bool = True,
    max_kernel_len: int | None = None,
):
    """CQT of x [..., T] → [..., n_bins, n_frames] (magnitude or complex).

    Computed as ONE strided convolution (stride = hop) against the kernel
    bank — XLA lowers it to an implicit GEMM on the MXU without ever
    materializing the [n_frames, K] frame matrix (a gather that dominated
    the op's runtime). ``max_kernel_len`` truncates the longest
    (lowest-frequency) kernels: they keep their center frequency but widen
    in bandwidth — the standard latency/memory trade for very low fmin at
    high bins_per_octave.
    """
    bank_np, _, K = cqt_kernel_bank(sr, fmin, n_bins, bins_per_octave, filter_scale, max_kernel_len)
    bank = jnp.asarray(bank_np)  # [K, 2*n_bins]
    lead = x.shape[:-1]
    T = x.shape[-1]
    xf = x.reshape((-1, 1, T))  # [N, C=1, T]
    xf = jnp.pad(xf, ((0, 0), (0, 0), (K // 2, K // 2)), mode="reflect")
    proj = jax.lax.conv_general_dilated(
        xf,
        bank[:, None, :],  # [K, C_in=1, C_out=2B]
        window_strides=(hop,),
        padding="VALID",
        dimension_numbers=("NCH", "HIO", "NCH"),
    )  # [N, 2B, nf]
    proj = jnp.moveaxis(proj, -2, -1)  # [N, nf, 2B]
    proj = proj.reshape(lead + proj.shape[1:])
    re, im = proj[..., :n_bins], proj[..., n_bins:]
    if magnitude:
        out = jnp.sqrt(re * re + im * im + 1e-20)
    else:
        out = re + 1j * im
    return jnp.swapaxes(out, -1, -2)  # [..., n_bins, nf]


@partial(
    jax.jit,
    static_argnames=("sr", "hop", "fmin", "n_bins", "bins_per_octave", "harmonics", "max_kernel_len"),
)
def hybrid_cqt(
    x,
    sr: int,
    hop: int = 512,
    fmin: float = 32.70319566257483,
    n_bins: int = 84,
    bins_per_octave: int = 12,
    harmonics: tuple[float, ...] = (0.5, 1, 2, 3, 4, 5, 6, 7),
    max_kernel_len: int = 16384,
):
    """Harmonically-stacked CQT [..., H, n_bins, n_frames].

    The Basic Pitch front end's HarmonicStacking (reference model N4 in
    SURVEY.md §2a): ONE base CQT wide enough to cover fmin·min(h) up to
    fmin·max(h)·2^(n_bins/bpo), then each harmonic h is the base CQT
    shifted by round(bpo·log2 h) bins (out-of-range bins are zero). One
    GEMM total instead of |harmonics| transforms.
    """
    import math

    shifts = [int(round(bins_per_octave * math.log2(h))) for h in harmonics]
    lo = min(shifts)
    hi = max(shifts)
    base_fmin = fmin * 2.0 ** (lo / bins_per_octave)
    nyq_bins = int(math.floor(bins_per_octave * math.log2((sr / 2.0) / base_fmin)))
    total_bins = min(n_bins + hi - lo, nyq_bins)
    base = cqt(
        x,
        sr,
        hop=hop,
        fmin=base_fmin,
        n_bins=total_bins,
        bins_per_octave=bins_per_octave,
        max_kernel_len=max_kernel_len,
    )  # [..., total_bins, T]
    outs = []
    for s in shifts:
        start = s - lo
        avail = max(0, min(n_bins, total_bins - start))
        sl = base[..., start : start + avail, :]
        if avail < n_bins:
            pad = [(0, 0)] * (sl.ndim - 2) + [(0, n_bins - avail), (0, 0)]
            sl = jnp.pad(sl, pad)
        outs.append(sl)
    return jnp.stack(outs, axis=-3)
