"""Chroma features (12 pitch classes) from the GEMM CQT.

Replaces librosa.feature.chroma_cqt
(reference: backend/app/services/chords/template.py:88-101).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .cqt import cqt

# fmin used throughout is C1, so CQT bin b has pitch class b % 12 with C == 0.


def chroma_from_cqt(C, bins_per_octave: int = 12, norm: bool = True):
    """Fold CQT magnitude [..., n_bins, T] to chroma [..., 12, T]."""
    n_bins = C.shape[-2]
    bins_per_pc = bins_per_octave // 12
    if bins_per_pc > 1:
        # collapse sub-semitone bins first
        usable = (n_bins // bins_per_pc) * bins_per_pc
        C = C[..., :usable, :]
        C = C.reshape(C.shape[:-2] + (usable // bins_per_pc, bins_per_pc, C.shape[-1])).sum(-2)
        n_bins = usable // bins_per_pc
    usable = (n_bins // 12) * 12
    folded = C[..., :usable, :].reshape(C.shape[:-2] + (usable // 12, 12, C.shape[-1])).sum(-3)
    rem = n_bins - usable
    if rem:
        tail = C[..., usable:, :]
        folded = folded.at[..., :rem, :].add(tail)
    if norm:
        folded = folded / jnp.maximum(jnp.max(folded, axis=-2, keepdims=True), 1e-8)
    return folded


@partial(jax.jit, static_argnames=("sr", "hop", "n_octaves", "bins_per_octave"))
def chroma_cqt(x, sr: int, hop: int = 512, n_octaves: int = 6, bins_per_octave: int = 36):
    C = cqt(x, sr, hop=hop, n_bins=n_octaves * bins_per_octave, bins_per_octave=bins_per_octave)
    return chroma_from_cqt(C, bins_per_octave=bins_per_octave)
