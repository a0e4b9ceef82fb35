"""Chord template library and emission model (device-side GEMM).

Capability parity with the reference's template matcher
(reference: backend/app/services/chords/template.py:20-137): 12 roots ×
vocab qualities + an N (no-chord) state; emissions are cosine similarities
(one [states, 12] @ [12, T] GEMM), with a 0.18 complexity penalty on 7th
qualities, an N-state energy model (bias 2 − slope 6 · energy), and a
frame-wise softmax. Non-chord tones carry a −0.35 template weight.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..theory.vocabulary import NOTE_NAMES_SHARP, QUALITY_INTERVALS

NON_CHORD_TONE_PENALTY = 0.35
COMPLEXITY_PENALTY = 0.18
N_STATE_BIAS = 2.0
N_STATE_SLOPE = 6.0

_VOCAB_QUALITIES = {
    "majmin": ("maj", "min"),
    "majmin7": ("maj", "min", "7", "min7"),
    "majmin7plus": ("maj", "min", "7", "min7", "maj7"),
}
_SEVENTH_QUALITIES = {"7", "min7", "maj7"}


@lru_cache(maxsize=4)
def build_chord_library(vocab: str = "majmin7") -> tuple[tuple[str, ...], np.ndarray]:
    """→ (labels with labels[0]='N', templates [n_states, 12] L2-normalized)."""
    qualities = _VOCAB_QUALITIES.get(vocab, _VOCAB_QUALITIES["majmin7plus"])
    labels = ["N"]
    rows = [np.zeros(12, dtype=np.float32)]
    for root in range(12):
        for q in qualities:
            v = np.full(12, -NON_CHORD_TONE_PENALTY, dtype=np.float32)
            for iv in QUALITY_INTERVALS[q]:
                v[(root + iv) % 12] = 1.0
            rows.append(v)
            labels.append(f"{NOTE_NAMES_SHARP[root]}:{q}")
    T = np.stack(rows)
    T /= np.linalg.norm(T, axis=1, keepdims=True) + 1e-9
    return tuple(labels), T


def emission_probs(chroma, energy, labels: tuple[str, ...], templates: np.ndarray):
    """[12, T] L2-normalized chroma + [T] energy → [states, T] probabilities."""
    scores = jnp.asarray(templates) @ chroma  # GEMM: [states, T]
    penalties = np.array(
        [COMPLEXITY_PENALTY if lbl.partition(":")[2] in _SEVENTH_QUALITIES else 0.0 for lbl in labels],
        dtype=np.float32,
    )
    scores = scores - jnp.asarray(penalties)[:, None]
    energy = jnp.clip(jnp.asarray(energy), 0.0, 1.0)
    scores = scores.at[0, :].set(N_STATE_BIAS - N_STATE_SLOPE * energy)
    m = jnp.max(scores, axis=0, keepdims=True)
    ex = jnp.exp(scores - m)
    return ex / (jnp.sum(ex, axis=0, keepdims=True) + 1e-9)
