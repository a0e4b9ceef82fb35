"""htdemucs source separation — JAX architecture (placeholder at this stage).

Full hybrid-transformer Demucs (reference dependency N3, SURVEY.md §2a;
invoked at backend/app/services/separation/demucs_sep.py:144-220) lands in
a later milestone: dual time/spectral encoders, cross-domain transformer,
overlap-add chunk schedule as batched windows. Until then ``separate_stems``
returns None and the pipeline transparently falls back to the full mix,
matching the reference's demucs-unavailable path (demucs_sep.py:11-22).
"""

from __future__ import annotations

import numpy as np

MODEL_STEMS = {
    "htdemucs": ("drums", "bass", "other", "vocals"),
    "htdemucs_ft": ("drums", "bass", "other", "vocals"),
    "htdemucs_6s": ("drums", "bass", "other", "vocals", "guitar", "piano"),
}


def separate_stems(y: np.ndarray, sr: int, model_name: str = "htdemucs_6s") -> dict | None:
    """→ {stem_name: waveform} or None when no separator weights are loaded."""
    return None
