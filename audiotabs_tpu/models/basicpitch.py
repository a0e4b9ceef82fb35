"""Polyphonic AMT — Basic Pitch architecture (placeholder at this stage).

The ICASSP-2022 CNN (reference dependency N4, SURVEY.md §2a; invoked at
backend/app/services/amt/basic_pitch.py:55-71) lands in a later milestone:
harmonic-CQT front end (ops/cqt.hybrid_cqt), onset/frame/contour heads,
posterior→note-event decoding as a scan. Until then the pipeline falls back
to the pYIN melody transcriber.
"""

from __future__ import annotations

import numpy as np

from ..theory.events import NoteEvent


def transcribe_polyphonic(
    y: np.ndarray,
    sr: int,
    *,
    onset_threshold: float = 0.5,
    frame_threshold: float = 0.3,
    min_note_ms: float = 127.70,
) -> list[NoteEvent]:
    raise NotImplementedError("basic-pitch JAX model lands in a later milestone")
