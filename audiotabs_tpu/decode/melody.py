"""Monophonic melody: pYIN pitch track → note events.

The BASELINE config-1 path (30 s WAV → CQT+pYIN → melody tab). Segments the
voiced f0 track into notes: split on voicing gaps and on pitch moves larger
than half a semitone, take the median pitch per run, drop sub-minimum runs.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops.features import rms
from ..ops.pyin import pyin
from ..theory.events import NoteEvent


def notes_from_f0(
    f0: np.ndarray,
    voiced: np.ndarray,
    hop_s: float,
    *,
    amplitudes: np.ndarray | None = None,
    min_note_s: float = 0.06,
    split_semitones: float = 0.6,
) -> list[NoteEvent]:
    f0 = np.asarray(f0, dtype=np.float64)
    voiced = np.asarray(voiced, dtype=bool)
    T = len(f0)
    midi = 69.0 + 12.0 * np.log2(np.maximum(f0, 1e-6) / 440.0)

    events: list[NoteEvent] = []
    i = 0
    while i < T:
        if not voiced[i]:
            i += 1
            continue
        j = i + 1
        while j < T and voiced[j] and abs(midi[j] - np.median(midi[i:j])) <= split_semitones:
            j += 1
        dur = (j - i) * hop_s
        if dur >= min_note_s:
            pitch = int(round(float(np.median(midi[i:j]))))
            if 0 <= pitch <= 127:
                amp = 0.5
                if amplitudes is not None:
                    k = min(len(amplitudes) - 1, j - 1)
                    amp = float(np.clip(np.max(amplitudes[i : k + 1]), 0.0, 1.0))
                events.append(
                    NoteEvent(
                        start_time_s=i * hop_s,
                        end_time_s=j * hop_s,
                        pitch_midi=pitch,
                        velocity=int(np.clip(40 + 87 * amp, 1, 127)),
                        amplitude=amp,
                    )
                )
        i = j
    return events


def transcribe_melody(
    y: np.ndarray,
    sr: int,
    *,
    fmin: float = 65.40639132514966,
    fmax: float = 2093.004522404789,
    frame_length: int = 2048,
    hop: int = 256,
    min_note_s: float = 0.06,
) -> list[NoteEvent]:
    """pYIN melody transcription of a mono signal."""
    yd = jnp.asarray(np.asarray(y, dtype=np.float32))
    f0, voiced, _ = pyin(yd, sr, fmin=fmin, fmax=fmax, frame_length=frame_length, hop=hop)
    amps = np.asarray(rms(yd, frame_length=frame_length, hop=hop))
    amps = amps / (amps.max() + 1e-9)
    n = min(len(np.asarray(f0)), len(amps))
    return notes_from_f0(
        np.asarray(f0)[:n],
        np.asarray(voiced)[:n],
        hop / sr,
        amplitudes=amps[:n],
        min_note_s=min_note_s,
    )
