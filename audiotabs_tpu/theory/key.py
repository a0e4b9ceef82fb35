"""Key estimation and enharmonic spelling.

Two estimators:
  * ``estimate_key_from_pcs`` — Krumhansl–Schmuckler template correlation on
    a pitch-class histogram. Replaces the reference's music21
    ``stream.analyze('key')`` (reference: backend/app/services/theory/
    quantize.py:42-82) with a dependency-free implementation; also the
    fallback when no CNN weights are loaded.
  * ``estimate_key_cnn`` — the madmom-style key CNN (models/key_cnn.py),
    capability parity with CNNKeyRecognitionProcessor
    (reference: backend/app/services/theory/key.py:99-178).

Circle-of-fifths spelling tables follow the reference's conventions
(key.py:58-96): prefer fewer accidentals, ties go to flats.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass
from typing import Literal, Optional

import numpy as np

from ..schemas import KeySignature
from .vocabulary import NOTE_NAMES_FLAT, NOTE_NAMES_SHARP, NOTE_TO_PC

Mode = Literal["major", "minor"]

# Krumhansl-Kessler probe-tone profiles
_KK_MAJOR = np.array(
    [6.35, 2.23, 3.48, 2.33, 4.38, 4.09, 2.52, 5.19, 2.39, 3.66, 2.29, 2.88]
)
_KK_MINOR = np.array(
    [6.33, 2.68, 3.52, 5.38, 2.60, 3.53, 2.54, 4.75, 3.98, 2.69, 3.34, 3.17]
)

_MAJOR_VARIANTS: dict[int, list[tuple[str, int]]] = {
    0: [("C", 0)], 1: [("Db", -5), ("C#", 7)], 2: [("D", 2)], 3: [("Eb", -3)],
    4: [("E", 4)], 5: [("F", -1)], 6: [("Gb", -6), ("F#", 6)], 7: [("G", 1)],
    8: [("Ab", -4)], 9: [("A", 3)], 10: [("Bb", -2)], 11: [("B", 5)],
}
_MINOR_VARIANTS: dict[int, list[tuple[str, int]]] = {
    9: [("A", 0)], 4: [("E", 1)], 11: [("B", 2)], 6: [("F#", 3)],
    1: [("C#", 4)], 8: [("G#", 5)], 3: [("Eb", -6), ("D#", 6)],
    10: [("Bb", -5), ("A#", 7)], 2: [("D", -1)], 7: [("G", -2)],
    0: [("C", -3)], 5: [("F", -4)],
}


@dataclass(frozen=True)
class KeyEstimate:
    tonic_pc: int
    tonic: str
    mode: Mode
    fifths: int
    name: str
    vexflow: str
    use_flats: bool
    score: float

    def to_dict(self) -> dict:
        return asdict(self)

    def to_schema(self) -> KeySignature:
        return KeySignature(
            tonic=self.tonic, mode=self.mode, fifths=self.fifths, name=self.name,
            vexflow=self.vexflow, use_flats=self.use_flats, score=self.score,
        )


def key_name_and_fifths(pc: int, mode: Mode) -> tuple[str, int]:
    """Pick the tonic spelling with the fewest accidentals (ties → flats)."""
    variants = _MAJOR_VARIANTS if mode == "major" else _MINOR_VARIANTS
    opts = variants.get(int(pc) % 12, [(NOTE_NAMES_SHARP[int(pc) % 12], 0)])
    tonic, fifths = sorted(opts, key=lambda it: (abs(it[1]), 0 if it[1] < 0 else 1))[0]
    return tonic, fifths


def _make_estimate(pc: int, mode: Mode, score: float) -> KeyEstimate:
    tonic, fifths = key_name_and_fifths(pc, mode)
    return KeyEstimate(
        tonic_pc=int(pc) % 12,
        tonic=tonic,
        mode=mode,
        fifths=fifths,
        name=f"{tonic} {'minor' if mode == 'minor' else 'major'}",
        vexflow=f"{tonic}{'m' if mode == 'minor' else ''}",
        use_flats=fifths < 0,
        score=float(score),
    )


def estimate_key_from_pcs(pc_weights: np.ndarray) -> Optional[KeyEstimate]:
    """Krumhansl–Schmuckler: correlate the pc histogram with all 24 keys."""
    w = np.asarray(pc_weights, dtype=np.float64)
    if w.size != 12 or w.sum() <= 0:
        return None
    w = w - w.mean()
    if np.allclose(w, 0):
        return None
    best = None
    for mode, profile in (("major", _KK_MAJOR), ("minor", _KK_MINOR)):
        p = profile - profile.mean()
        for pc in range(12):
            rolled = np.roll(p, pc)
            r = float(np.dot(w, rolled) / (np.linalg.norm(w) * np.linalg.norm(rolled)))
            if best is None or r > best[0]:
                best = (r, pc, mode)
    r, pc, mode = best
    return _make_estimate(pc, mode, r)


def estimate_key_from_events(note_events) -> Optional[KeyEstimate]:
    """Key from note events, duration-weighted pitch-class histogram."""
    if not note_events:
        return None
    hist = np.zeros(12)
    for ev in note_events:
        dur = max(1e-3, float(ev.end_time_s) - float(ev.start_time_s))
        hist[int(ev.pitch_midi) % 12] += dur
    return estimate_key_from_pcs(hist)


def estimate_key_from_chroma(chroma: np.ndarray) -> Optional[KeyEstimate]:
    """Key from a [12, T] chroma matrix (mean over time)."""
    c = np.asarray(chroma)
    if c.ndim == 2:
        c = c.mean(axis=1)
    return estimate_key_from_pcs(c)


def spell_chord_label(label: str, use_flats: bool) -> str:
    """Respell a chord root (and slash bass) enharmonically for the key."""
    if not label or label == "N":
        return label
    from .vocabulary import split_chord_label

    root, quality, bass = split_chord_label(label)
    if root is None:
        return label
    names = NOTE_NAMES_FLAT if use_flats else NOTE_NAMES_SHARP
    out = f"{names[NOTE_TO_PC[root]]}:{quality}" if quality else names[NOTE_TO_PC[root]]
    if bass:
        out += f"/{names[NOTE_TO_PC[bass]]}"
    return out
