from .templates import build_chord_library, emission_probs
from .extract import extract_chords
from .segments import beat_sync_majority, frames_to_segments

__all__ = [
    "build_chord_library",
    "emission_probs",
    "extract_chords",
    "beat_sync_majority",
    "frames_to_segments",
]
