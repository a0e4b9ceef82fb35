from .strum import detect_strum_onsets
from .shapes import Shape, pick_shape_for_chord, shape_pitches, shape_positions, shape_to_dict

__all__ = [
    "detect_strum_onsets",
    "Shape",
    "pick_shape_for_chord",
    "shape_pitches",
    "shape_positions",
    "shape_to_dict",
]
