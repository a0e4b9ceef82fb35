from .viterbi import viterbi_constant_switch, viterbi_log_dense
from .dbn_beats import dbn_beat_track, estimate_beats, normalize_beat_times, estimate_tempo

__all__ = [
    "viterbi_constant_switch",
    "viterbi_log_dense",
    "dbn_beat_track",
    "estimate_beats",
    "normalize_beat_times",
    "estimate_tempo",
]
