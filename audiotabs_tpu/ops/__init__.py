from .spectral import frame, hann_window, stft, istft, magnitude_db, power_to_db
from .cqt import cqt_kernel_bank, cqt, hybrid_cqt
from .chroma import chroma_from_cqt, chroma_cqt
from .hpss import hpss_masks, hpss, harmonic
from .features import (
    mel_filterbank,
    melspectrogram,
    rms,
    spectral_centroid,
    spectral_rolloff,
)
from .onset import onset_strength, onset_detect_frames
from .pyin import pyin

__all__ = [
    "frame",
    "hann_window",
    "stft",
    "istft",
    "magnitude_db",
    "power_to_db",
    "cqt_kernel_bank",
    "cqt",
    "hybrid_cqt",
    "chroma_from_cqt",
    "chroma_cqt",
    "hpss_masks",
    "hpss",
    "harmonic",
    "mel_filterbank",
    "melspectrogram",
    "rms",
    "spectral_centroid",
    "spectral_rolloff",
    "onset_strength",
    "onset_detect_frames",
    "pyin",
]
