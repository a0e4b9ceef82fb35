from .content_classifier import ContentSegment, ContentType, analyze_musical_content
from .audio_quality import analyze_audio_characteristics, calibrate_thresholds

__all__ = [
    "ContentSegment",
    "ContentType",
    "analyze_musical_content",
    "analyze_audio_characteristics",
    "calibrate_thresholds",
]
