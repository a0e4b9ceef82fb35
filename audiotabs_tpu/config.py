"""Environment-driven configuration.

Knob names are kept compatible with the reference's ``Settings``
(reference: backend/app/core/config.py:4-73) so a user of the reference can
bring their ``.env`` unchanged, but the implementation is a dependency-free
dataclass (no pydantic-settings in this environment).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any


def _env(name: str, default: Any) -> Any:
    raw = os.environ.get(name)
    if raw is None:
        return default
    if isinstance(default, bool):
        return raw.strip().lower() in ("1", "true", "yes", "on")
    if isinstance(default, int):
        return int(raw)
    if isinstance(default, float):
        return float(raw)
    return raw


@dataclasses.dataclass
class Settings:
    APP_NAME: str = "audiotabs-tpu"
    APP_ENV: str = "dev"

    DATA_DIR: str = "./data"
    FRONTEND_ORIGIN: str = "http://localhost:3000"
    MAX_UPLOAD_MB: int = 500

    # Job queue. The reference used Celery+Redis (workers/celery_app.py:7-21);
    # here the queue is a native in-process/multi-process runner and these
    # knobs gate an optional Celery integration when available.
    CELERY_ENABLED: bool = False
    REDIS_URL: str = "redis://localhost:6379/0"
    JOB_WORKERS: int = 1

    # Source separation (reference: config.py:17-24). Model names mirror the
    # htdemucs family; "device" is meaningless on TPU and kept for env compat.
    ENABLE_DEMUCS: bool = True
    DEMUCS_MODEL: str = "htdemucs_6s"
    DEMUCS_DEVICE: str = "auto"
    # Reference default is 2 (demucs_sep.py:26). Measured tradeoff on the
    # 6-source checkpoint (train/shifts_eval.py + bench.py, 2026-08-17):
    # shift averaging buys +0.48 dB held-out guitar-stem SI-SDR
    # (6.48 → 6.96) and identical golden stem routing (0.9698 vs 0.9695
    # RMS frac), but costs ~1.8× pipeline wall on short songs (59 → 33
    # audio-s/s/chip measured; separation compute sits on the fused
    # analysis' critical path). Throughput-first default; DEMUCS_SHIFTS=2
    # restores exact reference parity when quality is worth the wall.
    DEMUCS_SHIFTS: int = 1
    DEMUCS_OVERLAP: float = 0.25
    DEMUCS_SEGMENT_SEC: float = 7.8
    # Run the htdemucs net in bfloat16 on the MXU (STFT/iSTFT, norm stats,
    # attention softmax, and the OLA recombine stay f32). TPU-only knob —
    # no reference counterpart. Measured r5 on the relay-attached v5e
    # (30 s song, shifts=1, min-of-5 warm): f32 0.328 s vs bf16 0.354 s —
    # a wash; the program is not MXU-bound at this size (stem fidelity is
    # fine: 27-51 dB SNR vs f32). Default stays f32 for bit-stable golden
    # parity; the knob remains for larger checkpoints/batches where the
    # MXU balance differs (models/htdemucs.py forward(compute_dtype=...)).
    DEMUCS_BF16: bool = False
    TRANSCRIPTION_STEM_PRIORITY: str = "guitar,other,vocals"

    # AMT (reference: config.py:26-31)
    ENABLE_BASIC_PITCH: bool = True
    BASIC_PITCH_ONSET_THRESHOLD: float = 0.5
    BASIC_PITCH_FRAME_THRESHOLD: float = 0.3
    BASIC_PITCH_MIN_NOTE_MS: float = 127.70
    BASIC_PITCH_HOP_SEC: float = 0.05
    ENABLE_AUTO_THRESHOLD_CALIBRATION: bool = True

    # Musical post-processing (reference: config.py:33-42)
    HARMONIC_DUPLICATE_WINDOW_MS: float = 100.0
    HARMONIC_TOLERANCE_CENTS: float = 50.0
    HARMONIC_EVEN_THRESHOLD: float = 0.7
    HARMONIC_ODD_THRESHOLD: float = 0.55
    TEMPORAL_CLUSTER_WINDOW_MS: float = 80.0
    TEMPORAL_CLUSTER_GAP_MS: float = 50.0
    DISSONANCE_CORRECTION_AGGRESSIVENESS: float = 0.5
    DISSONANCE_WINDOW_MS: float = 60.0
    VOICE_ASSIGN_WINDOW_MS: float = 60.0

    # Guitar tuning (reference: config.py:45)
    GUITAR_TUNING: str = "standard"

    # Chord detection (reference: config.py:47-56)
    CHORD_DETECTION_BACKEND: str = "deep"  # deep|template
    CHORD_SMOOTHING_SEC: float = 0.3
    CHORD_VOCAB: str = "majmin7"  # majmin|majmin7|majmin7plus
    SWITCH_PENALTY: float = 2.5
    MIN_SEGMENT_SEC: float = 0.25

    # Transcription mode (reference: config.py:58)
    TRANSCRIPTION_MODE: str = "guitar"  # guitar|notes|accompaniment

    # Content analysis (reference: config.py:61-62)
    CONTENT_ANALYSIS_WINDOW_SEC: float = 3.0
    CONTENT_ANALYSIS_HOP_SEC: float = 1.5

    BEAT_BACKEND: str = "dbn"  # dbn|onset (reference: config.py:71 librosa|madmom)

    # --- TPU-native knobs (new in this framework) ---
    MESH_SHAPE: str = ""          # e.g. "8" or "4,2"; empty = all devices, 1-D
    MESH_AXES: str = "data"       # axis names matching MESH_SHAPE
    COMPUTE_DTYPE: str = "bfloat16"
    PAD_SECONDS_BUCKET: float = 30.0  # songs padded to multiples of this to bound recompiles
    # max songs per device per batched dispatch: the sharded batch program
    # inlines each local song's full separation+analysis, and past ~8 local
    # songs the program exceeds what the remote TPU compile helper accepts
    # (measured: local 8 w/ separation = 60 MB MLIR, compile HTTP 500;
    # local 4 compiles and runs 84 audio-s/s warm). Larger batches are
    # chunked into dispatches of this many songs per device.
    BATCH_SONGS_PER_DEVICE: int = 4
    PROFILE_DIR: str = ""         # if set, jax profiler traces per stage
    # fetch fused outputs lazily per key (async copies started up front) so
    # host post-processing of early outputs (beats, chords) overlaps the
    # transfer of the big tensors (AMT posteriors, y_harm) instead of one
    # blocking device_get. Off by default — measured on-relay A/B (r4,
    # interleaved min-of-5 on a 30 s song, same compiled program): off
    # med 0.666 s / min 0.660 s vs on med 0.669 s / min 0.644 s — a wash
    # inside relay round-trip variance (spread 0.644-0.803 s). The axon
    # relay does not overlap per-key copy_to_host_async transfers enough
    # to beat one batched tree fetch, and the tail's host work on early
    # keys (~tens of ms) is small against the ~60-80 ms RTT floor
    # (see runtime/pipeline.py _SplitFetch).
    FUSED_SPLIT_FETCH: bool = False

    @classmethod
    def from_env(cls) -> "Settings":
        kwargs = {}
        for f in dataclasses.fields(cls):
            kwargs[f.name] = _env(f.name, f.default)
        return cls(**kwargs)

    def stem_priority(self) -> list[str]:
        return [s.strip() for s in self.TRANSCRIPTION_STEM_PRIORITY.split(",") if s.strip()]


settings = Settings.from_env()


def reload_settings() -> Settings:
    """Re-read the environment (used by tests that tweak os.environ)."""
    global settings
    settings = Settings.from_env()
    return settings
