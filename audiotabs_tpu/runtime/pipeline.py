"""Pipeline orchestrator: decode → beats → pitch → chords → score → export.

The TPU-native re-expression of the reference's run_pipeline
(reference: backend/app/services/pipeline.py:1611-2047). Every stage is
try/except graceful-degradation like the reference (SURVEY.md §5), every
intermediate is persisted as a debug artifact with the same file names, and
stage wall-times are recorded to out/profile.json.

Audio is padded to PAD_SECONDS_BUCKET multiples so each jitted stage
compiles once per bucket size instead of once per song length.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import numpy as np

from .. import config
from ..schemas import ChordSegment, JobResult
from ..theory.events import NoteEvent

_LOG = logging.getLogger(__name__)

ANALYSIS_SR = 22050


class StageTimer:
    def __init__(self):
        self.times: dict[str, float] = {}

    def __call__(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                timer.times[name] = timer.times.get(name, 0.0) + time.perf_counter() - self.t0
                return False

        return _Ctx()


def _pad_to_bucket(y: np.ndarray, sr: int, bucket_s: float) -> np.ndarray:
    if bucket_s <= 0:
        return y
    bucket = int(bucket_s * sr)
    n = len(y)
    padded = ((n + bucket - 1) // bucket) * bucket
    if padded == n:
        return y
    return np.pad(y, (0, padded - n))


def _write_json(path: Path, obj) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f)


def run_pipeline(job_dir: Path | str, input_path: Path | str) -> JobResult:
    job_dir = Path(job_dir)
    input_path = Path(input_path)
    work = job_dir / "work"
    out = job_dir / "out"
    work.mkdir(parents=True, exist_ok=True)
    out.mkdir(parents=True, exist_ok=True)
    job_id = job_dir.name
    timer = StageTimer()
    errors: list[str] = []

    import jax.numpy as jnp

    from ..io import decode_to_mono_44k, peak_normalize, resample_poly_host, write_wav

    # ---- 1. decode ----
    with timer("decode"):
        y44, sr44 = decode_to_mono_44k(input_path, work / "audio_mono_44k.wav")
        if y44.size < sr44 // 10:
            raise ValueError(f"input too short: {y44.size} samples")
        y44 = peak_normalize(y44)
        y = resample_poly_host(y44, sr44, ANALYSIS_SR)
        sr = ANALYSIS_SR

    true_len = len(y)
    y_pad = _pad_to_bucket(y, sr, config.settings.PAD_SECONDS_BUCKET)

    # ---- 2. separation (htdemucs) — guitar stem for pitch, drums for beats
    stem = y_pad
    stem_source = "mix"
    if config.settings.ENABLE_DEMUCS:
        try:
            with timer("separation"):
                from ..models.htdemucs import separate_stems

                stems = separate_stems(y_pad, sr, model_name=config.settings.DEMUCS_MODEL)
                if stems is not None:
                    for name in config.settings.stem_priority():
                        if name in stems:
                            stem = np.asarray(stems[name])
                            stem_source = name
                            break
        except Exception as exc:  # graceful degradation (pipeline.py:1653-1661)
            errors.append(f"separation: {exc}")
            _LOG.warning("separation failed: %s", exc)

    # ---- 3. harmonic component ----
    with timer("harmonic"):
        try:
            from ..ops.hpss import harmonic as harmonic_op

            y_harm = np.asarray(harmonic_op(jnp.asarray(stem)))
            write_wav(work / "audio_harmonic.wav", y_harm[:true_len], sr)
        except Exception as exc:
            errors.append(f"harmonic: {exc}")
            y_harm = stem

    # ---- 4. beat tracking ----
    tempo_bpm, beat_times = 0.0, np.asarray([], dtype=np.float32)
    with timer("beats"):
        try:
            from ..decode import estimate_beats

            tempo_bpm, beat_times = estimate_beats(y_pad[:true_len], sr)
        except Exception as exc:
            errors.append(f"beats: {exc}")
            _LOG.warning("beat tracking failed: %s", exc)

    # ---- 5. transcription (mode-dependent) ----
    mode = config.settings.TRANSCRIPTION_MODE
    note_events: list[NoteEvent] = []
    backend_name = "none"
    with timer("transcription"):
        try:
            note_events, backend_name = _transcribe(y_harm[:true_len], sr, mode)
        except Exception as exc:
            errors.append(f"transcription: {exc}")
            _LOG.warning("transcription failed: %s", exc)

    # ---- 6. chords ----
    chords: list[ChordSegment] = []
    chroma = None
    with timer("chords"):
        try:
            from ..chords import extract_chords

            chroma, _times, chords = extract_chords(
                y_harm[:true_len],
                sr,
                vocab=config.settings.CHORD_VOCAB,
                switch_penalty=config.settings.SWITCH_PENALTY,
                min_segment_sec=config.settings.MIN_SEGMENT_SEC,
                beat_times=beat_times if beat_times.size else None,
            )
        except Exception as exc:
            errors.append(f"chords: {exc}")
            _LOG.warning("chord extraction failed: %s", exc)

    # ---- 7. key ----
    key_sig = None
    with timer("key"):
        try:
            from ..theory.key import estimate_key_from_chroma, estimate_key_from_events, spell_chord_label

            key_est = None
            if chroma is not None:
                key_est = estimate_key_from_chroma(np.asarray(chroma))
            if key_est is None and note_events:
                key_est = estimate_key_from_events(note_events)
            if key_est is not None:
                key_sig = key_est.to_schema()
                chords = [
                    ChordSegment(
                        start=c.start,
                        end=c.end,
                        label=spell_chord_label(c.label, key_est.use_flats),
                        confidence=c.confidence,
                    )
                    for c in chords
                ]
        except Exception as exc:
            errors.append(f"key: {exc}")

    # ---- 8. beat normalization + event shift ----
    from ..decode import estimate_tempo, normalize_beat_times

    raw_beats = beat_times.copy()
    norm_beats, offset = normalize_beat_times(beat_times if beat_times.size else None)
    if tempo_bpm <= 0 and norm_beats is not None:
        tempo_bpm = estimate_tempo(norm_beats)
    if tempo_bpm <= 0:
        tempo_bpm = 120.0
    if offset:
        note_events = [
            NoteEvent(e.start_time_s - offset, e.end_time_s - offset, e.pitch_midi, e.velocity, e.amplitude)
            for e in note_events
        ]
        chords = [
            ChordSegment(start=c.start - offset, end=c.end - offset, label=c.label, confidence=c.confidence)
            for c in chords
        ]

    # ---- 9. quantize to score + tab ----
    score = None
    quant = None
    with timer("quantize"):
        try:
            from ..theory.quantize import quantize_note_events_to_score

            quant = quantize_note_events_to_score(
                note_events,
                tempo_bpm=tempo_bpm,
                beat_times=norm_beats,
                time_signature="4/4",
                guitar_tuning=config.settings.GUITAR_TUNING,
            )
            score = quant.score
            if key_sig is None:
                key_sig = quant.key_signature
        except Exception as exc:
            errors.append(f"quantize: {exc}")
            _LOG.warning("quantization failed: %s", exc)

    # ---- 10. debug artifacts (same contract as pipeline.py:1929-1991) ----
    with timer("artifacts"):
        _write_json(
            out / "beat_times.json",
            {
                "tempo_bpm": float(tempo_bpm),
                "beat_times": [float(b) for b in (norm_beats if norm_beats is not None else [])],
                "raw_beat_times": [float(b) for b in raw_beats],
                "offset": float(offset),
                "stem_source": stem_source,
                "errors": errors,
            },
        )
        _write_json(
            out / "chords.json",
            [
                {"start": c.start, "end": c.end, "label": c.label, "confidence": c.confidence}
                for c in chords
            ],
        )
        try:
            from ..score import save_note_events_csv

            save_note_events_csv(note_events, out / "note_events.csv")
        except Exception as exc:
            errors.append(f"csv: {exc}")

    # ---- 11. exports ----
    transcription_error = "; ".join(errors) if errors else None
    with timer("export"):
        if score is not None:
            try:
                from ..score import export_musicxml
                from ..tab.fretboard import get_tuning

                export_musicxml(
                    out / "result.musicxml",
                    score,
                    tempo_bpm=tempo_bpm,
                    time_signature="4/4",
                    key_signature_fifths=key_sig.fifths if key_sig else None,
                    title=job_id,
                    instrument="guitar",
                    chords=[ChordSegment.model_validate(c.model_dump()) for c in chords],
                    beat_times=norm_beats,
                    pickup_quarters=quant.pickup_quarters if quant else 0.0,
                    slash_notation=(mode == "accompaniment"),
                    tab_positions=quant.tab_positions if quant else None,
                    tab_tuning=get_tuning(config.settings.GUITAR_TUNING),
                    midi_path=out / "transcription.mid",
                )
            except Exception as exc:
                errors.append(f"musicxml: {exc}")
                transcription_error = "; ".join(errors)
                _LOG.warning("musicxml export failed: %s", exc)
        try:
            from ..score.lilypond import build_lilypond_score, render_lilypond_pdf

            ly = build_lilypond_score(
                chords,
                tempo_bpm=tempo_bpm,
                beat_times=norm_beats,
                title=job_id,
                key_signature=key_sig,
            )
            (out / "score.ly").write_text(ly)
            render_lilypond_pdf(out / "score.ly", out / "score.pdf")
        except Exception as exc:
            errors.append(f"lilypond: {exc}")

    _write_json(out / "profile.json", {k: round(v, 4) for k, v in timer.times.items()})

    return JobResult(
        job_id=job_id,
        tempo_bpm=float(tempo_bpm),
        time_signature="4/4",
        key_signature=key_sig,
        chords=chords,
        transcription_backend=backend_name,
        transcription_error=transcription_error,
        score=score,
    )


def _transcribe(y_harm: np.ndarray, sr: int, mode: str) -> tuple[list[NoteEvent], str]:
    """Mode dispatch (reference: pipeline.py:1824-1909)."""
    if mode == "accompaniment":
        # chords-only slash score handled downstream; no note events
        return [], "accompaniment+chords_viterbi"

    if mode == "guitar":
        try:
            from .guitar_mode import run_guitar_mode

            return run_guitar_mode(y_harm, sr)
        except Exception as exc:
            _LOG.warning("guitar mode failed (%s); falling back to notes", exc)

    # notes mode: polyphonic AMT when available, else pYIN melody
    try:
        from ..models.basicpitch import transcribe_polyphonic

        events = transcribe_polyphonic(y_harm, sr)
        if events:
            return events, "basicpitch_jax"
    except Exception as exc:
        _LOG.info("polyphonic AMT unavailable (%s); using pYIN melody", exc)

    from ..decode.melody import transcribe_melody

    return transcribe_melody(y_harm, sr), "pyin_melody"
