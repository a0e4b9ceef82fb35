"""Pipeline orchestrator: decode → separate → beats → transcribe → chords →
key → mode processing → quantize → export.

The TPU-native re-expression of the reference's run_pipeline
(reference: backend/app/services/pipeline.py:1611-2047), with the same
stage order, graceful per-stage degradation (SURVEY.md §5), the same debug
artifact contract, plus per-stage wall-time profiling (out/profile.json).

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
    padded = ((len(y) + bucket - 1) // bucket) * bucket
    if padded == len(y):
        return y
    # wrap-pad: the tail repeats the song so beat/AMT statistics in the
    # padded region stay representative (outputs are cropped to true length)
    return np.pad(y, (0, padded - len(y)), mode="wrap")


def _write_json(path: Path, obj) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f)


class _SplitFetch:
    """Lazy per-key host fetch of a fused-output tree (FUSED_SPLIT_FETCH).

    Async device→host copies are started for every leaf at construction;
    each key then materializes (and caches) on first access, so the tail's
    host work on early outputs overlaps the in-flight transfers of the
    rest. Quacks like the dict the tail otherwise gets from device_get."""

    def __init__(self, tree: dict):
        self._tree = tree
        self._host: dict = {}
        for v in tree.values():
            copy_async = getattr(v, "copy_to_host_async", None)
            if copy_async is not None:
                try:
                    copy_async()
                except Exception:  # relay backends may not support it
                    pass

    def __contains__(self, k) -> bool:
        return k in self._tree

    def __getitem__(self, k):
        if k not in self._host:
            self._host[k] = np.asarray(self._tree[k])
        return self._host[k]

    def get(self, k, default=None):
        return self[k] if k in self._tree else default

    def keys(self):
        return self._tree.keys()


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
    s = config.settings

    import jax.numpy as jnp

    from ..io import peak_normalize, write_wav
    from ..io.wav import decode_for_analysis

    # ---- 1. decode (pipeline.py:1621-1622) ----
    # one resample from the native rate straight to the analysis rate; the
    # mono-44.1k work artifact writes on a thread, overlapped with device work
    with timer("decode"):
        y, sr, artifact_writer, (y_native, sr_native) = decode_for_analysis(
            input_path, work / "audio_mono_44k.wav", ANALYSIS_SR
        )
        if y.size < sr // 10:
            raise ValueError(f"input too short: {y.size} samples")
        y = peak_normalize(y)
        # full-band copy for the strum detector: pick transients above the
        # 11 kHz analysis band decide which attacks its median-mel envelope
        # sees (reference runs strum detection at the decode rate)
        y_native = peak_normalize(y_native)

    true_len = len(y)
    y_pad = _pad_to_bucket(y, sr, s.PAD_SECONDS_BUCKET)

    # ---- 2. separation (pipeline.py:1632-1659) ----
    stem = y_pad
    beat_source = y_pad
    stem_source = "mix"
    hpss_fallback = False
    y_beat_dev = None
    y_mix_dev = None
    if s.ENABLE_DEMUCS:
        try:
            with timer("separation"):
                from ..models.htdemucs import separate_stems_device

                # ONE jitted dispatch; stems stay on device — the chosen
                # stem feeds fused_analysis and the drums stem feeds its
                # beat tracker without ever visiting the host. The padded
                # mix is uploaded once and shared with fused_analysis (it
                # is the beat-tracking fallback for drum-free songs).
                y_mix_dev = jnp.asarray(y_pad)
                stems = separate_stems_device(
                    y_mix_dev, sr, model_name=s.DEMUCS_MODEL, shifts=s.DEMUCS_SHIFTS
                )
                if stems is not None:
                    for name in s.stem_priority():
                        if name in stems:
                            stem = stems[name]
                            stem_source = name
                            break
                    if "drums" in stems:
                        y_beat_dev = stems["drums"]
                        beat_source = y_beat_dev
                else:
                    # weight-free fallback: the fused program's HPSS split
                    # stands in for Demucs — harmonic → transcription stem,
                    # percussive → beat source (the reference's drums-for-
                    # beats wiring, pipeline.py:1649-1652) at zero extra
                    # device dispatches (separate=True below).
                    hpss_fallback = True
                    stem_source = "hpss_harmonic"
        except Exception as exc:
            errors.append(f"separation: {exc}")
            _LOG.warning("separation failed: %s", exc)

    # ---- 3. fused device analysis: ONE jitted program + ONE transfer ----
    # (harmonic residual, beat activation, AMT posteriors, chord chroma/
    #  emissions, calibration characteristics — runtime/fused.py)
    feats = None
    with timer("analysis"):
        try:
            import contextlib

            import jax

            from .fused import fused_analysis

            # real device profiling (SURVEY.md §5: the reference has none):
            # set PROFILE_DIR to capture an XLA trace of the fused program
            trace_ctx = (
                jax.profiler.trace(s.PROFILE_DIR) if s.PROFILE_DIR else contextlib.nullcontext()
            )
            backend = s.CHORD_DETECTION_BACKEND
            with trace_ctx:
                out_tree = fused_analysis(
                    jnp.asarray(stem),
                    sr,
                    switch_penalty=s.SWITCH_PENALTY,
                    separate=hpss_fallback,
                    chord_backend=backend if backend in ("deep", "template") else "both",
                    true_len=true_len,
                    y_beat=y_beat_dev,
                    y_mix=y_mix_dev if y_beat_dev is not None else None,
                )
                # default: ONE blocking device_get (the design invariant —
                # each blocking relay round-trip costs ~60-80 ms). The
                # split-fetch knob instead starts async copies for every
                # output and fetches per key on first use, overlapping the
                # tail's host work on early outputs (beats, chords) with
                # the transfer of the big ones (AMT posteriors, y_harm).
                feats = _SplitFetch(out_tree) if s.FUSED_SPLIT_FETCH else jax.device_get(out_tree)
        except Exception as exc:
            errors.append(f"analysis: {exc}")
            _LOG.warning("fused analysis failed: %s", exc)

    if feats is not None:
        if isinstance(feats, _SplitFetch):
            # Defer the biggest transfer: y_harm is only consumed by the
            # artifact write and by fallback/mode branches that run AFTER
            # the tail's host work on the small early outputs (beats,
            # calibration, chord decode) — materializing it eagerly here
            # would serialize the largest copy in front of all of that.
            _harm_box: list = []

            def _y_harm_lazy() -> np.ndarray:
                if not _harm_box:
                    _harm_box.append(np.asarray(feats["y_harm"], dtype=np.float32)[:true_len])
                return _harm_box[0]

            y_harm = _y_harm_lazy
        else:
            y_harm = np.asarray(feats["y_harm"], dtype=np.float32)[:true_len]
            try:
                write_wav(work / "audio_harmonic.wav", y_harm, sr)
            except Exception:
                pass
    else:
        with timer("harmonic"):
            try:
                from ..ops.hpss import harmonic as harmonic_op

                y_harm = np.asarray(harmonic_op(jnp.asarray(stem)))[:true_len]
                write_wav(work / "audio_harmonic.wav", y_harm, sr)
            except Exception as exc:
                errors.append(f"harmonic: {exc}")
                y_harm = stem[:true_len]

    if artifact_writer is not None:
        artifact_writer.join(timeout=30)  # artifact durable before the tail
        if artifact_writer.is_alive():
            errors.append("decode: audio_mono_44k.wav writer did not finish")
        elif getattr(artifact_writer, "error", None) is not None:
            errors.append(f"decode: audio_mono_44k.wav write failed: {artifact_writer.error}")

    result = _pipeline_tail(
        feats=feats,
        y_harm=y_harm,
        y=y,
        true_len=true_len,
        sr=sr,
        work=work,
        out=out,
        job_id=job_id,
        timer=timer,
        errors=errors,
        stem_source=stem_source,
        beat_act_from_feats=(
            feats is not None and (beat_source is stem or y_beat_dev is not None)
        ),
        beat_source=beat_source,
        y_native=(y_native, sr_native),
    )
    if callable(y_harm):
        # split-fetch mode: the transfer has been in flight since the fused
        # dispatch; by now it has landed, so the artifact write is cheap
        try:
            write_wav(work / "audio_harmonic.wav", y_harm(), sr)
        except Exception:
            pass
    return result


def run_pipeline_from_features(
    feats: dict,
    true_len: int,
    sr: int,
    job_dir: Path | str,
    job_id: str | None = None,
    stem_source: str | None = None,
) -> JobResult:
    """Post-analysis pipeline for a song whose fused features were computed
    elsewhere (the batch runner's per-song tail, runtime/batch_runner.py)."""
    job_dir = Path(job_dir)
    work = job_dir / "work"
    out = job_dir / "out"
    work.mkdir(parents=True, exist_ok=True)
    out.mkdir(parents=True, exist_ok=True)
    timer = StageTimer()
    errors: list[str] = []
    y_harm = np.asarray(feats["y_harm"], dtype=np.float32)[:true_len]
    try:
        from ..io import write_wav

        write_wav(work / "audio_harmonic.wav", y_harm, sr)
    except Exception:
        pass
    result = _pipeline_tail(
        feats=feats,
        y_harm=y_harm,
        y=None,
        true_len=true_len,
        sr=sr,
        work=work,
        out=out,
        job_id=job_id or job_dir.name,
        timer=timer,
        errors=errors,
        stem_source=stem_source
        or ("hpss_harmonic" if config.settings.ENABLE_DEMUCS else "mix"),
        beat_act_from_feats=True,
        beat_source=None,
    )
    from .storage import LocalStorage

    LocalStorage(job_dir.parent.parent).write_json(
        out / "result.json", json.loads(result.model_dump_json())
    )
    return result


def _pipeline_tail(
    *,
    feats: dict | None,
    y_harm,  # np.ndarray, or a 0-arg callable for deferred fetch (split-fetch)
    y: np.ndarray | None,
    true_len: int,
    sr: int,
    work: Path,
    out: Path,
    job_id: str,
    timer: StageTimer,
    errors: list[str],
    stem_source: str,
    beat_act_from_feats: bool,
    beat_source: np.ndarray | None,
    y_native: tuple[np.ndarray, int] | None = None,
) -> JobResult:
    s = config.settings

    import jax.numpy as jnp

    harm = y_harm if callable(y_harm) else (lambda _a=y_harm: _a)

    # ---- 4. beat tracking + meter (pipeline.py:1682-1686; beats.py:46-58) ----
    beat_times = np.asarray([], dtype=np.float32)
    time_sig = "4/4"
    downbeats = np.asarray([], dtype=np.float32)
    with timer("beats"):
        try:
            from ..decode.dbn_beats import dbn_beat_track

            t100 = int(true_len / sr * 100)
            if beat_act_from_feats and feats is not None and "dbn_phases" in feats:
                from ..decode.dbn_beats import beats_from_decoded

                act = np.asarray(feats["beat_activation"], dtype=np.float32)[:t100]
                beat_times = beats_from_decoded(
                    np.asarray(feats["dbn_phases"])[:t100],
                    np.asarray(feats["dbn_intervals"])[:t100],
                    act,
                    fps=100,
                )
            else:
                if beat_act_from_feats and feats is not None:
                    act = np.asarray(feats["beat_activation"], dtype=np.float32)[:t100]
                else:
                    from ..models.beat_rnn import beat_activation

                    act = np.asarray(beat_activation(jnp.asarray(beat_source), sr, 100))[:t100]
                beat_times = dbn_beat_track(act, fps=100)
            from ..decode.downbeats import infer_meter_and_downbeats

            time_sig, downbeats = infer_meter_and_downbeats(beat_times, act, fps=100)
        except Exception as exc:
            errors.append(f"beats: {exc}")
            _LOG.warning("beat tracking failed: %s", exc)

    # ---- 5. threshold calibration (pipeline.py:1692-1725) ----
    onset_thr, frame_thr = s.BASIC_PITCH_ONSET_THRESHOLD, s.BASIC_PITCH_FRAME_THRESHOLD
    if s.ENABLE_AUTO_THRESHOLD_CALIBRATION:
        try:
            with timer("calibration"):
                from ..analysis import calibrate_thresholds
                from ..analysis.audio_quality import _to_db

                if feats is not None:
                    chars = {
                        "rms_db": _to_db(float(feats["char_rms_median"])),
                        "spectral_centroid": float(feats["char_centroid"]),
                        "spectral_rolloff": float(feats["char_rolloff"]),
                        "harmonic_ratio": float(feats["char_harm_ratio"]),
                        "onset_density": float(feats["char_onset_density"]),
                        "noise_floor_db": _to_db(float(feats["char_noise_rms"])),
                    }
                else:
                    from ..analysis import analyze_audio_characteristics

                    chars = analyze_audio_characteristics(
                        work / "audio_mono_44k.wav", cache_dir=work,
                        audio=y if y is not None else harm(), audio_sr=sr,
                    )
                onset_thr, frame_thr = calibrate_thresholds(chars)
                _write_json(
                    out / "threshold_calibration.json",
                    {"characteristics": chars, "onset_threshold": onset_thr, "frame_threshold": frame_thr},
                )
        except Exception as exc:
            errors.append(f"calibration: {exc}")

    # ---- 6. base transcription on harmonic stem (pipeline.py:1730-1739) ----
    base_events: list[NoteEvent] = []
    base_backend = "none"
    with timer("transcription"):
        try:
            from ..models.basicpitch import HOP as BP_HOP
            from ..models.basicpitch import load_params as load_bp
            from ..models.basicpitch import notes_from_posteriors

            bp_params = load_bp()
            if feats is not None:
                fps_amt = sr / BP_HOP
                t_amt = int(true_len / BP_HOP) + 1
                # the salience posteriors run hotter than a trained CNN's
                # calibrated sigmoids; cap the thresholds only on that path
                if bp_params is None:
                    onset_thr_eff = min(onset_thr, 0.45)
                    frame_thr_eff = min(frame_thr, 0.35)
                else:
                    onset_thr_eff, frame_thr_eff = onset_thr, frame_thr
                base_events = notes_from_posteriors(
                    np.asarray(feats["amt_onset"], dtype=np.float32)[:t_amt],
                    np.asarray(feats["amt_frame"], dtype=np.float32)[:t_amt],
                    fps=fps_amt,
                    onset_threshold=onset_thr_eff,
                    frame_threshold=frame_thr_eff,
                    min_note_ms=s.BASIC_PITCH_MIN_NOTE_MS,
                )
                base_backend = "basicpitch_jax_cnn" if bp_params is not None else "basicpitch_jax"
            else:
                from ..models.basicpitch import transcribe_polyphonic

                base_events = transcribe_polyphonic(
                    harm(), sr, onset_threshold=onset_thr, frame_threshold=frame_thr,
                    min_note_ms=s.BASIC_PITCH_MIN_NOTE_MS, params=bp_params,
                )
                base_backend = "basicpitch_jax"
        except Exception as exc:
            errors.append(f"transcription: {exc}")
            _LOG.warning("transcription failed: %s", exc)

    # ---- 7. beat grid selection + tempo (pipeline.py:1750-1756) ----
    from ..decode import normalize_beat_times
    from ..theory.chord_simplify import pick_best_beat_times, tempo_from_beat_times

    raw_beats = beat_times.copy()
    tempo_raw_bpm = tempo_from_beat_times(raw_beats)
    with timer("beat_select"):
        try:
            beat_times = pick_best_beat_times(base_events, beat_times, time_signature=time_sig)
        except Exception as exc:
            errors.append(f"beat_select: {exc}")
    tempo_bpm = tempo_from_beat_times(beat_times)
    norm_beats, offset = normalize_beat_times(beat_times if beat_times is not None and len(beat_times) else None)
    if tempo_bpm <= 0:
        tempo_bpm = 120.0
    # NOTE: base_events/chords stay in RAW time through mode processing
    # (strum onsets and content segments are raw-time); the -offset shift is
    # applied to the mode OUTPUTS below, matching the reference's ordering
    # (pipeline.py:1824-1895 processes raw, then shifts).

    # ---- 8. chords (pipeline.py:1767-1774) ----
    chords: list[ChordSegment] = []
    chroma, chroma_times = None, None
    with timer("chords"):
        try:
            backend = s.CHORD_DETECTION_BACKEND
            if feats is not None and backend == "template" and s.CHORD_VOCAB == "majmin7":
                # (fused emissions/path are built with the majmin7 library)
                from ..chords.extract import CHROMA_FPS
                from ..chords.segments import beat_sync_majority, frames_to_segments
                from ..chords.templates import build_chord_library
                from ..decode.viterbi import viterbi_constant_switch

                t_ch = int(true_len / sr * CHROMA_FPS) + 1
                emissions = np.asarray(feats["chord_emissions"])[:, :t_ch]
                chroma = np.asarray(feats["chroma"])[:, :t_ch]
                labels, _T = build_chord_library(s.CHORD_VOCAB)
                if "chord_path" in feats:
                    path = np.asarray(feats["chord_path"])[:t_ch]
                else:
                    path, _conf = viterbi_constant_switch(jnp.asarray(emissions), s.SWITCH_PENALTY)
                    path = np.asarray(path)
                path_np, conf_np = beat_sync_majority(
                    path, emissions, raw_beats if raw_beats.size else None, CHROMA_FPS
                )
                chroma_times = np.arange(path_np.shape[0], dtype=np.float32) / CHROMA_FPS
                chords = frames_to_segments(
                    path_np, conf_np, chroma_times, labels, min_len=s.MIN_SEGMENT_SEC
                )
            elif backend == "deep":
                from ..chords.extract import CHROMA_FPS, extract_chords_deep

                pre = None
                pre_path = None
                if feats is not None:
                    t_ch = int(true_len / sr * CHROMA_FPS) + 1
                    # dc_chroma is present when the trained DeepChroma DNN ran
                    # inside the fused program — it is what the CRF decoded
                    pre = np.asarray(feats.get("dc_chroma", feats["chroma"]))[:, :t_ch]
                    if "crf_path" in feats:
                        pre_path = (
                            np.asarray(feats["crf_path"])[:t_ch],
                            np.asarray(feats["crf_conf"])[:t_ch],
                        )
                chroma, chroma_times, chords = extract_chords_deep(
                    harm(),
                    sr,
                    min_segment_sec=s.MIN_SEGMENT_SEC,
                    beat_times=raw_beats if raw_beats.size else None,
                    precomputed_chroma=pre,
                    precomputed_path=pre_path,
                )
            else:
                from ..chords import extract_chords

                chroma, chroma_times, chords = extract_chords(
                    harm(),
                    sr,
                    vocab=s.CHORD_VOCAB,
                    switch_penalty=s.SWITCH_PENALTY,
                    min_segment_sec=s.MIN_SEGMENT_SEC,
                    beat_times=raw_beats if raw_beats.size else None,
                    backend=backend,
                )
        except Exception as exc:
            errors.append(f"chords: {exc}")
            _LOG.warning("chord extraction failed: %s", exc)

    # ---- 9. key + respelling + 7th simplification (pipeline.py:1776-1816) ----
    key_sig = None
    use_flats = False
    with timer("key"):
        try:
            from ..theory.chord_simplify import simplify_chord_segments
            from ..theory.key import estimate_key_from_chroma, estimate_key_from_events, spell_chord_label

            key_est = None
            if feats is not None and "key_probs" in feats:
                # trained key CNN ran inside the fused program; its 24-way
                # posterior is reranked by decoded-chord diatonic
                # compatibility (theory/key.py rescore_key_with_chords —
                # the chords are independently gated at >=0.9 overlap, and
                # relative keys tie on compatibility so the CNN still
                # resolves tonic-vs-relative)
                from ..models.key_cnn import key_prediction_to_label
                from ..theory.key import _make_estimate, rescore_key_with_chords
                from ..theory.vocabulary import NOTE_TO_PC

                probs = np.asarray(feats["key_probs"], dtype=np.float32)
                probs = rescore_key_with_chords(probs, chords)
                tonic, mode = key_prediction_to_label(probs).split()
                key_est = _make_estimate(NOTE_TO_PC[tonic], mode, float(probs.max()))
            if key_est is None and chroma is not None:
                key_est = estimate_key_from_chroma(np.asarray(chroma))
            if key_est is None and base_events:
                key_est = estimate_key_from_events(base_events)
            if key_est is not None:
                key_sig = key_est.to_schema()
                use_flats = key_est.use_flats
            chords = simplify_chord_segments(
                chords,
                chroma=chroma,
                times=np.asarray(chroma_times) if chroma_times is not None else None,
                min_confidence=0.02,
                min_duration=1.0,
                seventh_ratio=0.5,
            )
            if key_est is not None:
                chords = [
                    ChordSegment(
                        start=c.start, end=c.end,
                        label=spell_chord_label(c.label, use_flats), confidence=c.confidence,
                    )
                    for c in chords
                ]
        except Exception as exc:
            errors.append(f"key: {exc}")

    # ---- 10. mode switch (pipeline.py:1824-1909) ----
    from .modes import ModeResult, run_accompaniment_mode, run_guitar_mode

    mode = s.TRANSCRIPTION_MODE
    mode_result = ModeResult(note_events=base_events, backend=base_backend)
    with timer("mode"):
        try:
            if mode == "guitar":
                pre_content = None
                if (
                    feats is not None
                    and "content_metrics" in feats
                    and abs(s.CONTENT_ANALYSIS_WINDOW_SEC - 3.0) < 1e-6
                    and abs(s.CONTENT_ANALYSIS_HOP_SEC - 1.5) < 1e-6
                ):
                    starts = np.asarray(feats["content_starts"])
                    metrics = np.asarray(feats["content_metrics"])
                    keep = starts + sr // 2 <= true_len  # windows inside the true song
                    pre_content = (starts[keep], metrics[keep])
                strum_env = None
                if y_native is None and feats is not None and "strum_envelope" in feats:
                    strum_env = np.asarray(feats["strum_envelope"], dtype=np.float32)
                mode_result = run_guitar_mode(
                    harm(), sr, chords, beat_times, tempo_bpm,
                    base_note_events=base_events, use_flats=use_flats,
                    window_sec=s.CONTENT_ANALYSIS_WINDOW_SEC, hop_sec=s.CONTENT_ANALYSIS_HOP_SEC,
                    precomputed_content=pre_content,
                    strum_envelope=strum_env,
                    # chordal segments detect strums on the native-rate
                    # audio (same full-band reasoning as accompaniment)
                    y_strum=y_native,
                )
            elif mode == "accompaniment":
                from ..theory.chord_simplify import simplify_chords_for_accompaniment

                acc_chords = simplify_chords_for_accompaniment(chords)
                if y_native is not None:
                    # full-band strum detection at the native rate (the
                    # reference detects on the decode-rate stem,
                    # pipeline.py:1884-1893); the detector computes its own
                    # host-side envelope
                    y_strum, sr_strum, strum_env = y_native[0], y_native[1], None
                else:
                    # batch path: no native-rate copy is kept; reuse the
                    # fused program's 22.05 kHz envelope
                    y_strum, sr_strum = harm(), sr
                    strum_env = None
                    if feats is not None and "strum_envelope" in feats:
                        strum_env = np.asarray(feats["strum_envelope"], dtype=np.float32)[
                            : true_len // 512 + 1
                        ]
                mode_result = run_accompaniment_mode(
                    y_strum, sr_strum, acc_chords, beat_times, tempo_bpm, use_flats=use_flats,
                    strum_envelope=strum_env, time_signature=time_sig,
                )
            else:  # notes
                from ..theory.postprocess import postprocess_note_events

                mode_result = ModeResult(
                    note_events=postprocess_note_events(base_events, chords, key_sig),
                    backend=base_backend,
                )
        except Exception as exc:
            errors.append(f"mode({mode}): {exc}")
            _LOG.warning("mode %s failed: %s; using raw events", mode, exc)

    note_events = mode_result.note_events
    if offset:
        note_events = [
            NoteEvent(e.start_time_s - offset, e.end_time_s - offset, e.pitch_midi, e.velocity, e.amplitude)
            for e in note_events
        ]
        chords = [
            ChordSegment(start=c.start - offset, end=c.end - offset, label=c.label, confidence=c.confidence)
            for c in chords
        ]
        mode_result.strum_onsets = [t - offset for t in mode_result.strum_onsets]

    # ---- 11. quantize (pipeline.py:1916-1927) ----
    score = mode_result.score_override
    pickup_quarters = mode_result.pickup_quarters
    tab_positions = mode_result.tab_positions
    with timer("quantize"):
        if score is None:
            try:
                from ..theory.quantize import quantize_note_events_to_score

                quant = quantize_note_events_to_score(
                    note_events,
                    tempo_bpm=tempo_bpm,
                    beat_times=norm_beats,
                    time_signature=time_sig,
                    guitar_tuning=s.GUITAR_TUNING,
                )
                score = quant.score
                pickup_quarters = quant.pickup_quarters
                tab_positions = quant.tab_positions
                if key_sig is None:
                    key_sig = quant.key_signature
            except Exception as exc:
                errors.append(f"quantize: {exc}")
                _LOG.warning("quantization failed: %s", exc)

    # ---- 12. debug artifacts (pipeline.py:1929-1991) ----
    # what drove the beat tracker (reference beat_source semantics): real
    # separation wires the drums stem (behind the on-device RMS gate with
    # mix-percussive fallback), the weight-free fallback uses the HPSS
    # percussive component, otherwise the mix itself
    if stem_source == "hpss_harmonic":
        beat_source_name = "hpss_percussive"
    elif stem_source == "mix":
        beat_source_name = "mix"
    else:
        beat_source_name = "drums"
    with timer("artifacts"):
        _write_json(
            out / "beat_times.json",
            {
                "tempo_bpm": float(tempo_bpm),
                "beat_times": [float(b) for b in (norm_beats if norm_beats is not None else [])],
                "raw_beat_times": [float(b) for b in raw_beats],
                "downbeat_times": [float(b) for b in downbeats],
                "time_signature": time_sig,
                "offset": float(offset),
                "stem_source": stem_source,
                "errors": errors,
                # reference field names (reference beat_times.json schema:
                # tempo_raw_bpm, beat_times_s, beat_times_raw_s,
                # beat_offset_s, beat_source, transcription_source,
                # transcription_mode, demucs_enabled, demucs_error) so
                # tooling written against the reference artifact reads ours
                "tempo_raw_bpm": float(tempo_raw_bpm),
                "beat_times_s": [float(b) for b in (norm_beats if norm_beats is not None else [])],
                "beat_times_raw_s": [float(b) for b in (beat_times if beat_times is not None else [])],
                "beat_offset_s": float(offset),
                "beat_source": beat_source_name,
                "transcription_source": stem_source,
                "transcription_mode": mode,
                "demucs_enabled": bool(s.ENABLE_DEMUCS),
                "demucs_error": next((e for e in errors if e.startswith("separation")), None),
            },
        )
        _write_json(
            out / "chords.json",
            [{"start": c.start, "end": c.end, "label": c.label, "confidence": c.confidence} for c in chords],
        )
        if mode_result.content_segments:
            _write_json(
                out / "content_segments.json",
                [
                    {
                        "start": cs.start_time_s,
                        "end": cs.end_time_s,
                        "type": cs.content_type,
                        "confidence": cs.confidence,
                        "metrics": cs.metrics,
                    }
                    for cs in mode_result.content_segments
                ],
            )
        if mode_result.strum_onsets:
            _write_json(out / "strum_onsets.json", mode_result.strum_onsets)
        if mode_result.chosen_shapes:
            _write_json(out / "chosen_shapes.json", mode_result.chosen_shapes)
        if tab_positions is not None and score is not None:
            # offline tablature artifact: per measure, per score item, the
            # chosen [string, fret] pairs (string 1 = highest). The same
            # data feeds the MusicXML TAB part (reference
            # musicxml/export.py:150-291); persisting it lets the bundled
            # frontend draw the 6-line tab with zero network access.
            from ..tab.fretboard import get_tuning as _get_tuning

            _write_json(
                out / "tab_positions.json",
                {
                    "tuning": [int(p) for p in _get_tuning(s.GUITAR_TUNING)],
                    "measures": [
                        [[[int(st), int(fr)] for st, fr in item] for item in meas]
                        for meas in tab_positions
                    ],
                },
            )
        try:
            from ..score import save_note_events_csv

            save_note_events_csv(note_events, out / "note_events.csv")
        except Exception as exc:
            errors.append(f"csv: {exc}")

    # ---- 13. exports (pipeline.py:1996-2030) ----
    with timer("export"):
        if score is not None:
            try:
                from ..score import export_musicxml
                from ..tab.fretboard import get_tuning

                export_musicxml(
                    out / "result.musicxml",
                    score,
                    tempo_bpm=tempo_bpm,
                    time_signature=time_sig,
                    key_signature_fifths=key_sig.fifths if key_sig else None,
                    title=job_id,
                    instrument="guitar",
                    chords=chords,
                    beat_times=norm_beats,
                    pickup_quarters=pickup_quarters,
                    slash_notation=(mode == "accompaniment"),
                    tab_positions=tab_positions,
                    tab_tuning=get_tuning(s.GUITAR_TUNING),
                    midi_path=out / "transcription.mid",
                )
            except Exception as exc:
                errors.append(f"musicxml: {exc}")
                _LOG.warning("musicxml export failed: %s", exc)
        try:
            from ..score.lilypond import build_lilypond_score, render_lilypond_pdf

            ly = build_lilypond_score(
                chords, tempo_bpm=tempo_bpm, beat_times=norm_beats, title=job_id, key_signature=key_sig
            )
            (out / "score.ly").write_text(ly)
            if not render_lilypond_pdf(out / "score.ly", out / "score.pdf"):
                # no lilypond binary: the dependency-free engraver keeps the
                # artifact contract's score.pdf (reference golden jobs ship
                # one; engraving/lilypond.py:318-336)
                from ..score.pdfwriter import render_pdf_lead_sheet

                render_pdf_lead_sheet(
                    out / "score.pdf", chords, tempo_bpm=tempo_bpm,
                    beat_times=norm_beats, title=job_id, key_signature=key_sig,
                )
        except Exception as exc:
            errors.append(f"lilypond: {exc}")

    _write_json(out / "profile.json", {k: round(v, 4) for k, v in timer.times.items()})

    return JobResult(
        job_id=job_id,
        tempo_bpm=float(tempo_bpm),
        time_signature=time_sig,
        key_signature=key_sig,
        chords=chords,
        transcription_backend=mode_result.backend,
        transcription_error="; ".join(errors) if errors else None,
        score=score,
    )
