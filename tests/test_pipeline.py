import json

import numpy as np
import pytest

from audiotabs_tpu.io import write_wav
from audiotabs_tpu.schemas import JobResult


@pytest.fixture(scope="module")
def melody_wav(tmp_path_factory):
    """4 s of a simple C-major melody with a click layer (quarter = 0.5 s)."""
    sr = 22050
    notes = [60, 62, 64, 65, 67, 65, 64, 62]  # C D E F G F E D
    dur = 0.5
    y = np.zeros(int(sr * len(notes) * dur), dtype=np.float32)
    for i, pitch in enumerate(notes):
        f = 440.0 * 2 ** ((pitch - 69) / 12)
        t = np.arange(int(sr * dur)) / sr
        seg = 0.4 * np.sin(2 * np.pi * f * t) * np.minimum(1, 10 * (1 - t / dur))
        # percussive attack for the beat tracker
        seg[:300] += 0.3 * np.random.default_rng(i).standard_normal(300).astype(np.float32)
        y[int(i * dur * sr) : int(i * dur * sr) + len(seg)] += seg.astype(np.float32)
    p = tmp_path_factory.mktemp("audio") / "melody.wav"
    write_wav(p, y, sr)
    return p


def test_pipeline_end_to_end(melody_wav, tmp_path, monkeypatch):
    monkeypatch.setenv("TRANSCRIPTION_MODE", "notes")
    monkeypatch.setenv("PAD_SECONDS_BUCKET", "5")
    # pin the weight-free separation fallback: this test asserts the HPSS
    # stem wiring specifically (the trained-htdemucs path has its own test)
    monkeypatch.setenv("HTDEMUCS_WEIGHTS", "off")
    import audiotabs_tpu.models.htdemucs as hd

    monkeypatch.setattr(hd, "_PARAMS", None)
    from audiotabs_tpu.config import reload_settings

    reload_settings()
    from audiotabs_tpu.runtime.pipeline import run_pipeline

    job_dir = tmp_path / "jobs" / "testjob1"
    for sub in ("input", "work", "out"):
        (job_dir / sub).mkdir(parents=True)
    result = run_pipeline(job_dir, melody_wav)

    assert isinstance(result, JobResult)
    assert result.job_id == "testjob1"
    assert 40 <= result.tempo_bpm <= 250
    assert result.transcription_backend in ("pyin_melody", "basicpitch_jax", "basicpitch_jax_cnn")
    assert result.score is not None and len(result.score.measures) >= 1

    # note events: C major pitches present
    pitched = [it for m in result.score.measures for it in m.items if not it.rest]
    assert pitched, "no pitched items in score"

    # artifact contract
    out = job_dir / "out"
    assert (out / "result.musicxml").exists()
    assert (out / "transcription.mid").exists()
    assert (out / "note_events.csv").exists()
    bt = json.loads((out / "beat_times.json").read_text())
    assert "tempo_bpm" in bt and "beat_times" in bt
    # reference beat_times.json field names are carried alongside ours
    for ref_field in (
        "tempo_raw_bpm", "beat_times_s", "beat_times_raw_s", "beat_offset_s",
        "beat_source", "transcription_source", "transcription_mode",
        "demucs_enabled", "demucs_error",
    ):
        assert ref_field in bt, ref_field
    assert bt["transcription_mode"] == "notes"
    assert bt["beat_source"] == "hpss_percussive"
    # separation is never a silent no-op: with ENABLE_DEMUCS on (default)
    # and no htdemucs weights, the HPSS fallback must be active — beats are
    # tracked on the percussive component, transcription on the harmonic
    assert bt["stem_source"] == "hpss_harmonic"
    chords = json.loads((out / "chords.json").read_text())
    assert isinstance(chords, list)
    prof = json.loads((out / "profile.json").read_text())
    assert "transcription" in prof
    assert (out / "score.ly").exists()
    # score.pdf is produced even without the lilypond binary (the
    # dependency-free engraver, score/pdfwriter.py)
    assert (out / "score.pdf").read_bytes().startswith(b"%PDF")

    # tab artifact: aligned with the score and drawable offline (the
    # frontend's Tablature view reads it — frontend/score_renderer.js)
    tab = json.loads((out / "tab_positions.json").read_text())
    assert len(tab["tuning"]) == 6
    assert len(tab["measures"]) == len(result.score.measures)
    flat = [p for meas in tab["measures"] for item in meas for p in item]
    assert flat, "no tab positions at all"
    assert all(1 <= s <= 6 and 0 <= f <= 24 for s, f in flat)

    # musicxml parses and has a TAB part
    import xml.etree.ElementTree as ET

    root = ET.parse(out / "result.musicxml").getroot()
    assert root.tag == "score-partwise"
    assert len(root.findall("part")) == 2

    # the transcribed pitches should be dominated by C-major scale tones
    csv_lines = (out / "note_events.csv").read_text().strip().split("\n")[1:]
    assert csv_lines, "empty note events"
    pitches = [int(l.split(",")[2]) % 12 for l in csv_lines]
    in_scale = sum(1 for p in pitches if p in (0, 2, 4, 5, 7, 9, 11))
    assert in_scale / len(pitches) > 0.7


def test_pipeline_accompaniment_mode(melody_wav, tmp_path, monkeypatch):
    monkeypatch.setenv("TRANSCRIPTION_MODE", "accompaniment")
    monkeypatch.setenv("PAD_SECONDS_BUCKET", "5")
    from audiotabs_tpu.config import reload_settings

    reload_settings()
    from audiotabs_tpu.runtime.pipeline import run_pipeline

    job_dir = tmp_path / "jobs" / "acc1"
    for sub in ("input", "work", "out"):
        (job_dir / sub).mkdir(parents=True)
    result = run_pipeline(job_dir, melody_wav)
    assert result.transcription_backend == "accompaniment+chords_viterbi"
    assert (job_dir / "out" / "chords.json").exists()
    # strummed-shape positions feed the offline tab view in this mode too
    tab = json.loads((job_dir / "out" / "tab_positions.json").read_text())
    assert len(tab["measures"]) == len(result.score.measures)


def test_pipeline_split_fetch_parity(melody_wav, tmp_path, monkeypatch):
    """FUSED_SPLIT_FETCH=1 overlaps the tail's host work with per-key async
    transfers and defers the y_harm copy until after the tail — the outputs
    must be bit-identical to the default single-device_get path, and the
    deferred audio_harmonic.wav artifact must still be written."""
    monkeypatch.setenv("TRANSCRIPTION_MODE", "notes")
    monkeypatch.setenv("PAD_SECONDS_BUCKET", "5")
    from audiotabs_tpu.config import reload_settings
    from audiotabs_tpu.runtime.pipeline import run_pipeline

    results = {}
    for knob in ("0", "1"):
        monkeypatch.setenv("FUSED_SPLIT_FETCH", knob)
        reload_settings()
        job_dir = tmp_path / "jobs" / f"sf{knob}"
        for sub in ("input", "work", "out"):
            (job_dir / sub).mkdir(parents=True)
        run_pipeline(job_dir, melody_wav)
        assert (job_dir / "work" / "audio_harmonic.wav").exists(), knob
        results[knob] = {
            name: (job_dir / "out" / name).read_bytes()
            for name in ("note_events.csv", "chords.json", "beat_times.json")
        }
        results[knob]["audio_harmonic"] = (job_dir / "work" / "audio_harmonic.wav").read_bytes()
    assert results["0"] == results["1"]


def test_pipeline_silence_degrades_gracefully(tmp_path):
    """Pure silence must produce a valid, empty-ish result — no-chord
    segments, no error, a well-formed (if empty) score — exercising every
    stage's degradation path at once (the reference degrades per-stage via
    try/except, SURVEY §5; silence is the all-stages-at-once case)."""
    from audiotabs_tpu.runtime.pipeline import run_pipeline

    p = tmp_path / "silence.wav"
    write_wav(p, np.zeros(22050 * 10, np.float32), 22050)
    job_dir = tmp_path / "jobs" / "silence"
    for sub in ("input", "work", "out"):
        (job_dir / sub).mkdir(parents=True)
    result = run_pipeline(job_dir, p)
    assert result.transcription_error is None
    assert result.tempo_bpm > 0
    assert {c.label for c in result.chords} <= {"N"}
    assert result.score is not None
    assert (job_dir / "out" / "chords.json").exists()


def test_pipeline_rejects_tiny_input(tmp_path):
    from audiotabs_tpu.runtime.pipeline import run_pipeline

    p = tmp_path / "tiny.wav"
    write_wav(p, np.zeros(100, np.float32), 22050)
    job_dir = tmp_path / "jobs" / "tiny"
    for sub in ("input", "work", "out"):
        (job_dir / sub).mkdir(parents=True)
    with pytest.raises(ValueError):
        run_pipeline(job_dir, p)


from pathlib import Path

_HTD_WEIGHTS = Path(__file__).resolve().parent.parent / "audiotabs_tpu/weights/htdemucs.npz"


@pytest.mark.slow
@pytest.mark.skipif(not _HTD_WEIGHTS.exists(), reason="no trained htdemucs checkpoint")
def test_pipeline_separates_with_trained_htdemucs(melody_wav, tmp_path, monkeypatch):
    """With the checked-in reduced-HTDemucs checkpoint, separation must run
    for real: the transcription stem comes from the model (stem priority,
    reference demucs_sep.py:107-141) and beats are tracked on the separated
    drums — no HPSS fallback involved."""
    monkeypatch.setenv("PAD_SECONDS_BUCKET", "5")
    from audiotabs_tpu.config import reload_settings

    reload_settings()
    from audiotabs_tpu.runtime.pipeline import run_pipeline

    job_dir = tmp_path / "jobs" / "sepjob"
    for sub in ("input", "work", "out"):
        (job_dir / sub).mkdir(parents=True)
    result = run_pipeline(job_dir, melody_wav)
    assert isinstance(result, JobResult)
    bt = json.loads((job_dir / "out" / "beat_times.json").read_text())
    assert bt["stem_source"] not in ("mix", "hpss_harmonic")
