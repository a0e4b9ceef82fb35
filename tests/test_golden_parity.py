"""Structural parity against the reference's golden job artifacts.

The reference repo ships complete job outputs (SURVEY.md §4:
/root/reference/data/jobs/*/out/). These tests validate that our artifact
files carry the same schema/contract, and that our pipeline's outputs on
the same input stay within musical tolerance of the reference's.
"""

import csv
import json
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path("/root/reference/data/jobs/c34b660dfb454be486983b1913bab38c")


@pytest.fixture(scope="module")
def golden_available():
    if not (GOLDEN / "out" / "result.json").exists():
        pytest.skip("reference golden artifacts unavailable")
    return GOLDEN


def test_reference_result_parses_with_our_schema(golden_available):
    from audiotabs_tpu.schemas import JobResult

    data = json.loads((golden_available / "out" / "result.json").read_text())
    result = JobResult.model_validate(data)
    assert result.tempo_bpm > 0
    assert result.chords


def test_reference_csv_parses_with_our_reader(golden_available):
    with open(golden_available / "out" / "note_events.csv") as f:
        rows = list(csv.DictReader(f))
    assert rows
    assert set(rows[0]) == {"start_time_s", "end_time_s", "pitch_midi", "velocity", "amplitude"}


@pytest.mark.slow
def test_pipeline_parity_on_golden_wav(golden_available, tmp_path, monkeypatch):
    """Full-pipeline run on the reference's input; tempo within half/double
    tolerance, chord roots overlapping the reference timeline."""
    monkeypatch.setenv("TRANSCRIPTION_MODE", "accompaniment")
    from audiotabs_tpu.config import reload_settings

    reload_settings()
    from audiotabs_tpu.runtime.pipeline import run_pipeline

    job = tmp_path / "jobs" / "golden"
    for sub in ("input", "work", "out"):
        (job / sub).mkdir(parents=True)
    result = run_pipeline(job, golden_available / "input" / "upload.wav")

    ref = json.loads((golden_available / "out" / "result.json").read_text())
    ref_tempo = ref["tempo_bpm"]
    ratios = [result.tempo_bpm / ref_tempo, ref_tempo / result.tempo_bpm]
    assert any(abs(r - k) < 0.12 * k for r in ratios for k in (1.0, 2.0)), (
        result.tempo_bpm,
        ref_tempo,
    )

    # chord-root overlap: at least one of the reference's main chords appears
    ref_roots = {c["label"].split(":")[0] for c in ref["chords"] if c["label"] != "N"}
    our_roots = {c.label.split(":")[0] for c in result.chords if c.label != "N"}
    assert our_roots & ref_roots, (our_roots, ref_roots)

    # artifact contract completeness
    out = job / "out"
    for name in ("result.musicxml", "transcription.mid", "note_events.csv", "beat_times.json", "chords.json", "score.ly"):
        assert (out / name).exists(), name
