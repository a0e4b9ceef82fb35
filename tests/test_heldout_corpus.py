"""Held-out realistic corpus gates (VERDICT r3 items 6+7).

Five committed renders (tests/data/heldout/, frozen WAVs + exact ground
truth) that no trainer ever draws: golden-style accuracy ratchets on more
than the one 15 s reference recording, across the styles the product must
handle (solo fingerpicking, a full band mix with vocals/piano/drums, a
picked melody over a chord bed, a triple-meter fingerpick, a second band
mix in a minor key). The first band mix also drives the separation A/B
gate: transcription WITH the htdemucs checkpoint must match or beat the
weight-free HPSS fallback on every metric (reference
demucs_sep.py:177-199 — separation exists to improve transcription).

Gate values are measured-at-introduction minus margin; the pipeline is
deterministic (tests/test_golden_parity.py gates byte-level determinism),
so any code change that moves a metric trips the gate visibly.
"""

import csv
import json
import os
import shutil
from pathlib import Path

import numpy as np
import pytest

HELD = Path(__file__).resolve().parent / "data" / "heldout"
PC = ["C", "C#", "D", "D#", "E", "F", "F#", "G", "G#", "A", "A#", "B"]

_HTD_WEIGHTS = (
    Path(__file__).resolve().parent.parent / "audiotabs_tpu" / "weights" / "htdemucs.npz"
)


def _run(tmp_root: Path, name: str, mode: str, env: dict | None = None):
    os.environ["TRANSCRIPTION_MODE"] = mode
    for k, v in (env or {}).items():
        os.environ[k] = v
    from audiotabs_tpu.config import reload_settings

    reload_settings()
    try:
        from audiotabs_tpu.runtime.pipeline import run_pipeline

        job = tmp_root / name / "jobs" / "j"
        shutil.rmtree(job, ignore_errors=True)
        for sub in ("input", "work", "out"):
            (job / sub).mkdir(parents=True)
        result = run_pipeline(job, HELD / f"heldout_{name.split('__')[0]}.wav")
        (job / "out" / "result.json").write_text(result.model_dump_json())
    finally:
        os.environ.pop("TRANSCRIPTION_MODE", None)
        for k in env or {}:
            os.environ.pop(k, None)
        reload_settings()
    return job


def _metrics(name: str, job: Path) -> dict:
    from audiotabs_tpu.analysis.metrics import beat_f_measure

    gt = json.loads((HELD / f"heldout_{name}.json").read_text())
    bt = json.loads((job / "out" / "beat_times.json").read_text())
    beat_f = beat_f_measure(
        np.asarray(bt["raw_beat_times"]), np.asarray(gt["beats"]), tol=0.07
    )
    off = bt["offset"]
    chords = json.loads((job / "out" / "chords.json").read_text())

    def our_label(t_audio):
        t = t_audio - off
        for c in chords:
            if c["start"] <= t < c["end"]:
                return c["label"]
        return None

    def gt_label(t):
        for c in gt["chords"]:
            if c["start"] <= t < c["end"]:
                return f'{PC[c["root_pc"]]}:{c["quality"]}'
        return None

    ts = np.arange(gt["chords"][0]["start"], gt["chords"][-1]["end"], 0.05)
    overlap = sum(1 for t in ts if our_label(t) == gt_label(t)) / len(ts)

    with open(job / "out" / "note_events.csv") as f:
        ours = [
            (float(r["start_time_s"]) + off, float(r["end_time_s"]) + off, int(r["pitch_midi"]))
            for r in csv.DictReader(f)
        ]
    hit = sum(
        1
        for g in gt["notes"]
        if any(op == g["pitch"] and oe >= g["start"] - 0.15 and ot <= g["end"] + 0.15 for ot, oe, op in ours)
    )
    recall = hit / len(gt["notes"])
    prec = sum(
        1
        for ot, oe, op in ours
        if any(g["pitch"] == op and oe >= g["start"] - 0.15 and ot <= g["end"] + 0.15 for g in gt["notes"])
    ) / max(len(ours), 1)
    ks = json.loads((job / "out" / "result.json").read_text()).get("key_signature")
    return {
        "beat_f": beat_f,
        "chord_overlap": overlap,
        "note_recall": recall,
        "note_prec": prec,
        "stem": bt["stem_source"],
        "key": f"{ks['tonic']} {ks['mode']}" if ks else None,
    }


@pytest.fixture(scope="module")
def heldout_root(tmp_path_factory):
    return tmp_path_factory.mktemp("heldout")


@pytest.mark.slow
def test_heldout_fingerpick(heldout_root):
    """Solo fingerpicking (the golden regime at a different key/tempo):
    measured at introduction beat F 1.0, chord 0.991, recall 1.0, prec 1.0."""
    job = _run(heldout_root, "fingerpick", "notes")
    m = _metrics("fingerpick", job)
    assert m["key"] == "E major", m
    assert m["beat_f"] >= 0.90, m
    assert m["chord_overlap"] >= 0.95, m
    assert m["note_recall"] >= 0.95, m
    assert m["note_prec"] >= 0.90, m


@pytest.mark.slow
def test_heldout_picked_melody(heldout_root):
    """Picked melody over a quiet chord bed: measured beat F 0.962,
    chord 0.962, recall 0.954, prec 0.923."""
    job = _run(heldout_root, "picked_melody", "notes")
    m = _metrics("picked_melody", job)
    assert m["key"] == "D major", m
    assert m["beat_f"] >= 0.90, m
    assert m["chord_overlap"] >= 0.90, m
    assert m["note_recall"] >= 0.85, m
    assert m["note_prec"] >= 0.80, m


@pytest.mark.slow
def test_heldout_waltz_fingerpick(heldout_root):
    """Triple-meter fingerpick (chords change every 3 beats — no other
    corpus clip leaves duple meter): measured at introduction beat F 1.0,
    chord 0.966, recall 0.986, prec 0.959."""
    job = _run(heldout_root, "waltz_fingerpick", "notes")
    m = _metrics("waltz_fingerpick", job)
    assert m["key"] == "C major", m
    assert m["beat_f"] >= 0.90, m
    assert m["chord_overlap"] >= 0.90, m
    assert m["note_recall"] >= 0.90, m
    assert m["note_prec"] >= 0.90, m


@pytest.mark.slow
def test_heldout_barre_band(heldout_root):
    """Second band mix (E minor, 126 BPM): separation must route the
    guitar stem and the metrics hold on a minor-key band arrangement.
    Measured at introduction beat F 1.0, chord 0.953, recall 0.92,
    prec 0.69 (the precision residual is piano-stab leakage through the
    guitar stem, an octave above the chord tones)."""
    job = _run(heldout_root, "barre_band", "notes")
    m = _metrics("barre_band", job)
    assert m["key"] == "E minor", m
    if _HTD_WEIGHTS.exists():
        assert m["stem"] == "guitar", m
    assert m["beat_f"] >= 0.90, m
    assert m["chord_overlap"] >= 0.90, m
    assert m["note_recall"] >= 0.85, m
    assert m["note_prec"] >= 0.60, m


@pytest.mark.slow
@pytest.mark.skipif(not _HTD_WEIGHTS.exists(), reason="no trained htdemucs checkpoint")
def test_heldout_band_separation_ab(heldout_root):
    """VERDICT r3 item 6: separation must never hurt transcription on a
    realistic mixture, as an A/B gate — the band mix (drums, bass, vocals,
    piano, strummed guitar) transcribed with the htdemucs checkpoint vs
    the HPSS fallback. Measured at introduction: note recall 0.821 (sep)
    vs 0.774 (HPSS), beat F 1.0 both, chord overlap 0.966 both; after the
    r4 silence→N chord gating the recall advantage collapsed to a tie
    (0.774 both — it was one boundary strum's worth of notes), so the gate
    asserts >= on every metric plus absolute floors, not a strict win."""
    job_on = _run(heldout_root, "strum_band__on", "accompaniment")
    job_off = _run(heldout_root, "strum_band__off", "accompaniment", env={"HTDEMUCS_WEIGHTS": "off"})
    m_on = _metrics("strum_band", job_on)
    m_off = _metrics("strum_band", job_off)
    assert m_on["stem"] == "guitar", m_on
    assert m_on["key"] == "A major", m_on
    assert m_off["stem"] in ("hpss_harmonic", "mix"), m_off
    # absolute floor for the harder mix
    assert m_on["beat_f"] >= 0.90, (m_on, m_off)
    assert m_on["chord_overlap"] >= 0.90, (m_on, m_off)
    assert m_on["note_recall"] >= 0.75, (m_on, m_off)
    # A/B: separation >= fallback on every metric
    for k in ("beat_f", "chord_overlap", "note_recall"):
        assert m_on[k] >= m_off[k] - 1e-9, (k, m_on, m_off)
