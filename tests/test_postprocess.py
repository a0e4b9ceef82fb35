import numpy as np

from audiotabs_tpu.schemas import ChordSegment
from audiotabs_tpu.theory.events import NoteEvent
from audiotabs_tpu.theory.postprocess import (
    apply_music_theory_rules,
    filter_note_events,
    merge_overlapping_same_pitch,
    merge_temporal_clusters,
    remove_harmonic_duplicates,
)


def test_octave_duplicate_removed():
    # C4 loud + C5 quiet at the same onset → C5 is a harmonic duplicate
    events = [
        NoteEvent(0.0, 0.5, 60, 100, 0.9),
        NoteEvent(0.01, 0.5, 72, 40, 0.2),
    ]
    out = remove_harmonic_duplicates(events)
    assert len(out) == 1
    assert out[0].pitch_midi == 60


def test_octave_kept_when_loud():
    events = [
        NoteEvent(0.0, 0.5, 60, 100, 0.9),
        NoteEvent(0.01, 0.5, 72, 90, 0.85),  # loud octave: real note
    ]
    out = remove_harmonic_duplicates(events)
    assert len(out) == 2


def test_fifth_duplicate_removed():
    events = [
        NoteEvent(0.0, 0.5, 60, 100, 0.9),
        NoteEvent(0.02, 0.5, 67, 30, 0.2),  # quiet fifth
    ]
    out = remove_harmonic_duplicates(events)
    assert [e.pitch_midi for e in out] == [60]


def test_temporal_cluster_merge_picks_max_amp():
    events = [
        NoteEvent(0.0, 0.1, 64, 60, 0.4),
        NoteEvent(0.12, 0.3, 64, 90, 0.8),  # within gap, louder
    ]
    out = merge_temporal_clusters(events, window_ms=200.0, gap_ms=50.0)
    assert len(out) == 1
    assert out[0].velocity == 90
    assert abs(out[0].start_time_s - 0.0) < 1e-9
    assert abs(out[0].end_time_s - 0.3) < 1e-9


def test_dissonance_resolution_keeps_chord_tone():
    chords = [ChordSegment(start=0.0, end=2.0, label="C:maj", confidence=0.9)]
    events = [
        NoteEvent(0.0, 0.5, 64, 80, 0.5),  # E: chord tone
        NoteEvent(0.01, 0.5, 63, 80, 0.5),  # Eb: semitone clash, non chord tone
    ]
    out = apply_music_theory_rules(events, chords, aggressiveness=1.0)
    assert [e.pitch_midi for e in out] == [64]


def test_overlap_merge_and_filters():
    events = [
        NoteEvent(0.0, 0.5, 60, 80, 0.5),
        NoteEvent(0.4, 0.9, 60, 70, 0.6),  # overlaps same pitch
        NoteEvent(1.0, 1.005, 62, 80, 0.5),  # too short
        NoteEvent(2.0, 2.5, 20, 80, 0.5),  # out of range
    ]
    merged = merge_overlapping_same_pitch(events)
    assert sum(1 for e in merged if e.pitch_midi == 60) == 1
    out = filter_note_events(merged, min_duration_s=0.03, pitch_range=(28, 96))
    assert all(e.pitch_midi != 20 for e in out)
    assert all(e.end_time_s - e.start_time_s >= 0.03 for e in out)


def test_polyphony_cap():
    events = [NoteEvent(0.0, 0.5, 50 + i, 80, 0.1 * i) for i in range(10)]
    out = filter_note_events(events, max_polyphony=6)
    assert len(out) == 6
    # keeps the loudest
    assert min(e.amplitude for e in out) >= 0.4 - 1e-9
