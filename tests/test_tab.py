import numpy as np

from audiotabs_tpu.tab import (
    STANDARD_TUNING,
    get_tuning,
    matches_open_chord,
    optimize_tab_positions,
    optimize_tab_positions_for_events,
    pitch_to_fret_options,
    positions_to_pitches,
)
from audiotabs_tpu.theory.events import NoteEvent


def test_pitch_to_fret_options_e4():
    opts = pitch_to_fret_options(64)  # E4
    assert (1, 0) in opts  # open high E
    assert (2, 5) in opts  # B string 5th fret
    for s, f in opts:
        idx = 6 - s
        assert STANDARD_TUNING[idx] + f == 64


def test_positions_roundtrip():
    opts = pitch_to_fret_options(57)
    pitches = positions_to_pitches(opts)
    assert all(p == 57 for p in pitches)


def test_tunings():
    assert get_tuning("drop_d")[0] == 38
    assert get_tuning("nonsense") == STANDARD_TUNING
    assert get_tuning(None) == STANDARD_TUNING


def test_open_chord_match_em():
    # E minor: E2 B2 E3 G3 B3 E4 → full open shape
    pitches = [40, 47, 52, 55, 59, 64]
    ok, positions = matches_open_chord(pitches, "E:min")
    assert ok
    assert len(positions) == len(pitches)
    sounded = positions_to_pitches(positions)
    assert sorted(sounded) == sorted(pitches)


def test_open_chord_no_match():
    ok, _ = matches_open_chord([41, 46, 51], "F#:maj")  # not an open shape
    assert not ok


def test_optimizer_prefers_low_frets_for_melody():
    events = [
        NoteEvent(0.0, 0.4, 64),  # E4
        NoteEvent(0.5, 0.9, 65),  # F4
        NoteEvent(1.0, 1.4, 67),  # G4
    ]
    tabs = optimize_tab_positions(events)
    assert len(tabs) == 3
    for positions in tabs:
        assert len(positions) == 1
        s, f = positions[0]
        assert 1 <= s <= 6 and 0 <= f <= 24
    # low-fret preference: all within the first 5 frets
    assert all(f <= 5 for (s, f), in tabs)


def test_optimizer_chord_playable_span():
    # C major triad C4 E4 G4
    res = optimize_tab_positions_for_events([(0.0, [60, 64, 67], "C:maj")])
    ev = res.events[0]
    assert ev.is_chord
    strings = [p.string for p in ev.positions]
    assert len(set(strings)) == len(strings)  # distinct strings
    fretted = [p.fret for p in ev.positions if p.fret > 0]
    if fretted:
        assert max(fretted) - min(fretted) <= 5


def test_optimizer_avoids_big_jumps():
    # same pitch repeated fast should not jump around the neck
    events = [(t * 0.1, [64], None) for t in range(8)]
    res = optimize_tab_positions_for_events(events, tempo_bpm=120.0)
    frets = [res.events[i].positions[0].fret for i in range(8)]
    strings = [res.events[i].positions[0].string for i in range(8)]
    assert len(set(zip(strings, frets))) == 1  # stays put
    assert res.position_changes == 0
    assert not res.impossible_transitions
