import numpy as np

from audiotabs_tpu.theory import (
    chord_tone_pcs,
    format_chord_label,
    normalize_chord_label,
    split_chord_label,
)
from audiotabs_tpu.theory.events import NoteEvent
from audiotabs_tpu.theory.key import (
    estimate_key_from_events,
    estimate_key_from_pcs,
    spell_chord_label,
)
from audiotabs_tpu.theory.quantize import (
    beats_to_seconds,
    decompose_duration,
    midi_to_vexflow_key,
    quantize_note_events_to_score,
    to_beats,
    vexflow_key_to_midi,
)


def test_split_chord_label():
    assert split_chord_label("G:maj") == ("G", "maj", None)
    assert split_chord_label("Am7") == ("A", "min7", None)
    assert split_chord_label("F#m") == ("F#", "min", None)
    assert split_chord_label("Bb:7/D") == ("Bb", "7", "D")
    assert split_chord_label("N") == (None, None, None)
    assert split_chord_label("C:maj/3") == ("C", "maj", "E")


def test_normalize_and_format():
    assert normalize_chord_label("a minor") in ("A:min", "N")
    assert normalize_chord_label("weird!!") == "N"
    assert format_chord_label("G", "maj") == "G:maj"
    assert format_chord_label("A", "min7", "E") == "A:min7/E"


def test_chord_tones():
    assert chord_tone_pcs("C:maj") == {0, 4, 7}
    assert chord_tone_pcs("A:min") == {9, 0, 4}
    assert chord_tone_pcs("G:7") == {7, 11, 2, 5}
    assert chord_tone_pcs("N") == set()


def test_key_estimate_c_major_scale():
    # C major scale notes, duration-weighted
    hist = np.zeros(12)
    for pc in (0, 2, 4, 5, 7, 9, 11):
        hist[pc] = 1.0
    hist[0] = 2.0  # emphasize tonic
    k = estimate_key_from_pcs(hist)
    assert k is not None
    assert k.tonic == "C" and k.mode == "major" and k.fifths == 0


def test_key_estimate_a_minor_events():
    # A harmonic-minor flavored event set
    pitches = [57, 59, 60, 62, 64, 65, 68, 69, 57, 69, 64]
    events = [NoteEvent(i * 0.5, i * 0.5 + 0.4, p) for i, p in enumerate(pitches)]
    k = estimate_key_from_events(events)
    assert k is not None
    assert k.tonic in ("A", "C")  # relative pair acceptable


def test_chord_key_rescoring_flips_wrong_signature():
    """Chord-aware key reranking (theory/key.py rescore_key_with_chords):
    a CNN posterior whose argmax carries accidentals the decoded harmony
    never sounds is flipped to the fully-diatonic signature (the held-out
    waltz regime: CNN E minor over an all-C-major progression)."""
    from audiotabs_tpu.schemas import ChordSegment
    from audiotabs_tpu.models.key_cnn import key_prediction_to_label
    from audiotabs_tpu.theory.key import rescore_key_with_chords

    prog = ["C:maj", "F:maj", "G:maj", "C:maj", "A:min", "D:min", "G:maj", "C:maj"]
    chords = [ChordSegment(start=2.0 * i, end=2.0 * i + 2.0, label=l, confidence=0.5) for i, l in enumerate(prog)]
    p = np.full(24, 0.02)
    p[12 + 4], p[12 + 5], p[0] = 0.148, 0.130, 0.071  # E min > F min > C maj
    p /= p.sum()
    assert key_prediction_to_label(p) == "E minor"
    assert key_prediction_to_label(rescore_key_with_chords(p, chords)) == "C major"


def test_chord_key_rescoring_keeps_relative_choice_and_confident_cnn():
    """Relative major/minor tie on compatibility by construction — the CNN
    still decides between them; a confident correct CNN is never flipped
    (the golden regime: G major over G/D/Am/C)."""
    from audiotabs_tpu.schemas import ChordSegment
    from audiotabs_tpu.models.key_cnn import key_prediction_to_label
    from audiotabs_tpu.theory.key import chord_key_compatibility, rescore_key_with_chords

    prog = ["N", "G:maj", "D:maj", "A:min", "C:maj", "G:maj"]
    chords = [ChordSegment(start=2.0 * i, end=2.0 * i + 2.0, label=l, confidence=0.5) for i, l in enumerate(prog)]
    compat = chord_key_compatibility(chords)
    assert compat is not None
    assert compat[7] == compat[12 + 4] == 1.0  # G major == E minor (relative pair)
    p = np.full(24, 0.01)
    p[7], p[2], p[12 + 9] = 0.363, 0.109, 0.053
    p /= p.sum()
    assert key_prediction_to_label(rescore_key_with_chords(p, chords)) == "G major"
    # no parseable chords → identity
    assert np.allclose(rescore_key_with_chords(p, []), p)


def test_spell_chord_label():
    assert spell_chord_label("C#:maj", use_flats=True) == "Db:maj"
    assert spell_chord_label("Db:min7", use_flats=False) == "C#:min7"
    assert spell_chord_label("N", True) == "N"


def test_vexflow_keys():
    assert midi_to_vexflow_key(69, use_flats=False) == "a/4"
    assert midi_to_vexflow_key(61, use_flats=True) == "db/4"
    assert vexflow_key_to_midi("a/4") == 69
    assert vexflow_key_to_midi("db/4") == 61
    assert vexflow_key_to_midi("zz/9") is None


def test_beat_interp_roundtrip():
    beats = np.array([0.5, 1.0, 1.5, 2.0, 2.5])
    ts = np.array([0.25, 0.75, 2.75])
    b = to_beats(ts, beats)
    back = [beats_to_seconds(x, beats, 120.0) for x in b]
    np.testing.assert_allclose(back, ts, atol=1e-9)


def test_decompose_duration():
    toks = decompose_duration(4.0)
    assert len(toks) == 1 and toks[0].duration == "w"
    toks = decompose_duration(2.5)
    assert sum(t.ql for t in toks) == 2.5
    toks = decompose_duration(1.0 / 3.0)
    assert abs(sum(t.ql for t in toks) - 1 / 3) < 1e-6


def test_quantize_empty():
    r = quantize_note_events_to_score([], tempo_bpm=120.0)
    assert len(r.score.measures) == 1
    assert all(item.rest for item in r.score.measures[0].items)


def test_quantize_simple_melody():
    # four quarter notes at 120 bpm: C4 D4 E4 F4 starting at t=0
    events = [NoteEvent(i * 0.5, i * 0.5 + 0.5, 60 + s) for i, s in enumerate((0, 2, 4, 5))]
    r = quantize_note_events_to_score(events, tempo_bpm=120.0)
    assert r.score.measures[0].number == 1
    items = [it for m in r.score.measures for it in m.items if not it.rest]
    assert len(items) == 4
    assert items[0].keys == ["c/4"]
    assert items[0].duration == "q"
    assert r.tab_positions is not None


def test_quantize_measure_fill_and_ties():
    # a 6-quarter note must tie across the 4/4 barline
    events = [NoteEvent(0.0, 3.0, 60)]  # 6 quarters at 120 bpm
    r = quantize_note_events_to_score(events, tempo_bpm=120.0)
    pitched = [(m.number, it) for m in r.score.measures for it in m.items if not it.rest]
    assert len(pitched) >= 2
    assert pitched[0][1].tie == "start"
    assert pitched[-1][1].tie == "stop"
    from audiotabs_tpu.theory.quantize import duration_to_quarters

    # first measure is exactly 4 quarters; the total spans the 6-quarter note
    m1_q = sum(duration_to_quarters(it) for it in r.score.measures[0].items)
    assert abs(m1_q - 4.0) < 1e-6
    total_q = sum(duration_to_quarters(it) for m in r.score.measures for it in m.items)
    assert abs(total_q - 6.0) < 1e-6


def test_quantize_chord_grouping():
    # simultaneous C-E-G becomes one chord item
    events = [NoteEvent(0.0, 1.0, p) for p in (60, 64, 67)]
    r = quantize_note_events_to_score(events, tempo_bpm=120.0)
    first = next(it for m in r.score.measures for it in m.items if not it.rest)
    assert len(first.keys) == 3


def test_pick_best_beat_times_prefers_true_grid():
    """Quarter notes at 120 BPM notated on a double-speed (240 BPM) grid read
    as half notes everywhere — the readability cost must pick the grid that
    notates them as quarters (reference pipeline.py:1562-1608 semantics)."""
    from audiotabs_tpu.theory.chord_simplify import pick_best_beat_times
    from audiotabs_tpu.theory.events import NoteEvent

    # melody: one note per 0.5 s (= 120 BPM quarters), 16 s
    events = [
        NoteEvent(i * 0.5, i * 0.5 + 0.45, 60 + (i % 5), 90, 0.8) for i in range(32)
    ]
    # candidate grid at double speed: beats every 0.25 s → beats[::2] is the
    # true 120 BPM grid and must win
    dbl = np.arange(0.0, 16.0, 0.25, dtype=np.float32)
    best = pick_best_beat_times(events, dbl)
    period = float(np.median(np.diff(best)))
    assert abs(period - 0.5) < 0.02, period


def test_pick_best_beat_times_keeps_correct_grid():
    """Straight eighths on the right grid become 16ths on the half-time
    grid (0.85 penalty each) — the correct grid must be kept."""
    from audiotabs_tpu.theory.chord_simplify import pick_best_beat_times
    from audiotabs_tpu.theory.events import NoteEvent

    events = [
        NoteEvent(i * 0.25, i * 0.25 + 0.22, 60 + (i % 5), 90, 0.8) for i in range(64)
    ]
    good = np.arange(0.0, 16.0, 0.5, dtype=np.float32)
    best = pick_best_beat_times(events, good)
    period = float(np.median(np.diff(best)))
    assert abs(period - 0.5) < 0.02, period
