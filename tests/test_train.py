"""Unit tests for the training stack: synthetic generators, label rolls,
and the shared evaluation metrics."""

import numpy as np
import pytest

from audiotabs_tpu.analysis.metrics import beat_f_measure, note_f_measure


def test_synth_beat_clip_labels():
    from audiotabs_tpu.train.synth import synth_beat_clip

    rng = np.random.default_rng(3)
    y, beats = synth_beat_clip(rng, 8.0, 22050)
    assert y.shape == (8 * 22050,)
    assert np.abs(y).max() <= 1.0
    assert len(beats) >= 6
    periods = np.diff(beats)
    assert np.allclose(periods, periods[0], atol=1e-3)  # steady grid
    assert 60.0 / periods.mean() >= 55 and 60.0 / periods.mean() <= 215


def test_synth_note_clip_events_inside_clip():
    from audiotabs_tpu.train.synth import synth_note_clip

    rng = np.random.default_rng(5)
    y, events = synth_note_clip(rng, 4.0, 22050)
    assert events
    for start, end, pitch in events:
        assert 0 <= start < end
        assert 21 <= pitch <= 96


def test_synth_multitrack_mix_is_sum_of_stems():
    from audiotabs_tpu.train.synth import synth_multitrack

    rng = np.random.default_rng(0)
    mix, stems, _beats = synth_multitrack(rng, 1.5, 44100)
    assert mix.shape[0] == 2 and stems.shape[:2] == (4, 2)
    np.testing.assert_allclose(mix, stems.sum(axis=0), atol=1e-5)
    # every stem carries energy
    for k in range(4):
        assert float(np.abs(stems[k]).max()) > 1e-3, k


def test_rolls_from_events():
    from audiotabs_tpu.train.basicpitch_train import FPS, rolls_from_events

    events = [(0.5, 1.0, 60), (0.5, 0.8, 64)]
    onset, frame, contour = rolls_from_events(events, 200)
    a = int(round(0.5 * FPS))
    assert onset[a, 60 - 21] == 1.0
    assert frame[a : int(round(1.0 * FPS)), 60 - 21].all()
    assert contour[a, (60 - 21) * 3 + 1] == 1.0
    assert frame[int(round(0.9 * FPS)), 64 - 21] == 0.0  # ended at 0.8


def test_beat_f_measure():
    ref = np.array([1.0, 2.0, 3.0, 4.0])
    assert beat_f_measure(ref, ref) == pytest.approx(1.0)
    est = ref + 0.05
    assert beat_f_measure(est, ref, tol=0.07) == pytest.approx(1.0)
    assert beat_f_measure(est, ref, tol=0.02) == pytest.approx(0.0)
    # half the beats → recall 0.5, precision 1 → F = 2/3
    assert beat_f_measure(ref[::2], ref) == pytest.approx(2 / 3)
    # one-to-one: two estimates near one ref beat only match once
    est2 = np.array([1.0, 1.01])
    f = beat_f_measure(est2, np.array([1.0]), tol=0.07)
    assert f == pytest.approx(2 * 0.5 * 1.0 / 1.5)


def test_note_f_measure():
    class E:
        def __init__(self, t, p):
            self.start_time_s = t
            self.pitch_midi = p

    truth = [(0.0, 0.5, 60), (1.0, 1.5, 64)]
    est = [E(0.01, 60), E(1.04, 64)]
    assert note_f_measure(est, truth, tol=0.05) == pytest.approx(1.0)
    assert note_f_measure([E(0.01, 61)], truth, tol=0.05) == pytest.approx(0.0)
    # nearest-unmatched semantics: both estimates claim distinct refs
    truth2 = [(0.0, 0.5, 60), (0.06, 0.5, 60)]
    est2 = [E(0.0, 60), E(0.05, 60)]
    assert note_f_measure(est2, truth2, tol=0.06) == pytest.approx(1.0)


def test_si_sdr():
    from audiotabs_tpu.train.htdemucs_train import si_sdr

    rng = np.random.default_rng(0)
    ref = rng.standard_normal((2, 1000)).astype(np.float32)
    assert si_sdr(ref, ref) > 80  # perfect
    assert si_sdr(2.0 * ref, ref) > 80  # scale-invariant
    noisy = ref + 0.1 * rng.standard_normal((2, 1000)).astype(np.float32)
    assert 15 < si_sdr(noisy, ref) < 25
