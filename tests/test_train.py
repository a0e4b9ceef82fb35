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
    # steady or SMOOTHLY drifting grid (synth draws up to ±6% tempo drift
    # across the clip): consecutive periods never jump, total drift bounded
    assert np.abs(np.diff(periods)).max() <= 0.02 * periods.mean()
    assert periods.max() - periods.min() <= 0.10 * periods.mean()
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


def test_synth_multitrack_6s_guitar_and_solo_modes():
    """The htdemucs_6s layout: 6 stems summing to the mix, guitar carrying
    plucked content, and the solo-guitar arrangement appearing (the golden
    WAV's case: silent drums, everything in guitar)."""
    from audiotabs_tpu.train.synth import synth_multitrack

    rng = np.random.default_rng(1)
    saw_solo = saw_guitar = False
    for _ in range(24):
        mix, stems, _beats = synth_multitrack(rng, 1.5, 44100, n_sources=6)
        assert stems.shape[:2] == (6, 2)
        np.testing.assert_allclose(mix, stems.sum(axis=0), atol=1e-5)
        rms = np.sqrt((stems**2).mean(axis=(1, 2)))
        if rms[4] > 1e-4:
            saw_guitar = True
        if rms[4] > 1e-4 and all(rms[k] < 1e-6 for k in (0, 1, 2, 3, 5)):
            saw_solo = True
    assert saw_guitar and saw_solo


def test_synth_guitar_voicing_clip():
    """AMT voicing clips: events are real 4-6 note guitar voicings within
    the clip, pitches on the fretboard."""
    from audiotabs_tpu.train.synth import synth_guitar_voicing_clip

    rng = np.random.default_rng(2)
    y, events = synth_guitar_voicing_clip(rng, 4.0, 22050)
    assert y.shape == (4 * 22050,) and events
    for start, end, pitch in events:
        assert 0 <= start < end
        assert 40 <= pitch <= 88  # open E2 .. high frets
    # simultaneous polyphony reaches guitar-voicing depth (>= 4 notes)
    times = np.arange(0, 4.0, 0.02)
    poly = max(sum(1 for s, e, _ in events if s <= t < e) for t in times)
    assert poly >= 4


def test_beat_rnn_ensemble_save_load_average(tmp_path):
    """Ensemble checkpoints round-trip and beat_activation averages the
    members (madmom's 8-BLSTM ensemble semantics, grid/beats.py:71-82)."""
    import jax
    import jax.numpy as jnp

    from audiotabs_tpu.models import beat_rnn

    members = [
        beat_rnn.init_params(jax.random.PRNGKey(i), input_dim=300, hidden=6)
        for i in range(3)
    ]
    for m in members:
        m["feat_mean"] = jnp.zeros((300,))
        m["feat_std"] = jnp.ones((300,))
    combined = dict(members[0])
    combined["ensemble"] = members[1:]
    p = tmp_path / "ens.npz"
    beat_rnn.save_params(str(p), combined)
    loaded = beat_rnn.load_params(str(p))
    assert len(loaded.get("ensemble", [])) == 2

    y = jnp.asarray(np.random.default_rng(0).standard_normal(22050).astype(np.float32))
    act_ens = np.asarray(beat_rnn.beat_activation(y, 22050, params=loaded))
    per_member = [
        np.asarray(
            beat_rnn.beat_activation(
                y, 22050, params={k: v for k, v in m.items() if k != "ensemble"}
            )
        )
        for m in [dict(members[0])] + members[1:]
    ]
    np.testing.assert_allclose(act_ens, np.mean(per_member, axis=0), atol=1e-5)


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
