import numpy as np
import jax
import jax.numpy as jnp

from audiotabs_tpu.models.basicpitch import (
    HOP,
    cnn_apply,
    hcqt,
    init_params,
    notes_from_posteriors,
    salience_posteriors,
    transcribe_polyphonic,
)


def _tone(pitches, sr=22050, dur=1.5, amp=0.3):
    t = np.arange(int(sr * dur)) / sr
    y = np.zeros_like(t)
    for p in pitches:
        f = 440.0 * 2 ** ((p - 69) / 12)
        y += amp * np.sin(2 * np.pi * f * t)
    return y.astype(np.float32)


def test_hcqt_shape():
    sr = 22050
    y = _tone([60], dur=1.0)
    hc = hcqt(jnp.asarray(y), sr)
    H, B, T = hc.shape
    assert H == 8 and B == 264
    assert abs(T - len(y) / HOP) <= 2


def test_cnn_shapes_random_params():
    sr = 22050
    y = _tone([60], dur=1.0)
    params = init_params(jax.random.PRNGKey(0))
    onset, frame, contour = cnn_apply(params, hcqt(jnp.asarray(y), sr))
    T = frame.shape[0]
    assert frame.shape == (T, 88)
    assert onset.shape == (T, 88)
    assert contour.shape == (T, 264)
    assert np.all((np.asarray(frame) >= 0) & (np.asarray(frame) <= 1))


def test_salience_single_tone():
    sr = 22050
    y = _tone([60], dur=1.5)  # C4 = semitone 39 above A0
    onset, frame = salience_posteriors(jnp.asarray(y), sr)
    frame = np.asarray(frame)
    mid = frame[frame.shape[0] // 2]
    assert int(np.argmax(mid)) == 60 - 21


def test_transcribe_polyphonic_chord():
    sr = 22050
    y = _tone([60, 64, 67], dur=1.5)  # C major triad
    events = transcribe_polyphonic(y, sr)
    pitches = {e.pitch_midi for e in events}
    assert {60, 64, 67}.issubset(pitches)
    # no wild spurious low/high notes with significant length
    long_events = [e for e in events if e.duration_s > 0.5]
    assert all(48 <= e.pitch_midi <= 84 for e in long_events)


def test_transcribe_polyphonic_sequence():
    sr = 22050
    y = np.concatenate([_tone([60], dur=0.7), _tone([67], dur=0.7)])
    events = transcribe_polyphonic(y, sr)
    assert events
    first = min(events, key=lambda e: e.start_time_s)
    assert first.pitch_midi == 60
    assert any(e.pitch_midi == 67 and e.start_time_s > 0.5 for e in events)


def test_notes_from_posteriors_decoding():
    fps = 86.0
    T = 200
    onset = np.zeros((T, 88), dtype=np.float32)
    frame = np.zeros((T, 88), dtype=np.float32)
    onset[10, 40] = 0.9
    frame[10:60, 40] = 0.8
    # onset-less note for the melodia trick
    frame[100:160, 45] = 0.7
    events = notes_from_posteriors(onset, frame, fps=fps)
    assert len(events) == 2
    e1, e2 = sorted(events, key=lambda e: e.start_time_s)
    assert e1.pitch_midi == 21 + 40
    assert abs(e1.start_time_s - 10 / fps) < 0.02
    assert abs(e1.end_time_s - 60 / fps) < 0.1
    assert e2.pitch_midi == 21 + 45
    assert abs(e2.start_time_s - 100 / fps) < 0.06


def test_min_note_length_filter():
    fps = 86.0
    onset = np.zeros((50, 88), dtype=np.float32)
    frame = np.zeros((50, 88), dtype=np.float32)
    onset[5, 30] = 0.9
    frame[5:8, 30] = 0.9  # only 3 frames ≈ 35ms < 127ms
    events = notes_from_posteriors(onset, frame, fps=fps, melodia_trick=False)
    assert events == []


def test_quiet_tail_notes_survive_windowed_normalization():
    """A -20 dB tail section must still produce notes (the normalizer is
    windowed, not whole-song — VERDICT r1 item 10)."""
    sr = 22050
    loud = _tone([60, 64, 67], dur=8.0, amp=0.3)
    quiet = _tone([72], dur=8.0, amp=0.03)  # -20 dB vs the loud section
    y = np.concatenate([loud, quiet])
    events = transcribe_polyphonic(y, sr)
    tail = [e for e in events if e.start_time_s >= 8.0 and e.pitch_midi == 72]
    assert tail, "no notes detected in the -20 dB tail"


def test_silence_not_amplified_into_notes():
    sr = 22050
    loud = _tone([60], dur=6.0, amp=0.3)
    silence = 1e-5 * np.random.default_rng(0).standard_normal(6 * sr).astype(np.float32)
    y = np.concatenate([loud, silence])
    events = transcribe_polyphonic(y, sr)
    ghosts = [e for e in events if e.start_time_s >= 6.5]
    assert not ghosts, f"phantom notes in silence: {ghosts}"
