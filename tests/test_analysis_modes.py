import numpy as np
import pytest

from audiotabs_tpu.io import write_wav
from audiotabs_tpu.schemas import ChordSegment


def _melodic_audio(sr=22050, dur=4.0):
    """Wide-ranging monophonic line → melodic."""
    rng = np.random.default_rng(0)
    n = int(sr * dur)
    y = np.zeros(n, dtype=np.float32)
    pitches = [52, 64, 55, 69, 59, 71, 57, 67]
    seg = n // len(pitches)
    for i, p in enumerate(pitches):
        f = 440.0 * 2 ** ((p - 69) / 12)
        t = np.arange(seg) / sr
        y[i * seg : (i + 1) * seg] = 0.5 * np.sin(2 * np.pi * f * t)
    return y


def _chordal_audio(sr=22050, dur=4.0):
    """Repeated percussive strums of one chord → chordal."""
    rng = np.random.default_rng(1)
    n = int(sr * dur)
    y = np.zeros(n, dtype=np.float32)
    period = int(0.25 * sr)  # 8 strums/sec → high onset density
    for start in range(0, n - period, period):
        t = np.arange(period) / sr
        burst = np.zeros(period)
        for p in (48, 52, 55):  # C major triad, fixed → low dispersion
            f = 440.0 * 2 ** ((p - 69) / 12)
            burst += 0.2 * np.sin(2 * np.pi * f * t)
        burst *= np.exp(-t * 12)
        burst[:200] += 0.4 * rng.standard_normal(200)
        y[start : start + period] += burst.astype(np.float32)
    return y


def test_content_classifier_discriminates():
    from audiotabs_tpu.analysis import analyze_musical_content

    sr = 22050
    mel = analyze_musical_content(_melodic_audio(sr), sr)
    cho = analyze_musical_content(_chordal_audio(sr), sr)
    assert mel and cho
    mel_types = {s.content_type for s in mel}
    cho_types = {s.content_type for s in cho}
    assert "melodic" in mel_types or "hybrid" in mel_types
    assert "chordal" in cho_types or "hybrid" in cho_types
    # the dominant classification should differ in the melodic direction
    mel_disp = np.mean([s.metrics.get("pitch_dispersion", 0) for s in mel])
    cho_disp = np.mean([s.metrics.get("pitch_dispersion", 0) for s in cho])
    assert mel_disp > cho_disp


def test_audio_quality_and_calibration(tmp_path, sine_wave):
    from audiotabs_tpu.analysis import analyze_audio_characteristics, calibrate_thresholds

    y, sr = sine_wave
    p = tmp_path / "t.wav"
    write_wav(p, y, sr)
    chars = analyze_audio_characteristics(p, cache_dir=tmp_path)
    for key in ("rms_db", "spectral_centroid", "spectral_rolloff", "harmonic_ratio", "onset_density", "noise_floor_db"):
        assert key in chars and np.isfinite(chars[key])
    assert chars["harmonic_ratio"] > 0.6  # pure tone is harmonic
    # cache round trip
    chars2 = analyze_audio_characteristics(p, cache_dir=tmp_path)
    assert chars2 == chars

    onset, frame = calibrate_thresholds(chars)
    assert 0.25 <= onset <= 0.75
    assert 0.15 <= frame <= 0.55
    # clean loud audio should get higher thresholds than noisy quiet audio
    clean = {"rms_db": -12.0, "harmonic_ratio": 0.8, "onset_density": 5.0, "noise_floor_db": -55.0}
    noisy = {"rms_db": -28.0, "harmonic_ratio": 0.3, "onset_density": 2.0, "noise_floor_db": -30.0}
    o_clean, f_clean = calibrate_thresholds(clean)
    o_noisy, f_noisy = calibrate_thresholds(noisy)
    assert o_clean != o_noisy  # calibration responds to characteristics


def test_strum_detection():
    from audiotabs_tpu.accompaniment import detect_strum_onsets

    sr = 22050
    y = _chordal_audio(sr, 4.0)
    onsets = detect_strum_onsets(y, sr, tempo_bpm=120.0)
    assert len(onsets) >= 6
    assert np.all(np.diff(onsets) > 0.1)


def test_strum_envelope_host_device_parity():
    """The accompaniment path computes the onset envelope host-side at the
    native rate; the fused program computes the same envelope on-device at
    22.05 kHz. Same definition, same numbers."""
    import jax.numpy as jnp

    from audiotabs_tpu.accompaniment.strum import (
        _onset_strength_median,
        _onset_strength_median_host,
    )

    sr = 22050
    y = _chordal_audio(sr, 3.0)
    dev = np.asarray(_onset_strength_median(jnp.asarray(y), sr))
    host = _onset_strength_median_host(y, sr)
    n = min(len(dev), len(host))
    assert n > 50
    scale = np.abs(dev[:n]).max() + 1e-9
    assert np.allclose(dev[:n] / scale, host[:n] / scale, atol=2e-3)


def test_shapes():
    from audiotabs_tpu.accompaniment import pick_shape_for_chord, shape_pitches, shape_positions

    g = pick_shape_for_chord("G:maj")
    assert g is not None
    pcs = {p % 12 for p in shape_pitches(g)}
    assert pcs == {7, 11, 2}  # G B D
    am = pick_shape_for_chord("A:min7")  # collapses to A:min shape
    assert am is not None
    assert {p % 12 for p in shape_pitches(am)} == {9, 0, 4}
    # barre fallback for F# major
    fs = pick_shape_for_chord("F#:maj")
    assert fs is not None
    assert {p % 12 for p in shape_pitches(fs)} == {6, 10, 1}
    positions = shape_positions(fs)
    assert all(1 <= s <= 6 for s, _ in positions)


def test_shape_continuity():
    from audiotabs_tpu.accompaniment import pick_shape_for_chord

    c = pick_shape_for_chord("C:maj")
    # next chord picks a shape near the previous hand position
    d = pick_shape_for_chord("D:maj", prev_shape=c)
    assert d is not None and d.position <= 5


def test_accompaniment_mode_builds_slash_score():
    from audiotabs_tpu.runtime.modes import run_accompaniment_mode

    sr = 22050
    y = _chordal_audio(sr, 4.0)
    chords = [ChordSegment(start=0.0, end=4.0, label="C:maj", confidence=0.9)]
    beats = np.arange(0.0, 4.0, 0.5)
    res = run_accompaniment_mode(y, sr, chords, beats, 120.0)
    assert res.score_override is not None
    assert res.backend == "accompaniment+chords_viterbi"
    assert res.strum_onsets
    assert res.chosen_shapes
    items = [it for m in res.score_override.measures for it in m.items if not it.rest]
    assert items
    # C major open shape pitches
    assert any("c/" in k or "e/" in k or "g/" in k for it in items for k in it.keys)


def test_quantize_strum_events_empty():
    from audiotabs_tpu.runtime.modes import quantize_strum_events

    score, pickup, tabs = quantize_strum_events([], beat_times=None, tempo_bpm=120.0)
    assert len(score.measures) == 1
    assert all(it.rest for it in score.measures[0].items)
