import numpy as np

import jax.numpy as jnp

from audiotabs_tpu.ops import (
    chroma_cqt,
    cqt,
    frame,
    hann_window,
    harmonic,
    hpss,
    istft,
    melspectrogram,
    onset_detect_frames,
    onset_strength,
    rms,
    spectral_centroid,
    spectral_rolloff,
    stft,
)


def _np_stft(x, n_fft, hop):
    """Brute-force centered STFT reference."""
    w = hann_window(n_fft)
    xp = np.pad(x, n_fft // 2, mode="reflect")
    nf = 1 + (len(xp) - n_fft) // hop
    out = np.zeros((n_fft // 2 + 1, nf), dtype=np.complex128)
    for t in range(nf):
        seg = xp[t * hop : t * hop + n_fft] * w
        out[:, t] = np.fft.rfft(seg)
    return out


def test_stft_matches_bruteforce(sine_wave):
    y, sr = sine_wave
    y = y[:4096]
    S = np.asarray(stft(jnp.asarray(y), n_fft=512, hop=128))
    R = _np_stft(y, 512, 128)
    assert S.shape == R.shape
    np.testing.assert_allclose(np.abs(S), np.abs(R), atol=1e-3)


def test_istft_roundtrip(sine_wave):
    y, sr = sine_wave
    y = y[:4096]
    S = stft(jnp.asarray(y), n_fft=512, hop=128)
    yr = np.asarray(istft(S, hop=128, length=len(y)))
    np.testing.assert_allclose(yr, y, atol=1e-3)


def test_frame_shapes():
    x = jnp.arange(100.0)
    f = frame(x, 16, 4, center=False)
    assert f.shape == (1 + (100 - 16) // 4, 16)
    np.testing.assert_array_equal(np.asarray(f[0]), np.arange(16.0))


def test_cqt_peak_at_tone_bin(sine_wave):
    y, sr = sine_wave
    C = np.asarray(cqt(jnp.asarray(y), sr, hop=512, n_bins=84))
    mid = C[:, C.shape[1] // 2]
    peak_bin = int(np.argmax(mid))
    # 440 Hz = A4 = MIDI 69 = 45 semitones above C1 (fmin, MIDI 24)
    assert abs(peak_bin - 45) <= 1
    # analytic kernel magnitude ≈ amplitude/2
    assert abs(mid[peak_bin] - 0.25) < 0.02
    # peak magnitude near the 0.5 sine amplitude (kernel L1 normalization → a/2... )
    assert mid[peak_bin] > 5 * np.median(mid)


def test_chroma_cqt_pitch_class(sine_wave):
    y, sr = sine_wave
    ch = np.asarray(chroma_cqt(jnp.asarray(y), sr, hop=512))
    mid = ch[:, ch.shape[1] // 2]
    assert int(np.argmax(mid)) == 9  # A


def test_hpss_sine_is_harmonic(sine_wave):
    y, sr = sine_wave
    y = y[:8192]
    yh, yp = hpss(jnp.asarray(y), n_fft=512, hop=128)
    yh, yp = np.asarray(yh), np.asarray(yp)
    assert np.sum(yh**2) > 10 * np.sum(yp**2)
    yh2 = np.asarray(harmonic(jnp.asarray(y), n_fft=512, hop=128))
    np.testing.assert_allclose(yh2, yh, atol=1e-5)


def test_hpss_click_is_percussive():
    sr = 22050
    y = np.zeros(8192, dtype=np.float32)
    y[4000:4032] = 1.0  # broadband click
    yh, yp = hpss(jnp.asarray(y), n_fft=512, hop=128)
    assert float(np.sum(np.asarray(yp) ** 2)) > float(np.sum(np.asarray(yh) ** 2))


def test_features_sane(sine_wave):
    y, sr = sine_wave
    y = y[:8192]
    r = np.asarray(rms(jnp.asarray(y), 2048, 512))
    assert np.allclose(r[2:-2], 0.5 / np.sqrt(2), atol=0.05)
    c = np.asarray(spectral_centroid(jnp.asarray(y), sr, 2048, 512))
    assert np.all(np.abs(c[2:-2] - 440) < 100)
    ro = np.asarray(spectral_rolloff(jnp.asarray(y), sr, 2048, 512))
    assert np.all(ro[2:-2] < 1200)
    m = np.asarray(melspectrogram(jnp.asarray(y), sr, 2048, 512, n_mels=64))
    assert m.shape[0] == 64 and np.isfinite(m).all()


def test_onset_detection_on_clicks():
    sr = 22050
    hop = 256
    y = np.zeros(sr, dtype=np.float32) + 0.001
    click_samples = [4000, 10000, 16000]
    for c in click_samples:
        y[c : c + 200] += np.random.default_rng(1).standard_normal(200).astype(np.float32)
    env = onset_strength(jnp.asarray(y), sr, hop=hop, n_fft=1024)
    mask = np.asarray(onset_detect_frames(env, delta=1.0, wait=5))
    onsets = np.flatnonzero(mask) * hop
    assert len(onsets) == 3
    for c, o in zip(click_samples, onsets):
        assert abs(o - c) < 1500
