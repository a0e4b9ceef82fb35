import numpy as np
import pytest

from audiotabs_tpu.io import (
    load_wav,
    peak_normalize,
    read_wav,
    resample_poly_host,
    write_wav,
)


def test_wav_roundtrip_float32(tmp_path, rng):
    x = rng.standard_normal((1000, 2)).astype(np.float32) * 0.5
    p = tmp_path / "t.wav"
    write_wav(p, x, 22050)
    y, sr = read_wav(p)
    assert sr == 22050
    np.testing.assert_allclose(y, x, atol=1e-6)


def test_wav_roundtrip_pcm16(tmp_path, rng):
    x = np.clip(rng.standard_normal(500) * 0.5, -0.99, 0.99).astype(np.float32)
    p = tmp_path / "t16.wav"
    write_wav(p, x, 44100, pcm16=True)
    y, sr = read_wav(p)
    assert sr == 44100
    np.testing.assert_allclose(y[:, 0], x, atol=1.0 / 16000)


def test_load_wav_mono_downmix(tmp_path):
    x = np.stack([np.ones(100), -np.ones(100)], axis=1).astype(np.float32)
    p = tmp_path / "st.wav"
    write_wav(p, x, 8000)
    y, _ = load_wav(p, mono=True)
    np.testing.assert_allclose(y, np.zeros(100), atol=1e-6)


def test_reference_golden_wav_loads():
    """The reference's checked-in upload.wav must decode with our codec."""
    import glob

    paths = glob.glob("/root/reference/data/jobs/*/input/upload.wav")
    if not paths:
        pytest.skip("no reference golden wav")
    y, sr = load_wav(paths[0])
    assert sr > 0 and y.size > 0
    assert np.isfinite(y).all()


def test_peak_normalize():
    x = np.array([0.1, -0.2, 0.05], dtype=np.float32)
    y = peak_normalize(x, 0.95)
    assert abs(np.abs(y).max() - 0.95) < 1e-6
    assert peak_normalize(np.zeros(4, np.float32)).sum() == 0


def test_resample_host_tone_preserved():
    sr_in, sr_out = 44100, 22050
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample_poly_host(x, sr_in, sr_out)
    assert abs(len(y) - sr_out) <= 2
    # dominant frequency still 440
    spec = np.abs(np.fft.rfft(y[: sr_out]))
    f = np.argmax(spec) * sr_out / sr_out
    assert abs(f - 440) < 2


def test_resample_jax_matches_host():
    import jax.numpy as jnp

    from audiotabs_tpu.io import resample_kernel_jax

    sr_in, sr_out = 44100, 22050
    t = np.arange(4096) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y_host = resample_poly_host(x, sr_in, sr_out)
    y_jax = np.asarray(resample_kernel_jax(jnp.asarray(x), sr_in, sr_out))
    n = min(len(y_host), len(y_jax)) - 64
    # compare away from the edges
    np.testing.assert_allclose(y_jax[32:n], y_host[32:n], atol=5e-3)
