import numpy as np
import pytest

from audiotabs_tpu.io import write_wav
from audiotabs_tpu.io.native import get_lib, read_wav_native, resample_native
from audiotabs_tpu.io.wav import read_wav


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native lib unavailable (no compiler)")
    return lib


def test_native_wav_matches_python(lib, tmp_path, rng):
    x = np.clip(rng.standard_normal((2000, 2)) * 0.4, -0.99, 0.99).astype(np.float32)
    p = tmp_path / "n.wav"
    write_wav(p, x, 44100)
    got = read_wav_native(p, mono=False)
    assert got is not None
    y, sr = got
    assert sr == 44100
    np.testing.assert_allclose(y, x, atol=1e-6)
    # mono downmix parity
    ym, _ = read_wav_native(p, mono=True)
    np.testing.assert_allclose(ym, x.mean(axis=1), atol=1e-6)


def test_native_wav_pcm16(lib, tmp_path, rng):
    x = np.clip(rng.standard_normal(1500) * 0.4, -0.99, 0.99).astype(np.float32)
    p = tmp_path / "n16.wav"
    write_wav(p, x, 22050, pcm16=True)
    y_native, _ = read_wav_native(p, mono=True)
    y_python, _ = read_wav(p)
    np.testing.assert_allclose(y_native, y_python[:, 0], atol=1e-6)


def test_native_resample_tone(lib):
    sr_in, sr_out = 44100, 22050
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample_native(x, sr_in, sr_out)
    assert y is not None
    assert abs(len(y) - sr_out) <= 8
    # scipy parity away from edges
    from scipy.signal import resample_poly

    ref = resample_poly(x.astype(np.float64), 1, 2).astype(np.float32)
    n = min(len(y), len(ref))
    np.testing.assert_allclose(y[100 : n - 100], ref[100 : n - 100], atol=5e-3)


def test_native_rejects_garbage(lib, tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"definitely not a wav file contents here")
    assert read_wav_native(p) is None
