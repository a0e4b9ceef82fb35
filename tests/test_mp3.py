"""MP3 decode round-trip: encode a known tone with the system libmp3lame,
decode it with our libmpg123 binding, and check the audio survives."""

import ctypes

import numpy as np
import pytest

from audiotabs_tpu.io.mp3 import decode_mp3, looks_like_mp3, mp3_available


def _encode_mp3(path, pcm: np.ndarray, sr: int) -> bool:
    """Minimal mono MP3 encoder via libmp3lame (test fixture only)."""
    try:
        lame = ctypes.CDLL("libmp3lame.so.0")
    except OSError:
        return False
    lame.lame_init.restype = ctypes.c_void_p
    gfp = ctypes.c_void_p(lame.lame_init())
    lame.lame_set_in_samplerate(gfp, sr)
    lame.lame_set_num_channels(gfp, 1)
    lame.lame_set_mode(gfp, 3)  # MONO
    lame.lame_set_brate(gfp, 96)
    assert lame.lame_init_params(gfp) >= 0
    s16 = (np.clip(pcm, -1, 1) * 32767).astype(np.int16)
    out = (ctypes.c_ubyte * (len(s16) * 2 + 16384))()
    lame.lame_encode_buffer.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int16),
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int,
    ]
    n = lame.lame_encode_buffer(gfp, s16, None, len(s16), out, len(out))
    assert n >= 0
    tail = (ctypes.c_ubyte * 16384)()
    m = lame.lame_encode_flush(gfp, tail, len(tail))
    lame.lame_close(gfp)
    with open(path, "wb") as f:
        f.write(bytes(out[:n]) + bytes(tail[:m]))
    return True


@pytest.fixture(scope="module")
def mp3_fixture(tmp_path_factory):
    if not mp3_available():
        pytest.skip("libmpg123 unavailable")
    sr = 44100
    t = np.arange(int(sr * 2.0)) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    path = tmp_path_factory.mktemp("mp3") / "tone.mp3"
    if not _encode_mp3(path, tone, sr):
        pytest.skip("libmp3lame unavailable to build the fixture")
    return path, tone, sr


def test_mp3_decode_roundtrip(mp3_fixture):
    path, tone, sr = mp3_fixture
    assert looks_like_mp3(path)
    y, rate = decode_mp3(path)
    assert rate == sr
    # lame adds encoder delay; align by cross-correlation on a window
    n = min(len(y), len(tone), sr)
    seg_y = y[: n + 4096]
    corr = np.correlate(seg_y, tone[:n], mode="valid")
    lag = int(np.argmax(corr))
    aligned = y[lag : lag + n]
    ref = tone[:n]
    c = np.corrcoef(aligned, ref)[0, 1]
    assert c > 0.97, c
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(aligned * np.hanning(n)))
    f_peak = np.argmax(spec) * sr / n
    assert abs(f_peak - 440.0) < 3.0, f_peak


def test_decode_to_mono_44k_accepts_mp3(mp3_fixture, tmp_path):
    from audiotabs_tpu.io import decode_to_mono_44k

    path, _tone, _sr = mp3_fixture
    y, sr = decode_to_mono_44k(path, tmp_path / "out.wav")
    assert sr == 44100
    assert len(y) > 44100  # ~2 s decoded
    assert (tmp_path / "out.wav").exists()


def test_avdecode_shim_on_mp3(mp3_fixture):
    """The FFmpeg-library shim decodes the same fixture (it covers ANY
    container; MP3 is the format we can synthesize a fixture for)."""
    from audiotabs_tpu.io.avdecode import av_available, decode_any

    if not av_available():
        pytest.skip("libaudiotabs_decode.so not built")
    path, tone, sr = mp3_fixture
    y, rate = decode_any(path)
    assert rate == sr
    n = min(len(y), len(tone), sr)
    corr = np.correlate(y[: n + 4096], tone[:n], mode="valid")
    lag = int(np.argmax(corr))
    c = np.corrcoef(y[lag : lag + n], tone[:n])[0, 1]
    assert c > 0.97, c


def test_avdecode_shim_on_wav(tmp_path):
    from audiotabs_tpu.io import write_wav
    from audiotabs_tpu.io.avdecode import av_available, decode_any

    if not av_available():
        pytest.skip("libaudiotabs_decode.so not built")
    sr = 22050
    t = np.arange(sr) / sr
    tone = (0.4 * np.sin(2 * np.pi * 330.0 * t)).astype(np.float32)
    p = tmp_path / "tone.wav"
    write_wav(p, tone, sr)
    y, rate = decode_any(p)
    assert rate == sr
    np.testing.assert_allclose(y[: len(tone)], tone, atol=1e-3)
