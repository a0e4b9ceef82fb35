import numpy as np
import jax.numpy as jnp

from audiotabs_tpu.ops import pyin


def test_pyin_tracks_tone():
    sr = 22050
    t = np.arange(sr // 2) / sr
    y = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    f0, voiced, vprob = pyin(jnp.asarray(y), sr, frame_length=1024, hop=256)
    f0, voiced = np.asarray(f0), np.asarray(voiced)
    mid = slice(4, len(f0) - 4)
    assert voiced[mid].mean() > 0.9
    est = np.median(f0[mid][voiced[mid]])
    assert abs(est - 220.0) < 4.0


def test_pyin_silence_unvoiced():
    sr = 22050
    y = np.zeros(sr // 2, dtype=np.float32)
    f0, voiced, vprob = pyin(jnp.asarray(y), sr, frame_length=1024, hop=256)
    assert np.asarray(voiced).mean() < 0.2


def test_pyin_follows_pitch_step():
    sr = 22050
    n = sr // 2
    t1 = np.arange(n) / sr
    y = np.concatenate(
        [0.5 * np.sin(2 * np.pi * 196.0 * t1), 0.5 * np.sin(2 * np.pi * 392.0 * t1)]
    ).astype(np.float32)
    f0, voiced, _ = pyin(jnp.asarray(y), sr, frame_length=1024, hop=256)
    f0, voiced = np.asarray(f0), np.asarray(voiced)
    T = len(f0)
    first = f0[T // 8 : 3 * T // 8]
    second = f0[5 * T // 8 : 7 * T // 8]
    assert abs(np.median(first) - 196.0) < 6.0
    assert abs(np.median(second) - 392.0) < 10.0
