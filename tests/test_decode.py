import numpy as np
import jax.numpy as jnp

from audiotabs_tpu.decode import (
    dbn_beat_track,
    estimate_tempo,
    normalize_beat_times,
    viterbi_constant_switch,
    viterbi_log_dense,
)


def _np_viterbi_constant(emissions, penalty):
    """Reference O(S^2 T) implementation (matches chords/viterbi.py:4-41)."""
    S, T = emissions.shape
    logp = -np.log(np.clip(emissions, 1e-9, 1.0))
    dp = np.zeros((S, T))
    back = np.zeros((S, T), dtype=int)
    dp[:, 0] = logp[:, 0]
    for t in range(1, T):
        prev = dp[:, t - 1]
        for s in range(S):
            costs = prev + penalty
            costs[s] = prev[s]
            k = int(np.argmin(costs))
            dp[s, t] = costs[k] + logp[s, t]
            back[s, t] = k
    path = np.zeros(T, dtype=int)
    path[-1] = int(np.argmin(dp[:, -1]))
    for t in range(T - 1, 0, -1):
        path[t - 1] = back[path[t], t]
    return path


def test_viterbi_constant_matches_bruteforce(rng):
    S, T = 7, 40
    em = rng.random((S, T)).astype(np.float32)
    em /= em.sum(0, keepdims=True)
    ref = _np_viterbi_constant(em, 1.5)
    path, conf = viterbi_constant_switch(jnp.asarray(em), 1.5)
    path = np.asarray(path)
    # cost of both paths must be identical (ties may pick different states)
    def cost(p):
        c = -np.log(np.clip(em[p, np.arange(T)], 1e-9, 1)).sum()
        c += 1.5 * np.sum(p[1:] != p[:-1])
        return c

    np.testing.assert_allclose(cost(path), cost(ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(conf), em[path, np.arange(T)], rtol=1e-5)


def test_viterbi_dense_simple_chain():
    # 3 states, strong self transition, emissions switch halfway
    T = 20
    log_em = np.full((T, 3), -5.0)
    log_em[:10, 0] = -0.1
    log_em[10:, 2] = -0.1
    log_tr = np.log(np.array([[0.8, 0.1, 0.1], [0.1, 0.8, 0.1], [0.1, 0.1, 0.8]]))
    path, score = viterbi_log_dense(jnp.asarray(log_em), jnp.asarray(log_tr))
    path = np.asarray(path)
    assert (path[:9] == 0).all()
    assert (path[12:] == 2).all()


def test_dbn_tracks_metronome():
    # synthetic activation: impulses every 0.5 s (120 bpm) at 100 fps
    fps = 100
    T = 1000
    act = np.full(T, 0.02, dtype=np.float32)
    act[::50] = 0.95
    beats = dbn_beat_track(act, fps=fps)
    assert len(beats) >= 15
    intervals = np.diff(beats)
    assert abs(np.median(intervals) - 0.5) < 0.03
    tempo = estimate_tempo(beats)
    assert abs(tempo - 120.0) < 5.0


def test_dbn_robust_to_noise(rng):
    fps = 100
    T = 800
    act = rng.random(T).astype(np.float32) * 0.15
    n_clicks = len(act[::40])
    act[::40] = np.clip(0.8 + 0.1 * rng.standard_normal(n_clicks), 0, 1)  # 150 bpm
    beats = dbn_beat_track(act, fps=fps)
    tempo = estimate_tempo(beats)
    assert abs(tempo - 150.0) < 8.0


def test_normalize_beat_times():
    bt, off = normalize_beat_times(np.array([1.5, 2.0, 2.5]))
    assert off == 1.5
    np.testing.assert_allclose(bt, [0.0, 0.5, 1.0])
    assert normalize_beat_times(None) == (None, 0.0)
    assert normalize_beat_times(np.array([]))[0] is None


def test_beat_activation_and_estimate_beats_on_clicktrack():
    from audiotabs_tpu.decode import estimate_beats

    sr = 22050
    dur = 8.0
    y = np.zeros(int(sr * dur), dtype=np.float32)
    period = int(0.5 * sr)  # 120 bpm click track
    for i in range(0, len(y) - 400, period):
        y[i : i + 400] += np.random.default_rng(3).standard_normal(400).astype(np.float32) * np.exp(
            -np.arange(400) / 80.0
        )
    tempo, beats = estimate_beats(y, sr)
    assert abs(tempo - 120.0) < 6.0 or abs(tempo - 60.0) < 3.0 or abs(tempo - 240.0) < 12.0
    assert len(beats) >= 8
