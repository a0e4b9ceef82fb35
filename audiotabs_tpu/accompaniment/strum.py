"""Strum onset detection + beat-grid quantization.

Capability parity with the reference (reference: backend/app/services/
accompaniment/strum.py:50-164): median-aggregated onset strength → peak
pick → percentile-40 strength gate → min-interval dedup keeping the
stronger onset → quantization to the best beat subdivision (¼/½/1 beat,
with per-grid penalties 1.1/1.0/1.05).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np

import jax.numpy as jnp

from ..ops.features import melspectrogram
from ..ops.spectral import power_to_db
from ..theory.quantize import to_beats


def _onset_strength_median(y, sr: int, hop: int = 512):
    """Median-over-bands spectral flux (the reference's aggregate=np.median)."""
    S = power_to_db(melspectrogram(y, sr, n_fft=2048, hop=hop, n_mels=128), top_db=None)
    diff = jnp.maximum(0.0, S[..., :, 1:] - S[..., :, :-1])
    flux = jnp.median(diff, axis=-2)
    return jnp.pad(flux, [(1, 0)])


def _beats_from_index(beats_idx: np.ndarray, beat_times: np.ndarray) -> np.ndarray:
    beats = np.sort(np.asarray(beat_times, dtype=np.float64))
    idx = np.arange(len(beats), dtype=np.float64)
    avg = float(np.mean(np.diff(beats))) if len(beats) > 1 else 0.5
    avg = avg if avg > 0 else 0.5
    res = np.interp(beats_idx, idx, beats)
    lo = beats_idx < 0
    res[lo] = beats[0] + beats_idx[lo] * avg
    hi = beats_idx > idx[-1]
    res[hi] = beats[-1] + (beats_idx[hi] - idx[-1]) * avg
    return res


def _choose_grid(positions: np.ndarray) -> float:
    if positions.size == 0:
        return 0.5
    best = None
    for grid, penalty in ((0.25, 1.1), (0.5, 1.0), (1.0, 1.05)):
        q = np.round(positions / grid) * grid
        cost = float(np.mean(np.abs(positions - q))) * penalty
        if best is None or cost < best[0]:
            best = (cost, grid)
    return best[1]


def quantize_onsets(
    onsets_s: np.ndarray,
    *,
    beat_times: np.ndarray | None,
    tempo_bpm: float | None,
) -> np.ndarray:
    if onsets_s.size == 0:
        return onsets_s
    if beat_times is not None and len(beat_times) > 1:
        pos = to_beats(onsets_s, beat_times)
        grid = _choose_grid(pos)
        return _beats_from_index(np.round(pos / grid) * grid, beat_times)
    tempo = float(tempo_bpm or 0.0)
    if tempo <= 0:
        return onsets_s
    sec_per_q = 60.0 / tempo
    pos = onsets_s / sec_per_q
    grid = _choose_grid(pos)
    return np.round(pos / grid) * grid * sec_per_q


def _peak_pick_np(env: np.ndarray, delta: float, wait: int, pre: int = 3, post: int = 3) -> np.ndarray:
    """Host-side numpy port of ops.onset.onset_detect_frames (tiny arrays —
    a device round-trip would cost more than the computation)."""
    T = len(env)
    if T == 0:
        return np.zeros(0, dtype=np.int64)
    padded_max = np.pad(env, (pre, post), constant_values=-np.inf)
    win = pre + post + 1
    local_max = np.max(
        np.lib.stride_tricks.sliding_window_view(padded_max, win), axis=-1
    )
    padded_avg = np.pad(env, (pre, post + 2), constant_values=0.0)
    sums = np.convolve(padded_avg, np.ones(pre + 6), mode="valid")[:T]
    count = np.minimum(np.arange(T) + pre + 1, T - np.arange(T) + pre)
    count = np.minimum(count, pre + 6)
    local_avg = sums / np.maximum(count, 1)
    cand = (env >= local_max) & (env >= local_avg + delta)
    frames = []
    last = -wait - 1
    for t in np.flatnonzero(cand):
        if t - last > wait:
            frames.append(t)
            last = t
    return np.asarray(frames, dtype=np.int64)


def detect_strum_onsets(
    y: np.ndarray,
    sr: int,
    *,
    beat_times: Iterable[float] | None = None,
    tempo_bpm: float | None = None,
    min_interval_s: float = 0.12,
    onset_delta: float = 0.2,
    hop: int = 512,
    envelope: np.ndarray | None = None,
) -> np.ndarray:
    """Detect strum onsets. Pass ``envelope`` (the normalized median-flux
    envelope at `hop` for this span, e.g. a slice of the fused program's
    strum_envelope) to skip the device pass entirely."""
    y = np.asarray(y, dtype=np.float32)
    if y.size == 0:
        return np.asarray([], dtype=np.float32)

    def _normalize(e):
        # percentile normalization: one dominant transient must not squash
        # every other strum below the detection delta (max-norm did)
        scale = np.percentile(e, 99) if e.size else 1.0
        return np.clip(e / (scale + 1e-9), 0.0, 3.0)

    if envelope is not None:
        env_np = _normalize(np.asarray(envelope, dtype=np.float32))
    else:
        # bucket-pad so arbitrary segment lengths reuse one compiled program
        true_len = len(y)
        bucket = int(1.5 * sr)
        padded = ((true_len + bucket - 1) // bucket) * bucket
        if padded != true_len:
            y = np.pad(y, (0, padded - true_len), mode="wrap")
        env = _onset_strength_median(jnp.asarray(y), sr, hop)
        env_np = _normalize(np.asarray(env[: true_len // hop + 1]))

    frames = _peak_pick_np(env_np, delta=onset_delta, wait=3)
    if frames.size == 0:
        return np.asarray([], dtype=np.float32)

    strengths = env_np[np.clip(frames, 0, len(env_np) - 1)]
    thr = max(0.1, float(np.percentile(strengths, 40)))
    keep = strengths >= thr
    frames, strengths = frames[keep], strengths[keep]
    if frames.size == 0:
        return np.asarray([], dtype=np.float32)

    times = frames * hop / sr
    # min-interval dedup keeping the stronger onset
    filtered: list[float] = []
    last_t = last_s = None
    for t, s in zip(times, strengths):
        if last_t is None or t - last_t >= min_interval_s:
            filtered.append(float(t))
            last_t, last_s = float(t), float(s)
        elif s > (last_s or 0.0):
            filtered[-1] = float(t)
            last_t, last_s = float(t), float(s)

    onsets = np.asarray(filtered, dtype=np.float32)
    bt = np.asarray(list(beat_times), dtype=np.float32) if beat_times is not None else None
    onsets = quantize_onsets(onsets, beat_times=bt, tempo_bpm=tempo_bpm)

    onsets = np.sort(onsets)
    unique: list[float] = []
    for t in onsets:
        if not unique or t - unique[-1] > 1e-3:
            unique.append(float(t))
    return np.asarray(unique, dtype=np.float32)
