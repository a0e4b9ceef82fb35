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

from ..ops.features import mel_filterbank
from ..ops.spectral import stft
from ..theory.quantize import to_beats


def _onset_strength_median(y, sr: int, hop: int = 512, n_fft: int = 2048):
    """librosa-faithful onset strength, median-aggregated over mel bands
    (the reference's onset_strength(aggregate=np.median), strum.py:115):
    Slaney-scale mel power → dB floored at max−80 → positive first
    difference → median over bands → +n_fft//(2·hop) frame lag shift.

    The median over bands is the detector's physics: a full strum excites
    broadband (median jumps), a single fingerpicked pluck moves only a few
    bands (median stays near zero) — so this envelope fires on strums, not
    plucks. The dB floor and Slaney band placement both materially change
    WHICH attacks peak; deviating from librosa here changed the golden
    strum set entirely (round-4 measurements). Center padding is
    "constant" — librosa 0.10.2's melspectrogram default (the reference
    pins librosa==0.10.2.post1, backend/requirements.txt)."""
    S = jnp.abs(stft(y, n_fft=n_fft, hop=hop, pad_mode="constant")) ** 2
    fb = jnp.asarray(mel_filterbank(sr, n_fft, 128, scale="slaney"))
    M = jnp.einsum("mf,...ft->...mt", fb, S)
    db = 10.0 * jnp.log10(jnp.maximum(M, 1e-10))
    db = jnp.maximum(db, jnp.max(db, axis=(-2, -1), keepdims=True) - 80.0)
    diff = jnp.maximum(0.0, db[..., :, 1:] - db[..., :, :-1])
    flux = jnp.median(diff, axis=-2)
    shift = 1 + n_fft // (2 * hop)  # +1 for the diff, + the window-center lag
    flux = jnp.pad(flux, [(0, 0)] * (flux.ndim - 1) + [(shift, 0)])
    return flux[..., : S.shape[-1]]


def _onset_strength_median_host(y: np.ndarray, sr: int, hop: int = 512, n_fft: int = 2048) -> np.ndarray:
    """Host-side numpy mirror of _onset_strength_median for the
    accompaniment path, which analyses the NATIVE-rate (44.1 kHz) audio —
    content above the 22.05 kHz analysis band carries the pick transients
    this envelope needs, and a one-off host FFT beats a device round-trip.
    Kept numerically in lockstep with the jnp version
    (tests/test_analysis_modes.py::test_strum_envelope_host_device_parity).

    The arithmetic chain follows librosa 0.10.2 bit-for-bit (the pinned
    reference version): zero ("constant") center padding, float32 frames ×
    float64 Hann window → float64 product, rfft cast to complex64, |.|² in
    float32, float32 mel dot, float32 power_to_db with a whole-array
    top-80 dB floor, positive lag-1 diff, median over the 128 bands, and a
    left pad of lag + n_fft//(2·hop) frames."""
    n = len(y)
    if n < n_fft:
        y = np.pad(y, (0, n_fft - n))
    pad = n_fft // 2
    yp = np.pad(y.astype(np.float32), (pad, pad))  # librosa 0.10.x: constant
    n_frames = 1 + (len(yp) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    w = np.hanning(n_fft + 1)[:-1]  # float64, as librosa leaves get_window
    frames = yp[idx] * w  # float32 × float64 → float64 (librosa's promotion)
    spec = np.fft.rfft(frames, axis=-1).T.astype(np.complex64)
    S = np.abs(spec) ** 2  # float32 [F, T]
    fb = mel_filterbank(sr, n_fft, 128, scale="slaney")  # float32
    M = fb @ S  # float32
    db = (10.0 * np.log10(np.maximum(M, np.float32(1e-10)))).astype(np.float32)
    db = np.maximum(db, db.max() - np.float32(80.0))
    diff = np.maximum(0.0, db[:, 1:] - db[:, :-1])
    flux = np.median(diff, axis=0)
    shift = 1 + n_fft // (2 * hop)
    flux = np.pad(flux, (shift, 0))[: S.shape[1]]
    return flux


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


def _peak_pick_np(env: np.ndarray, delta: float, sr: int, hop: int = 512) -> np.ndarray:
    """librosa.util.peak_pick at onset_detect's operating point, exactly
    (librosa 0.10.2, the reference's pinned version; host numpy — tiny
    arrays, a device round-trip would cost more than the compute):
    pre_max/post_max = 0.03 s/0 s (+1), pre_avg/post_avg = 0.1 s, wait =
    0.03 s (reference strum.py:118-123). The moving max/mean use librosa's
    scipy filters verbatim — maximum_filter1d(mode="constant") and
    uniform_filter1d(mode="nearest") — whose EDGE semantics (edge-value
    replication in the mean) differ from a naive clipped-window mean for
    the first/last ~0.1 s; peaks there decide whether an intro strum
    survives."""
    import scipy.ndimage as ndi

    x = np.asarray(env, dtype=np.float32)
    T = len(x)
    if T == 0:
        return np.zeros(0, dtype=np.int64)
    pre_max = int(np.ceil(0.03 * sr // hop))
    post_max = int(np.ceil(0.00 * sr // hop + 1))
    pre_avg = int(np.ceil(0.10 * sr // hop))
    post_avg = int(np.ceil(0.10 * sr // hop + 1))
    wait = int(np.ceil(0.03 * sr // hop))
    max_origin = int(np.ceil(0.5 * (pre_max - post_max)))
    mov_max = ndi.maximum_filter1d(x, pre_max + post_max, mode="constant", origin=max_origin)
    avg_origin = int(np.ceil(0.5 * (pre_avg - post_avg)))
    mov_avg = ndi.uniform_filter1d(x, pre_avg + post_avg, mode="nearest", origin=avg_origin)
    detections = x * (x == mov_max) * (x >= mov_avg + delta)
    frames: list[int] = []
    last = -np.inf
    for i in np.nonzero(detections)[0]:
        if i > last + wait:
            frames.append(int(i))
            last = int(i)
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
        # librosa.util.normalize: scale by the max (reference strum.py:116)
        return e / (np.abs(e).max() + 1e-9)

    if envelope is not None:
        env_np = _normalize(np.asarray(envelope, dtype=np.float32))
    else:
        env_np = _normalize(_onset_strength_median_host(y, sr, hop)[: len(y) // hop + 1])

    frames = _peak_pick_np(env_np, delta=onset_delta, sr=sr, hop=hop)
    if frames.size == 0:
        return np.asarray([], dtype=np.float32)

    strengths = env_np[np.clip(frames, 0, len(env_np) - 1)]
    # The reference's percentile-40 strength gate exists to prune spurious
    # peaks out of a DENSE detection (strum.py:127-131). When the envelope
    # is already sparse (< ~0.5 peaks/s) our max-normalized median-mel
    # strengths cluster in a narrow band and pct-40 becomes a knife-edge
    # that drops REAL strums on float ties (golden: the 4.87 s and 6.82 s
    # attacks sat exactly at the percentile). Apply it only at high peak
    # density; the absolute 0.1 floor always holds.
    duration_s = len(env_np) * hop / sr
    if len(frames) > 1.0 * max(duration_s, 1.0):
        thr = max(0.1, float(np.percentile(strengths, 40))) - 1e-6
    else:
        thr = 0.1
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
