"""DBN beat tracking: the madmom bar-pointer model as a jitted lax.scan.

Capability parity with madmom's DBNBeatTrackingProcessor as used by the
reference (reference: backend/app/services/grid/beats.py:61-89 — 100 fps
activations, 55–215 BPM). The state space is (tempo, phase): each tempo i
has an integer beat interval L_i in frames; the phase advances
deterministically each frame and tempo changes are only allowed at the beat
boundary with an exponential penalty exp(-λ·|ln(L_j/L_i)|), λ=100.

The ragged (tempo-dependent) phase dimension is stored as a padded
[n_tempi, max_interval] score matrix: one frame step = a phase roll + a
max-plus [n_tempi × n_tempi] tempo-transition reduction at phase 0 — all
static shapes, one lax.scan over frames. Beat activation can come from the
BLSTM model (models/beat_rnn.py) or any normalized onset envelope.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=8)
def _tempo_grid(min_bpm: float, max_bpm: float, fps: int) -> np.ndarray:
    min_int = int(np.floor(60.0 * fps / max_bpm))
    max_int = int(np.ceil(60.0 * fps / min_bpm))
    return np.arange(min_int, max_int + 1, dtype=np.int32)  # beat intervals in frames


@lru_cache(maxsize=8)
def _tempo_transition(min_bpm: float, max_bpm: float, fps: int, transition_lambda: float) -> np.ndarray:
    intervals = _tempo_grid(min_bpm, max_bpm, fps).astype(np.float64)
    ratio = intervals[None, :] / intervals[:, None]
    log_t = -transition_lambda * np.abs(np.log(ratio))
    # normalize rows in prob domain
    p = np.exp(log_t)
    p /= p.sum(axis=1, keepdims=True)
    return np.log(p).astype(np.float32)  # [from_tempo, to_tempo]


@partial(jax.jit, static_argnames=("fps", "min_bpm", "max_bpm", "transition_lambda", "observation_lambda"))
def _dbn_forward(
    activations,
    fps: int = 100,
    min_bpm: float = 55.0,
    max_bpm: float = 215.0,
    transition_lambda: float = 100.0,
    observation_lambda: int = 16,
):
    """Viterbi over the bar-pointer model.

    Returns (beat_mask [T] bool, tempo_path [T] int32 interval frames).
    """
    intervals_np = _tempo_grid(min_bpm, max_bpm, fps)
    n_tempi = len(intervals_np)
    max_int = int(intervals_np.max())
    intervals = jnp.asarray(intervals_np)
    log_trans = jnp.asarray(_tempo_transition(min_bpm, max_bpm, fps, transition_lambda))

    act = jnp.clip(jnp.asarray(activations, dtype=jnp.float32), 1e-6, 1.0 - 1e-6)
    T = act.shape[0]

    phase_idx = jnp.arange(max_int)[None, :]  # [1, P]
    valid = phase_idx < intervals[:, None]  # [n_tempi, P]
    # beat window: phase < ceil(L / observation_lambda)
    beat_win = phase_idx < jnp.ceil(intervals[:, None] / observation_lambda).astype(jnp.int32)

    neg_inf = jnp.float32(-1e30)

    def obs(a_t):
        lo_beat = jnp.log(a_t)
        lo_off = jnp.log((1.0 - a_t) / (observation_lambda - 1))
        return jnp.where(beat_win, lo_beat, lo_off)  # [n_tempi, P]

    def step(score, a_t):
        # phase advance: new[i, p] = score[i, p-1]; p=0 gets a tempo-change max
        last_phase = score[jnp.arange(n_tempi), intervals - 1]  # score at L_i-1
        enter0 = jnp.max(last_phase[:, None] + log_trans, axis=0)  # [n_tempi]
        bp_tempo = jnp.argmax(last_phase[:, None] + log_trans, axis=0).astype(jnp.int32)
        shifted = jnp.roll(score, 1, axis=1)
        new_score = shifted.at[:, 0].set(enter0)
        new_score = jnp.where(valid, new_score + obs(a_t), neg_inf)
        return new_score, (bp_tempo, jnp.argmax(new_score))

    init = jnp.where(valid, jnp.log(1.0 / jnp.sum(valid)), neg_inf)
    init = init + obs(act[0])
    final, (bp_tempi, _) = jax.lax.scan(step, init, act[1:], unroll=8)

    # backtrack: state = (tempo, phase); phase decreases by 1 per earlier
    # frame; at phase 0 the previous state was (bp_tempo, L_prev - 1).
    flat_idx = jnp.argmax(final)
    tempo0, phase0 = flat_idx // max_int, flat_idx % max_int

    def back(carry, bp_t):
        tempo, phase = carry
        at_zero = phase == 0
        prev_tempo = jnp.where(at_zero, bp_t[tempo], tempo)
        prev_phase = jnp.where(at_zero, intervals[prev_tempo] - 1, phase - 1)
        return (prev_tempo, prev_phase), (tempo, phase)

    (t0, p0), (tempos_rev, phases_rev) = jax.lax.scan(
        back, (tempo0, phase0), bp_tempi, reverse=True, unroll=8
    )
    tempos = jnp.concatenate([t0[None], tempos_rev])
    phases = jnp.concatenate([p0[None], phases_rev])
    return phases, intervals[tempos]


def dbn_beat_track(
    activations: np.ndarray,
    fps: int = 100,
    min_bpm: float = 55.0,
    max_bpm: float = 215.0,
    transition_lambda: float = 100.0,
    observation_lambda: int = 16,
    threshold: float = 0.05,
) -> np.ndarray:
    """Activation function [T] at `fps` → beat times in seconds."""
    act = np.asarray(activations, dtype=np.float32)
    if act.size < 2:
        return np.asarray([], dtype=np.float32)
    phases, intervals = _dbn_forward(
        act,
        fps=fps,
        min_bpm=min_bpm,
        max_bpm=max_bpm,
        transition_lambda=transition_lambda,
        observation_lambda=observation_lambda,
    )
    return beats_from_decoded(
        np.asarray(phases), np.asarray(intervals), act,
        fps=fps, observation_lambda=observation_lambda, threshold=threshold,
    )


def beats_from_decoded(
    phases: np.ndarray,
    intervals: np.ndarray,
    act: np.ndarray,
    *,
    fps: int = 100,
    observation_lambda: int = 16,
    threshold: float = 0.05,
) -> np.ndarray:
    """Decoded (phase, interval) path + activation → beat times.

    Beat = the max-activation frame inside each decoded beat window
    (phase < ceil(L/observation_lambda)), madmom's peak-selection behavior.
    Used both by dbn_beat_track and by the fused program's on-device decode
    (runtime/fused.py outputs dbn_phases/dbn_intervals).
    """
    T = min(len(act), len(phases))
    phases, intervals, act = phases[:T], intervals[:T], act[:T]
    in_window = phases < np.ceil(intervals / observation_lambda).astype(np.int64)
    frames = []
    t = 0
    while t < T:
        if in_window[t]:
            u = t
            while u + 1 < T and in_window[u + 1]:
                u += 1
            frames.append(t + int(np.argmax(act[t : u + 1])))
            t = u + 1
        else:
            t += 1
    frames = np.asarray(frames, dtype=np.int64)
    # suppress spurious beats in LEADING/TRAILING silence only — madmom's
    # threshold trims the activation envelope at the edges before decoding
    # (DBNBeatTrackingProcessor.threshold / threshold_activations); it
    # never drops interior beats. Dropping interior low-activation beats
    # (the old behavior) punched holes in quasi-periodic beat sequences
    # wherever a soft fingerpicked beat fell below 5 % of the clip max:
    # the golden WAV lost its 4.87 s beat that way (a 1.76 s gap the
    # bar-pointer model itself can never produce).
    if threshold > 0 and frames.size:
        thr = threshold * float(act.max())
        above = np.nonzero(act >= thr)[0]
        if above.size:
            frames = frames[(frames >= above[0]) & (frames <= above[-1] + 1)]
        else:
            frames = frames[:0]
    return (frames / float(fps)).astype(np.float32)


def estimate_tempo(beat_times: np.ndarray) -> float:
    """Tempo = 60 / mean beat interval (reference: grid/beats.py:36-43)."""
    bt = np.asarray(beat_times, dtype=np.float64)
    if bt.size < 2:
        return 0.0
    diffs = np.diff(bt)
    diffs = diffs[np.isfinite(diffs) & (diffs > 0)]
    if diffs.size == 0:
        return 0.0
    return float(60.0 / np.mean(diffs))


def normalize_beat_times(beat_times: np.ndarray | None) -> tuple[np.ndarray | None, float]:
    """Shift beats to start at t=0, returning (beats, offset)
    (reference: grid/beats.py:92-101)."""
    if beat_times is None:
        return None, 0.0
    bt = np.asarray(beat_times, dtype=np.float32)
    bt = bt[np.isfinite(bt)]
    if bt.size == 0:
        return None, 0.0
    bt = np.sort(bt)
    offset = float(bt[0])
    return (bt - offset).astype(np.float32), offset


def estimate_beats(
    y: np.ndarray,
    sr: int,
    *,
    fps: int = 100,
    min_bpm: float = 55.0,
    max_bpm: float = 215.0,
) -> tuple[float, np.ndarray]:
    """Full beat tracking: activation (BLSTM if weights available, else
    spectral-flux onset envelope) → DBN decode → (tempo_bpm, beat_times).

    Mirrors the reference's estimate_beats contract (grid/beats.py:61-89).
    """
    import jax.numpy as jnp2

    from ..models.beat_rnn import beat_activation

    act = np.asarray(beat_activation(jnp2.asarray(y), sr, fps=fps))
    beats = dbn_beat_track(act, fps=fps, min_bpm=min_bpm, max_bpm=max_bpm)
    if beats.size == 0:
        return 0.0, np.asarray([], dtype=np.float32)
    return estimate_tempo(beats), beats
