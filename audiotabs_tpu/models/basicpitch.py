"""Polyphonic AMT: the Basic Pitch (ICASSP-2022) architecture in JAX.

Capability parity with the reference's AMT stage (reference dependency N4,
SURVEY.md §2a; invoked at backend/app/services/amt/basic_pitch.py:26-102):
audio → onset/frame/contour posteriors → note events.

Two posterior paths share one decoder:
  * ``cnn_posteriors`` — the Basic Pitch CNN on a harmonically-stacked CQT
    (3 bins/semitone from A0, harmonics 0.5,1..7, hop 256 ≈ 86 fps), built
    with lax.conv as a parameter pytree; ``init_params`` gives a random
    init, ``load_params`` loads a converted checkpoint (npz). Heads follow
    the published topology: contour (sigmoid over 264 bins), note (strided
    conv → 88 bins), onset (conv on hCQT ⊕ note → 88 bins).
  * ``salience_posteriors`` — the dependency-free default: harmonic-sum
    salience over the GEMM CQT (weights 0.9^h), frame posterior from the
    normalized salience, onset posterior from its half-wave-rectified
    temporal difference. Fully functional polyphonic transcription without
    pretrained weights.

The posterior→note decoding matches Basic Pitch's semantics: onsets above
threshold open notes, frames extend them (with a short tolerance gap), the
"melodia trick" then recovers onset-less notes from leftover frame energy,
and minimum-length/pitch-range filters apply.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp

from ..theory.events import NoteEvent

FMIN = 27.5  # A0
BINS_PER_SEMITONE = 3
N_SEMITONES = 88
N_BINS = N_SEMITONES * BINS_PER_SEMITONE  # 264
HOP = 256
HARMONICS = (0.5, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0)
MIDI_A0 = 21


# ---------------------------------------------------------------- frontend --


@partial(jax.jit, static_argnames=("sr",))
def hcqt(y, sr: int):
    """Harmonic CQT [H, n_bins, T] at 3 bins/semitone from A0."""
    from ..ops.cqt import hybrid_cqt

    return hybrid_cqt(
        y,
        sr,
        hop=HOP,
        fmin=FMIN,
        n_bins=N_BINS,
        bins_per_octave=12 * BINS_PER_SEMITONE,
        harmonics=HARMONICS,
    )


# ------------------------------------------------------------ CNN variant --


def _conv(x, w, b, stride=(1, 1)):
    """x: [H, W, C_in] (freq, time, chan) → [H', W', C_out], SAME padding."""
    out = jax.lax.conv_general_dilated(
        x[None],
        w,
        window_strides=stride,
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]
    return out + b


def init_params(rng: jax.Array) -> dict:
    """Random init of the Basic Pitch CNN topology."""
    k = jax.random.split(rng, 8)

    def w(key, shape):
        fan_in = int(np.prod(shape[:3]))
        return jax.random.normal(key, shape) * (1.0 / np.sqrt(fan_in))

    return {
        # contour head: hCQT [264, T, 8] → [264, T, 1]
        "c1_w": w(k[0], (5, 5, len(HARMONICS), 16)),
        "c1_b": jnp.zeros((16,)),
        "c2_w": w(k[1], (39, 3, 16, 8)),
        "c2_b": jnp.zeros((8,)),
        "c3_w": w(k[2], (5, 5, 8, 1)),
        "c3_b": jnp.zeros((1,)),
        # note head: contour [264, T, 1] → strided (3,1) → [88, T, 1]
        "n1_w": w(k[3], (7, 7, 1, 32)),
        "n1_b": jnp.zeros((32,)),
        "n2_w": w(k[4], (7, 3, 32, 1)),
        "n2_b": jnp.zeros((1,)),
        # onset head: hCQT strided conv ⊕ note → [88, T, 1]
        "o1_w": w(k[5], (5, 5, len(HARMONICS), 32)),
        "o1_b": jnp.zeros((32,)),
        "o2_w": w(k[6], (3, 3, 33, 1)),
        "o2_b": jnp.zeros((1,)),
    }


@jax.jit
def cnn_apply(params: dict, hc):
    """hc: [H, n_bins, T] → (onset [T, 88], frame [T, 88], contour [T, 264])."""
    x = jnp.transpose(hc, (1, 2, 0))  # [freq, time, harmonics]
    x = jnp.log1p(10.0 * x)
    x = (x - jnp.mean(x)) / (jnp.std(x) + 1e-5)

    c = jax.nn.relu(_conv(x, params["c1_w"], params["c1_b"]))
    c = jax.nn.relu(_conv(c, params["c2_w"], params["c2_b"]))
    contour = jax.nn.sigmoid(_conv(c, params["c3_w"], params["c3_b"]))  # [264, T, 1]

    n = jax.nn.relu(_conv(contour, params["n1_w"], params["n1_b"], stride=(BINS_PER_SEMITONE, 1)))
    note = jax.nn.sigmoid(_conv(n, params["n2_w"], params["n2_b"]))  # [88, T, 1]

    o = jax.nn.relu(_conv(x, params["o1_w"], params["o1_b"], stride=(BINS_PER_SEMITONE, 1)))
    o = jnp.concatenate([o, note], axis=-1)
    onset = jax.nn.sigmoid(_conv(o, params["o2_w"], params["o2_b"]))  # [88, T, 1]

    return (
        jnp.transpose(onset[..., 0], (1, 0)),
        jnp.transpose(note[..., 0], (1, 0)),
        jnp.transpose(contour[..., 0], (1, 0)),
    )


@lru_cache(maxsize=2)
def _load_params_cached(path: str) -> dict | None:
    if not path or not os.path.exists(path):
        return None
    data = np.load(path)
    # numpy on purpose: loading can happen at fused-program trace time, and
    # jnp arrays created inside a trace would leak tracers into this cache
    return {k: np.asarray(v) for k, v in data.items()}


def default_weights_path() -> str:
    """Checked-in trained weights; BASICPITCH_WEIGHTS overrides ('off'
    disables and falls back to the weight-free salience path)."""
    env = os.environ.get("BASICPITCH_WEIGHTS")
    if env is not None:
        return "" if env.lower() in ("off", "none", "0") else env
    from pathlib import Path

    return str(Path(__file__).resolve().parent.parent / "weights" / "basicpitch.npz")


def load_params(path: str | None = None) -> dict | None:
    return _load_params_cached(path or default_weights_path())


# ------------------------------------------------------- salience variant --


@partial(jax.jit, static_argnames=("sr",))
def salience_posteriors(y, sr: int):
    """Fundamental-gated harmonic salience → (onset [T, 88], frame [T, 88]).

    S(b) = A(f_b) · (1 + Σ_{h≥2} w_h·Â(h·f_b)): a bin needs DIRECT energy
    at its own frequency (which kills the subharmonic ghosts a plain
    harmonic sum produces at f0/2, f0/3, …), and upper-harmonic support
    only boosts it. A mild penalty applies when the half-frequency bin is
    strong (the bin is then likely itself a harmonic of a lower note).
    """
    hc = hcqt(y, sr)  # [H, 264, T]; rows follow HARMONICS (0.5, 1, 2, ..7)
    peak = jnp.max(hc[1])
    A = hc / (peak + 1e-8)  # normalized magnitude per harmonic row
    fundamental = A[1]
    boost = 1.0 + sum(0.9 ** (i - 1) * A[i] for i in range(2, len(HARMONICS)))
    sub_penalty = 1.0 - 0.5 * jnp.clip(A[0] - fundamental, 0.0, 1.0)
    sal = fundamental * boost * sub_penalty  # [264, T]
    sal = jnp.where(peak > 1e-4, sal, jnp.zeros_like(sal))
    # collapse 3 bins/semitone → 88 semitones (max over sub-bins)
    sal = sal.reshape(N_SEMITONES, BINS_PER_SEMITONE, -1).max(axis=1)  # [88, T]

    # Local normalization: a loud chorus must not push the frame posteriors
    # of a quiet verse below threshold (whole-song percentile did exactly
    # that). The normalizer is a bidirectional exponential-decay max
    # envelope over ~0.75 s block maxima — it tracks the local level,
    # relaxes ~20 dB within a few seconds of a loud section, and is floored
    # at 5% of the song peak so true silence isn't amplified into notes.
    stride = 64  # frames ≈ 0.75 s at ~86 fps
    T = sal.shape[-1]
    nblk = max(1, -(-T // stride))
    s_pad = jnp.pad(sal, ((0, 0), (0, nblk * stride - T)))
    m = s_pad.reshape(sal.shape[0], nblk, stride).max(axis=(0, 2))  # [nblk]
    decay = 0.6  # per block → -20 dB in ~3.4 s

    def _env(carry, x):
        e = jnp.maximum(x, decay * carry)
        return e, e

    _, fwd = jax.lax.scan(_env, 0.0, m)
    _, bwd = jax.lax.scan(_env, 0.0, m, reverse=True)
    norm = jnp.maximum(jnp.maximum(fwd, bwd), 0.05 * jnp.max(sal))
    norm_t = jnp.repeat(norm, stride)[:T]  # [T]
    frame_post = jnp.clip(sal / (norm_t[None, :] + 1e-2), 0.0, 1.0)

    diff = frame_post[:, 1:] - frame_post[:, :-1]
    onset_post = jnp.concatenate([frame_post[:, :1], jnp.maximum(diff, 0.0)], axis=1) * 2.0
    onset_post = jnp.clip(onset_post, 0.0, 1.0)
    return jnp.transpose(onset_post, (1, 0)), jnp.transpose(frame_post, (1, 0))


# ----------------------------------------------------------------- decode --


def notes_from_posteriors(
    onset: np.ndarray,
    frame: np.ndarray,
    *,
    fps: float,
    onset_threshold: float = 0.5,
    frame_threshold: float = 0.3,
    min_note_ms: float = 127.70,
    melodia_trick: bool = True,
    gap_tolerance_frames: int = 3,
) -> list[NoteEvent]:
    """Posteriors [T, 88] → note events (Basic Pitch decoding semantics)."""
    onset = np.asarray(onset)
    frame = np.asarray(frame)
    T, P = frame.shape
    min_frames = max(1, int(round(min_note_ms / 1000.0 * fps)))
    remaining = frame.copy()
    events: list[NoteEvent] = []

    # local onset peaks per pitch
    peaks = (
        (onset >= onset_threshold)
        & (onset >= np.roll(onset, 1, axis=0))
        & (onset >= np.roll(onset, -1, axis=0))
    )
    peaks[0] = onset[0] >= onset_threshold
    peaks[-1] &= False

    def track(t0: int, p: int) -> int:
        """Extend a note from frame t0 while the frame posterior stays on.
        Returns the EXCLUSIVE end frame (one past the last on-frame)."""
        t = t0
        gap = 0
        while t < T:
            if remaining[t, p] >= frame_threshold:
                gap = 0
            else:
                gap += 1
                if gap > gap_tolerance_frames:
                    t += 1  # uniform exit: t is one past the examined frame
                    break
            t += 1
        return t - gap

    for t0, p in zip(*np.nonzero(peaks)):
        if remaining[t0, p] < frame_threshold and onset[t0, p] < onset_threshold:
            continue
        t1 = track(t0, p)
        if t1 - t0 >= min_frames:
            amp = float(np.clip(np.mean(frame[t0:t1, p]), 0.0, 1.0))
            events.append(
                NoteEvent(
                    start_time_s=t0 / fps,
                    end_time_s=t1 / fps,
                    pitch_midi=MIDI_A0 + int(p),
                    velocity=int(np.clip(40 + 87 * amp, 1, 127)),
                    amplitude=amp,
                )
            )
            remaining[t0:t1, p] = 0.0

    if melodia_trick:
        # recover onset-less notes from leftover frame energy, loudest first
        masked = remaining.copy()
        while True:
            t0, p = np.unravel_index(np.argmax(masked), masked.shape)
            if masked[t0, p] < frame_threshold:
                break
            # walk backwards to the note start
            s = t0
            gap = 0
            while s > 0:
                if remaining[s - 1, p] >= frame_threshold:
                    gap = 0
                else:
                    gap += 1
                    if gap > gap_tolerance_frames:
                        s -= 1  # uniform exit: s is one past the examined frame
                        break
                s -= 1
            s = min(t0, s + gap)  # undo the tolerated gap, never past the seed
            t1 = track(t0, p)
            masked[s : max(t1, t0 + 1), p] = 0.0  # always clear the seed frame
            if t1 - s >= min_frames:
                amp = float(np.clip(np.mean(frame[s:t1, p]), 0.0, 1.0))
                events.append(
                    NoteEvent(
                        start_time_s=s / fps,
                        end_time_s=t1 / fps,
                        pitch_midi=MIDI_A0 + int(p),
                        velocity=int(np.clip(40 + 87 * amp, 1, 127)),
                        amplitude=amp,
                    )
                )
                remaining[s:t1, p] = 0.0

    # suppress spectral-leakage neighbors: an event loses to a co-occurring
    # event one semitone away with clearly higher amplitude
    keep = [True] * len(events)
    for i, a in enumerate(events):
        for j, b in enumerate(events):
            if i == j or abs(a.pitch_midi - b.pitch_midi) != 1:
                continue
            ov = min(a.end_time_s, b.end_time_s) - max(a.start_time_s, b.start_time_s)
            if ov > 0.8 * (a.end_time_s - a.start_time_s) and b.amplitude > 1.4 * a.amplitude:
                keep[i] = False
                break
    events = [e for e, k in zip(events, keep) if k]

    return sorted(events, key=lambda e: e.start_time_s)


def transcribe_polyphonic(
    y: np.ndarray,
    sr: int,
    *,
    onset_threshold: float = 0.5,
    frame_threshold: float = 0.3,
    min_note_ms: float = 127.70,
    melodia_trick: bool = True,
    params: dict | None = None,
) -> list[NoteEvent]:
    """Full polyphonic transcription (CNN if weights loaded, else salience)."""
    yd = jnp.asarray(np.asarray(y, dtype=np.float32))
    p = params if params is not None else load_params()
    if p is not None:
        onset, frame_post, _ = cnn_apply(p, hcqt(yd, sr))
    else:
        onset, frame_post = salience_posteriors(yd, sr)
        # the salience frame posterior runs hotter than a calibrated CNN's;
        # rescale the caller's CNN-calibrated thresholds into its range
        onset_threshold = min(onset_threshold, 0.45)
        frame_threshold = min(frame_threshold, 0.35)
    fps = sr / HOP
    return notes_from_posteriors(
        np.asarray(onset),
        np.asarray(frame_post),
        fps=fps,
        onset_threshold=onset_threshold,
        frame_threshold=frame_threshold,
        min_note_ms=min_note_ms,
        melodia_trick=melodia_trick,
    )


def chroma_from_note_events(events: list[NoteEvent], n_frames: int, fps: float) -> np.ndarray:
    """[12, n_frames] chroma matrix from note events
    (reference: amt/basic_pitch.py:116-156)."""
    out = np.zeros((12, n_frames), dtype=np.float32)
    for ev in events:
        a = int(np.clip(ev.start_time_s * fps, 0, n_frames - 1))
        b = int(np.clip(ev.end_time_s * fps, a + 1, n_frames))
        out[ev.pitch_midi % 12, a:b] += ev.amplitude
    m = out.max()
    return out / m if m > 0 else out
