"""Content classification: melodic vs chordal vs hybrid sections.

Capability parity with the reference's classifier (reference: backend/app/
services/analysis/content_classifier.py:45-374): 3 s windows with 1.5 s
hop, four metrics (pYIN pitch dispersion, onset density, onset-autocorr
periodicity in the 60–200 BPM lag band, HPSS harmonic ratio) and the same
rule-based scoring.

TPU-first difference: instead of the reference's per-window Python loop
(each window separately invoking pyin/hpss/onset), ALL windows are stacked
into one [n_windows, window_samples] batch and every metric is computed by
a single vmapped jitted program — one compile, one device round-trip.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from enum import Enum
from functools import partial
from typing import Literal

import numpy as np

import jax
import jax.numpy as jnp

_LOG = logging.getLogger(__name__)

PITCH_DISPERSION_MELODIC = 4.0
PITCH_DISPERSION_CHORDAL = 2.0
ONSET_DENSITY_CHORDAL = 6.0
ONSET_DENSITY_MELODIC = 3.0
PERIODICITY_CHORDAL = 0.4
HARMONIC_RATIO_MELODIC = 0.6


class ContentType(str, Enum):
    MELODIC = "melodic"
    CHORDAL = "chordal"
    HYBRID = "hybrid"


@dataclass(frozen=True)
class ContentSegment:
    start_time_s: float
    end_time_s: float
    content_type: Literal["melodic", "chordal", "hybrid"]
    confidence: float
    metrics: dict = field(default_factory=dict)


@partial(jax.jit, static_argnames=("sr",))
def _window_metrics(windows, sr: int):
    """[W, N] batch of windows → per-window metric vectors."""
    from ..ops.hpss import hpss_masks
    from ..ops.onset import onset_detect_frames, onset_strength
    from ..ops.pyin import pyin
    from ..ops.spectral import stft

    hop = 512
    n = windows.shape[-1]
    dur = n / sr

    def one(y):
        # onset envelope + density
        env = onset_strength(y, sr, hop=hop, n_fft=1024)
        onsets = onset_detect_frames(env, delta=0.5, wait=4)
        onset_density = jnp.sum(onsets) / dur

        # periodicity: onset autocorr peak in the 60-200 BPM lag band
        e = env - jnp.mean(env)
        norm = jnp.linalg.norm(e)
        e = e / jnp.maximum(norm, 1e-6)
        ac = jnp.correlate(e, e, mode="full")[e.shape[0] - 1 :]
        min_lag = max(1, int(sr * 60 / (200 * hop)))
        max_lag = max(min_lag + 1, int(sr * 60 / (60 * hop)))
        periodicity = jnp.clip(jnp.max(ac[min_lag:max_lag]), 0.0, 1.0)
        periodicity = jnp.where(norm < 1e-6, 0.0, periodicity)

        # pitch dispersion (std of voiced midi pitches)
        f0, voiced, _ = pyin(
            y, sr, fmin=82.40688922821748, fmax=1318.5102276514797, frame_length=2048, hop=512
        )  # E2..E6
        midi = 69.0 + 12.0 * jnp.log2(jnp.maximum(f0, 1e-6) / 440.0)
        w = voiced.astype(jnp.float32)
        cnt = jnp.sum(w)
        mean = jnp.sum(midi * w) / jnp.maximum(cnt, 1.0)
        var = jnp.sum(w * (midi - mean) ** 2) / jnp.maximum(cnt, 1.0)
        dispersion = jnp.where(cnt >= 2, jnp.sqrt(var), 0.0)

        # harmonic ratio via HPSS masks in the spectral domain (energy of the
        # masked spectrogram ≈ energy of the separated waveform)
        S = jnp.abs(stft(y, n_fft=1024, hop=hop))
        mh, mp = hpss_masks(S, 17, 17, use_pallas=False)
        eh = jnp.sum((S * mh) ** 2)
        ep = jnp.sum((S * mp) ** 2)
        ratio = jnp.where(eh + ep > 1e-9, eh / (eh + ep), 0.5)
        return dispersion, onset_density, periodicity, ratio

    return jax.vmap(one)(windows)


def classify_metrics(
    pitch_dispersion: float, onset_density: float, periodicity: float, harmonic_ratio: float
) -> tuple[ContentType, float]:
    """Rule-based scoring (reference: content_classifier.py:136-193)."""
    melodic = chordal = 0.0
    if pitch_dispersion >= PITCH_DISPERSION_MELODIC:
        melodic += 2.0
    elif pitch_dispersion <= PITCH_DISPERSION_CHORDAL:
        chordal += 2.0
    else:
        melodic += 0.5
        chordal += 0.5
    if onset_density >= ONSET_DENSITY_CHORDAL:
        chordal += 1.5
    elif onset_density <= ONSET_DENSITY_MELODIC:
        melodic += 1.0
    else:
        melodic += 0.5
        chordal += 0.5
    if periodicity >= PERIODICITY_CHORDAL:
        chordal += 1.5
    else:
        melodic += 0.5
    if harmonic_ratio >= HARMONIC_RATIO_MELODIC:
        melodic += 1.0
    else:
        chordal += 0.5

    total = melodic + chordal
    if total < 1e-6:
        return ContentType.HYBRID, 0.5
    confidence = min(1.0, abs(melodic - chordal) / total + 0.3)
    if melodic > chordal * 1.3:
        return ContentType.MELODIC, confidence
    if chordal > melodic * 1.3:
        return ContentType.CHORDAL, confidence
    return ContentType.HYBRID, max(0.3, confidence - 0.2)


def analyze_musical_content(
    y: np.ndarray,
    sr: int,
    *,
    window_sec: float = 3.0,
    hop_sec: float = 1.5,
    min_segment_sec: float = 1.0,
    precomputed: tuple[np.ndarray, np.ndarray] | None = None,
) -> list[ContentSegment]:
    """Classify sections. ``precomputed`` = (window start samples, [W, 4]
    metric matrix) from the fused analysis program skips the device pass."""
    y = np.asarray(y)
    duration = len(y) / sr

    if precomputed is not None:
        starts_s, metrics = precomputed
        spans = [(int(p) / sr, min((int(p) + int(window_sec * sr)), len(y)) / sr) for p in starts_s]
        disp, dens, per, harm = (np.asarray(metrics)[:, i] for i in range(4))
        return _segments_from_metrics(spans, disp, dens, per, harm, min_segment_sec)

    y = np.asarray(y, dtype=np.float32)
    win = int(window_sec * sr)
    hop = int(hop_sec * sr)
    if duration < min_segment_sec or len(y) < win:
        pad = np.zeros(max(win, int(sr)), dtype=np.float32)
        pad[: len(y)] = y
        d, od, p, h = (float(np.asarray(v)[0]) for v in _window_metrics(pad[None, :], sr))
        ctype, conf = classify_metrics(d, od, p, h)
        return [
            ContentSegment(0.0, duration, ctype.value, conf, {
                "pitch_dispersion": d, "onset_density": od, "periodicity": p, "harmonic_ratio": h,
            })
        ]

    starts = list(range(0, len(y) - int(0.5 * sr), hop))
    windows = np.zeros((len(starts), win), dtype=np.float32)
    spans = []
    for i, pos in enumerate(starts):
        end = min(pos + win, len(y))
        windows[i, : end - pos] = y[pos:end]
        spans.append((pos / sr, end / sr))

    disp, dens, per, harm = (np.asarray(v) for v in _window_metrics(windows, sr))
    return _segments_from_metrics(spans, disp, dens, per, harm, min_segment_sec)


def _segments_from_metrics(
    spans, disp, dens, per, harm, min_segment_sec: float
) -> list[ContentSegment]:
    raw = []
    for i, (t0, t1) in enumerate(spans):
        ctype, conf = classify_metrics(float(disp[i]), float(dens[i]), float(per[i]), float(harm[i]))
        raw.append((t0, t1, ctype, conf, {
            "pitch_dispersion": float(disp[i]), "onset_density": float(dens[i]),
            "periodicity": float(per[i]), "harmonic_ratio": float(harm[i]),
        }))

    if not raw:
        return [ContentSegment(0.0, 0.0, ContentType.HYBRID.value, 0.5, {})]

    # merge consecutive same-type windows
    merged: list[ContentSegment] = []
    cs, ce, ct, conf_sum, mlist, cnt = raw[0][0], raw[0][1], raw[0][2], raw[0][3], [raw[0][4]], 1
    for t0, t1, ctype, conf, m in raw[1:]:
        if ctype == ct:
            ce, conf_sum, cnt = t1, conf_sum + conf, cnt + 1
            mlist.append(m)
        else:
            avg = {k: float(np.mean([mm[k] for mm in mlist])) for k in mlist[0]}
            merged.append(ContentSegment(cs, ce, ct.value, conf_sum / cnt, avg))
            cs, ce, ct, conf_sum, mlist, cnt = t0, t1, ctype, conf, [m], 1
    avg = {k: float(np.mean([mm[k] for mm in mlist])) for k in mlist[0]}
    merged.append(ContentSegment(cs, ce, ct.value, conf_sum / cnt, avg))

    # absorb short segments into the longer neighbor
    final: list[ContentSegment] = []
    for seg in merged:
        if seg.end_time_s - seg.start_time_s < min_segment_sec and final:
            prev = final[-1]
            keep = (
                prev.content_type
                if prev.end_time_s - prev.start_time_s >= seg.end_time_s - seg.start_time_s
                else seg.content_type
            )
            final[-1] = ContentSegment(
                prev.start_time_s, seg.end_time_s, keep,
                (prev.confidence + seg.confidence) / 2, prev.metrics,
            )
        else:
            final.append(seg)

    _LOG.info(
        "content analysis: %d segments (melodic=%d chordal=%d hybrid=%d)",
        len(final),
        sum(1 for s in final if s.content_type == "melodic"),
        sum(1 for s in final if s.content_type == "chordal"),
        sum(1 for s in final if s.content_type == "hybrid"),
    )
    return final
