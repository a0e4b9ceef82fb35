"""Chord extraction: chroma features → emissions → Viterbi → segments.

Capability parity with the reference's extractor (reference: backend/app/
services/chords/extract.py:70-132). Chroma comes from the deep-chroma DNN
(models/deepchroma.py) when weights are loaded, otherwise from the GEMM CQT
of the harmonic component at the same 10 fps clock the reference uses.
The decoder is the jitted constant-switch Viterbi (decode/viterbi.py),
then beat-synchronous majority smoothing and min-length segment merging.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..decode.viterbi import viterbi_constant_switch
from ..ops.features import rms
from ..schemas import ChordSegment
from .segments import beat_sync_majority, frames_to_segments
from .templates import build_chord_library, emission_probs

CHROMA_FPS = 10.0


def _pool_matrix(t_in: int, t_out: int) -> np.ndarray:
    """[t_out, t_in] mean-pooling matrix for frame-rate conversion."""
    m = np.zeros((t_out, t_in), dtype=np.float32)
    step = t_in / max(t_out, 1)
    for i in range(t_out):
        a, b = int(i * step), max(int((i + 1) * step), int(i * step) + 1)
        m[i, a:b] = 1.0 / (b - a)
    return m


def salience_chroma(frame_post, t_out: int):
    """AMT frame posteriors [T_amt, 88] → chord chroma [12, t_out] at 10 fps.

    The fundamental-gated salience already suppresses harmonics, which makes
    its pitch-class folding a far cleaner chord feature than raw CQT chroma
    (validated against the reference's golden chord timeline).
    """
    fold = np.zeros((88, 12), dtype=np.float32)
    for p in range(88):
        fold[p, (21 + p) % 12] = 1.0
    pcs = frame_post @ jnp.asarray(fold)  # [T_amt, 12]
    pool = jnp.asarray(_pool_matrix(int(frame_post.shape[0]), t_out))
    return (pool @ pcs).T  # [12, t_out]


def chroma_features(y, sr: int, fps: float = CHROMA_FPS, harmonic_input: bool = True):
    """[12, T] L2-normalized chroma + [T] energy at `fps` frames/sec.

    `y` should already be the harmonic component when harmonic_input is True
    (the pipeline separates it once and reuses it across stages). The chroma
    is the pitch-class folding of the fundamental-gated AMT salience.
    """
    from ..models.basicpitch import salience_posteriors

    hop = int(round(sr / fps))
    yd = jnp.asarray(y)
    t_out = yd.shape[-1] // hop + 1
    _onset, frame_post = salience_posteriors(yd, sr)
    chroma = salience_chroma(frame_post, t_out)  # [12, T]
    norm = jnp.linalg.norm(chroma, axis=0, keepdims=True)
    chroma_norm = chroma / (norm + 1e-9)
    energy = rms(yd, frame_length=2048, hop=hop)
    n = min(chroma_norm.shape[-1], energy.shape[-1])
    energy = energy[:n]
    energy = energy / (jnp.max(energy) + 1e-9)
    return chroma_norm[:, :n], energy


def extract_chords_deep(
    y: np.ndarray,
    sr: int,
    *,
    min_segment_sec: float = 0.25,
    beat_times: np.ndarray | None = None,
    precomputed_chroma: np.ndarray | None = None,
    precomputed_path: tuple[np.ndarray, np.ndarray] | None = None,
) -> tuple[np.ndarray, np.ndarray, list[ChordSegment]]:
    """Deep backend: (deep chroma DNN | CQT chroma) features → CRF Viterbi
    (capability parity with reference deep_chords.py:233-274; the CRF uses
    converted weights when present, else analytic template emissions).
    Pass ``precomputed_chroma`` [12, T] to reuse the fused-analysis chroma,
    and ``precomputed_path`` (path [T], conf [T]) when the CRF decode
    already ran inside the fused program — then this function is pure host
    post-processing (zero device dispatches)."""
    from ..models import crf_chords

    if precomputed_chroma is not None and precomputed_path is not None:
        # the fused program already ran the full deep path (DNN chroma when
        # weights exist — runtime/fused.py 4b' — else salience chroma) and
        # the CRF decode; this branch is pure host post-processing
        chroma_np = np.asarray(precomputed_chroma)
        path_np = np.asarray(precomputed_path[0]).copy()
        conf_np = np.asarray(precomputed_path[1])
    else:
        from ..models.deepchroma import load_params as load_dc

        dc_params = load_dc()
        if dc_params is not None:
            from ..models.deepchroma import deep_chroma_apply

            chroma_np = deep_chroma_apply(dc_params, y, sr)  # [12, T]
            chroma = jnp.asarray(chroma_np)
        elif precomputed_chroma is not None:
            chroma = jnp.asarray(precomputed_chroma)
            chroma_np = np.asarray(precomputed_chroma)
        else:
            chroma, _energy = chroma_features(y, sr)
            chroma_np = np.asarray(chroma)

        crf_params = crf_chords.load_params() or crf_chords.template_emission_params()
        feats = jnp.transpose(chroma, (1, 0))  # [T, 12]
        norm = jnp.linalg.norm(feats, axis=1, keepdims=True)
        feats = feats / jnp.maximum(norm, 1e-9)
        # silence gate (mirrors runtime/fused.py 4b'): zero near-silent
        # frames so the CRF extends a neighbor instead of decoding noise
        hop = int(round(sr / CHROMA_FPS))
        energy = np.asarray(rms(jnp.asarray(y), frame_length=2048, hop=hop))
        energy = energy / (energy.max() + 1e-9)
        if energy.shape[0] < feats.shape[0]:
            energy = np.pad(energy, (0, feats.shape[0] - energy.shape[0]), constant_values=1.0)
        feats = feats * jnp.asarray(
            (energy[: feats.shape[0]] > crf_chords.SILENCE_GATE_FRAC).astype(np.float32)
        )[:, None]
        path, conf = crf_chords.decode(crf_params, feats)
        path_np, conf_np = np.asarray(path).copy(), np.asarray(conf)

    # beat-sync smoothing reuses the same majority vote; the proxy carries
    # the frame confidence at EVERY state so frames relabeled by the vote
    # keep their confidence instead of reading 0
    emissions_proxy = np.broadcast_to(
        conf_np[None, :], (crf_chords.N_STATES, path_np.shape[0])
    ).copy()
    path_np, conf_np = beat_sync_majority(path_np, emissions_proxy, beat_times, CHROMA_FPS)

    times = np.arange(path_np.shape[0], dtype=np.float32) / CHROMA_FPS
    segments = frames_to_segments(
        path_np, conf_np, times, crf_chords.LABELS, min_len=min_segment_sec
    )
    return chroma_np, times, segments


def extract_chords(
    y: np.ndarray,
    sr: int,
    *,
    vocab: str = "majmin7",
    switch_penalty: float = 2.5,
    min_segment_sec: float = 0.25,
    beat_times: np.ndarray | None = None,
    deep_params=None,
    backend: str | None = None,
) -> tuple[np.ndarray, np.ndarray, list[ChordSegment]]:
    """→ (chroma [12, T], times [T] s, chord segments).

    Backend dispatch mirrors the reference (extract.py:86-96):
    "deep" = chroma DNN + CRF; "template" = templates + constant-switch
    Viterbi. Default comes from settings.CHORD_DETECTION_BACKEND.
    """
    if backend is None:
        from .. import config

        backend = config.settings.CHORD_DETECTION_BACKEND
    if backend == "deep":
        return extract_chords_deep(
            y, sr, min_segment_sec=min_segment_sec, beat_times=beat_times
        )
    if deep_params is not None:
        from ..models.deepchroma import deep_chroma_apply

        chroma_np = deep_chroma_apply(deep_params, y, sr)  # [12, T] at 10 fps
        energy = np.clip(chroma_np.mean(axis=0), 0.0, 1.0)
        chroma = jnp.asarray(chroma_np / (np.linalg.norm(chroma_np, axis=0, keepdims=True) + 1e-9))
        energy = jnp.asarray(energy)
    else:
        chroma, energy = chroma_features(y, sr)

    labels, templates = build_chord_library(vocab)
    emissions = emission_probs(chroma, energy, labels, templates)
    path, conf = viterbi_constant_switch(emissions, switch_penalty)

    emissions_np = np.asarray(emissions)
    path_np = np.asarray(path)
    path_np, conf_np = beat_sync_majority(path_np, emissions_np, beat_times, CHROMA_FPS)

    T = path_np.shape[0]
    times = np.arange(T, dtype=np.float32) / CHROMA_FPS
    segments = frames_to_segments(path_np, conf_np, times, labels, min_len=min_segment_sec)
    return np.asarray(chroma), times, segments
