"""Onset strength and onset detection (vectorized spectral flux + peak pick).

Replaces librosa.onset.onset_strength / onset_detect
(reference: backend/app/services/accompaniment/strum.py:114-123,
analysis/content_classifier.py:45-55). Peak picking follows the classic
pre/post max + mean + delta + wait rule; the `wait` refractory constraint is
a lax.scan so the whole detector stays inside jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .features import melspectrogram
from .spectral import power_to_db


@partial(jax.jit, static_argnames=("sr", "hop", "n_fft", "n_mels", "lag"))
def onset_strength(y, sr: int, hop: int = 512, n_fft: int = 2048, n_mels: int = 128, lag: int = 1):
    """Half-wave-rectified dB mel flux, mean over bands → [..., T]."""
    S = power_to_db(melspectrogram(y, sr, n_fft=n_fft, hop=hop, n_mels=n_mels), top_db=None)
    diff = S[..., :, lag:] - S[..., :, :-lag]
    flux = jnp.maximum(0.0, diff).mean(axis=-2)
    pad = [(0, 0)] * (flux.ndim - 1) + [(lag, 0)]
    return jnp.pad(flux, pad)


def _sliding_reduce(x, pre: int, post: int, kind: str):
    """Max/mean over window [t-pre, t+post] along the last axis."""
    win = pre + post + 1
    pad_val = -jnp.inf if kind == "max" else 0.0
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pre, post)], constant_values=pad_val)
    idx = jnp.arange(x.shape[-1])[:, None] + jnp.arange(win)[None, :]
    w = xp[..., idx]
    if kind == "max":
        return jnp.max(w, axis=-1)
    # mean ignoring the padded region near the edges: window [t-pre, t+post]
    # holds min(t, pre) + min(T-1-t, post) + 1 valid samples
    t_idx = jnp.arange(x.shape[-1])
    count = jnp.minimum(t_idx + post + 1, x.shape[-1] - t_idx + pre)
    count = jnp.minimum(count, win).astype(x.dtype)
    return jnp.sum(w, axis=-1) / count


@partial(jax.jit, static_argnames=("pre_max", "post_max", "pre_avg", "post_avg", "wait"))
def onset_detect_frames(
    env,
    pre_max: int = 3,
    post_max: int = 3,
    pre_avg: int = 3,
    post_avg: int = 5,
    delta: float = 0.07,
    wait: int = 3,
):
    """Peak-pick an onset envelope [T] → boolean onset mask [T] (jittable)."""
    local_max = _sliding_reduce(env, pre_max, post_max, "max")
    local_avg = _sliding_reduce(env, pre_avg, post_avg, "mean")
    cand = (env >= local_max) & (env >= local_avg + delta)

    def step(last_onset, inp):
        t, is_cand = inp
        fire = is_cand & (t - last_onset > wait)
        new_last = jnp.where(fire, t, last_onset)
        return new_last, fire

    T = env.shape[-1]
    _, fired = jax.lax.scan(step, -wait - 1, (jnp.arange(T), cand))
    return fired
