"""pYIN probabilistic pitch tracking, fully jitted.

Replaces librosa.pyin (reference: backend/app/services/analysis/
content_classifier.py:66-71 uses it for melody-vs-chords classification;
BASELINE config 1 uses it as the monophonic melody transcriber).

Structure (Mauch & Dixon 2014):
  1. YIN difference function per frame via FFT cross-correlation (GEMM/FFT
     friendly, no per-lag loops).
  2. Cumulative-mean-normalized difference (CMNDF).
  3. Probabilistic thresholding: a Beta(2, 18) prior over thresholds
     distributes probability mass over CMNDF troughs.
  4. Trough probabilities → a pitch-bin observation matrix
     (voiced bins + mirrored unvoiced bins).
  5. Banded-transition Viterbi over pitch states as a lax.scan.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .spectral import frame


@lru_cache(maxsize=4)
def _beta_pmf(n_thresholds: int = 100, a: float = 2.0, b: float = 18.0) -> np.ndarray:
    """Discretized Beta(a,b) prior over YIN thresholds in (0, 1]."""
    edges = np.linspace(0, 1, n_thresholds + 1)
    from scipy.stats import beta as _beta

    cdf = _beta.cdf(edges, a, b)
    return np.diff(cdf).astype(np.float32)


def _yin_frames(y, frame_length: int, hop: int):
    """CMNDF [n_frames, max_lag] with max_lag = frame_length // 2."""
    fr = frame(y, frame_length, hop, center=True)  # [T, L]
    L = frame_length
    W = L // 2
    n_fft = 2 * L
    spec_full = jnp.fft.rfft(fr, n=n_fft, axis=-1)
    spec_head = jnp.fft.rfft(fr[..., :W], n=n_fft, axis=-1)
    # cross(tau) = sum_{j<W} x[j] x[j+tau]
    cross = jnp.fft.irfft(spec_full * jnp.conj(spec_head), n=n_fft, axis=-1)[..., : W + 1]
    sq = fr * fr
    csum = jnp.concatenate([jnp.zeros_like(sq[..., :1]), jnp.cumsum(sq, axis=-1)], axis=-1)
    e0 = csum[..., W] - csum[..., 0]  # energy of x[0:W]
    taus = jnp.arange(W + 1)
    e_tau = csum[..., taus + W] - csum[..., taus]  # energy of x[tau:tau+W]
    d = e0[..., None] + e_tau - 2.0 * cross  # difference function [T, W+1]
    d = jnp.maximum(d, 0.0)
    # cumulative mean normalization
    cum = jnp.cumsum(d[..., 1:], axis=-1)
    tau_range = jnp.arange(1, W + 1, dtype=d.dtype)
    cmndf = d[..., 1:] * tau_range / jnp.maximum(cum, 1e-12)
    cmndf = jnp.concatenate([jnp.ones_like(d[..., :1]), cmndf], axis=-1)
    return cmndf  # [T, W+1]


def _parabolic_shift(d):
    """Sub-sample trough refinement: shift in [-0.5, 0.5] per lag."""
    prev = jnp.roll(d, 1, axis=-1)
    nxt = jnp.roll(d, -1, axis=-1)
    denom = 2.0 * (prev + nxt - 2.0 * d)
    shift = jnp.where(jnp.abs(denom) > 1e-9, (prev - nxt) / jnp.maximum(jnp.abs(denom), 1e-9) * jnp.sign(denom), 0.0)
    return jnp.clip(shift, -0.5, 0.5)


@partial(
    jax.jit,
    static_argnames=("sr", "fmin", "fmax", "frame_length", "hop", "n_thresholds", "bins_per_semitone"),
)
def _pyin_observations(
    y,
    sr: int,
    fmin: float,
    fmax: float,
    frame_length: int,
    hop: int,
    n_thresholds: int = 100,
    bins_per_semitone: int = 5,
):
    cmndf = _yin_frames(y, frame_length, hop)  # [T, W+1]
    W = cmndf.shape[-1] - 1
    taus = jnp.arange(W + 1, dtype=jnp.float32)
    tau_min = jnp.floor(sr / fmax).astype(jnp.int32)
    tau_max = jnp.minimum(jnp.ceil(sr / fmin).astype(jnp.int32), W)

    in_range = (taus >= tau_min) & (taus <= tau_max)
    prev = jnp.roll(cmndf, 1, axis=-1)
    nxt = jnp.roll(cmndf, -1, axis=-1)
    is_trough = (cmndf <= prev) & (cmndf <= nxt) & in_range[None, :]
    trough_val = jnp.where(is_trough, cmndf, jnp.inf)

    # Beta-prior thresholding: each threshold sends its mass to the FIRST
    # (smallest-lag) trough whose CMNDF is below it.
    thresholds = (jnp.arange(n_thresholds, dtype=jnp.float32) + 1.0) / n_thresholds
    pmf = jnp.asarray(_beta_pmf(n_thresholds))
    below = trough_val[:, None, :] < thresholds[None, :, None]  # [T, S, W+1]
    any_below = jnp.any(below, axis=-1)
    first_idx = jnp.argmax(below, axis=-1)  # [T, S]
    # fallback: global min trough, with small no-trough probability
    global_min = jnp.argmin(trough_val, axis=-1)  # [T]
    no_trough_prob = 0.01
    chosen = jnp.where(any_below, first_idx, global_min[:, None])
    weight = jnp.where(any_below, pmf[None, :], pmf[None, :] * no_trough_prob)

    T = cmndf.shape[0]
    lag_probs = jnp.zeros((T, W + 1), dtype=jnp.float32)
    lag_probs = jax.vmap(lambda lp, ch, w: lp.at[ch].add(w))(lag_probs, chosen, weight)

    # refine lags and convert to pitch bins
    shift = _parabolic_shift(cmndf)
    refined = taus[None, :] + shift  # [T, W+1]
    f0 = sr / jnp.maximum(refined, 1e-6)
    n_bins = int(round(12 * bins_per_semitone * np.log2(fmax / fmin))) + 1
    bin_idx = jnp.round(12.0 * bins_per_semitone * jnp.log2(jnp.maximum(f0, 1e-6) / fmin)).astype(jnp.int32)
    valid = (bin_idx >= 0) & (bin_idx < n_bins) & (lag_probs > 0)
    bin_idx = jnp.clip(bin_idx, 0, n_bins - 1)

    obs = jnp.zeros((T, n_bins), dtype=jnp.float32)
    obs = jax.vmap(lambda o, b, p: o.at[b].add(p))(obs, bin_idx, jnp.where(valid, lag_probs, 0.0))
    voiced_prob = jnp.clip(obs.sum(-1), 0.0, 1.0)
    return obs, voiced_prob


def _banded_viterbi(log_obs_v, log_obs_u, band: int, switch_prob: float):
    """Viterbi over [voiced bins | unvoiced bins] with banded pitch moves.

    States: 2*B (first B voiced, next B unvoiced). Within-layer transitions
    are a triangular kernel of width `band`; cross-layer keeps the same bin
    with probability switch_prob. Returns (bin path [T], voiced path [T]).
    """
    T, B = log_obs_v.shape
    offsets = jnp.arange(-band, band + 1)
    tri = (band + 1.0 - jnp.abs(offsets)).astype(jnp.float32)
    tri = tri / tri.sum()
    log_tri = jnp.log(tri)
    log_stay = jnp.log1p(-switch_prob)
    log_switch = jnp.log(switch_prob)

    def shift_scores(s):
        """max-plus banded propagation: out[b] = max_d s[b+d] + log_tri[d]."""
        padded = jnp.pad(s, (band, band), constant_values=-jnp.inf)
        idx = jnp.arange(B)[:, None] + (offsets + band)[None, :]
        cand = padded[idx] + log_tri[None, :]
        return jnp.max(cand, axis=-1), jnp.argmax(cand, axis=-1) - band

    def step(carry, obs_t):
        sv, su = carry  # scores [B] voiced, [B] unvoiced
        ov, ou = obs_t
        pv, av = shift_scores(sv)
        pu, au = shift_scores(su)
        # new voiced: from voiced (stay) or unvoiced (switch)
        nv_stay = pv + log_stay
        nv_sw = pu + log_switch
        nv = jnp.maximum(nv_stay, nv_sw) + ov
        nv_from_u = nv_sw > nv_stay
        nu_stay = pu + log_stay
        nu_sw = pv + log_switch
        nu = jnp.maximum(nu_stay, nu_sw) + ou
        nu_from_v = nu_sw > nu_stay
        bp = (av, au, nv_from_u, nu_from_v)
        return (nv, nu), bp

    init = (jnp.full((B,), jnp.log(0.5 / B)), jnp.full((B,), jnp.log(0.5 / B)))
    (fv, fu), bps = jax.lax.scan(step, init, (log_obs_v, log_obs_u), unroll=4)

    end_voiced = jnp.max(fv) >= jnp.max(fu)
    end_bin = jnp.where(end_voiced, jnp.argmax(fv), jnp.argmax(fu))

    def back(carry, bp):
        b, is_v = carry
        av, au, nv_from_u, nu_from_v = bp
        # previous layer, then the bin backpointer FROM THAT layer
        prev_is_v = jnp.where(is_v, ~nv_from_u[b], nu_from_v[b])
        delta = jnp.where(prev_is_v, av[b], au[b])
        prev_b = jnp.clip(b + delta, 0, av.shape[0] - 1)
        return (prev_b, prev_is_v), (b, is_v)

    (_, _), path = jax.lax.scan(back, (end_bin, end_voiced), bps, reverse=True, unroll=4)
    return path  # (bins [T], voiced [T])


@partial(
    jax.jit,
    static_argnames=("sr", "fmin", "fmax", "frame_length", "hop", "bins_per_semitone", "switch_prob", "max_semitones_per_frame"),
)
def pyin(
    y,
    sr: int,
    fmin: float = 65.40639132514966,  # C2
    fmax: float = 2093.004522404789,  # C7
    frame_length: int = 2048,
    hop: int = 512,
    bins_per_semitone: int = 5,
    switch_prob: float = 0.01,
    max_semitones_per_frame: float = 5.0,
):
    """Pitch-track y → (f0 [T] in Hz, voiced_flag [T] bool, voiced_prob [T])."""
    obs, voiced_prob = _pyin_observations(
        y, sr, fmin, fmax, frame_length, hop, bins_per_semitone=bins_per_semitone
    )
    n_bins = int(round(12 * bins_per_semitone * np.log2(fmax / fmin))) + 1
    eps = 1e-10
    log_obs_v = jnp.log(obs + eps)
    # unvoiced evidence is spread uniformly
    log_obs_u = jnp.log(jnp.maximum(1.0 - voiced_prob, eps) / n_bins)[:, None] * jnp.ones_like(obs)
    # band width honors the parameter directly; the 5-semitone default
    # matches librosa pYIN's 35.92 oct/s transition rate at ~86 fps
    band = int(round(max_semitones_per_frame * bins_per_semitone))
    band = max(1, min(band, n_bins - 1))
    bins, voiced = _banded_viterbi(log_obs_v, log_obs_u, band, switch_prob)
    f0 = fmin * 2.0 ** (bins.astype(jnp.float32) / (12.0 * bins_per_semitone))
    return f0, voiced, voiced_prob
