"""Sample-rate conversion.

Host path: scipy polyphase (fast, exact). Device path: windowed-sinc
polyphase expressed as a strided matmul so XLA can put it on the MXU —
the TPU-native replacement for ffmpeg's soxr stage
(reference: backend/app/services/audio.py:7-16).
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np


def resample_poly_host(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase resampling on the host (C++ fast path, scipy fallback)."""
    if sr_in == sr_out:
        return np.asarray(x, dtype=np.float32)
    try:
        from .native import resample_native

        y = resample_native(x, sr_in, sr_out)
        if y is not None:
            return y
    except Exception:
        pass
    from scipy.signal import resample_poly

    g = math.gcd(sr_in, sr_out)
    y = resample_poly(np.asarray(x, dtype=np.float64), sr_out // g, sr_in // g)
    return y.astype(np.float32)


@lru_cache(maxsize=16)
def _polyphase_bank(up: int, down: int, taps_per_phase: int = 24) -> np.ndarray:
    """Windowed-sinc filter bank [up, taps] for rational rate up/down."""
    cutoff = min(1.0 / up, 1.0 / down)
    half = taps_per_phase * up // 2
    n = np.arange(-half, half + 1, dtype=np.float64)
    h = up * cutoff * np.sinc(cutoff * n)
    h *= np.kaiser(len(n), beta=8.6)
    # pad to a multiple of up and fold into phases
    pad = (-len(h)) % up
    h = np.concatenate([h, np.zeros(pad)])
    bank = h.reshape(-1, up).T[:, ::-1]  # [up, taps], time-reversed for dot
    return np.ascontiguousarray(bank[:, ::-1]).astype(np.float32)


def resample_kernel_jax(x, sr_in: int, sr_out: int):
    """Rational resampling as a gather + GEMM, jit-friendly (static shapes).

    For each output sample t: phase p = (t*down) % up, input offset
    k = (t*down) // up; y[t] = dot(bank[p], x[k - taps//2 : ...]).
    Implemented by building the [T_out, taps] gather of x then a batched
    row-wise dot — XLA fuses this into one pass.
    """
    import jax.numpy as jnp

    if sr_in == sr_out:
        return x
    g = math.gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    bank = _polyphase_bank(up, down)  # [up, taps]
    taps = bank.shape[1]
    n_in = x.shape[-1]
    n_out = int(n_in * up // down)

    t = jnp.arange(n_out)
    phase = (t * down) % up
    base = (t * down) // up - taps // 2
    idx = base[:, None] + jnp.arange(taps)[None, :]  # [T_out, taps]
    idx = jnp.clip(idx, 0, n_in - 1)
    valid = (base[:, None] + jnp.arange(taps)[None, :] >= 0) & (
        base[:, None] + jnp.arange(taps)[None, :] < n_in
    )
    gathered = jnp.where(valid, x[..., idx], 0.0)  # [..., T_out, taps]
    coeffs = jnp.asarray(bank)[phase]  # [T_out, taps]
    return jnp.sum(gathered * coeffs, axis=-1)
