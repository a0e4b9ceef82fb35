"""Global key classification CNN (madmom CNNKeyRecognitionProcessor in JAX).

Capability parity with reference dependency N8 (SURVEY.md §2a; invoked at
backend/app/services/theory/key.py:99-178): a small CNN over a log-filtered
spectrogram producing 24 class probabilities (12 major + 12 minor), one
global prediction per song. ``key_prediction_to_label`` mirrors madmom's
ordering. Without converted weights the pipeline's Krumhansl estimator
(theory/key.py) remains the default.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..theory.vocabulary import NOTE_NAMES_SHARP

N_CLASSES = 24  # 12 major then 12 minor


def key_prediction_to_label(probs: np.ndarray) -> str:
    """argmax over 24 classes → 'C major' style label (madmom ordering)."""
    probs = np.asarray(probs).reshape(-1)
    idx = int(np.argmax(probs))
    tonic = NOTE_NAMES_SHARP[idx % 12]
    mode = "major" if idx < 12 else "minor"
    return f"{tonic} {mode}"


@partial(jax.jit, static_argnames=("sr",))
def features(y, sr: int):
    """Log-filtered spectrogram [T, B, 1] at ~5 fps for the CNN."""
    from .deepchroma import _filterbank
    from ..ops.spectral import frame as frame_signal, hann_window

    n_fft = 8192 if sr > 30000 else 4096
    hop = sr // 5
    frames = frame_signal(y, n_fft, hop, center=True)
    w = jnp.asarray(hann_window(n_fft))
    mag = jnp.abs(jnp.fft.rfft(frames * w, axis=-1))
    fb = jnp.asarray(_filterbank(sr, n_fft))
    return jnp.log1p(mag @ fb.T)[..., None]  # [T, B, 1]


def init_params(rng: jax.Array, n_bands: int = 120) -> dict:
    k = jax.random.split(rng, 4)

    def he(key, shape):
        return jax.random.normal(key, shape) * np.sqrt(2.0 / np.prod(shape[:-1]))

    return {
        "c1_w": he(k[0], (5, 5, 1, 8)), "c1_b": jnp.zeros((8,)),
        "c2_w": he(k[1], (3, 3, 8, 16)), "c2_b": jnp.zeros((16,)),
        "c3_w": he(k[2], (3, 3, 16, 32)), "c3_b": jnp.zeros((32,)),
        # dense over the (band, channel) map: key identity lives in ABSOLUTE
        # band position, so pooling may only collapse time (translation along
        # the band axis is a transposition — averaging it away would make all
        # keys of a mode indistinguishable)
        "out_w": he(k[3], ((n_bands // 4) * 32, N_CLASSES)),
        "out_b": jnp.zeros((N_CLASSES,)),
    }


def _conv2(x, w, b):
    return jax.lax.conv_general_dilated(
        x[None], w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )[0] + b


@jax.jit
def apply(params: dict, feats, frame_mask=None):
    """[T, B, 1] → [24] global key probabilities.

    ``frame_mask`` [T] (bool, optional) restricts the global time average to
    valid frames — the fused program passes the true-length mask so the
    wrap-padded tail of a bucket cannot tip the key (it did: the golden WAV
    read A minor over G major by 0.003 until the pad was masked out)."""
    x = feats
    x = jax.nn.elu(_conv2(x, params["c1_w"], params["c1_b"]))
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 1), (1, 2, 1), "VALID")
    x = jax.nn.elu(_conv2(x, params["c2_w"], params["c2_b"]))
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 1), (1, 2, 1), "VALID")
    x = jax.nn.elu(_conv2(x, params["c3_w"], params["c3_b"]))
    if frame_mask is None:
        pooled = x.mean(axis=0)  # average over TIME only: [bands//4, 32]
    else:
        m = frame_mask.astype(x.dtype)[:, None, None]
        pooled = (x * m).sum(axis=0) / jnp.maximum(m.sum(), 1.0)
    return jax.nn.softmax(pooled.reshape(-1) @ params["out_w"] + params["out_b"])


def default_weights_path() -> str:
    """Checked-in trained weights; KEY_CNN_WEIGHTS overrides ('off' disables
    and falls back to the Krumhansl-profile estimator)."""
    env = os.environ.get("KEY_CNN_WEIGHTS")
    if env is not None:
        return "" if env.lower() in ("off", "none", "0") else env
    from pathlib import Path

    return str(Path(__file__).resolve().parent.parent / "weights" / "key_cnn.npz")


_PARAMS_CACHE: dict = {}


def load_params(path: str | None = None) -> dict | None:
    path = path or default_weights_path()
    if path in _PARAMS_CACHE:
        return _PARAMS_CACHE[path]
    if not path or not os.path.exists(path):
        return None
    data = np.load(path)
    # numpy on purpose: this loader can run at fused-program trace time
    params = {k: np.asarray(v) for k, v in data.items()}
    # layout check: the dense head reads the flattened (bands//4, 32) map —
    # a checkpoint from the old global-pooled head ((32, 24) out_w) would
    # shape-error at fused-program trace time and take down EVERY device
    # stage with it; reject it here so only the key estimate falls back
    from .deepchroma import N_BANDS

    ow = params.get("out_w")
    if ow is None or ow.ndim != 2 or ow.shape != ((N_BANDS // 4) * 32, N_CLASSES):
        import logging

        logging.getLogger(__name__).warning(
            "key_cnn checkpoint %s rejected: out_w shape %s != %s; "
            "falling back to Krumhansl key estimation",
            path, None if ow is None else ow.shape, ((N_BANDS // 4) * 32, N_CLASSES),
        )
        _PARAMS_CACHE[path] = None
        return None
    _PARAMS_CACHE[path] = params
    return params


def estimate_key_cnn(y: np.ndarray, sr: int, params: dict | None = None):
    """Audio → KeyEstimate via the CNN, None when no weights are loaded."""
    p = params or load_params()
    if p is None:
        return None
    probs = np.asarray(apply(p, features(jnp.asarray(np.asarray(y, np.float32)), sr)))
    label = key_prediction_to_label(probs)
    tonic, mode = label.split()
    from ..theory.key import _make_estimate
    from ..theory.vocabulary import NOTE_TO_PC

    return _make_estimate(NOTE_TO_PC[tonic], mode, float(probs.max()))
