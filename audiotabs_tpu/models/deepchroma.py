"""Deep chroma DNN (madmom DeepChromaProcessor architecture in JAX).

Capability parity with reference dependency N6 (SURVEY.md §2a; invoked at
backend/app/services/chords/extract.py:45-67 at 10 fps): a dense network
over context-stacked log-filtered spectrogram frames producing 12 sigmoid
chroma units. Topology follows madmom's published model: frames of a
band-limited (65–2100 Hz) log-filtered magnitude spectrogram, ±7 frames of
context, 3 hidden ReLU layers of 512, sigmoid chroma output.

``init_params``/``load_params`` handle random init and converted-checkpoint
loading; without weights the chord extractor falls back to the GEMM CQT
chroma (chords/extract.py), matching the reference's behavior when madmom
is unavailable.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp

FPS = 10
CONTEXT = 7  # frames each side
FMIN, FMAX = 65.0, 2100.0
BINS_PER_OCTAVE = 24  # quarter-tone filterbank
N_BANDS = 120  # floor(log2(FMAX/FMIN) * BINS_PER_OCTAVE)
HIDDEN = 512
N_LAYERS = 3


@lru_cache(maxsize=4)
def _filterbank(sr: int, n_fft: int) -> np.ndarray:
    n_oct = np.log2(FMAX / FMIN)
    n_bands = int(np.floor(n_oct * BINS_PER_OCTAVE))
    centers = FMIN * 2.0 ** (np.arange(n_bands + 2) / BINS_PER_OCTAVE)
    freqs = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    fb = np.zeros((n_bands, len(freqs)), dtype=np.float32)
    for i in range(n_bands):
        lo, ctr, hi = centers[i], centers[i + 1], centers[i + 2]
        fb[i] = np.maximum(0, np.minimum((freqs - lo) / max(ctr - lo, 1e-9), (hi - freqs) / max(hi - ctr, 1e-9)))
        ssum = fb[i].sum()
        if ssum > 0:
            fb[i] /= ssum
    return fb


@partial(jax.jit, static_argnames=("sr",))
def features(y, sr: int):
    """Context-stacked log-filtered spectrogram [T, (2*CONTEXT+1)*n_bands] at 10 fps."""
    from ..ops.spectral import frame as frame_signal, hann_window

    n_fft = 8192 if sr > 30000 else 4096
    hop = sr // FPS
    frames = frame_signal(y, n_fft, hop, center=True)
    w = jnp.asarray(hann_window(n_fft))
    mag = jnp.abs(jnp.fft.rfft(frames * w, axis=-1))
    fb = jnp.asarray(_filterbank(sr, n_fft))
    banded = jnp.log1p(mag @ fb.T)  # [T, B]
    T, B = banded.shape
    padded = jnp.pad(banded, ((CONTEXT, CONTEXT), (0, 0)))
    idx = jnp.arange(T)[:, None] + jnp.arange(2 * CONTEXT + 1)[None, :]
    stacked = padded[idx]  # [T, 2C+1, B]
    return stacked.reshape(T, -1)


def init_params(rng: jax.Array, input_dim: int) -> dict:
    keys = jax.random.split(rng, N_LAYERS + 1)
    params = {"layers": []}
    d = input_dim
    for i in range(N_LAYERS):
        params["layers"].append(
            {
                "w": jax.random.normal(keys[i], (d, HIDDEN)) * np.sqrt(2.0 / d),
                "b": jnp.zeros((HIDDEN,)),
            }
        )
        d = HIDDEN
    params["out_w"] = jax.random.normal(keys[-1], (d, 12)) * np.sqrt(1.0 / d)
    params["out_b"] = jnp.zeros((12,))
    return params


@jax.jit
def apply(params: dict, feats):
    """[T, D] features → [T, 12] sigmoid chroma."""
    x = feats
    if "feat_mean" in params:
        x = (x - params["feat_mean"]) / params["feat_std"]
    for layer in params["layers"]:
        x = jax.nn.relu(x @ layer["w"] + layer["b"])
    return jax.nn.sigmoid(x @ params["out_w"] + params["out_b"])


def default_weights_path() -> str:
    """Checked-in trained weights; DEEPCHROMA_WEIGHTS overrides ('off'
    disables and falls back to the salience-folded chroma)."""
    env = os.environ.get("DEEPCHROMA_WEIGHTS")
    if env is not None:
        return "" if env.lower() in ("off", "none", "0") else env
    from pathlib import Path

    return str(Path(__file__).resolve().parent.parent / "weights" / "deepchroma.npz")


@lru_cache(maxsize=2)
def _load_params_cached(path: str) -> dict | None:
    if not path or not os.path.exists(path):
        return None
    data = np.load(path)
    layers = []
    i = 0
    while f"l{i}_w" in data:
        # numpy on purpose: this loader can run at fused-program trace time
        layers.append({"w": np.asarray(data[f"l{i}_w"]), "b": np.asarray(data[f"l{i}_b"])})
        i += 1
    if not layers:
        return None
    out = {"layers": layers, "out_w": np.asarray(data["out_w"]), "out_b": np.asarray(data["out_b"])}
    for k in ("feat_mean", "feat_std"):
        if k in data.files:
            out[k] = np.asarray(data[k])
    return out


def load_params(path: str | None = None) -> dict | None:
    return _load_params_cached(path or default_weights_path())


def deep_chroma_apply(params: dict, y: np.ndarray, sr: int) -> np.ndarray:
    """Full path: audio → [12, T] chroma at 10 fps."""
    feats = features(jnp.asarray(np.asarray(y, dtype=np.float32)), sr)
    return np.asarray(apply(params, feats)).T
