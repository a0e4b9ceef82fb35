"""Beat activation: BLSTM ensemble architecture + DSP default.

Capability parity with madmom's RNNBeatProcessor as used by the reference
(reference: backend/app/services/grid/beats.py:71-82): 100 fps beat
activation in [0, 1].

Two paths:
  * ``BeatBLSTM`` — the madmom architecture (3 stacked bidirectional LSTM
    layers, 25 units, sigmoid output) over multi-resolution log-filtered
    spectrogram + first-difference features. Weights load via
    ``load_params`` from a converted checkpoint; ``init_params`` gives a
    random init for training/porting tests. The recurrence is a lax.scan
    with one fused [x,h]→gates matmul per step.
  * ``onset_activation`` — the dependency-free default: multi-resolution
    spectral flux, smoothed and normalized. This drives the DBN decoder to
    usable beats without any learned weights.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.spectral import frame as frame_signal
from ..ops.spectral import hann_window

FPS_DEFAULT = 100
_FRAME_SIZES = (1024, 2048, 4096)
_BANDS_PER_OCTAVE = 6
_FMIN, _FMAX = 30.0, 10000.0


@lru_cache(maxsize=16)
def _log_filterbank(sr: int, n_fft: int) -> np.ndarray:
    """Triangular filters on a log-frequency grid → [n_bands, n_fft//2+1]."""
    n_oct = np.log2(_FMAX / _FMIN)
    n_bands = int(np.floor(n_oct * _BANDS_PER_OCTAVE))
    centers = _FMIN * 2.0 ** (np.arange(n_bands + 2) / _BANDS_PER_OCTAVE)
    freqs = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    fb = np.zeros((n_bands, len(freqs)), dtype=np.float32)
    for i in range(n_bands):
        lo, ctr, hi = centers[i], centers[i + 1], centers[i + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-9)
        dn = (hi - freqs) / max(hi - ctr, 1e-9)
        fb[i] = np.maximum(0, np.minimum(up, dn))
        s = fb[i].sum()
        if s > 0:
            fb[i] /= s
    return fb


def spectral_features(y, sr: int, fps: int = FPS_DEFAULT):
    """Multi-resolution log-filtered magnitudes + positive first differences.

    Returns [T, D] with T = frames at `fps`.
    """
    hop = sr // fps
    feats = []
    for n_fft in _FRAME_SIZES:
        frames = frame_signal(y, n_fft, hop, center=True)
        w = jnp.asarray(hann_window(n_fft))
        mag = jnp.abs(jnp.fft.rfft(frames * w, axis=-1))  # [T, F]
        fb = jnp.asarray(_log_filterbank(sr, n_fft))
        banded = mag @ fb.T  # [T, B]
        logb = jnp.log10(1.0 + 5.0 * banded)
        diff = jnp.maximum(0.0, logb[1:] - logb[:-1])
        diff = jnp.concatenate([jnp.zeros_like(diff[:1]), diff], axis=0)
        feats.append(logb)
        feats.append(diff)
    n = min(f.shape[0] for f in feats)
    return jnp.concatenate([f[:n] for f in feats], axis=-1)


# ---------------------------------------------------------------- BLSTM ----


def _lstm_scan(params, xs, reverse: bool = False):
    """One LSTM direction over [T, D] with fused gate matmul."""
    W, U, b = params["W"], params["U"], params["b"]  # [D,4H], [H,4H], [4H]
    H = U.shape[0]

    def step(carry, x):
        h, c = carry
        gates = x @ W + h @ U + b
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((H,)), jnp.zeros((H,)))
    _, hs = jax.lax.scan(step, init, xs, reverse=reverse)
    return hs


def init_params(rng: jax.Array, input_dim: int, hidden: int = 25, layers: int = 3) -> dict:
    """Random init of the 3-layer BLSTM + sigmoid head (madmom topology)."""
    params: dict = {"layers": []}
    d = input_dim
    keys = jax.random.split(rng, layers * 6 + 2)
    k = 0

    def dense(key, shape):
        return jax.random.normal(key, shape) * (1.0 / np.sqrt(shape[0]))

    for _ in range(layers):
        layer = {}
        for direction in ("fwd", "bwd"):
            layer[direction] = {
                "W": dense(keys[k], (d, 4 * hidden)),
                "U": dense(keys[k + 1], (hidden, 4 * hidden)),
                "b": jnp.zeros((4 * hidden,)),
            }
            k += 2
        params["layers"].append(layer)
        d = 2 * hidden
    params["out_w"] = dense(keys[k], (d, 1))
    params["out_b"] = jnp.zeros((1,))
    return params


def _bilstm_scan(layer: dict, x):
    """Both LSTM directions in ONE lax.scan: the backward pass runs on the
    time-reversed sequence as a second batch row, halving the sequential
    depth vs two scans (the dominant cost of the BLSTM on TPU)."""
    W = jnp.stack([layer["fwd"]["W"], layer["bwd"]["W"]])  # [2, D, 4H]
    U = jnp.stack([layer["fwd"]["U"], layer["bwd"]["U"]])  # [2, H, 4H]
    b = jnp.stack([layer["fwd"]["b"], layer["bwd"]["b"]])  # [2, 4H]
    H = U.shape[1]
    xs = jnp.stack([x, x[::-1]], axis=1)  # [T, 2, D]

    def step(carry, xt):
        h, c = carry  # [2, H]
        gates = jnp.einsum("bd,bdg->bg", xt, W) + jnp.einsum("bh,bhg->bg", h, U) + b
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((2, H)), jnp.zeros((2, H)))
    # unroll: the per-step tensors are tiny ([2, 25] per window), so the
    # scan is loop-overhead-bound on TPU — unrolling 16 steps cut the
    # fused program's dominant stage (this BLSTM) roughly in half
    _, hs = jax.lax.scan(step, init, xs, unroll=16)  # [T, 2, H]
    return jnp.concatenate([hs[:, 0], hs[::-1, 1]], axis=-1)  # [T, 2H]


@jax.jit
def blstm_apply(params: dict, feats):
    """[T, D] features → [T] beat activation in (0, 1)."""
    x = feats
    if "feat_mean" in params:
        x = (x - params["feat_mean"]) / params["feat_std"]
    for layer in params["layers"]:
        x = _bilstm_scan(layer, x)
    logits = x @ params["out_w"] + params["out_b"]
    return jax.nn.sigmoid(logits[:, 0])


def blstm_apply_chunked(params: dict, feats, window: int = 256, margin: int = 32):
    """[T, D] → [T] activation via overlapped windows vmapped through the
    BLSTM — the TPU-first way to run a recurrent net over a long sequence:
    the serial scan is bounded at `window` steps and all windows run in
    parallel on the MXU, instead of one T-step serial scan. The `margin`
    frames at each window edge (~0.3 s of context) are recomputed by the
    neighboring window and discarded, so edge effects stay out of the kept
    activation. Traceable: all shapes derive from the static T.
    """
    T, D = feats.shape
    if T <= window:
        return blstm_apply(params, feats)
    hop = window - 2 * margin
    nwin = -(-(T - 2 * margin) // hop)
    padT = nwin * hop + 2 * margin
    f = jnp.pad(feats, ((0, padT - T), (0, 0)), mode="edge")
    idx = np.arange(nwin)[:, None] * hop + np.arange(window)[None, :]
    wins = f[jnp.asarray(idx)]  # [nwin, window, D]
    acts = jax.vmap(lambda w: blstm_apply(params, w))(wins)  # [nwin, window]
    out = jnp.concatenate(
        [acts[0, :margin], acts[:, margin : window - margin].reshape(-1), acts[-1, window - margin :]]
    )
    return out[:T]


def _flatten(params: dict, prefix: str = "") -> dict:
    flat = {}
    for i, layer in enumerate(params["layers"]):
        for d in ("fwd", "bwd"):
            for k in ("W", "U", "b"):
                flat[f"{prefix}l{i}_{d}_{k}"] = np.asarray(layer[d][k])
    flat[f"{prefix}out_w"] = np.asarray(params["out_w"])
    flat[f"{prefix}out_b"] = np.asarray(params["out_b"])
    for k in ("feat_mean", "feat_std", "full_context"):
        if k in params:
            flat[f"{prefix}{k}"] = np.asarray(params[k])
    return flat


def save_params(path: str, params: dict) -> None:
    """Save BLSTM weights as a flat npz (inverse of load_params). An
    "ensemble" list of extra member pytrees is saved under m1_/m2_/…
    prefixes (madmom's RNNBeatProcessor averages 8 such nets —
    reference grid/beats.py:71-82)."""
    flat = _flatten(params)
    for j, member in enumerate(params.get("ensemble", []), start=1):
        flat.update(_flatten(member, prefix=f"m{j}_"))
    np.savez(path, **flat)


def _unflatten(data, prefix: str = "") -> dict | None:
    layers = []
    i = 0
    while f"{prefix}l{i}_fwd_W" in data:
        layers.append(
            {
                d: {
                    # numpy on purpose: load can happen at trace time, and
                    # jnp arrays created inside a trace would leak tracers
                    # into this cached pytree
                    "W": np.asarray(data[f"{prefix}l{i}_{d}_W"]),
                    "U": np.asarray(data[f"{prefix}l{i}_{d}_U"]),
                    "b": np.asarray(data[f"{prefix}l{i}_{d}_b"]),
                }
                for d in ("fwd", "bwd")
            }
        )
        i += 1
    if not layers:
        return None
    out = {
        "layers": layers,
        "out_w": np.asarray(data[f"{prefix}out_w"]),
        "out_b": np.asarray(data[f"{prefix}out_b"]),
    }
    for k in ("feat_mean", "feat_std", "full_context"):
        if f"{prefix}{k}" in data.files:
            out[k] = np.asarray(data[f"{prefix}{k}"])
    return out


def load_params(path: str) -> dict | None:
    """Load trained/converted BLSTM weights (npz pytree). None if absent.
    Extra ensemble members (m1_/m2_/… prefixes) load into an "ensemble"
    list consumed by beat_activation's averaging."""
    import os

    if not path or not os.path.exists(path):
        return None
    data = np.load(path)  # flat npz of arrays — no pickle needed (or allowed)
    out = _unflatten(data)
    if out is None:
        return None
    members = []
    j = 1
    while f"m{j}_l0_fwd_W" in data:
        members.append(_unflatten(data, prefix=f"m{j}_"))
        j += 1
    if members:
        out["ensemble"] = members
    return out


# ------------------------------------------------------------ DSP default --


@partial(jax.jit, static_argnames=("sr", "fps"))
def onset_activation(y, sr: int, fps: int = FPS_DEFAULT):
    """Spectral-flux beat activation at `fps`, normalized to [0, 1].

    Band energies come from the conv-CQT GEMM (6 bands/octave over the
    madmom frequency range) instead of three framed FFT spectrograms —
    the same implicit-GEMM formulation as ops/cqt, no frame gathers.
    """
    import math

    from ..ops.cqt import cqt

    hop = sr // fps
    n_bins = int(math.floor(_BANDS_PER_OCTAVE * math.log2(_FMAX / _FMIN)))
    C = cqt(
        y,
        sr,
        hop=hop,
        fmin=_FMIN,
        n_bins=min(n_bins, int(math.floor(_BANDS_PER_OCTAVE * math.log2((sr / 2.0 - 1) / _FMIN)))),
        bins_per_octave=_BANDS_PER_OCTAVE,
        max_kernel_len=2048,
    )  # [B, T]
    logb = jnp.log10(1.0 + 5.0 * C)
    diff = jnp.maximum(0.0, logb[:, 1:] - logb[:, :-1])
    act = jnp.pad(diff.mean(axis=0), (1, 0))
    # light smoothing (3-frame triangular)
    kernel = jnp.array([0.25, 0.5, 0.25])
    act = jnp.convolve(act, kernel, mode="same")
    # moving-percentile normalization to [0,1]
    act = act - jnp.percentile(act, 25)
    act = jnp.maximum(act, 0.0)
    denom = jnp.percentile(act, 99) + 1e-8
    return jnp.clip(act / denom, 0.0, 1.0)


_TRAINED: dict | None = None
_TRAINED_CHECKED = False


def default_weights_path() -> str:
    """Checked-in trained weights; BEAT_RNN_WEIGHTS overrides ('off' disables)."""
    import os

    env = os.environ.get("BEAT_RNN_WEIGHTS")
    if env is not None:
        return "" if env.lower() in ("off", "none", "0") else env
    return str(__import__("pathlib").Path(__file__).resolve().parent.parent / "weights" / "beat_rnn.npz")


def trained_params() -> dict | None:
    """Lazily load (once) the default trained BLSTM weights."""
    global _TRAINED, _TRAINED_CHECKED
    if not _TRAINED_CHECKED:
        _TRAINED = load_params(default_weights_path())
        _TRAINED_CHECKED = True
    return _TRAINED


def beat_activation(y, sr: int, fps: int = FPS_DEFAULT, params: dict | None = None):
    """Beat activation [T]: trained BLSTM when weights exist, else DSP flux
    (the madmom RNN-vs-spectral-flux duality, reference grid/beats.py:71-82).

    A checkpoint with extra "ensemble" members averages all members'
    activations, madmom-style (RNNBeatProcessor averages 8 BLSTMs).
    Members are grouped by parameter-shape signature and each group runs as
    ONE vmapped forward over a stacked parameter pytree — a same-shape
    ensemble costs one batched pass, and architecture-diverse members
    (madmom's nets differ too) cost one pass per distinct shape."""
    p = params if params is not None else trained_params()
    if p is not None:
        feats = spectral_features(y, sr, fps)

        def _apply(m, f):
            # a member flagged full_context runs the WHOLE sequence through
            # one scan (madmom's RNNBeatProcessor semantics): its backward
            # LSTM carries the locked tempo into quiet/rubato passages and
            # can place metrical activation where no onset exists — the
            # mechanism behind the reference's intro beats on the golden
            # WAV, which windowed inference structurally cannot express
            if "full_context" in m:
                return blstm_apply({k: v for k, v in m.items() if k != "full_context"}, f)
            return blstm_apply_chunked(m, f)

        members = [
            {k: v for k, v in p.items() if k != "ensemble"},
            *p.get("ensemble", []),
        ]
        if len(members) == 1:
            return _apply(members[0], feats)
        groups: dict = {}
        for m in members:
            leaves, treedef = jax.tree_util.tree_flatten(m)
            sig = (str(treedef), tuple(np.shape(l) for l in leaves))
            groups.setdefault(sig, []).append(m)
        acts = []
        for group in groups.values():
            if len(group) == 1:
                acts.append(_apply(group[0], feats)[None])
            else:
                stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *group)
                acts.append(jax.vmap(lambda m: _apply(m, feats))(stacked))
        return jnp.concatenate(acts, axis=0).mean(axis=0)
    return onset_activation(y, sr, fps)
