"""CRF chord recognition (madmom CRFChordRecognitionProcessor in JAX).

Capability parity with reference dependency N7 (SURVEY.md §2a; invoked at
backend/app/services/chords/deep_chords.py:63-82): a linear-chain CRF over
25 states (12 maj + 12 min + N) with learned transition matrix, decoded by
the jitted dense Viterbi (decode/viterbi.py). Emissions come from the deep
chroma DNN features (or any [T, D] feature matrix) through a linear layer.

Without converted weights the "deep" chord backend transparently falls back
to the template+Viterbi path (chords/extract.py), mirroring the reference's
fallback chain (deep_chords.py:63-82 falls back to DeepChroma recognition).
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..theory.vocabulary import NOTE_NAMES_SHARP

# state order: N, then 12 maj, then 12 min (madmom's majmin chord labels)
LABELS = tuple(
    ["N"] + [f"{n}:maj" for n in NOTE_NAMES_SHARP] + [f"{n}:min" for n in NOTE_NAMES_SHARP]
)
N_STATES = len(LABELS)  # 25

# Silence gate, shared by BOTH decode call sites (runtime/fused.py 4b' and
# chords/extract.py host path): frames whose harmonic RMS is below this
# fraction of the clip's peak RMS get zeroed features → uniform emissions,
# so Viterbi's self-transition prior extends the neighboring chord instead
# of decoding amplified noise as a confident wrong chord.
# tests/test_chords_silence_gate.py sweeps 0.02–0.10 to show the decoded
# progression is stable in a wide band around this value (not a knife-edge).
SILENCE_GATE_FRAC = 0.05


def init_params(rng: jax.Array, feature_dim: int = 12) -> dict:
    k1, k2 = jax.random.split(rng)
    # self-transition-heavy prior
    trans = np.full((N_STATES, N_STATES), np.log(0.02 / (N_STATES - 1)), dtype=np.float32)
    np.fill_diagonal(trans, np.log(0.98))
    return {
        "emit_w": jax.random.normal(k1, (feature_dim, N_STATES)) * 0.1,
        "emit_b": jnp.zeros((N_STATES,)),
        "transitions": jnp.asarray(trans),
        "initial": jnp.full((N_STATES,), -np.log(N_STATES)),
    }


def template_emission_params() -> dict:
    """Analytic emission weights from chord templates — makes the CRF usable
    without trained weights when fed 12-d chroma features."""
    from ..theory.vocabulary import NOTE_TO_PC, QUALITY_INTERVALS

    w = np.full((12, N_STATES), -0.35, dtype=np.float32)
    w[:, 0] = 0.0
    for s, label in enumerate(LABELS[1:], start=1):
        root, qual = label.split(":")
        for iv in QUALITY_INTERVALS[qual]:
            w[(NOTE_TO_PC[root] + iv) % 12, s] = 1.0
    w /= np.linalg.norm(w, axis=0, keepdims=True) + 1e-9
    trans = np.full((N_STATES, N_STATES), np.log(0.02 / (N_STATES - 1)), dtype=np.float32)
    np.fill_diagonal(trans, np.log(0.98))
    return {
        "emit_w": jnp.asarray(w * 8.0),  # temperature
        "emit_b": jnp.zeros((N_STATES,)),
        "transitions": jnp.asarray(trans),
        "initial": jnp.full((N_STATES,), -np.log(N_STATES)),
    }


def context_stack(feats, width: int):
    """[T, D] → [T, D*width]: concat the ±(width//2) neighboring frames
    (zero-padded at the edges) so the emission layer sees temporal context.
    width=1 is the identity. All-zero (silence-gated) runs stay all-zero,
    preserving the uniform-emission contract away from chord boundaries."""
    if width == 1:
        return feats
    half = width // 2
    padded = jnp.pad(feats, ((half, half), (0, 0)))
    T = feats.shape[0]
    return jnp.concatenate([padded[k : k + T] for k in range(width)], axis=-1)


@jax.jit
def decode(params: dict, feats):
    """feats [T, D] → (state path [T], confidence [T]).

    If the checkpoint's emission matrix expects a multiple of D input
    features, the context window is built here so ALL call sites (the fused
    program, the host chords path, the trainer) share one definition.
    """
    from ..decode.viterbi import viterbi_log_dense

    # Gated (all-zero) frames decode as N regardless of the emission
    # weights: the fused program zeroes features below the silence gate so
    # templates see uniform emissions and extend neighbors — but a TRAINED
    # emission's bigram transition prior can route uniform frames to a
    # common chord instead (pure silence decoded A:maj when the r4
    # checkpoint shipped). Silence is N by definition, not by prior.
    silent = jnp.max(jnp.abs(feats), axis=-1) < 1e-8
    d_in = params["emit_w"].shape[0]
    if d_in != feats.shape[-1] and d_in % feats.shape[-1] == 0:
        feats = context_stack(feats, d_in // feats.shape[-1])
    logits = feats @ params["emit_w"] + params["emit_b"]
    log_em = jax.nn.log_softmax(logits, axis=-1)
    path, _score = viterbi_log_dense(log_em, params["transitions"], params["initial"])
    path = jnp.where(silent, 0, path)
    conf = jnp.exp(log_em[jnp.arange(log_em.shape[0]), path])
    return path, conf


def default_weights_path() -> str:
    """Checked-in trained weights; CRF_CHORDS_WEIGHTS overrides ('off'
    reverts to the analytic template emissions)."""
    env = os.environ.get("CRF_CHORDS_WEIGHTS")
    if env is not None:
        return "" if env.lower() in ("off", "none", "0") else env
    from pathlib import Path

    return str(Path(__file__).resolve().parent.parent / "weights" / "crf_chords.npz")


def load_params(path: str | None = None) -> dict | None:
    path = path or default_weights_path()
    if not path or not os.path.exists(path):
        return None
    data = np.load(path)
    needed = {"emit_w", "emit_b", "transitions", "initial"}
    if not needed.issubset(set(data.files)):
        return None
    # numpy on purpose: this loader runs at fused-program trace time
    return {k: np.asarray(data[k]) for k in needed}
