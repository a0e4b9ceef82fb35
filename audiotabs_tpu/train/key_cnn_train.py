"""Train the key-classification CNN (models/key_cnn.py) on synthetic keys.

The reference uses madmom's pretrained CNNKeyRecognitionProcessor
(reference: backend/app/services/theory/key.py:99-178); no checkpoint
exists here, so the same topology trains on synthesized clips with
diatonic chord progressions anchored on a known tonic/mode
(train/synth.synth_key_clip).

Each base clip is multiplied 12x by transposition augmentation: the
feature filterbank is quarter-tone spaced (deepchroma.BINS_PER_OCTAVE=24),
so shifting the band axis by 2k bins transposes by k semitones and maps
the label tonic to (pc+k) mod 12 with the mode unchanged.

Save gates: (1) held-out key accuracy beats the Krumhansl-profile
estimator the pipeline defaults to, and (2) the golden WAV still resolves
to G major.

Usage:
    python -m audiotabs_tpu.train.key_cnn_train \
        [--clips 128] [--steps 4000] [--out audiotabs_tpu/weights/key_cnn.npz]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..models import key_cnn as kc

SR = 22050
CLIP_S = 12.0


def build_clips(n: int, seed: int):
    from ..ops.hpss import hpss
    from .synth import synth_key_clip

    rng = np.random.default_rng(seed)
    feats, labels, audio = [], [], []
    for _ in range(n):
        y, pc, mode = synth_key_clip(rng, CLIP_S, SR)
        # the pipeline feeds the key CNN the HPSS-harmonic component
        # (runtime/fused.py stage 5b) — train in the same domain
        yh = np.asarray(hpss(jnp.asarray(y))[0])
        f = np.asarray(kc.features(jnp.asarray(yh), SR))
        feats.append(f)
        labels.append(pc + (0 if mode == "major" else 12))
        audio.append(yh)
    T = min(f.shape[0] for f in feats)
    X = np.stack([f[:T] for f in feats])
    return X, np.asarray(labels, np.int32), audio


def transpose_feats(f: np.ndarray, k: int) -> np.ndarray:
    """Shift [T, B, 1] quarter-tone-banded features by k semitones (2k bins),
    zero-filling the vacated edge (no wraparound across the register)."""
    if k == 0:
        return f
    b = 2 * abs(k)
    out = np.zeros_like(f)
    if k > 0:
        out[:, b:, :] = f[:, :-b, :]
    else:
        out[:, :-b, :] = f[:, b:, :]
    return out


def augment_batch(X: np.ndarray, Y: np.ndarray, rng: np.random.Generator):
    """Random per-sample transposition in [-5, +6] semitones."""
    ks = rng.integers(-5, 7, size=X.shape[0])
    Xa = np.stack([transpose_feats(x, int(k)) for x, k in zip(X, ks)])
    # level + noise jitter: the held-out domain (real recordings) varies in
    # gain and noise floor in ways the clean synthetic clips do not
    gains = rng.uniform(0.6, 1.4, size=(X.shape[0], 1, 1, 1)).astype(np.float32)
    Xa = Xa * gains + rng.normal(0.0, 0.05, size=Xa.shape).astype(np.float32)
    Ya = ((Y % 12) + ks) % 12 + (Y // 12) * 12
    return Xa.astype(np.float32), Ya.astype(np.int32)


def _krumhansl_label(y: np.ndarray) -> int | None:
    from ..chords.extract import chroma_features
    from ..theory.key import estimate_key_from_chroma

    chroma, _ = chroma_features(jnp.asarray(y), SR)
    est = estimate_key_from_chroma(np.asarray(chroma))
    if est is None:
        return None
    return est.tonic_pc + (0 if est.mode == "major" else 12)


def train(
    n_clips: int = 128,
    steps: int = 4000,
    batch: int = 32,
    seed: int = 0,
    out_path: str = "audiotabs_tpu/weights/key_cnn.npz",
) -> dict:
    t0 = time.time()
    X, Y, _ = build_clips(n_clips, seed)
    Xv, Yv, val_audio = build_clips(24, seed + 91_000)
    print(f"dataset: {X.shape} ({time.time()-t0:.0f}s)", flush=True)

    params = kc.init_params(jax.random.PRNGKey(seed), n_bands=X.shape[2])
    sched = optax.cosine_decay_schedule(2e-3, steps, alpha=0.05)
    opt = optax.adamw(sched, weight_decay=1e-4)
    opt_state = opt.init(params)

    def loss_fn(p, xb, yb):
        probs = jax.vmap(lambda f: kc.apply(p, f))(xb)  # [B, 24]
        probs = jnp.clip(probs, 1e-6, 1.0)
        # label smoothing 0.1: the golden gate needs calibrated probabilities
        # on out-of-domain audio, not a memorized one-hot
        smooth = 0.1
        logp = jnp.log(probs)
        nll = -logp[jnp.arange(xb.shape[0]), yb]
        return ((1 - smooth) * nll - smooth * logp.mean(axis=1)).mean()

    @jax.jit
    def update(p, o, xb, yb):
        loss, grads = jax.value_and_grad(loss_fn)(p, xb, yb)
        updates, o = opt.update(grads, o, p)  # adamw needs params
        return optax.apply_updates(p, updates), o, loss

    rng = np.random.default_rng(seed)
    for step in range(steps):
        sel = rng.choice(n_clips, size=batch, replace=False)
        xb, yb = augment_batch(X[sel], Y[sel], rng)
        params, opt_state, loss = update(params, opt_state, jnp.asarray(xb), jnp.asarray(yb))
        if step % 200 == 0 or step == steps - 1:
            print(f"step {step}: loss {float(loss):.4f} ({time.time()-t0:.0f}s)", flush=True)

    pred = np.asarray(jax.vmap(lambda f: kc.apply(params, f))(jnp.asarray(Xv))).argmax(axis=1)
    acc_cnn = float((pred == Yv).mean())
    kr = [_krumhansl_label(y) for y in val_audio]
    acc_kr = float(np.mean([k == t for k, t in zip(kr, Yv) if k is not None]))
    print(f"val key accuracy: CNN {acc_cnn:.3f} vs Krumhansl {acc_kr:.3f}", flush=True)

    g_ok = _golden_key_ok(params)
    print(f"golden key: {'G major ok' if g_ok else 'FAIL'}", flush=True)

    # held-out corpus ratchet (clips no trainer draws): the new checkpoint
    # must get at least as many of the six committed keys right as the
    # shipped one — tests/test_heldout_corpus.py asserts every one of them
    held_new = _heldout_keys(params)
    held_ok = True
    if held_new is not None:
        n_new, n_tot = held_new
        print(f"heldout keys: {n_new}/{n_tot} correct", flush=True)
        old = kc.load_params() if Path(out_path).exists() else None
        if old is not None:
            n_old, _ = _heldout_keys(old)
            print(f"heldout keys (shipped checkpoint): {n_old}/{n_tot}", flush=True)
            held_ok = n_new >= n_old

    if acc_cnn > acc_kr and g_ok and held_ok:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        np.savez(out_path, **{k: np.asarray(v) for k, v in params.items()})
        print(f"saved {out_path}", flush=True)
    else:
        print("NOT saved: CNN fails an acceptance gate", flush=True)
    return {"acc_cnn": acc_cnn, "acc_krumhansl": acc_kr, "golden_ok": g_ok,
            "heldout": held_new, "params": params}


_HELD_AUDIO: dict[str, np.ndarray] = {}


def _heldout_keys(params) -> tuple[int, int] | None:
    """(n_correct, n_total) over the committed held-out corpus, evaluated
    on the audio the production pipeline feeds the key CNN: the HPSS
    harmonic of the mix for solo clips, of the htdemucs guitar stem for
    band clips (runtime/pipeline.py stem-priority selection)."""
    import json

    from ..io import load_wav, peak_normalize
    from ..ops.hpss import hpss

    held = Path(__file__).resolve().parent.parent.parent / "tests" / "data" / "heldout"
    wavs = sorted(held.glob("heldout_*.wav"))
    if not wavs:
        return None
    n_ok = 0
    for wav in wavs:
        gt = json.loads(wav.with_suffix(".json").read_text())
        key = str(wav)
        if key not in _HELD_AUDIO:
            from ..io import resample_poly_host

            y, sr0 = load_wav(wav)
            y = resample_poly_host(peak_normalize(y), sr0, SR)
            if gt.get("band"):
                from ..models.htdemucs import separate_stems_device

                stems = separate_stems_device(jnp.asarray(y), SR, shifts=1)
                if stems is not None and "guitar" in stems:
                    y = np.asarray(stems["guitar"], np.float32)
            _HELD_AUDIO[key] = np.asarray(hpss(jnp.asarray(y))[0])
        yh = _HELD_AUDIO[key]
        probs = np.asarray(kc.apply(params, kc.features(jnp.asarray(yh), SR))).ravel()
        label = kc.key_prediction_to_label(probs)
        want = f"{['C','C#','D','D#','E','F','F#','G','G#','A','A#','B'][gt['key']['tonic_pc']]} {gt['key']['mode']}"
        ok = label == want
        n_ok += ok
        print(f"  {wav.stem}: {label} (want {want}){'' if ok else '  MISS'}", flush=True)
    return n_ok, len(wavs)


def _golden_key_ok(params) -> bool:
    from .golden import golden_audio, golden_available

    if not golden_available():
        return True
    _y, yh, _yp = golden_audio()
    probs = np.asarray(kc.apply(params, kc.features(jnp.asarray(yh), SR)))
    label = kc.key_prediction_to_label(probs)
    top3 = np.argsort(probs)[::-1][:3]
    print(
        "golden prediction:",
        ", ".join(f"{kc.key_prediction_to_label(np.eye(24)[i])} {probs[i]:.3f}" for i in top3),
        flush=True,
    )
    return label == "G major"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=128)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="audiotabs_tpu/weights/key_cnn.npz")
    args = ap.parse_args(argv)
    train(args.clips, args.steps, args.batch, args.seed, args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
