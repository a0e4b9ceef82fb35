"""Train a reduced HTDemucs (models/htdemucs.py) on synthetic multitracks.

The reference uses released htdemucs checkpoints (reference:
backend/app/services/separation/demucs_sep.py:144-220); none exist in this
zero-egress environment, so a smaller variant of the SAME architecture
(channels 16, bottom 128, 3 transformer layers — every size derived from
the parameter pytree) is trained from scratch on synthesized 4-stem
multitracks with exact ground truth (train/synth.synth_multitrack).

Loss is per-stem level-normalized L1 on waveforms. Save gates are aligned
with what the PIPELINE consumes from separation: the "other" stem feeds
transcription (held-out SI-SDR must beat the HPSS-harmonic baseline) and
the "drums" stem feeds beat tracking (beat F-measure of a DBN decode on
the separated drums must match or beat the HPSS-percussive baseline) —
the weight-free fallback is exactly that HPSS baseline, so shipping
weights must be a measurable upgrade.

Usage:
    python -m audiotabs_tpu.train.htdemucs_train \
        [--clips 48] [--steps 1500] [--out audiotabs_tpu/weights/htdemucs.npz]
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

from ..models import htdemucs as hd

SR = 44100
SEG = 131072  # ≈ 2.97 s, multiple of ALIGN


def si_sdr(est: np.ndarray, ref: np.ndarray) -> float:
    """Scale-invariant SDR in dB over flattened [ch, T]."""
    est = est.reshape(-1).astype(np.float64)
    ref = ref.reshape(-1).astype(np.float64)
    denom = np.dot(ref, ref) + 1e-12
    s = (np.dot(est, ref) / denom) * ref
    e = est - s
    return float(10 * np.log10((np.dot(s, s) + 1e-12) / (np.dot(e, e) + 1e-12)))


def build_clips(n: int, seed: int, duration: float | None = None):
    from .synth import synth_multitrack

    seg = SEG if duration is None else int(duration * SR)
    rng = np.random.default_rng(seed)
    mixes = np.zeros((n, 2, seg), np.float32)
    stems = np.zeros((n, 4, 2, seg), np.float32)
    beats = []
    for i in range(n):
        m, s, b = synth_multitrack(rng, seg / SR + 0.05, SR)
        mixes[i] = m[:, :seg]
        stems[i] = s[:, :, :seg]
        beats.append(b[b < seg / SR])
    return mixes, stems, beats


def hpss_baseline(mix: np.ndarray) -> dict[str, np.ndarray]:
    """The pipeline's weight-free fallback: HPSS percussive→drums,
    harmonic→other (mono, applied per channel)."""
    from ..ops.hpss import hpss

    outs = {"drums": np.zeros_like(mix), "other": np.zeros_like(mix)}
    for c in range(mix.shape[0]):
        yh, yp = hpss(jnp.asarray(mix[c]))
        outs["other"][c] = np.asarray(yh)
        outs["drums"][c] = np.asarray(yp)
    return outs


def train(
    n_clips: int = 48,
    steps: int = 1500,
    batch: int = 4,
    seed: int = 0,
    out_path: str = "audiotabs_tpu/weights/htdemucs.npz",
    channels: int = 16,
    bottom: int = 128,
    t_layers: int = 3,
) -> dict:
    t0 = time.time()
    mixes, stems, _ = build_clips(n_clips, seed)
    val_m, val_s, val_beats = build_clips(8, seed + 31_000)
    print(f"dataset: {mixes.shape} mixes ({time.time()-t0:.0f}s)", flush=True)

    params = hd.init_params(
        jax.random.PRNGKey(seed), channels=channels, bottom=bottom, t_layers=t_layers
    )
    n_params = sum(np.prod(np.shape(x)) for x in jax.tree.leaves(params))
    print(f"model: {n_params/1e6:.2f}M params", flush=True)

    sched = optax.cosine_decay_schedule(3e-4, steps, alpha=0.1)
    opt = optax.adam(sched)
    opt_state = opt.init(params)

    def loss_fn(p, mb, sb):
        pred = jax.vmap(lambda m: hd.forward(p, m))(mb)  # [B, 4, 2, T]
        # per-stem level-normalized L1: the drums stem is sparse transients
        # whose raw L1 mass is tiny next to sustained stems — unnormalized,
        # the optimizer simply ignores it
        err = jnp.abs(pred - sb).mean(axis=(0, 2, 3))  # [4]
        level = jnp.abs(sb).mean(axis=(0, 2, 3)) + 1e-4
        return (err / level).mean()

    @jax.jit
    def update(p, o, mb, sb):
        loss, grads = jax.value_and_grad(loss_fn)(p, mb, sb)
        updates, o = opt.update(grads, o)
        return optax.apply_updates(p, updates), o, loss

    rng = np.random.default_rng(seed)
    for step in range(steps):
        sel = rng.choice(n_clips, size=batch, replace=False)
        params, opt_state, loss = update(
            params, opt_state, jnp.asarray(mixes[sel]), jnp.asarray(stems[sel])
        )
        if step % 100 == 0 or step == steps - 1:
            print(f"step {step}: L1 {float(loss):.5f} ({time.time()-t0:.0f}s)", flush=True)

    # ---- eval: gates aligned with what the PIPELINE consumes ----
    # "other" feeds transcription → SI-SDR; "drums" feeds beat tracking →
    # beat F-measure of a DBN decode on the separated stem (waveform SI-SDR
    # punishes transient phase errors that beat tracking is blind to)
    from ..analysis.metrics import beat_f_measure
    from ..decode.dbn_beats import dbn_beat_track
    from ..models.beat_rnn import onset_activation

    fwd = jax.jit(lambda m: hd.forward(params, m))
    names = ("drums", "bass", "other", "vocals")
    ours = {k: [] for k in names}
    base = {"drums": [], "other": []}
    beat_ours, beat_base = [], []

    def beats_from(drums_lr: np.ndarray) -> np.ndarray:
        act = np.asarray(onset_activation(jnp.asarray(drums_lr.mean(axis=0)), SR, 100))
        return np.asarray(dbn_beat_track(act.astype(np.float32), fps=100))

    for i in range(val_m.shape[0]):
        pred = np.asarray(fwd(jnp.asarray(val_m[i])))
        for k, name in enumerate(names):
            ours[name].append(si_sdr(pred[k], val_s[i, k]))
        hb = hpss_baseline(val_m[i])
        base["drums"].append(si_sdr(hb["drums"], val_s[i, 0]))
        base["other"].append(si_sdr(hb["other"], val_s[i, 2]))
        beat_ours.append(beat_f_measure(beats_from(pred[0]), val_beats[i]))
        beat_base.append(beat_f_measure(beats_from(hb["drums"]), val_beats[i]))
    ours_m = {k: float(np.mean(v)) for k, v in ours.items()}
    base_m = {k: float(np.mean(v)) for k, v in base.items()}
    bf_ours, bf_base = float(np.mean(beat_ours)), float(np.mean(beat_base))
    print(f"val SI-SDR (dB): model {ours_m}", flush=True)
    print(f"val SI-SDR (dB): HPSS baseline {base_m}", flush=True)
    print(f"val beat F from separated drums: model {bf_ours:.3f} vs HPSS {bf_base:.3f}", flush=True)

    if ours_m["other"] > base_m["other"] and bf_ours >= bf_base:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        params_out = dict(params)
        params_out["meta_segment"] = np.asarray(SEG, dtype=np.int64)
        hd.save_params(out_path, params_out)
        print(f"saved {out_path}", flush=True)
    else:
        print("NOT saved: model does not beat the HPSS fallback", flush=True)
    return {"ours": ours_m, "base": base_m, "params": params}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=48)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="audiotabs_tpu/weights/htdemucs.npz")
    args = ap.parse_args(argv)
    train(args.clips, args.steps, args.batch, args.seed, args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
