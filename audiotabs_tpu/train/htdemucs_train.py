"""Train a reduced HTDemucs (models/htdemucs.py) on synthetic multitracks.

The reference uses released htdemucs checkpoints (reference:
backend/app/services/separation/demucs_sep.py:144-220); none exist in this
zero-egress environment, so a smaller variant of the SAME architecture
(every size derived from the parameter pytree) is trained from scratch on
synthesized multitracks with exact ground truth (train/synth.synth_multitrack).

``--sources 6`` trains a 6-stem layout (drums, bass, other, vocals,
guitar, piano). Note the reference resolves stem order at runtime from the
demucs package's ``model.sources`` attribute (demucs_sep.py:205-207 uses
getattr), not from its hardcoded ``_MODEL_STEMS`` listing — both sides
select stems BY NAME, so only internal consistency matters here. The
GUITAR stem is the reference's first-priority transcription source
(core/config.py:21-24). The synthetic arrangements include solo-guitar
clips so the model learns to route solo acoustic recordings (the golden
WAV's style) to the guitar stem with a silent drums stem.

Loss is per-stem level-normalized L1 on waveforms. Save gates are aligned
with what the PIPELINE consumes from separation: the priority stem feeds
transcription (held-out SI-SDR must beat the HPSS-harmonic baseline) and
the drums stem feeds beat tracking (beat F of a DBN decode on the
separated drums must match or beat the HPSS-percussive baseline). With the
golden WAV present, the candidate must also keep the PRODUCTION beat path
(drums stem behind the fused RMS gate, mix-percussive fallback) at or
above the mix-percussive baseline on that real recording — round 2's
4-source checkpoint failed exactly this (golden F 0.375 on the lone stem).

Usage:
    python -m audiotabs_tpu.train.htdemucs_train \
        [--sources 6] [--clips 48] [--steps 1500] \
        [--out audiotabs_tpu/weights/htdemucs.npz]
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
GATE_FRAC = 0.15  # the fused-program drums-RMS gate (runtime/fused.py)


def si_sdr(est: np.ndarray, ref: np.ndarray) -> float:
    """Scale-invariant SDR in dB over flattened [ch, T]."""
    est = est.reshape(-1).astype(np.float64)
    ref = ref.reshape(-1).astype(np.float64)
    denom = np.dot(ref, ref) + 1e-12
    s = (np.dot(est, ref) / denom) * ref
    e = est - s
    return float(10 * np.log10((np.dot(s, s) + 1e-12) / (np.dot(e, e) + 1e-12)))


def build_clips(n: int, seed: int, duration: float | None = None, n_sources: int = 4):
    from .synth import synth_multitrack

    seg = SEG if duration is None else int(duration * SR)
    rng = np.random.default_rng(seed)
    mixes = np.zeros((n, 2, seg), np.float32)
    stems = np.zeros((n, n_sources, 2, seg), np.float32)
    beats = []
    for i in range(n):
        m, s, b = synth_multitrack(rng, seg / SR + 0.05, SR, n_sources=n_sources)
        mixes[i] = m[:, :seg]
        stems[i] = s[:, :, :seg]
        beats.append(b[b < seg / SR])
    return mixes, stems, beats


def hpss_baseline(mix: np.ndarray) -> dict[str, np.ndarray]:
    """The pipeline's weight-free fallback: HPSS percussive→drums,
    harmonic→transcription stem (mono, applied per channel)."""
    from ..ops.hpss import hpss

    outs = {"drums": np.zeros_like(mix), "harmonic": np.zeros_like(mix)}
    for c in range(mix.shape[0]):
        yh, yp = hpss(jnp.asarray(mix[c]))
        outs["harmonic"][c] = np.asarray(yh)
        outs["drums"][c] = np.asarray(yp)
    return outs


def golden_gates(params: dict, n_sources: int) -> dict | None:
    """Real-audio gates on the golden WAV through the PRODUCTION beat path.

    Separates the golden mix with the candidate checkpoint, applies the
    fused program's drums-RMS gate (runtime/fused.py: use the drums stem
    only above GATE_FRAC of mix RMS, else the mix-percussive), and scores
    the DBN beat decode against the reference's own beat output. Also
    reports how much of the (solo-guitar) recording's energy lands in the
    guitar stem when the checkpoint has one."""
    import json

    from .golden import GOLDEN_DIR, golden_audio, golden_available
    from ..analysis.metrics import beat_f_measure
    from ..decode.dbn_beats import dbn_beat_track
    from ..models.beat_rnn import beat_activation

    if not golden_available("beat_times.json"):
        return None
    y, _yh, yp = golden_audio()  # 22.05 kHz mono
    ref_beats = np.asarray(
        json.loads((GOLDEN_DIR / "out" / "beat_times.json").read_text())["beat_times_raw_s"]
    )
    run = {k: v for k, v in params.items() if k != "meta_segment"}
    stems = np.asarray(
        hd._separate_program(
            run, jnp.asarray(y), sr=22050, seg=SEG, stride=(SEG * 3) // 4,
            shifts=1, n_sources=n_sources,
        )
    )  # [S, T] mono at 22.05 kHz

    def beat_f(sig: np.ndarray) -> float:
        act = np.asarray(beat_activation(jnp.asarray(sig.astype(np.float32)), 22050, 100))
        est = np.asarray(dbn_beat_track(act.astype(np.float32), fps=100))
        return beat_f_measure(est, ref_beats)

    r_mix = float(np.sqrt((y**2).mean()))
    r_drums = float(np.sqrt((stems[0] ** 2).mean()))
    gate_on = r_drums > GATE_FRAC * r_mix
    f_fallback = beat_f(yp)  # the mix-percussive path (weight-free baseline)
    f_drums = beat_f(stems[0])
    f_production = f_drums if gate_on else f_fallback
    out = {
        "drums_rms_frac": r_drums / (r_mix + 1e-12),
        "gate_selects_drums": gate_on,
        "beat_f_drums_stem": f_drums,
        "beat_f_fallback": f_fallback,
        "beat_f_production": f_production,
    }
    if n_sources >= 6:
        # the golden WAV is solo fingerpicked guitar: the guitar stem should
        # carry the bulk of the energy
        r_guitar = float(np.sqrt((stems[4] ** 2).mean()))
        out["guitar_rms_frac"] = r_guitar / (r_mix + 1e-12)
    return out


def train(
    n_clips: int = 48,
    steps: int = 1500,
    batch: int = 4,
    seed: int = 0,
    out_path: str = "audiotabs_tpu/weights/htdemucs.npz",
    channels: int = 16,
    bottom: int = 128,
    t_layers: int = 3,
    sources: int = 4,
    resume: bool = False,
    lr: float = 3e-4,
) -> dict:
    t0 = time.time()
    names = hd.MODEL_STEMS["htdemucs_6s"][:sources]
    trans_name = "guitar" if sources >= 6 else "other"
    trans_idx = names.index(trans_name)
    mixes, stems, _ = build_clips(n_clips, seed, n_sources=sources)
    val_m, val_s, val_beats = build_clips(8, seed + 31_000, n_sources=sources)
    print(f"dataset: {mixes.shape} mixes, stems {names} ({time.time()-t0:.0f}s)", flush=True)

    if resume and Path(out_path).exists():
        # refinement run: continue from the shipped checkpoint (fresh
        # optimizer, typically a lower peak lr). The same-arch SI-SDR
        # ratchet below then refuses to overwrite with a worse separator.
        prev = hd.load_params(out_path)
        prev_sources = prev["tdecoder"][-1]["convtr_w"].shape[1] // 2
        if prev_sources != sources:
            raise ValueError(f"--resume checkpoint has {prev_sources} sources, asked {sources}")
        params = jax.tree.map(jnp.asarray, {k: v for k, v in prev.items() if k != "meta_segment"})
        print(f"resumed from {out_path}", flush=True)
    else:
        params = hd.init_params(
            jax.random.PRNGKey(seed), n_sources=sources,
            channels=channels, bottom=bottom, t_layers=t_layers,
        )
    n_params = sum(np.prod(np.shape(x)) for x in jax.tree.leaves(params))
    print(f"model: {n_params/1e6:.2f}M params", flush=True)

    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.1)
    opt = optax.adam(sched)
    opt_state = opt.init(params)

    def loss_fn(p, mb, sb):
        pred = jax.vmap(lambda m: hd.forward(p, m, n_sources=sources))(mb)  # [B, S, 2, T]
        # per-CLIP per-stem level-normalized L1: the drums stem is sparse
        # transients whose raw L1 mass is tiny next to sustained stems —
        # unnormalized, the optimizer simply ignores it. The level floor is
        # 0.02 (≈ half a typical active-stem level), NOT 1e-4: 6-source
        # arrangements include silent stems (solo-guitar clips), and a tiny
        # floor weighted silence-enforcement ~500× over separation — the
        # first 6s run collapsed to near-silence on every output.
        err = jnp.abs(pred - sb).mean(axis=(2, 3))  # [B, S]
        level = jnp.abs(sb).mean(axis=(2, 3)) + 0.02
        # mix-reconstruction anchor: the stems must still sum to the input
        recon = jnp.abs(pred.sum(axis=1) - mb).mean()
        return (err / level).mean() + 2.0 * recon

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
    # the priority stem feeds transcription → SI-SDR; drums feeds beat
    # tracking → beat F of a DBN decode on the separated stem (waveform
    # SI-SDR punishes transient phase errors beat tracking is blind to)
    from ..analysis.metrics import beat_f_measure
    from ..decode.dbn_beats import dbn_beat_track
    from ..models.beat_rnn import onset_activation

    fwd = jax.jit(lambda m: hd.forward(params, m, n_sources=sources))
    ours = {k: [] for k in names}
    base = {"drums": [], trans_name: []}
    beat_ours, beat_base = [], []

    def beats_from(drums_lr: np.ndarray) -> np.ndarray:
        act = np.asarray(onset_activation(jnp.asarray(drums_lr.mean(axis=0)), SR, 100))
        return np.asarray(dbn_beat_track(act.astype(np.float32), fps=100))

    for i in range(val_m.shape[0]):
        pred = np.asarray(fwd(jnp.asarray(val_m[i])))
        for k, name in enumerate(names):
            if float(np.abs(val_s[i, k]).max()) > 1e-6:  # skip silent stems
                ours[name].append(si_sdr(pred[k], val_s[i, k]))
        hb = hpss_baseline(val_m[i])
        if float(np.abs(val_s[i, 0]).max()) > 1e-6:
            base["drums"].append(si_sdr(hb["drums"], val_s[i, 0]))
        if float(np.abs(val_s[i, trans_idx]).max()) > 1e-6:
            base[trans_name].append(si_sdr(hb["harmonic"], val_s[i, trans_idx]))
        beat_ours.append(beat_f_measure(beats_from(pred[0]), val_beats[i]))
        beat_base.append(beat_f_measure(beats_from(hb["drums"]), val_beats[i]))
    ours_m = {k: float(np.mean(v)) for k, v in ours.items() if v}
    base_m = {k: float(np.mean(v)) for k, v in base.items() if v}
    bf_ours, bf_base = float(np.mean(beat_ours)), float(np.mean(beat_base))
    print(f"val SI-SDR (dB): model {ours_m}", flush=True)
    print(f"val SI-SDR (dB): HPSS baseline {base_m}", flush=True)
    print(f"val beat F from separated drums: model {bf_ours:.3f} vs HPSS {bf_base:.3f}", flush=True)

    g = golden_gates(params, sources)
    if g is not None:
        print(f"golden: {g}", flush=True)

    gates_ok = ours_m[trans_name] > base_m[trans_name] and bf_ours >= bf_base
    if g is not None:
        gates_ok = gates_ok and g["beat_f_production"] >= g["beat_f_fallback"] - 1e-6
        # ratchet vs the existing checkpoint on the production golden path
        old = hd.load_params(out_path) if Path(out_path).exists() else None
        if old is not None:
            old_sources = old["tdecoder"][-1]["convtr_w"].shape[1] // 2
            g_old = golden_gates(old, old_sources)
            if g_old is not None:
                print(f"existing checkpoint golden: {g_old}", flush=True)
                gates_ok = gates_ok and (
                    g["beat_f_production"] >= g_old["beat_f_production"] - 1e-6
                    # a 6-source candidate may tie (not regress) the golden
                    # beat path: it adds the guitar stem the 4-source
                    # checkpoint cannot produce
                )
            if old_sources == sources:
                # same-arch ratchet (refinement runs): the candidate must
                # also hold the transcription-stem SI-SDR on this val set
                old_run = jax.tree.map(
                    jnp.asarray, {k: v for k, v in old.items() if k != "meta_segment"}
                )
                fwd_old = jax.jit(lambda m: hd.forward(old_run, m, n_sources=sources))
                old_tr = [
                    si_sdr(np.asarray(fwd_old(jnp.asarray(val_m[i])))[trans_idx], val_s[i, trans_idx])
                    for i in range(val_m.shape[0])
                    if float(np.abs(val_s[i, trans_idx]).max()) > 1e-6
                ]
                old_tr_m = float(np.mean(old_tr)) if old_tr else -np.inf
                print(f"existing checkpoint val {trans_name} SI-SDR: {old_tr_m:.3f}", flush=True)
                gates_ok = gates_ok and ours_m.get(trans_name, -np.inf) >= old_tr_m - 0.25

    if gates_ok:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        params_out = dict(params)
        params_out["meta_segment"] = np.asarray(SEG, dtype=np.int64)
        hd.save_params(out_path, params_out)
        print(f"saved {out_path}", flush=True)
    else:
        print("NOT saved: model fails an acceptance gate", flush=True)
    return {"ours": ours_m, "base": base_m, "beat_f": bf_ours, "beat_f_base": bf_base,
            "golden": g, "params": params, "saved": gates_ok}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=48)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sources", type=int, default=4, choices=(4, 6))
    ap.add_argument("--channels", type=int, default=16)
    ap.add_argument("--bottom", type=int, default=128)
    ap.add_argument("--t-layers", type=int, default=3)
    ap.add_argument("--resume", action="store_true",
                    help="init from the existing --out checkpoint (same arch)")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", default="audiotabs_tpu/weights/htdemucs.npz")
    args = ap.parse_args(argv)
    train(args.clips, args.steps, args.batch, args.seed, args.out,
          channels=args.channels, bottom=args.bottom, t_layers=args.t_layers,
          sources=args.sources, resume=args.resume, lr=args.lr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
