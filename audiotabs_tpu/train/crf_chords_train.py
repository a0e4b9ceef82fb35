"""Train the CRF chord recognizer (models/crf_chords.py) on synthetic chords.

The reference uses madmom's pretrained CRFChordRecognitionProcessor
(reference: backend/app/services/chords/deep_chords.py:63-82); no checkpoint
exists here, so the emission layer is trained as frame-wise multinomial
logistic regression over the PRODUCTION feature (the trained DeepChroma
DNN's chroma, per-frame L2-normalized, exactly what runtime/fused.py 4b'
feeds the CRF) and the transition matrix is estimated from smoothed bigram
counts of the true label sequences.

Save gates: (1) held-out CRF-decoded frame accuracy >= the analytic
template emissions on the same features, (2) the golden WAV keeps its exact
G/D/Am/C progression with overlap >= 0.86 through the production decode
(beat-synchronous majority smoothing), (3) ratchet: never overwrite an
existing checkpoint that scores higher on the golden overlap.

WHY NO CHECKPOINT SHIPS (r3 finding, re-measured r4 with stronger
evidence): on the EASY r3 corpus every trained candidate lost to the
analytic template emissions on held-out decode accuracy (0.960-0.962 vs
0.968). On the r4 HARDENED corpus (7th voicings, sus4 resolutions,
inversions, key modulations — synth.py SYNTH_VERSION 5) the synthetic
axis flips — trained ctx=3 emissions 0.887 vs template 0.868 — but every
candidate regresses the real/realistic reference points: golden overlap
0.996 → 0.932-0.936 unconstrained, and even 85-90% template blends drop
the committed held-out corpus (tests/data/heldout/) from 0.942 to
0.899-0.906 mean overlap. Selection is therefore doubly constrained
(golden parity AND held-out-corpus parity, both template-relative); no
candidate passed. The structural reason:
the production feature is the trained DeepChroma DNN's chroma, which is
itself optimized to emit chord-tone mass, so the chord-template readout is
already the right decision structure; a logistic regression fit on
synthetic clips only adds estimation noise to it. The production "deep"
backend therefore keeps the full CRF decode (models/crf_chords.decode —
the real Viterbi over learned-feature emissions, matching
deep_chords.py:63-82 capability) with analytically-derived emission
weights, and this trainer stands ready to ship a checkpoint the day its
gates pass (the save gate is template-relative on BOTH axes, so a shipped
checkpoint can only improve production).

Usage:
    python -m audiotabs_tpu.train.crf_chords_train \
        [--clips 60] [--steps 2000] [--out audiotabs_tpu/weights/crf_chords.npz]
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

from ..models import crf_chords as cc
from ..models import deepchroma as dc

SR = 22050
CLIP_S = 12.0
FPS = 10


def _dnn_chroma(yh, dc_params) -> np.ndarray:
    """[T, 12] production CRF features: DNN chroma, per-frame L2-normalized,
    with the SAME silence gate runtime/fused.py 4b' applies (near-silent
    frames zeroed). Training must see gated features — and emit_b stays
    zero — so the production contract "zero features → uniform emissions →
    Viterbi extends the neighbor" survives a trained checkpoint."""
    from ..ops.features import rms

    feats = dc.features(jnp.asarray(yh), SR)
    ch = np.asarray(dc.apply(dc_params, feats))  # [T, 12]
    norm = np.linalg.norm(ch, axis=1, keepdims=True)
    ch = ch / np.maximum(norm, 1e-9)
    hop = SR // FPS
    energy = np.asarray(rms(jnp.asarray(yh), frame_length=2048, hop=hop))
    energy = energy / (energy.max() + 1e-9)
    n = min(len(energy), len(ch))
    ch[:n] *= (energy[:n] > 0.05).astype(np.float32)[:, None]
    return ch


def _state_labels(labels, n_frames: int) -> np.ndarray:
    """[(start, end, root_pc, quality)] → [T] state ids (0 = N)."""
    out = np.zeros(n_frames, dtype=np.int32)
    for start, end, root_pc, qual in labels:
        a = int(round(start * FPS))
        b = min(n_frames, max(a + 1, int(round(end * FPS))))
        out[a:b] = 1 + root_pc + (12 if qual == "min" else 0)
    return out


def build_dataset(n_clips: int, seed: int, dc_params, cache: bool = True):
    import os
    import tempfile

    # feature extraction dominates trainer wall time on this 1-core host
    # (~8 min for 80 clips); the (n_clips, seed) draw is deterministic, so
    # cache it across candidate runs. The key folds in the DeepChroma
    # checkpoint identity (features are computed FROM dc_params — retraining
    # deepchroma.npz must invalidate these) and the synth generator version.
    from .synth import SYNTH_VERSION

    dc_tag = "none"
    dc_path = dc.default_weights_path()
    if dc_path and os.path.exists(dc_path):
        st = os.stat(dc_path)
        dc_tag = f"{int(st.st_mtime)}_{st.st_size}"
    cache_path = os.path.join(
        tempfile.gettempdir(), f"crf_ds_v{SYNTH_VERSION}_{dc_tag}_{n_clips}_{seed}.npz"
    )
    if cache and os.path.exists(cache_path):
        data = np.load(cache_path)
        k = int(data["n"])
        return (
            [data[f"x{i}"] for i in range(k)],
            [data[f"y{i}"] for i in range(k)],
        )
    from ..ops.hpss import hpss
    from .synth import synth_chord_clip

    rng = np.random.default_rng(seed)
    X, Y = [], []
    for _ in range(n_clips):
        y, labels = synth_chord_clip(rng, CLIP_S, SR)
        yh = np.asarray(hpss(jnp.asarray(y))[0])
        ch = _dnn_chroma(yh, dc_params)
        st = _state_labels(labels, ch.shape[0])
        X.append(ch)
        Y.append(st)
    if cache:
        np.savez(
            cache_path, n=len(X),
            **{f"x{i}": x for i, x in enumerate(X)},
            **{f"y{i}": y for i, y in enumerate(Y)},
        )
    # per-clip lists: the evaluator must never splice Viterbi sequences
    # across clip boundaries (frame counts are 1 + T//hop, NOT CLIP_S*FPS)
    return X, Y


def _transitions_from_bigrams(seqs, alpha: float = 1.0) -> np.ndarray:
    counts = np.full((cc.N_STATES, cc.N_STATES), alpha, dtype=np.float64)
    for s in seqs:
        np.add.at(counts, (s[:-1], s[1:]), 1.0)
    return np.log(counts / counts.sum(axis=1, keepdims=True)).astype(np.float32)


def _decode_accuracy(params, X_clips, Y_clips) -> float:
    accs = []
    for ch, st in zip(X_clips, Y_clips):
        path, _ = cc.decode(params, jnp.asarray(ch))  # decode context-stacks as needed
        mask = st > 0
        if mask.any():
            accs.append(float((np.asarray(path)[mask] == st[mask]).mean()))
    return float(np.mean(accs))


def _golden_gate(params):
    """Production decode on the golden WAV: (overlap, progression_ok)."""
    import json

    from .golden import GOLDEN_DIR as golden
    from .golden import golden_audio, golden_available

    if not golden_available("chords.json", "beat_times.json"):
        return None, True
    from ..chords.extract import CHROMA_FPS
    from ..chords.segments import beat_sync_majority, frames_to_segments

    dc_params = dc.load_params()
    _y, yh, _yp = golden_audio()
    ch = _dnn_chroma(yh, dc_params)
    path, conf = cc.decode(params, jnp.asarray(ch))
    path_np, conf_np = np.asarray(path).copy(), np.asarray(conf)
    ref_bt = json.loads((golden / "out" / "beat_times.json").read_text())
    beats = np.asarray(ref_bt.get("beat_times_raw_s", []), dtype=np.float32)
    proxy = np.broadcast_to(conf_np[None, :], (cc.N_STATES, path_np.shape[0])).copy()
    path_np, conf_np = beat_sync_majority(path_np, proxy, beats if beats.size else None, CHROMA_FPS)
    times = np.arange(path_np.shape[0], dtype=np.float32) / CHROMA_FPS
    segs = frames_to_segments(path_np, conf_np, times, cc.LABELS, min_len=0.25)

    ref = json.loads((golden / "out" / "chords.json").read_text())
    offset = 0.79

    def label_at(segments, t):
        for c in segments:
            s0 = c["start"] if isinstance(c, dict) else c.start
            s1 = c["end"] if isinstance(c, dict) else c.end
            if s0 <= t < s1:
                return c["label"] if isinstance(c, dict) else c.label
        return None

    ts = np.arange(0.0, 14.0, 0.05)
    agree = sum(1 for t in ts if label_at(ref, t) == label_at(segs, t + offset))
    labels = [c.label for c in segs if c.label != "N"]
    collapsed = [l for i, l in enumerate(labels) if i == 0 or l != labels[i - 1]]
    prog_ok = collapsed == ["G:maj", "D:maj", "A:min", "G:maj", "D:maj", "C:maj", "G:maj"]
    return agree / len(ts), prog_ok


def _ctx_stack_np(ch: np.ndarray, width: int) -> np.ndarray:
    return np.asarray(cc.context_stack(jnp.asarray(ch), width))


_HELDOUT_CACHE: dict = {}


def _heldout_overlap(params) -> float | None:
    """Mean chord overlap vs exact ground truth across the committed
    held-out corpus (tests/data/heldout/ — clips NO trainer draws). The r4
    unconstrained-on-golden pick kept golden 0.996 but dropped the held-out
    fingerpick clip 0.991 → 0.923; the selection constraint therefore spans
    every committed reference point, not just the one real recording."""
    import json
    from pathlib import Path

    held = Path(__file__).resolve().parent.parent.parent / "tests" / "data" / "heldout"
    wavs = sorted(held.glob("heldout_*.wav"))
    if not wavs:
        return None
    from ..chords.segments import frames_to_segments
    from ..io import load_wav, peak_normalize, resample_poly_host
    from ..ops.hpss import hpss

    pc_names = ["C", "C#", "D", "D#", "E", "F", "F#", "G", "G#", "A", "A#", "B"]
    dc_params = dc.load_params()
    scores = []
    for wav in wavs:
        gt = json.loads(wav.with_suffix(".json").read_text())
        ch = _HELDOUT_CACHE.get(wav.name)
        if ch is None:
            y, sr = load_wav(wav)
            y = resample_poly_host(peak_normalize(y), sr, SR)
            yh = np.asarray(hpss(jnp.asarray(y))[0])
            ch = _dnn_chroma(yh, dc_params)
            _HELDOUT_CACHE[wav.name] = ch
        path, conf = cc.decode(params, jnp.asarray(ch))
        times = np.arange(path.shape[0], dtype=np.float32) / FPS
        segs = frames_to_segments(np.asarray(path), np.asarray(conf), times, cc.LABELS, min_len=0.25)

        def our_label(t):
            for c in segs:
                if c.start <= t < c.end:
                    return c.label
            return None

        def gt_label(t):
            for c in gt["chords"]:
                if c["start"] <= t < c["end"]:
                    return f'{pc_names[c["root_pc"]]}:{c["quality"]}'
            return None

        ts = np.arange(gt["chords"][0]["start"], gt["chords"][-1]["end"], 0.05)
        scores.append(sum(1 for t in ts if our_label(t) == gt_label(t)) / len(ts))
    return float(np.mean(scores))


def train(
    n_clips: int = 60,
    steps: int = 2000,
    batch: int = 512,
    seed: int = 0,
    out_path: str = "audiotabs_tpu/weights/crf_chords.npz",
    init: str = "template",
    trans: str = "bigram",
    ctx: int = 3,
) -> dict:
    t0 = time.time()
    dc_params = dc.load_params()
    if dc_params is None:
        print("DeepChroma weights required (the CRF's production features)", flush=True)
        return {}
    X_clips, Y_clips = build_dataset(n_clips, seed, dc_params)
    # CE training needs the per-frame feature the emission layer actually
    # sees: the ±(ctx//2)-frame context window (crf_chords.context_stack,
    # the same op decode applies at inference)
    X = np.concatenate([_ctx_stack_np(x, ctx) for x in X_clips])
    Y = np.concatenate(Y_clips)
    print(f"dataset: {X.shape} frames, ctx={ctx} ({time.time()-t0:.0f}s)", flush=True)

    # emit_b stays ZERO: the production silence/true_len gate zeroes feature
    # rows and relies on 0 @ w + b being uniform so Viterbi extends the
    # neighboring chord; a learned bias would decode gated frames to
    # argmax(b) instead
    #
    # init "template": start FROM the analytic template weights and
    # fine-tune — the trained model then dominates the template baseline it
    # must beat at the save gate, instead of having to rediscover it from
    # zero (a from-zero run plateaued at val 0.959 vs template 0.968)
    # context-lifted template weights: template on the CENTER frame, zero on
    # the neighbors — the trained model starts exactly AT the analytic
    # baseline it must beat, and gradients can only add information the
    # templates lack (boundary context)
    w_tmpl_center = np.asarray(cc.template_emission_params()["emit_w"])
    w_tmpl = np.zeros((12 * ctx, cc.N_STATES), np.float32)
    w_tmpl[12 * (ctx // 2) : 12 * (ctx // 2 + 1)] = w_tmpl_center
    if init == "template":
        emit_w = jnp.asarray(w_tmpl)
        lr = 1e-2
    else:
        emit_w = jnp.asarray(np.zeros((12 * ctx, cc.N_STATES), np.float32))
        lr = 5e-2
    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.05)
    opt = optax.adam(sched)
    opt_state = opt.init(emit_w)

    def loss_fn(w, xb, yb):
        logp = jax.nn.log_softmax(xb @ w, axis=-1)
        return -logp[jnp.arange(xb.shape[0]), yb].mean()

    @jax.jit
    def update(w, o, xb, yb):
        loss, grads = jax.value_and_grad(loss_fn)(w, xb, yb)
        updates, o = opt.update(grads, o)
        return optax.apply_updates(w, updates), o, loss

    rng = np.random.default_rng(seed)
    w = emit_w
    for step in range(steps):
        sel = rng.integers(0, X.shape[0], size=batch)
        w, opt_state, loss = update(w, opt_state, jnp.asarray(X[sel]), jnp.asarray(Y[sel]))
        if step % 500 == 0 or step == steps - 1:
            print(f"step {step}: loss {float(loss):.4f} ({time.time()-t0:.0f}s)", flush=True)

    if trans == "bigram":
        trans_m = _transitions_from_bigrams(Y_clips)
    else:  # the analytic self-transition-heavy prior
        trans_m = np.asarray(cc.template_emission_params()["transitions"])

    def cand(tau: float, alpha: float) -> dict:
        # MAP-style emission: analytic template prior blended with the
        # learned update, sharpened by tau. alpha=1, tau=1 IS the template;
        # alpha=0 is the raw CE-trained logreg.
        return {
            "emit_w": (alpha * w_tmpl + (1 - alpha) * np.asarray(w)) * tau,
            "emit_b": np.zeros((cc.N_STATES,), np.float32),
            "transitions": trans_m,
            "initial": np.full((cc.N_STATES,), -np.log(cc.N_STATES), np.float32),
        }

    # ---- (tau, alpha) selection on a SELECTION split ----
    # CE training calibrates (softens) the emissions; Viterbi under a
    # 0.98-self-transition prior then smears boundaries, so the raw trained
    # logreg decoded ~0.006 below the (temperature-8) analytic templates on
    # synthetic data that matches the templates by construction. The
    # template-prior blend keeps that analytic structure where the data is
    # uninformative while the learned update corrects it where it isn't
    # (golden overlap: trained 0.932). Selection runs on its own split; the
    # val split below stays untouched.
    Xs, Ys = build_dataset(30, seed + 55_000, dc_params)
    grid = [
        (tau, alpha)
        for tau in (1.0, 1.5, 2.0, 3.0)
        # high-alpha points stay close to the template's behavior on real
        # recordings while the learned update fixes the hard voicings —
        # where the golden/held-out-constrained search usually lands
        for alpha in (0.0, 0.25, 0.5, 0.75, 0.85, 0.9)
    ]
    accs = {ta: _decode_accuracy(cand(*ta), Xs, Ys) for ta in grid}
    print(
        "selection sweep (tau, alpha):",
        {f"{t}/{a}": round(v, 4) for (t, a), v in accs.items()},
        flush=True,
    )
    # Constrained selection: the save gate requires golden parity (the
    # production bar), so selection maximizes synthetic accuracy AMONG
    # candidates that keep it — the unconstrained argmax (r4 hardened
    # corpus: tau=1.0/alpha=0.25, sel 0.891) beat the template held-out
    # (0.888 vs 0.868) but dropped golden 0.996 → 0.932 and was unshippable;
    # the high-alpha blends keep the analytic structure where the one real
    # recording needs it. Candidates below the template's own selection
    # accuracy are pruned before paying a golden evaluation.
    acc_sel_tmpl = _decode_accuracy(cc.template_emission_params(), Xs, Ys)
    g_tmpl_sel, _ = _golden_gate(cc.template_emission_params())
    h_tmpl = _heldout_overlap(cc.template_emission_params())
    ranked = sorted(
        (ta for ta in grid if accs[ta] >= acc_sel_tmpl),
        key=lambda ta: accs[ta],
        reverse=True,
    )
    tau_best, alpha_best = max(grid, key=lambda ta: accs[ta])
    for ta in ranked:
        if g_tmpl_sel is None:
            break  # no golden artifacts: plain argmax stands
        c = cand(*ta)
        g_c, prog_c = _golden_gate(c)
        if not (prog_c and g_c is not None and g_c >= g_tmpl_sel - 1e-6):
            continue
        h_c = _heldout_overlap(c)
        if h_tmpl is not None and h_c is not None and h_c < h_tmpl - 0.01:
            print(f"  tau={ta[0]} alpha={ta[1]}: heldout {h_c:.3f} < template {h_tmpl:.3f}", flush=True)
            continue
        tau_best, alpha_best = ta
        print(
            f"constrained pick: tau={ta[0]} alpha={ta[1]} "
            f"(sel {accs[ta]:.4f}, golden {g_c:.3f} >= template {g_tmpl_sel:.3f}, "
            f"heldout {h_c if h_c is None else round(h_c, 3)} vs template "
            f"{h_tmpl if h_tmpl is None else round(h_tmpl, 3)})",
            flush=True,
        )
        break
    trained = cand(tau_best, alpha_best)

    # ---- held-out eval vs the analytic template emissions ----
    Xv, Yv = build_dataset(30, seed + 33_000, dc_params)
    acc_tr = _decode_accuracy(trained, Xv, Yv)
    acc_tmpl = _decode_accuracy(cc.template_emission_params(), Xv, Yv)
    print(
        f"val frame accuracy: trained(tau={tau_best}, alpha={alpha_best}) "
        f"{acc_tr:.4f} vs template {acc_tmpl:.4f}",
        flush=True,
    )

    g_overlap, g_prog = _golden_gate(trained)
    golden_ok = True
    if g_overlap is not None:
        # shipping a checkpoint switches production OFF the analytic
        # templates, so the bar is the templates' own golden score, not an
        # absolute threshold: the trained CRF must match or beat them here
        g_tmpl, _ = _golden_gate(cc.template_emission_params())
        print(
            f"golden: overlap {g_overlap:.3f} (template {g_tmpl:.3f}) "
            f"progression={'ok' if g_prog else 'FAIL'}",
            flush=True,
        )
        golden_ok = g_prog and g_overlap >= g_tmpl - 1e-6

    ratchet_ok = True
    if g_overlap is not None and Path(out_path).exists():
        old = cc.load_params(str(out_path))
        if old is not None:
            g_old, _ = _golden_gate(old)
            if g_old is not None:
                print(f"existing checkpoint golden overlap: {g_old:.3f}", flush=True)
                ratchet_ok = g_overlap >= g_old - 1e-6

    # held-out corpus save gate (same bar as selection): a candidate must
    # not regress the committed held-out clips vs the template path
    heldout_ok = True
    h_tr = _heldout_overlap(trained)
    if h_tr is not None and h_tmpl is not None:
        print(f"heldout overlap: trained {h_tr:.3f} vs template {h_tmpl:.3f}", flush=True)
        heldout_ok = h_tr >= h_tmpl - 0.01

    if acc_tr >= acc_tmpl and golden_ok and ratchet_ok and heldout_ok:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        np.savez(out_path, **trained)
        print(f"saved {out_path}", flush=True)
    else:
        print("NOT saved: trained CRF fails an acceptance gate", flush=True)
    return {"acc_trained": acc_tr, "acc_template": acc_tmpl,
            "golden_overlap": g_overlap, "golden_progression_ok": g_prog}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=60)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="audiotabs_tpu/weights/crf_chords.npz")
    ap.add_argument("--init", choices=["template", "zero"], default="template")
    ap.add_argument("--trans", choices=["bigram", "prior"], default="bigram")
    ap.add_argument("--ctx", type=int, default=3,
                    help="context window (frames) for the emission features")
    args = ap.parse_args(argv)
    train(args.clips, args.steps, args.batch, args.seed, args.out,
          init=args.init, trans=args.trans, ctx=args.ctx)
    return 0


if __name__ == "__main__":
    sys.exit(main())
