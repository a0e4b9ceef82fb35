"""Train the Basic Pitch CNN (models/basicpitch.py) on synthetic note clips.

The reference ships Spotify's pretrained TF model (reference:
backend/app/services/amt/basic_pitch.py:55-71); no checkpoint exists in
this zero-egress environment, so the same topology is trained on
synthesized polyphonic clips with exactly-known note rolls
(train/synth.synth_note_clip).

Training runs on the default JAX backend (TPU through one jitted update
step; hCQT features are computed on-device per batch, so host RAM holds
only raw audio). The checkpoint is saved ONLY if its decoded note
F-measure on held-out clips beats the weight-free salience baseline AND a
pure-tone out-of-distribution smoke passes. Chord chroma always folds the
SALIENCE posteriors (runtime/fused.py), so the CNN cannot regress chords;
the trainer still prints the would-be golden chord parity for visibility.

Usage:
    python -m audiotabs_tpu.train.basicpitch_train \
        [--clips 48] [--steps 600] [--out audiotabs_tpu/weights/basicpitch.npz]
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

from ..models import basicpitch as bp

SR = 22050
CLIP_S = 4.0
FPS = SR / bp.HOP  # ≈ 86.1


def rolls_from_events(events, n_frames: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """[(start, end, pitch)] → (onset [T, 88], frame [T, 88], contour [T, 264]).

    The contour roll supervises the 3-bins-per-semitone pitch-salience head
    directly (as the published Basic Pitch training does) — without it the
    contour branch collapses to a constant and the frame head, which reads
    only the contour, can never learn."""
    onset = np.zeros((n_frames, 88), dtype=np.float32)
    frame = np.zeros((n_frames, 88), dtype=np.float32)
    contour = np.zeros((n_frames, bp.N_BINS), dtype=np.float32)
    for start, end, pitch in events:
        p = pitch - bp.MIDI_A0
        if not 0 <= p < 88:
            continue
        a = int(round(start * FPS))
        b = max(a + 1, int(round(end * FPS)))
        if a >= n_frames:
            continue
        b = min(b, n_frames)
        frame[a:b, p] = 1.0
        c = p * bp.BINS_PER_SEMITONE + 1  # center sub-bin
        contour[a:b, c] = 1.0
        for dc in (-1, 1):
            if 0 <= c + dc < bp.N_BINS:
                contour[a:b, c + dc] = np.maximum(contour[a:b, c + dc], 0.5)
        onset[a, p] = 1.0
        if a + 1 < n_frames:
            onset[a + 1, p] = max(onset[a + 1, p], 0.5)
    return onset, frame, contour


from ..analysis.metrics import note_f_measure  # shared with the CI gates


def build_clips(n: int, seed: int, voicing_frac: float = 0.5):
    """Half the clips are REAL guitar voicings (open-chord shapes strummed
    or fingerpicked, 4-6 way polyphony — synth_guitar_voicing_clip); the
    rest keep the varied-timbre note clips. The golden WAV is strummed
    chords, exactly the regime the note-clip generator underweights."""
    from .synth import synth_guitar_voicing_clip, synth_note_clip

    rng = np.random.default_rng(seed)
    clips = []
    for _ in range(n):
        if rng.uniform() < voicing_frac:
            y, events = synth_guitar_voicing_clip(rng, CLIP_S, SR)
        else:
            # denser polyphony on a third of the note clips (VERDICT r3
            # item 1: harder training material bounds hallucination better
            # than more of the easy regime). First poly-4 run (80 clips,
            # 1000 steps, seed 11) scored heldout F 0.667 vs the shipped
            # 0.687 — the ratchet refused it; the option stays for wider
            # sweeps on faster hardware.
            poly = 4 if rng.uniform() < 0.33 else 3
            y, events = synth_note_clip(rng, CLIP_S, SR, polyphony=poly)
        clips.append((y, events))
    return clips


def decode_events(onset, frame, on_thr=0.5, fr_thr=0.3):
    return bp.notes_from_posteriors(
        np.asarray(onset, np.float32),
        np.asarray(frame, np.float32),
        fps=FPS,
        onset_threshold=on_thr,
        frame_threshold=fr_thr,
        min_note_ms=80.0,
    )


def train(
    n_clips: int = 48,
    steps: int = 600,
    batch: int = 8,
    seed: int = 0,
    out_path: str = "audiotabs_tpu/weights/basicpitch.npz",
) -> dict:
    t0 = time.time()
    clips = build_clips(n_clips, seed)
    val_clips = build_clips(12, seed + 77_000)
    n_frames = int(CLIP_S * SR) // bp.HOP + 1

    audio = np.stack([c[0] for c in clips])  # [N, T]
    onsets = np.zeros((n_clips, n_frames, 88), np.float32)
    frames = np.zeros((n_clips, n_frames, 88), np.float32)
    contours = np.zeros((n_clips, n_frames, bp.N_BINS), np.float32)
    for i, (_, ev) in enumerate(clips):
        onsets[i], frames[i], contours[i] = rolls_from_events(ev, n_frames)
    print(f"dataset: {audio.shape} audio, {n_frames} frames/clip ({time.time()-t0:.0f}s)", flush=True)

    params = bp.init_params(jax.random.PRNGKey(seed))
    sched = optax.cosine_decay_schedule(3e-3, steps, alpha=0.05)
    opt = optax.adam(sched)
    opt_state = opt.init(params)

    def loss_fn(p, yb, ob, fb, cb):
        def one(y, o_t, f_t, c_t):
            onset, frame, contour = bp.cnn_apply(p, bp.hcqt(y, SR))
            T = min(onset.shape[0], o_t.shape[0])
            onset = jnp.clip(onset[:T], 1e-6, 1 - 1e-6)
            frame = jnp.clip(frame[:T], 1e-6, 1 - 1e-6)
            contour = jnp.clip(contour[:T], 1e-6, 1 - 1e-6)
            o_t, f_t, c_t = o_t[:T], f_t[:T], c_t[:T]
            bce_o = -(12.0 * o_t * jnp.log(onset) + (1 - o_t) * jnp.log(1 - onset))
            bce_f = -(4.0 * f_t * jnp.log(frame) + (1 - f_t) * jnp.log(1 - frame))
            bce_c = -(4.0 * c_t * jnp.log(contour) + (1 - c_t) * jnp.log(1 - contour))
            return bce_o.mean() + bce_f.mean() + 2.0 * bce_c.mean()

        return jax.vmap(one)(yb, ob, fb, cb).mean()

    @jax.jit
    def update(p, o, yb, ob, fb, cb):
        loss, grads = jax.value_and_grad(loss_fn)(p, yb, ob, fb, cb)
        updates, o = opt.update(grads, o)
        return optax.apply_updates(p, updates), o, loss

    rng = np.random.default_rng(seed)
    for step in range(steps):
        sel = rng.choice(n_clips, size=batch, replace=False)
        params, opt_state, loss = update(
            params, opt_state,
            jnp.asarray(audio[sel]), jnp.asarray(onsets[sel]),
            jnp.asarray(frames[sel]), jnp.asarray(contours[sel]),
        )
        if step % 100 == 0 or step == steps - 1:
            print(f"step {step}: loss {float(loss):.4f} ({time.time()-t0:.0f}s)", flush=True)

    # ---- eval: decoded note F-measure on held-out clips, CNN vs salience ----
    def eval_f(posteriors_fn) -> float:
        fs = []
        for y, ev in val_clips:
            onset, frame = posteriors_fn(jnp.asarray(y))
            est = decode_events(onset, frame)
            fs.append(note_f_measure(est, ev))
        return float(np.mean(fs))

    f_cnn = eval_f(lambda y: bp.cnn_apply(params, bp.hcqt(y, SR))[:2])
    f_sal = eval_f(lambda y: bp.salience_posteriors(y, SR))
    print(f"val note F: CNN {f_cnn:.3f} vs salience baseline {f_sal:.3f}", flush=True)

    ok_tone = _pure_tone_smoke(params)
    print(f"pure-tone smoke: {'ok' if ok_tone else 'FAIL'}", flush=True)
    # informational only: the production chord chroma folds the SALIENCE
    # posteriors (runtime/fused.py), so the CNN cannot poison chords — this
    # prints what WOULD happen if the CNN fed the chroma
    g_overlap, g_prog = _golden_chord_parity(params)
    if g_overlap is not None:
        print(f"[info] golden chord overlap if CNN fed chroma: {g_overlap:.3f} progression={'ok' if g_prog else 'FAIL'}", flush=True)

    g_recall = _golden_note_recall(params)
    if g_recall is not None:
        print(f"[info] golden accompaniment-CSV recall: {g_recall:.3f}", flush=True)

    # PRIMARY gate on the ALIGNED metric: exact-GT note F over the
    # committed held-out corpus (VERDICT r3 item 1: recall alone lets a
    # hallucinating model through, so F = harmonic mean of both). The
    # candidate must beat the weight-free salience baseline ON THE SAME
    # GROUND and never regress the shipped checkpoint. The synthetic val-F
    # comparison stays as the gate only when no held-out corpus exists:
    # r4 measured a candidate at heldout F 0.687 vs shipped 0.610 that the
    # val gate rejected by a hair (0.843 vs salience 0.851 on same-family
    # synthetic clips) — the held-out renders are the metric that matters.
    def _hf(pr):
        r, p = pr
        return 2 * r * p / (r + p + 1e-12)

    pr_raw = _heldout_note_pr(params, production=False)
    if pr_raw is not None:
        print(
            f"[info] heldout RAW-decode-on-mix recall {pr_raw[0]:.3f} "
            f"precision {pr_raw[1]:.3f} F {_hf(pr_raw):.3f}",
            flush=True,
        )
    pr = _heldout_note_pr(params)
    ratchet_ok = True
    beats_baseline = f_cnn > f_sal
    if pr is not None:
        f_new = _hf(pr)
        print(f"heldout note recall {pr[0]:.3f} precision {pr[1]:.3f} F {f_new:.3f}", flush=True)
        pr_sal = _heldout_note_pr_salience()
        if pr_sal is not None:
            print(f"heldout salience baseline F: {_hf(pr_sal):.3f}", flush=True)
            beats_baseline = f_new > _hf(pr_sal)
        if Path(out_path).exists():
            old = bp.load_params(str(out_path))
            if old is not None:
                pr_old = _heldout_note_pr(old)
                if pr_old is not None:
                    f_old = _hf(pr_old)
                    print(f"existing checkpoint heldout F: {f_old:.3f}", flush=True)
                    ratchet_ok = f_new >= f_old - 1e-6

    if beats_baseline and ok_tone and ratchet_ok:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        np.savez(out_path, **{k: np.asarray(v) for k, v in params.items()})
        # the ratchet loaded the OLD checkpoint through the lru-cached
        # loader just before this overwrite — drop the stale entry so any
        # later load in this process sees the file we just wrote
        bp._load_params_cached.cache_clear()
        print(f"saved {out_path}", flush=True)
    else:
        print("NOT saved: CNN fails an acceptance gate", flush=True)
    return {
        "f_cnn": f_cnn, "f_sal": f_sal, "pure_tone_ok": ok_tone,
        "golden_overlap": g_overlap, "golden_progression_ok": g_prog, "params": params,
    }


def _pure_tone_smoke(params) -> bool:
    """Out-of-distribution check: a plain-sine C-major chord and a two-note
    sine sequence must decode to the right pitches (the failure mode of a
    timbre-overfit CNN is empty or wrong events on clean tones)."""
    t = np.arange(int(SR * 1.5)) / SR
    chord = sum(
        0.3 * np.sin(2 * np.pi * 440.0 * 2 ** ((p - 69) / 12) * t) for p in (60, 64, 67)
    ).astype(np.float32)
    onset, frame = bp.cnn_apply(params, bp.hcqt(jnp.asarray(chord), SR))[:2]
    est = decode_events(onset, frame)
    got = {e.pitch_midi for e in est}
    if not {60, 64, 67} <= got:
        return False
    seq = np.concatenate(
        [
            (0.3 * np.sin(2 * np.pi * 440.0 * 2 ** ((p - 69) / 12) * t)).astype(np.float32)
            for p in (60, 67)
        ]
    )
    onset, frame = bp.cnn_apply(params, bp.hcqt(jnp.asarray(seq), SR))[:2]
    est = sorted(decode_events(onset, frame), key=lambda e: e.start_time_s)
    return bool(est) and est[0].pitch_midi == 60 and est[-1].pitch_midi == 67


# separated/HPSS-processed held-out audio, cached per process: the stem is
# a function of the htdemucs checkpoint only (never of the AMT candidate),
# so the candidate, the salience baseline, and the ratchet's old checkpoint
# all decode the identical input
_HELDOUT_AUDIO: dict[str, np.ndarray] = {}


def _heldout_amt_input(wav, band: bool) -> np.ndarray:
    """The audio the PRODUCTION pipeline feeds the AMT on this clip: for a
    band mix, the htdemucs guitar stem (runtime/pipeline.py stem-priority
    selection — reference demucs_sep.py:107-135) then the HPSS harmonic
    residual of that stem; for solo clips the HPSS harmonic of the mix
    (separation is near-identity there and the fused program's HPSS split
    is the weight-free path). Evaluating the raw band MIX instead counts
    the (correctly transcribed) bass/piano/vocal tracks as false positives
    against the guitar-only ground truth — a metric artifact r4 measured
    at precision 0.323 vs 0.84+ on the stem."""
    from ..io import load_wav, peak_normalize, resample_poly_host
    from ..ops.hpss import hpss

    key = str(wav)
    if key not in _HELDOUT_AUDIO:
        y, sr0 = load_wav(wav)
        y = resample_poly_host(peak_normalize(y), sr0, SR)
        if band:
            from ..models.htdemucs import separate_stems_device

            stems = separate_stems_device(jnp.asarray(y), SR, shifts=1)
            if stems is not None and "guitar" in stems:
                y = np.asarray(stems["guitar"], np.float32)
        _HELDOUT_AUDIO[key] = np.asarray(hpss(jnp.asarray(y))[0])
    return _HELDOUT_AUDIO[key]


def _heldout_note_pr(
    params, *, production: bool = True
) -> tuple[float, float] | None:
    """(recall, precision) of decoded events vs the EXACT note ground truth
    of the committed held-out corpus (tests/data/heldout/), onset ±50 ms,
    pitch exact — the aligned AMT metric. `params=None` runs the weight-free
    salience baseline, the bar a trained CNN must clear on the same ground.

    production=True measures what the product emits: band clips go through
    htdemucs guitar-stem selection (as runtime/pipeline.py does) and the
    decoded events pass the pipeline's harmonic-duplicate filter
    (theory/postprocess.remove_harmonic_duplicates — reference
    musical_postprocessor.py:64-132). production=False is the raw decoder
    on the HPSS mix, printed for model-quality visibility.

    The golden-CSV recall below compares against the reference's
    ACCOMPANIMENT artifact (chord tones at strums on an offset-shifted
    timeline), which is not AMT ground truth: the shipped checkpoint scores
    0.125/0.019 on it while scoring ~1.0/1.0 on real note GT — kept only as
    a legacy real-recording signal, not a gate."""
    import json
    from pathlib import Path

    held = Path(__file__).resolve().parent.parent.parent / "tests" / "data" / "heldout"
    wavs = sorted(held.glob("heldout_*.wav"))
    if not wavs:
        return None
    from ..io import load_wav, peak_normalize, resample_poly_host
    from ..ops.hpss import hpss
    from ..theory.postprocess import remove_harmonic_duplicates

    rs, ps = [], []
    for wav in wavs:
        meta = json.loads(wav.with_suffix(".json").read_text())
        gt = meta["notes"]
        if production:
            yh = jnp.asarray(_heldout_amt_input(wav, bool(meta.get("band"))))
        else:
            y, sr0 = load_wav(wav)
            y = resample_poly_host(peak_normalize(y), sr0, SR)
            yh = jnp.asarray(np.asarray(hpss(jnp.asarray(y))[0]))
        if params is None:
            onset, frame = bp.salience_posteriors(yh, SR)
        else:
            onset, frame = bp.cnn_apply(params, bp.hcqt(yh, SR))[:2]
        est = decode_events(onset, frame)
        if production:
            est = remove_harmonic_duplicates(est)
        hit = sum(
            1 for g in gt
            if any(e.pitch_midi == g["pitch"] and abs(e.start_time_s - g["start"]) <= 0.05 for e in est)
        )
        phit = sum(
            1 for e in est
            if any(g["pitch"] == e.pitch_midi and abs(g["start"] - e.start_time_s) <= 0.05 for g in gt)
        )
        rs.append(hit / max(len(gt), 1))
        ps.append(phit / max(len(est), 1))
    return float(np.mean(rs)), float(np.mean(ps))


def _heldout_note_pr_salience() -> tuple[float, float] | None:
    return _heldout_note_pr(None)


def _golden_note_recall(params) -> float | None:
    """Recall of the reference's note_events.csv (onset ±50 ms, exact
    pitch) when this CNN's posteriors are decoded on the golden WAV's
    HPSS-harmonic. NOTE: that CSV is the reference's accompaniment-mode
    artifact (chord tones at detected strums, offset-relative timeline) —
    see _heldout_note_pr for the aligned AMT metric."""
    import csv

    from .golden import GOLDEN_DIR as golden
    from .golden import golden_audio, golden_available

    csv_path = golden / "out" / "note_events.csv"
    if not golden_available("note_events.csv"):
        return None
    _y, y_harm, _yp = golden_audio()
    onset, frame = bp.cnn_apply(params, bp.hcqt(jnp.asarray(y_harm), SR))[:2]
    est = decode_events(onset, frame)
    ref = [
        (float(r["start_time_s"]), int(r["pitch_midi"]))
        for r in csv.DictReader(open(csv_path))
    ]
    if not ref:
        return None
    hit = sum(
        1
        for rs, rp in ref
        if any(e.pitch_midi == rp and abs(e.start_time_s - rs) <= 0.05 for e in est)
    )
    return hit / len(ref)


def _golden_chord_parity(params):
    """The chord chroma folds the AMT frame posteriors, so shipping a new
    AMT model must not regress the golden chord timeline: time-weighted
    overlap vs the reference's chords.json + exact progression check."""
    import json

    golden = Path("/root/reference/data/jobs/c34b660dfb454be486983b1913bab38c")
    if not (golden / "out" / "chords.json").exists():
        return None, True
    from ..chords.extract import CHROMA_FPS, salience_chroma
    from ..chords.segments import frames_to_segments
    from ..models import crf_chords
    from .golden import golden_audio

    yg, y_harm, _yp = golden_audio()
    _on, frame_post = bp.cnn_apply(params, bp.hcqt(jnp.asarray(y_harm), SR))[:2]
    t_ch = yg.shape[-1] // int(round(SR / CHROMA_FPS)) + 1
    chroma = salience_chroma(frame_post, t_ch)
    chroma_n = chroma / (jnp.linalg.norm(chroma, axis=0, keepdims=True) + 1e-9)
    crf_params = crf_chords.load_params() or crf_chords.template_emission_params()
    path, conf = crf_chords.decode(crf_params, chroma_n.T)
    times = np.arange(t_ch, dtype=np.float32) / CHROMA_FPS
    segs = frames_to_segments(np.asarray(path), np.asarray(conf), times, crf_chords.LABELS, min_len=0.25)

    ref = json.loads((golden / "out" / "chords.json").read_text())
    offset = 0.79  # reference timeline is normalized by its beat offset

    def label_at(segments, t):
        for c in segments:
            s0 = c["start"] if isinstance(c, dict) else c.start
            s1 = c["end"] if isinstance(c, dict) else c.end
            if s0 <= t < s1:
                return c["label"] if isinstance(c, dict) else c.label
        return None

    ts = np.arange(0.0, 14.0, 0.05)
    agree = sum(1 for t in ts if label_at(ref, t) == label_at(segs, t + offset))
    overlap = agree / len(ts)
    labels = [c.label for c in segs if c.label != "N"]
    collapsed = [l for i, l in enumerate(labels) if i == 0 or l != labels[i - 1]]
    prog_ok = collapsed == ["G:maj", "D:maj", "A:min", "G:maj", "D:maj", "C:maj", "G:maj"]
    return overlap, prog_ok


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=48)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="audiotabs_tpu/weights/basicpitch.npz")
    args = ap.parse_args(argv)
    res = train(args.clips, args.steps, args.batch, args.seed, args.out)
    return 0 if res["f_cnn"] > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
