"""Fused-program behaviors that the pipeline depends on."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _chord_tone(pitches, dur, sr=22050, amp=0.25):
    t = np.arange(int(sr * dur)) / sr
    y = np.zeros_like(t)
    for p in pitches:
        y += amp * np.sin(2 * np.pi * 440.0 * 2 ** ((p - 69) / 12) * t)
    return y.astype(np.float32)


def test_true_len_masks_wrap_padded_chord_tail():
    """Wrap padding repeats the song's OPENING chord after the true end; the
    global Viterbi backtrack must not pull the last real frames toward it
    (VERDICT r2 self-review finding: fused decode over the padded bucket
    diverged from the host decode on cropped chroma)."""
    from audiotabs_tpu.chords.extract import CHROMA_FPS
    from audiotabs_tpu.models.crf_chords import LABELS
    from audiotabs_tpu.runtime.fused import fused_analysis

    sr = 22050
    # C major for 3.5 s, then A minor for 3.5 s; bucket pads to 10 s with a
    # wrapped copy of the C-major opening
    y = np.concatenate([_chord_tone((48, 52, 55), 3.5), _chord_tone((45, 48, 52), 3.5)])
    true_len = len(y)
    pad = int(10.0 * sr) - true_len
    y_pad = np.pad(y, (0, pad), mode="wrap")

    out = jax.device_get(
        fused_analysis(jnp.asarray(y_pad), sr, chord_backend="deep", true_len=true_len)
    )
    t_ch = int(true_len / sr * CHROMA_FPS) + 1
    path = np.asarray(out["crf_path"])[:t_ch]
    # the invariant is no LEAK of the wrap-padded opening chord into the
    # tail: extending the last real chord or decoding N (gated/zeroed
    # frames map to N since r4, crf_chords.decode) both satisfy it
    tail_labels = {LABELS[s] for s in path[-5:]}
    assert tail_labels <= {"A:min", "N"}, tail_labels
    assert "C:maj" not in tail_labels, tail_labels
    head_labels = {LABELS[s] for s in path[3:20]}
    assert head_labels == {"C:maj"}, head_labels


def test_crf_silence_gate_operating_range():
    """The 0.05 relative-energy gate (runtime/fused.py 4b'): a near-silent
    lead-in must NOT decode to a confident chord (it extends the neighbor
    via the transition prior), while a quiet-but-real chord (20 dB below
    the louder section) must still be decoded on its own evidence — the
    gate threshold has to sit between those two regimes."""
    from audiotabs_tpu.chords.extract import CHROMA_FPS
    from audiotabs_tpu.models.crf_chords import LABELS
    from audiotabs_tpu.runtime.fused import fused_analysis

    sr = 22050
    rng = np.random.default_rng(0)
    # 2 s of near-silence (noise at -52 dB rel. to the chord), then C major
    lead = (3e-4 * rng.standard_normal(2 * sr)).astype(np.float32)
    y = np.concatenate([lead, _chord_tone((48, 52, 55), 3.0)])
    out = jax.device_get(
        fused_analysis(jnp.asarray(y), sr, chord_backend="deep", true_len=len(y))
    )
    path = np.asarray(out["crf_path"])
    lead_frames = path[2 : int(1.8 * CHROMA_FPS)]
    body = path[int(2.5 * CHROMA_FPS) : int(4.5 * CHROMA_FPS)]
    # the lead-in must carry NO chord other than the body's (either N or
    # the extended C:maj — never a hallucinated different chord)
    assert set(np.unique(lead_frames)) <= {0} | set(np.unique(body)), (
        [LABELS[s] for s in np.unique(lead_frames)]
    )

    # quiet A-minor (amp 0.1x the C-major section) must survive the gate
    y2 = np.concatenate(
        [_chord_tone((48, 52, 55), 3.0), _chord_tone((45, 48, 52), 3.0, amp=0.025)]
    )
    out2 = jax.device_get(
        fused_analysis(jnp.asarray(y2), sr, chord_backend="deep", true_len=len(y2))
    )
    path2 = np.asarray(out2["crf_path"])
    quiet = [LABELS[s] for s in path2[int(3.6 * CHROMA_FPS) : int(5.6 * CHROMA_FPS)]]
    assert quiet.count("A:min") / len(quiet) >= 0.8, quiet


def test_chord_backend_gates_decodes():
    from audiotabs_tpu.runtime.fused import fused_analysis

    sr = 22050
    y = jnp.asarray(_chord_tone((48, 52, 55), 2.0))
    deep = jax.device_get(fused_analysis(y, sr, chord_backend="deep"))
    assert "crf_path" in deep and "chord_path" not in deep
    tmpl = jax.device_get(fused_analysis(y, sr, chord_backend="template"))
    assert "chord_path" in tmpl and "crf_path" not in tmpl
    both = jax.device_get(fused_analysis(y, sr, chord_backend="both"))
    assert "chord_path" in both and "crf_path" in both
