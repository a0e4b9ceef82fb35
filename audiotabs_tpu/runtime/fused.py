"""The fused per-song analysis program: one jitted call, one transfer.

The north-star design (BASELINE.json): "the whole audio→note-events path is
one jitted program". This module fuses every device-side stage of the
pipeline — HPSS harmonic extraction, beat activation, AMT posteriors,
chord chroma/emissions, and calibration characteristics — into a single
XLA program per bucket size. XLA shares the underlying STFT work across
stages and the host pays exactly one dispatch + one device→host transfer
per song instead of one per stage.

Host-side sequential decoders (DBN backtrack bookkeeping, note decoding,
quantization) consume the returned arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(
    jax.jit,
    static_argnames=("sr", "use_pallas", "switch_penalty", "separate", "chord_backend"),
)
def fused_analysis(
    y,
    sr: int,
    use_pallas: bool | None = None,
    switch_penalty: float = 2.5,
    separate: bool = False,
    chord_backend: str = "both",
    true_len=None,
    y_beat=None,
    y_mix=None,
):
    """y [T] float32 → dict of every device-computed feature the pipeline needs.

    ``separate=True`` activates the weight-free separation fallback: the
    HPSS percussive component stands in for the reference's drums stem as
    the beat-tracking source (reference pipeline.py:1649-1652 feeds the
    Demucs drums stem to beat tracking) while the harmonic component is the
    transcription stem — all inside the same single-dispatch program.

    ``chord_backend`` ("template" | "deep" | "both") selects which on-device
    chord decode(s) to run — the unused Viterbi scan is dead weight at
    trace time, not runtime.

    ``true_len`` (traced scalar, samples) masks chord emissions past the
    true song end to uniform so the global Viterbi backtrack near the crop
    point is not pulled by the wrap-padded tail (the padded frames repeat
    the song's OPENING chord).
    """
    from ..chords.extract import CHROMA_FPS
    from ..chords.templates import build_chord_library, emission_probs
    from ..models.basicpitch import cnn_apply, hcqt
    from ..models.basicpitch import load_params as load_bp
    from ..models.basicpitch import salience_posteriors
    from ..models.beat_rnn import beat_activation
    from ..ops.features import rms, spectral_centroid, spectral_rolloff
    from ..ops.hpss import hpss as hpss_op
    from ..ops.onset import onset_detect_frames, onset_strength
    from ..ops.spectral import stft
    from ..ops.hpss import hpss_masks

    out = {}

    # 1. harmonic/percussive split (harmonic shared by AMT + chords; the
    # percussive residual is the drums proxy when separate=True)
    y_harm, y_perc = hpss_op(y, use_pallas=use_pallas)
    out["y_harm"] = y_harm

    # 2. beat activation at 100 fps. The beat source, in priority order:
    # an explicit y_beat (the separated drums stem, passed as a DEVICE array
    # straight from the separation program — no host round-trip), else the
    # percussive component when separate=True (HPSS fallback), else the mix.
    # Energy gate on the drums stem: a drum-free recording (the golden WAV
    # is solo fingerpicked guitar) separates to a near-silent drums stem
    # whose activation is noise — beat F collapsed 0.69 → 0.11 before this
    # gate. Below 15% of the reference RMS the tracker falls back to the
    # MIX (y_mix — the separation program's input, already device-resident),
    # not the transcription stem. This is by DESIGN, not a patch around a
    # weak model: with the 6-source checkpoint the golden drums stem holds
    # 0.55% of the mix RMS (correct — there are no drums) and tracking that
    # near-silence scores beat F 0.25 vs 0.706 on the mix-percussive
    # fallback, while on held-out synth WITH drums the separated stem
    # matches the HPSS baseline (F 0.969) and the gate passes it through
    # (train/htdemucs_train.py golden_gates measures both paths every run).
    if y_beat is not None:
        if y_mix is not None:
            # the HPSS-percussive of the MIX: the exact signal the weight-
            # free fallback path tracks (golden beat F 0.69; the raw mix
            # gave 0.56 and the separated stem 0.375)
            fallback = hpss_op(y_mix, use_pallas=use_pallas)[1]
        else:
            fallback = y_perc
        r_beat = jnp.sqrt(jnp.mean(jnp.square(y_beat)))
        r_ref = jnp.sqrt(jnp.mean(jnp.square(y_mix if y_mix is not None else y)))
        use_drums = r_beat > 0.15 * r_ref
        out["beat_from_drums"] = use_drums
        out["beat_activation"] = beat_activation(
            jnp.where(use_drums, y_beat, fallback), sr, 100
        )
    else:
        out["beat_activation"] = beat_activation(y_perc if separate else y, sr, 100)

    # 3. AMT posteriors on the harmonic component: the trained Basic Pitch
    # CNN when its checkpoint exists (resolved at trace time), else the
    # weight-free harmonic salience. The chord CHROMA always folds the
    # salience frame posterior — chords and notes use separate feature
    # paths, exactly as the reference separates Basic Pitch (AMT) from
    # DeepChroma (chords); XLA CSEs the shared hCQT between the two.
    sal_onset, sal_frame = salience_posteriors(y_harm, sr)
    bp_params = load_bp()
    if bp_params is not None:
        onset_post, frame_post, _contour = cnn_apply(bp_params, hcqt(y_harm, sr))
    else:
        onset_post, frame_post = sal_onset, sal_frame
    out["amt_onset"] = onset_post
    out["amt_frame"] = frame_post

    # 4. chord chroma + template emissions at 10 fps. The chroma is the
    # pitch-class folding of the AMT frame posteriors (harmonics already
    # suppressed) — markedly closer to the reference's DeepChroma chord
    # timeline than raw CQT chroma on the golden artifacts.
    from ..chords.extract import salience_chroma

    hop = int(round(sr / CHROMA_FPS))
    t_ch = y.shape[-1] // hop + 1
    chroma = salience_chroma(sal_frame, t_ch)  # [12, t_ch]
    chroma_n = chroma / (jnp.linalg.norm(chroma, axis=0, keepdims=True) + 1e-9)
    energy = rms(y_harm, 2048, hop)
    energy = energy[:t_ch] / (jnp.max(energy[:t_ch]) + 1e-9)
    out["chroma"] = chroma_n
    out["chord_energy"] = energy
    labels, templates = build_chord_library("majmin7")
    emissions = emission_probs(chroma_n, energy, labels, templates)
    if true_len is not None:
        valid = jnp.arange(t_ch) * hop < true_len
        emissions = jnp.where(valid[None, :], emissions, 1.0 / emissions.shape[0])
    out["chord_emissions"] = emissions

    # 4b. chord Viterbi decode (decode/viterbi.py) — the whole template chord
    # path completes on-device; the host only segments the frame path
    if chord_backend in ("template", "both"):
        from ..decode.viterbi import viterbi_constant_switch

        chord_path, chord_conf = viterbi_constant_switch(emissions, switch_penalty)
        out["chord_path"] = chord_path
        out["chord_conf"] = chord_conf

    # 4b'. CRF chord decode (the default "deep" backend) also completes
    # on-device so the default config stays ONE dispatch per song. CRF
    # weights are resolved at trace time (template-derived emissions when
    # no trained checkpoint is present).
    if chord_backend in ("deep", "both"):
        from ..models import crf_chords
        from ..models import deepchroma as dcm

        crf_params = crf_chords.load_params() or crf_chords.template_emission_params()
        # trained DeepChroma DNN (resolved at trace time): chord-tone chroma
        # that actively suppresses melody/percussion, replacing the salience
        # folding for the CRF path (reference extract.py:45-67 uses
        # DeepChromaProcessor for exactly this stage)
        dc_params = dcm.load_params()
        if dc_params is not None:
            dc_feats = dcm.features(y_harm, sr)[:t_ch]
            dc_chroma = dcm.apply(dc_params, dc_feats)  # [t_ch, 12]
            out["dc_chroma"] = dc_chroma.T
            norm = jnp.linalg.norm(dc_chroma, axis=1, keepdims=True)
            feats_t = dc_chroma / jnp.maximum(norm, 1e-9)
        else:
            feats_t = chroma_n.T
        # silence gate: per-frame L2 normalization turns a near-silent
        # lead-in into amplified noise the CRF reads as a confident wrong
        # chord (the golden WAV grew a spurious leading G:min); zeroed
        # features give uniform emissions, so Viterbi's transition prior
        # extends the neighboring chord instead
        feats_t = jnp.where(
            energy[: feats_t.shape[0], None] > crf_chords.SILENCE_GATE_FRAC,
            feats_t,
            0.0,
        )
        if true_len is not None:
            valid = jnp.arange(feats_t.shape[0]) * hop < true_len
            # uniform emission past the song end: the backtrack then simply
            # extends the last real chord (transition prior), instead of
            # being pulled toward the wrap-padded opening chord
            feats_t = jnp.where(valid[:, None], feats_t, 0.0)
        crf_path, crf_conf = crf_chords.decode(crf_params, feats_t)
        out["crf_path"] = crf_path
        out["crf_conf"] = crf_conf

    # 4c. DBN beat decode (decode/dbn_beats.py) — Viterbi + backtrack
    # on-device; the host only picks activation peaks per beat window
    from ..decode.dbn_beats import _dbn_forward

    phases, intervals = _dbn_forward(out["beat_activation"])
    out["dbn_phases"] = phases.astype(jnp.int32)
    out["dbn_intervals"] = intervals.astype(jnp.int32)

    # 4d. full-track strum envelope (accompaniment/strum.py front end):
    # median-aggregated mel flux; segment-local peak picking runs on host
    from ..accompaniment.strum import _onset_strength_median

    # computed from the INPUT stem, not the harmonic: the reference feeds
    # its strum detector y_trans (pipeline.py:1884-1893), and HPSS removes
    # exactly the broadband attacks the median-mel envelope fires on
    strum_env = _onset_strength_median(y, sr, 512)
    out["strum_envelope"] = strum_env / (jnp.max(strum_env) + 1e-9)

    # 5. content-classifier window metrics (analysis/content_classifier.py),
    # computed for the standard 3 s / 1.5 s window grid over the bucket
    from ..analysis.content_classifier import _window_metrics

    win = 3 * sr
    hop_w = sr + sr // 2
    n = y.shape[-1]
    starts = [p for p in range(0, max(1, n - sr // 2), hop_w) if p + sr // 2 <= n]
    if starts:
        idx = jnp.asarray(starts)[:, None] + jnp.arange(win)[None, :]
        windows = jnp.where(idx < n, y[jnp.clip(idx, 0, n - 1)], 0.0)
        disp, dens, per, harm = _window_metrics(windows, sr)
        out["content_starts"] = jnp.asarray(starts)
        out["content_metrics"] = jnp.stack([disp, dens, per, harm], axis=1)

    # 5b. key CNN (trace-time): 24-class key probabilities when trained
    # weights exist; else the host falls back to Krumhansl profiles
    from ..models import key_cnn

    kc_params = key_cnn.load_params()
    if kc_params is not None:
        key_feats = key_cnn.features(y_harm, sr)
        key_mask = None
        if true_len is not None:
            # exclude the wrap-padded tail from the global time average
            key_mask = jnp.arange(key_feats.shape[0]) * (sr // 5) < true_len
        out["key_probs"] = key_cnn.apply(kc_params, key_feats, key_mask)

    # 6. calibration characteristics (audio_quality.py metrics)
    r = rms(y, 2048, 512)
    S = jnp.abs(stft(y, n_fft=1024, hop=512))
    mh, mp = hpss_masks(S, 17, 17, use_pallas=use_pallas)
    eh = jnp.sum((S * mh) ** 2)
    ep = jnp.sum((S * mp) ** 2)
    env = onset_strength(y, sr, hop=512, n_fft=1024)
    onsets = onset_detect_frames(env, delta=0.5, wait=4)
    out["char_rms_median"] = jnp.percentile(r, 50)
    out["char_noise_rms"] = jnp.percentile(r, 10)
    out["char_centroid"] = jnp.mean(spectral_centroid(y, sr, 2048, 512))
    out["char_rolloff"] = jnp.mean(spectral_rolloff(y, sr, 2048, 512))
    out["char_harm_ratio"] = jnp.where(eh + ep > 1e-9, eh / (eh + ep), 0.5)
    out["char_onset_density"] = jnp.sum(onsets) / (y.shape[-1] / sr)

    # halve the big device→host transfers (values are unit-scale posteriors
    # and waveforms; f16 round-trip error is inaudible/sub-threshold)
    for k in ("y_harm", "amt_onset", "amt_frame", "beat_activation"):
        out[k] = out[k].astype(jnp.float16)

    return out
