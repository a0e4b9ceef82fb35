"""Synthetic labeled music generator.

Produces clips with exactly-known beat grids and note rolls, covering the
styles the pipeline must handle: drum-driven mixes, strummed chords with no
percussion (the golden WAV's style), and mixed arrangements — at tempi
spanning the DBN's 55–215 BPM range, with amplitude/noise variation so a
model trained here does not overfit a single timbre.
"""

from __future__ import annotations

import numpy as np

# Bump whenever any generator's clip distribution changes: trainer dataset
# caches under $TMPDIR fold this into their filenames so a generator change
# invalidates stale cached datasets from earlier rounds automatically.
SYNTH_VERSION = 9

_CHORDS = {
    "maj": (0, 4, 7),
    "min": (0, 3, 7),
    "maj7": (0, 4, 7, 11),
    "min7": (0, 3, 7, 10),
}


def _tone(f: float, t: np.ndarray, harmonics: int = 4, decay: float = 3.0) -> np.ndarray:
    y = np.zeros_like(t)
    for h in range(1, harmonics + 1):
        if f * h < 10000:
            y += (0.7**h) * np.sin(2 * np.pi * f * h * t)
    return y * np.exp(-decay * t)


def _pluck(
    f: float, t: np.ndarray, rng: np.random.Generator, decay: float = 2.0
) -> np.ndarray:
    """Plucked-string tone (Karplus-Strong-like additive approximation):
    1/h^r harmonic rolloff, per-harmonic damping, slight inharmonicity and
    random phases — much closer to a real guitar than a pure sine stack."""
    y = np.zeros_like(t)
    rolloff = rng.uniform(0.8, 1.6)
    damp = rng.uniform(0.5, 1.2)
    inharm = rng.uniform(0.0, 2e-4)
    for h in range(1, 9):
        fh = f * h * (1.0 + inharm * h * h)
        if fh > 9500:
            break
        ph = rng.uniform(0, 2 * np.pi)
        y += (1.0 / h**rolloff) * np.sin(2 * np.pi * fh * t + ph) * np.exp(
            -t * (decay + damp * h)
        )
    # pick attack: a few ms of filtered noise
    na = max(8, int(0.004 * (len(t) / (t[-1] + 1e-9) if len(t) > 1 else 22050)))
    na = min(na, len(t))
    y[:na] += 0.6 * rng.standard_normal(na) * np.linspace(1, 0, na)
    return y


def _noise_burst(rng: np.random.Generator, n: int, decay: float) -> np.ndarray:
    t = np.arange(n) / n
    return rng.standard_normal(n) * np.exp(-decay * t)


def synth_beat_clip(
    rng: np.random.Generator,
    duration_s: float = 12.0,
    sr: int = 22050,
) -> tuple[np.ndarray, np.ndarray]:
    """→ (mono audio [T], true beat times [s]). Style, tempo, key, phase and
    mix levels are drawn from the generator."""
    n = int(duration_s * sr)
    y = np.zeros(n, dtype=np.float64)
    tempo = float(np.exp(rng.uniform(np.log(58.0), np.log(205.0))))
    period = 60.0 / tempo
    phase = float(rng.uniform(0.0, period))
    # tempo drift: half the clips slowly speed up / slow down (up to ±6%
    # across the clip) — real players drift, and a tracker trained only on
    # metronomic grids over-commits to a single DBN tempo state
    drift = float(rng.uniform(-0.06, 0.06)) if rng.random() < 0.5 else 0.0
    # rubato intro in a third of clips: the first 2-4 beats run slower and
    # settle into tempo — the golden WAV's regime, where a tracker that
    # assumes a fixed grid places the opening beats early
    rubato_beats = int(rng.integers(2, 5)) if rng.random() < 0.33 else 0
    rubato_stretch = float(rng.uniform(1.1, 1.35))
    bl, tcur, bi = [], phase, 0
    while tcur < duration_s - 0.05:
        bl.append(tcur)
        stretch = rubato_stretch ** max(0, (rubato_beats - bi) / max(rubato_beats, 1)) if rubato_beats else 1.0
        tcur += period * stretch * (1.0 + drift * (tcur / duration_s))
        bi += 1
    beats = np.asarray(bl)
    # LABEL placement under rubato is madmom-style: human annotators (and
    # madmom's DBN output, which the golden gate scores against) lay a
    # near-constant grid through an expressive intro — the steady tempo
    # extrapolated BACK from the first settled beat — rather than tracking
    # each slowed pluck. The golden WAV's reference beats are exactly this
    # back-extrapolation (its first three plucks sit 0.13-0.24 s EARLY of
    # the annotated grid). Sounded events stay on the stretched grid;
    # training on pluck-placed labels teaches the net to fire on expressive
    # onsets, which is precisely the production failure being fixed.
    labels = beats
    if rubato_beats and len(beats) > rubato_beats + 1:
        labels = beats.copy()
        anchor = beats[rubato_beats]
        step = beats[rubato_beats + 1] - beats[rubato_beats]
        for i in range(rubato_beats):
            labels[i] = anchor - (rubato_beats - i) * step
        labels = labels[labels >= 0.02]
    # swing: off-eighths land late (0.5 → up to 0.64 of the beat) in a
    # third of clips
    swing = float(rng.uniform(0.54, 0.64)) if rng.random() < 0.33 else 0.5

    style = rng.choice(["drums", "strum", "both", "legato", "fingerpick"])
    root = int(rng.integers(40, 56))
    scale = np.array([0, 2, 4, 5, 7, 9, 11])
    prog = [root + int(rng.choice(scale)) for _ in range(4)]
    quals = [rng.choice(list(_CHORDS)) for _ in range(4)]
    beats_per_chord = int(rng.choice([2, 4]))

    # onset timing jitter (keeps learned peaks calibrated, not overfit to
    # exact grid positions) and occasional dropped/syncopated beats
    jit = rng.uniform(0.0, 0.02)
    sounded = np.maximum(0.0, beats + rng.uniform(-jit, jit, size=beats.shape))
    drop_p = float(rng.uniform(0.0, 0.25))
    keep = rng.uniform(size=beats.shape) > drop_p
    keep[0] = True

    # percussion at beats (kick/click), optional weak offbeats
    if style in ("drums", "both"):
        off_amp = float(rng.uniform(0.0, 0.5))
        for i, b in enumerate(sounded):
            if not keep[i]:
                continue
            a = int(b * sr)
            dur = int(0.06 * sr)
            if a + dur >= n:
                break
            amp = 0.5 * float(rng.uniform(0.7, 1.0))
            seg = np.arange(dur) / sr
            y[a : a + dur] += amp * np.sin(2 * np.pi * (150 * np.exp(-seg * 25) + 45) * seg) * np.exp(-seg * 25 / 0.06 * 4)
            y[a : a + dur // 2] += 0.6 * amp * _noise_burst(rng, dur // 2, 8.0)
            half = b + period * swing  # swung off-eighth
            ha = int(half * sr)
            if off_amp > 0.05 and ha + dur // 3 < n:
                y[ha : ha + dur // 3] += off_amp * 0.25 * _noise_burst(rng, dur // 3, 10.0)
            # drum fill: an occasional 16th-note burst run across the second
            # half of the beat — off-grid transients the tracker must NOT
            # lock onto
            if rng.uniform() < 0.06:
                for k16 in range(2, 4):
                    fa = int((b + k16 * period / 4) * sr)
                    fd = dur // 4
                    if fa + fd < n:
                        y[fa : fa + fd] += 0.35 * amp * _noise_burst(rng, fd, 9.0)

    # strummed chords at beats (slightly arpeggiated attacks); the legato
    # style sustains across beats with soft attacks — the hardest case for
    # a flux-based tracker (beats are marked mostly by chord changes)
    if style in ("strum", "both", "legato"):
        soft = style == "legato"
        for i, b in enumerate(sounded):
            if not keep[i] and not soft:
                continue
            if soft and i % beats_per_chord not in (0, beats_per_chord // 2):
                if rng.uniform() < 0.6:
                    continue
            ch = prog[(i // beats_per_chord) % 4]
            qual = quals[(i // beats_per_chord) % 4]
            amp = 0.22 * float(rng.uniform(0.6, 1.0))
            for k, iv in enumerate(_CHORDS[qual]):
                a = int((b + 0.004 * k) * sr)
                dur = min(int(period * sr * 0.95), n - a)
                if dur <= 0:
                    continue
                seg = np.arange(dur) / sr
                f = 440.0 * 2 ** ((ch + iv - 69) / 12)
                y[a : a + dur] += amp * _pluck(f, seg, rng, decay=2.0 / period)
            # strum attack transient — the only percussive cue in this style
            a = int(b * sr)
            dur = int(0.02 * sr)
            if a + dur < n:
                t_amp = 0.04 if soft else 0.12
                y[a : a + dur] += t_amp * _noise_burst(rng, dur, 6.0)

    # fingerpicked accompaniment (the golden WAV's style): alternating
    # root/fifth bass ON the beat, chord-tone arpeggios on the off-eighths,
    # no percussive bursts — beats are marked only by the bass plucks
    if style == "fingerpick":
        # pickup pluck BEFORE the first beat in half the clips — a real
        # onset that is NOT a beat (the golden WAV opens exactly this way;
        # a tracker trained without pickups locks its grid onto the pickup
        # and places every opening beat early)
        if rng.uniform() < 0.5 and beats[0] > 0.25:
            tp = float(beats[0] - rng.uniform(0.3, 0.6) * period)
            if tp > 0.02:
                a = int(tp * sr)
                d = min(int(period * sr * 0.5), n - a)
                if d > 0:
                    seg = np.arange(d) / sr
                    fp = 440.0 * 2 ** ((prog[0] - 69) / 12)
                    y[a : a + d] += 0.25 * _pluck(fp, seg, rng, decay=2.0 / period)
        for i, b in enumerate(sounded):
            if not keep[i]:
                continue
            ch = prog[(i // beats_per_chord) % 4]
            qual = quals[(i // beats_per_chord) % 4]
            bass_p = ch - 12 + (7 if i % 2 == 1 and rng.random() < 0.7 else 0)
            a = int(b * sr)
            dur = min(int(period * sr * 0.95), n - a)
            if dur > 0:
                seg = np.arange(dur) / sr
                fb = 440.0 * 2 ** ((bass_p - 69) / 12)
                y[a : a + dur] += 0.35 * float(rng.uniform(0.7, 1.0)) * _pluck(
                    fb, seg, rng, decay=1.5 / period
                )
            for frac in (0.25, swing, 0.75):  # swung middle eighth
                if rng.uniform() < 0.3:
                    continue
                iv = int(rng.choice(_CHORDS[qual]))
                a2 = int((b + frac * period) * sr)
                d2 = min(int(period * sr * 0.4), n - a2)
                if d2 > 0:
                    seg = np.arange(d2) / sr
                    f = 440.0 * 2 ** ((ch + iv - 69) / 12)
                    y[a2 : a2 + d2] += 0.16 * float(rng.uniform(0.6, 1.0)) * _pluck(
                        f, seg, rng, decay=2.5 / period
                    )

    # melody on beats or eighths
    if rng.uniform() < 0.7:
        div = rng.choice([1, 2])
        step = period / div
        t0 = phase
        while t0 < duration_s - step:
            p = root + 12 + int(rng.choice(scale))
            a = int(t0 * sr)
            dur = min(int(step * sr * 0.9), n - a)
            if dur > 0:
                seg = np.arange(dur) / sr
                f = 440.0 * 2 ** ((p - 69) / 12)
                y[a : a + dur] += 0.18 * _pluck(f, seg, rng, decay=3.0 / step)
            t0 += step

    # room smear (short exponential reverb tail) softens every attack
    if rng.uniform() < 0.5:
        tail = int(rng.uniform(0.03, 0.12) * sr)
        k = np.exp(-np.arange(tail) / (0.35 * tail))
        k /= k.sum()
        y = np.convolve(y, k)[:n]
    # fade-in intro (quiet first bars — the classic tracker failure mode)
    if rng.uniform() < 0.3:
        fade = int(rng.uniform(1.0, 3.0) * sr)
        y[:fade] *= np.linspace(0.15, 1.0, fade)
    y += rng.uniform(0.001, 0.01) * rng.standard_normal(n)
    peak = np.abs(y).max() + 1e-9
    return (0.9 * y / peak).astype(np.float32), labels.astype(np.float32)


def synth_note_clip(
    rng: np.random.Generator,
    duration_s: float = 6.0,
    sr: int = 22050,
    polyphony: int = 3,
) -> tuple[np.ndarray, list[tuple[float, float, int]]]:
    """→ (mono audio, [(start_s, end_s, midi_pitch), ...]) for AMT training.

    Timbres vary per phrase (pure sine / additive tone / plucked string)
    so the AMT model doesn't overfit a single spectral envelope — real
    inputs range from clean electronic tones to acoustic guitar."""
    n = int(duration_s * sr)
    y = np.zeros(n, dtype=np.float64)
    events: list[tuple[float, float, int]] = []
    t = float(rng.uniform(0.0, 0.3))
    timbre = rng.choice(["sine", "tone", "pluck"])
    while t < duration_s - 0.3:
        k = int(rng.integers(1, polyphony + 1))
        dur = float(rng.uniform(0.2, 0.9))
        base = int(rng.integers(40, 76))
        pitches = {base}
        while len(pitches) < k:
            pitches.add(int(np.clip(base + rng.choice([3, 4, 5, 7, 12]), 21, 96)))
        # re-articulation: strummed/fingerpicked chords repeat the SAME
        # pitch set every few hundred ms, each strum a separate labeled
        # event — the onset head must spike for re-struck pitches whose
        # frame posterior never drops (the golden WAV's dominant failure
        # mode before this existed: whole re-strums went undetected)
        n_strums = int(rng.choice([1, 1, 2, 3, 4]))
        gap = float(rng.uniform(0.3, 0.8))
        for s_i in range(n_strums):
            ts = t + s_i * gap
            if ts >= duration_s - 0.1:
                break
            for p in pitches:
                a = int(ts * sr)
                d = min(int(dur * sr), n - a)
                if d <= 0:
                    continue
                seg = np.arange(d) / sr
                f = 440.0 * 2 ** ((p - 69) / 12)
                amp = float(rng.uniform(0.15, 0.35))
                if timbre == "sine":
                    tone = np.sin(2 * np.pi * f * seg) * np.exp(-seg * rng.uniform(0.5, 3.0) / dur)
                elif timbre == "tone":
                    tone = _tone(f, seg, decay=2.5 / dur)
                else:
                    tone = _pluck(f, seg, rng, decay=2.0 / dur)
                y[a : a + d] += amp * tone
                events.append((ts, ts + dur, p))
        t += n_strums * gap if n_strums > 1 else 0.0
        t += float(rng.uniform(0.25, 0.8))
        if rng.uniform() < 0.15:  # occasional timbre change mid-clip
            timbre = rng.choice(["sine", "tone", "pluck"])
    y += rng.uniform(0.001, 0.008) * rng.standard_normal(n)
    peak = np.abs(y).max() + 1e-9
    return (0.9 * y / peak).astype(np.float32), events


def _piano_note(f: float, t: np.ndarray, rng: np.random.Generator, decay: float = 1.5) -> np.ndarray:
    """Struck-string tone: two slightly detuned unison strings, steep
    per-harmonic damping, and a hammer-noise attack — piano-like enough to
    be separable from the plucked-guitar timbre."""
    y = np.zeros_like(t)
    detune = rng.uniform(0.0005, 0.002)
    for fk in (f * (1 - detune), f * (1 + detune)):
        for h in range(1, 7):
            fh = fk * h * (1.0 + 3e-4 * h * h)
            if fh > 9000:
                break
            y += (1.0 / h**1.2) * np.sin(2 * np.pi * fh * t) * np.exp(-t * (decay + 1.8 * h))
    na = min(len(t), max(8, int(0.003 * len(t) / (t[-1] + 1e-9) if len(t) > 1 else 64)))
    y[:na] += 0.4 * rng.standard_normal(na) * np.linspace(1, 0, na)
    return 0.5 * y


def _pad_tone(f: float, t: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Sustained slow-attack pad (strings/organ-ish): odd+even harmonics,
    no decay, ~80 ms linear attack — the 6-stem "other" residual source,
    deliberately unlike both pluck and piano envelopes."""
    y = np.zeros_like(t)
    for h in range(1, 7):
        if f * h > 8000:
            break
        y += (1.0 / h) * np.sin(2 * np.pi * f * h * t + rng.uniform(0, 2 * np.pi))
    atk = min(len(t), max(1, int(0.08 * len(t) / (t[-1] + 1e-9) if len(t) > 1 else 64)))
    env = np.ones_like(t)
    env[:atk] = np.linspace(0, 1, atk)
    # slight amplitude vibrato so the pad is not a pure steady state
    env *= 1.0 + 0.08 * np.sin(2 * np.pi * rng.uniform(0.3, 1.5) * t)
    return 0.35 * y * env


def synth_multitrack(
    rng: np.random.Generator,
    duration_s: float = 3.0,
    sr: int = 44100,
    n_sources: int = 4,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """→ (mix [2, T], stems [n_sources, 2, T], beat_times [s]) in htdemucs
    stem order — (drums, bass, other, vocals) for 4 sources, plus
    (guitar, piano) for 6 (htdemucs_6s order, reference
    demucs_sep.py:30-36) — exact ground truth for separation training;
    stems are mono sources with random stereo panning.

    For 6 sources the plucked strums/fingerpicking live in the GUITAR stem
    (the reference's transcription priority stem), "other" becomes a
    sustained pad, and a solo-guitar arrangement is drawn ~25% of the time
    so the model learns to route solo acoustic recordings (the golden WAV's
    style) to the guitar stem with a silent drums stem."""
    n = int(duration_s * sr)
    tempo = float(np.exp(rng.uniform(np.log(70.0), np.log(170.0))))
    period = 60.0 / tempo
    beats = np.arange(rng.uniform(0, period), duration_s, period)
    root = int(rng.integers(40, 52))
    scale = np.array([0, 2, 4, 5, 7, 9, 11])
    prog = [root + int(rng.choice(scale)) for _ in range(4)]
    quals = [rng.choice(list(_CHORDS)) for _ in range(4)]

    drums = np.zeros(n)
    bass = np.zeros(n)
    other = np.zeros(n)
    vocals = np.zeros(n)

    # fixed per-clip percussion samples, reused for every hit — real drums
    # repeat the same physical sample; per-hit fresh noise would be
    # irreducible under a waveform loss and unlearnable by design
    kick_dur = int(0.05 * sr)
    kseg = np.arange(kick_dur) / sr
    kick = 0.8 * np.sin(2 * np.pi * (140 * np.exp(-kseg * 30) + 45) * kseg) * np.exp(-kseg * 60)
    snare = 0.5 * _noise_burst(rng, kick_dur, 5.0)
    hat_dur = int(0.02 * sr)
    hat = 0.25 * _noise_burst(rng, hat_dur, 12.0)

    guitar = np.zeros(n)
    piano = np.zeros(n)
    six = n_sources >= 6

    # arrangement: 4-source keeps the fixed full-band layout the shipped
    # checkpoint was trained on; 6-source draws ensembles, including the
    # solo-guitar case (the golden WAV's arrangement) often enough that
    # "route acoustic plucks to guitar, keep drums silent" is learnable
    if six:
        mode = str(rng.choice(["band", "band", "guitar_solo", "guitar_duo", "piano_led"]))
    else:
        mode = "band"
    has = {
        "drums": mode in ("band", "piano_led") or (mode == "guitar_duo" and rng.random() < 0.3),
        "bass": mode in ("band", "piano_led", "guitar_duo"),
        "vocals": mode in ("band", "piano_led") and rng.random() < 0.7,
        "other": (not six and mode == "band") or (six and mode == "band" and rng.random() < 0.6),
        "guitar": six and mode in ("band", "guitar_solo", "guitar_duo"),
        "piano": six and (mode == "piano_led" or (mode == "band" and rng.random() < 0.5)),
    }
    if not six:
        has.update({"drums": True, "bass": True, "vocals": True, "other": True})
    # 6-stem strums/arpeggios belong to the GUITAR stem; for the 4-stem
    # model they are the "other" residual, as before
    strum_target = guitar if six else other
    fingerpick = mode == "guitar_solo" and rng.random() < 0.5

    for i, b in enumerate(beats):
        a = int(b * sr)
        if has["drums"]:
            if a + kick_dur < n:
                drums[a : a + kick_dur] += kick
                if i % 2 == 1:
                    drums[a : a + kick_dur] += snare
            ha = int((b + period / 2) * sr)
            if ha + hat_dur < n:
                drums[ha : ha + hat_dur] += hat

        ch = prog[(i // 2) % 4]
        qual = quals[(i // 2) % 4]
        # bass: root note an octave down, one pluck per beat
        dur = min(int(period * sr * 0.9), n - a)
        if has["bass"] and dur > 0:
            seg = np.arange(dur) / sr
            fb = 440.0 * 2 ** ((ch - 24 - 69) / 12)
            bass[a : a + dur] += 0.6 * _pluck(fb, seg, rng, decay=2.0 / period)

        if has["guitar"] or not six:
            if fingerpick:
                # solo fingerpicking: alternating root/fifth bass pluck ON
                # the beat (the guitar covers the bass register itself) +
                # chord-tone arpeggios on the off-eighths
                bass_p = ch - 12 + (7 if i % 2 == 1 and rng.random() < 0.7 else 0)
                if dur > 0:
                    seg = np.arange(dur) / sr
                    fb = 440.0 * 2 ** ((bass_p - 69) / 12)
                    strum_target[a : a + dur] += 0.5 * float(rng.uniform(0.7, 1.0)) * _pluck(
                        fb, seg, rng, decay=1.5 / period
                    )
                for frac in (0.25, 0.5, 0.75):
                    if rng.uniform() < 0.3:
                        continue
                    iv = int(rng.choice(_CHORDS[qual]))
                    a2 = int((b + frac * period) * sr)
                    d2 = min(int(period * sr * 0.4), n - a2)
                    if d2 > 0:
                        seg = np.arange(d2) / sr
                        f = 440.0 * 2 ** ((ch + iv - 69) / 12)
                        strum_target[a2 : a2 + d2] += 0.25 * float(rng.uniform(0.6, 1.0)) * _pluck(
                            f, seg, rng, decay=2.5 / period
                        )
            elif i % 2 == 0 and dur > 0:
                # strummed chord every 2 beats (slightly arpeggiated attack)
                dur2 = min(int(period * sr * 1.8), n - a)
                seg = np.arange(dur2) / sr
                for k, iv in enumerate(_CHORDS[qual]):
                    f = 440.0 * 2 ** ((ch + iv - 69) / 12)
                    aa = min(a + int(0.005 * k * sr), n - 1)
                    d2 = min(dur2, n - aa)
                    strum_target[aa : aa + d2] += 0.3 * _pluck(f, seg[:d2], rng, decay=1.0 / period)

        # piano comping: chord stab on the offbeat (or every beat when
        # piano-led), distinct struck timbre
        if has["piano"]:
            stab_beat = (i % 2 == 1) or mode == "piano_led"
            if stab_beat and dur > 0:
                dur3 = min(int(period * sr * 1.2), n - a)
                seg = np.arange(dur3) / sr
                for iv in _CHORDS[qual]:
                    f = 440.0 * 2 ** ((ch + iv - 57) / 12)  # an octave up
                    piano[a : a + dur3] += 0.3 * _piano_note(f, seg, rng, decay=1.2 / period)

        # sustained pad holding the chord (6-stem "other" residual)
        if six and has["other"] and i % 2 == 0 and dur > 0:
            dur4 = min(int(period * sr * 2.0), n - a)
            seg = np.arange(dur4) / sr
            for iv in _CHORDS[qual][:3]:
                f = 440.0 * 2 ** ((ch + iv - 69) / 12)
                other[a : a + dur4] += 0.25 * _pad_tone(f, seg, rng)

    # vocals: vibrato melody phrases (the most "voiced" synthetic source)
    if has["vocals"]:
        t0 = float(rng.uniform(0, 0.4))
        while t0 < duration_s - 0.3:
            p = root + 24 + int(rng.choice(scale))
            dur = float(rng.uniform(0.3, 0.9))
            a = int(t0 * sr)
            d = min(int(dur * sr), n - a)
            if d > 0:
                seg = np.arange(d) / sr
                f0 = 440.0 * 2 ** ((p - 69) / 12)
                vib = f0 * (1.0 + 0.015 * np.sin(2 * np.pi * 5.5 * seg))
                phase = 2 * np.pi * np.cumsum(vib) / sr
                env = np.minimum(1, 8 * seg) * np.minimum(1, 8 * (seg[-1] - seg + 1e-3))
                vocals[a : a + d] += 0.5 * env * (
                    np.sin(phase) + 0.4 * np.sin(2 * phase) + 0.15 * np.sin(3 * phase)
                )
            t0 += dur + float(rng.uniform(0.05, 0.4))

    stems_mono = [drums, bass, other, vocals] + ([guitar, piano] if six else [])
    levels = rng.uniform(0.5, 1.0, size=len(stems_mono))
    pans = rng.uniform(0.35, 0.65, size=len(stems_mono))  # near-center panning
    stems = np.zeros((len(stems_mono), 2, n), dtype=np.float32)
    for k, st in enumerate(stems_mono):
        st = levels[k] * st
        stems[k, 0] = pans[k] * st
        stems[k, 1] = (1 - pans[k]) * st
    mix = stems.sum(axis=0)
    peak = np.abs(mix).max() + 1e-9
    g = 0.9 / peak
    return (mix * g).astype(np.float32), (stems * g).astype(np.float32), beats.astype(np.float32)


def synth_chord_clip(
    rng: np.random.Generator,
    duration_s: float = 12.0,
    sr: int = 22050,
) -> tuple[np.ndarray, list[tuple[float, float, int, str]]]:
    """→ (mono audio, [(start_s, end_s, root_pc, quality), ...]) for chord
    model training. Chords are strummed/sustained; a melody line and
    optional percussion add NON-chord-tone energy the model must learn to
    ignore (that is what a trained chroma net buys over raw salience)."""
    n = int(duration_s * sr)
    y = np.zeros(n, dtype=np.float64)
    tempo = float(np.exp(rng.uniform(np.log(65.0), np.log(160.0))))
    period = 60.0 / tempo
    beats = np.arange(rng.uniform(0, period), duration_s, period)
    root = int(rng.integers(40, 56))
    scale = np.array([0, 2, 4, 5, 7, 9, 11])
    beats_per_chord = int(rng.choice([2, 4]))
    labels: list[tuple[float, float, int, str]] = []

    # key modulation halfway through ~40% of clips (VERDICT r3 item 3:
    # harder corpus — the decoder must re-anchor, not latch onto one key)
    modulate_at = len(beats) // 2 if rng.uniform() < 0.4 else None

    i = 0
    while i < len(beats):
        if modulate_at is not None and i >= modulate_at:
            root = int(rng.integers(40, 56))
            modulate_at = None
        ch = root + int(rng.choice(scale))
        qual = rng.choice(["maj", "min"])
        start = beats[i]
        end = beats[min(i + beats_per_chord, len(beats) - 1)] if i + beats_per_chord < len(beats) else duration_s
        labels.append((float(start), float(end), ch % 12, str(qual)))
        # harder voicings, all label-preserving: an added 7th (dom7/maj7 on
        # maj, b7 on min — the majmin vocabulary folds 7ths into the triad
        # family, chords/chord_vocabulary semantics), an inversion (3rd or
        # 5th in the bass), and a sus4 that RESOLVES to the triad within
        # the span (labeled by the triad it resolves to, as annotators do)
        seventh = {"maj": int(rng.choice([10, 11])), "min": 10}[qual] if rng.uniform() < 0.35 else None
        inv_bass = int(rng.choice(list(_CHORDS[qual][1:]))) if rng.uniform() < 0.3 else 0
        sus_first = qual == "maj" and rng.uniform() < 0.2
        # strum at each beat of the chord span, with an alternating
        # root/fifth bass an octave down (real accompaniment is bass-heavy;
        # chord-tone targets still cover it — root and fifth ARE chord tones)
        for j in range(i, min(i + beats_per_chord, len(beats))):
            b = beats[j]
            a = int(b * sr)
            dur = min(int(period * sr * 1.5), n - a)
            if dur <= 0:
                continue
            seg = np.arange(dur) / sr
            ivs = list(_CHORDS[qual])
            if sus_first and j == i:
                ivs = [0, 5, 7]  # sus4 voicing on the first beat only
            if seventh is not None:
                ivs = ivs + [seventh]
            for k, iv in enumerate(ivs):
                f = 440.0 * 2 ** ((ch + iv - 69) / 12)
                aa = min(a + int(0.004 * k * sr), n - 1)
                d2 = min(dur, n - aa)
                y[aa : aa + d2] += 0.25 * _pluck(f, seg[:d2], rng, decay=1.5 / period)
            bass_iv = inv_bass if j % 2 == 0 else (7 if rng.random() < 0.7 else inv_bass)
            fb = 440.0 * 2 ** ((ch + bass_iv - 12 - 69) / 12)
            db = min(int(period * sr * 0.95), n - a)
            if db > 0:
                y[a : a + db] += rng.uniform(0.2, 0.4) * _pluck(fb, seg[:db], rng, decay=1.2 / period)
        i += beats_per_chord

    # melody of scale tones (often NON-chord tones — distractors)
    if rng.uniform() < 0.8:
        t0 = float(beats[0])
        while t0 < duration_s - 0.3:
            p = root + 12 + int(rng.choice(scale))
            a = int(t0 * sr)
            d = min(int(period * 0.9 * sr), n - a)
            if d > 0:
                seg = np.arange(d) / sr
                f = 440.0 * 2 ** ((p - 69) / 12)
                y[a : a + d] += rng.uniform(0.1, 0.25) * _pluck(f, seg, rng, decay=2.5 / period)
            t0 += period / rng.choice([1, 2])
    # percussion distractor
    if rng.uniform() < 0.5:
        for b in beats:
            a = int(b * sr)
            d = int(0.04 * sr)
            if a + d < n:
                y[a : a + d] += 0.2 * _noise_burst(rng, d, 8.0)

    y += rng.uniform(0.001, 0.008) * rng.standard_normal(n)
    peak = np.abs(y).max() + 1e-9
    return (0.9 * y / peak).astype(np.float32), labels


def synth_guitar_voicing_clip(
    rng: np.random.Generator,
    duration_s: float = 6.0,
    sr: int = 22050,
) -> tuple[np.ndarray, list[tuple[float, float, int]]]:
    """→ (mono audio, [(start_s, end_s, midi_pitch), ...]) of REAL guitar
    voicings: open-position chord shapes from the repo's own shape tables
    (tab/open_chords.py — 4-6 simultaneous strings, the voicings the golden
    WAV actually strums), strummed with per-string arpeggiation and
    re-strums, or fingerpicked bass+arpeggio patterns, with an optional
    melody on top. This is the polyphony regime synth_note_clip
    underweights (its chords are 1-3 stacked intervals, not guitar
    voicings), and it is what the AMT model must recall on the golden clip
    (reference amt/basic_pitch.py:55-71 handles this via pretraining)."""
    from ..tab.fretboard import STANDARD_TUNING, positions_to_pitches
    from ..tab.open_chords import OPEN_POSITION_CHORDS, shape_to_positions

    n = int(duration_s * sr)
    y = np.zeros(n, dtype=np.float64)
    events: list[tuple[float, float, int]] = []
    shape_names = list(OPEN_POSITION_CHORDS)
    tempo = float(np.exp(rng.uniform(np.log(60.0), np.log(140.0))))
    period = 60.0 / tempo
    style = str(rng.choice(["strum", "strum", "fingerpick", "melody_over_bed"]))

    t = float(rng.uniform(0.05, 0.3))
    while t < duration_s - 0.4:
        shape = OPEN_POSITION_CHORDS[shape_names[int(rng.integers(len(shape_names)))]]
        pitches = positions_to_pitches(shape_to_positions(shape), STANDARD_TUNING)
        span = period * float(rng.choice([2, 4]))  # chord hold
        if style == "melody_over_bed":
            # quiet sustained chord bed under a loud picked melody — the
            # 3-5x amplitude imbalance the solo "picked melody" regime has
            # (tests/data/heldout picked_melody: bed 0.10 vs melody 0.45);
            # the AMT must recall the bed tones, so they are fully labeled
            bed_amp = float(rng.uniform(0.05, 0.12))
            bed_dur = min(span * float(rng.uniform(0.85, 1.0)), duration_s - t)
            d = min(int(bed_dur * sr), n - int(t * sr))
            if d > 0:
                seg = np.arange(d) / sr
                for p in pitches[: int(rng.integers(3, min(5, len(pitches)) + 1))]:
                    f = 440.0 * 2 ** ((p - 69) / 12)
                    y[int(t * sr) : int(t * sr) + d] += bed_amp * _pluck(
                        f, seg, rng, decay=0.8 / period
                    )
                    events.append((t, t + d / sr, p))
            mel_amp = float(rng.uniform(0.3, 0.5))
            scale = np.array([0, 2, 4, 5, 7, 9, 11, 12])
            mel_root = int(pitches[-1]) + int(rng.choice([0, 12]))
            t_m = t
            while t_m < min(t + span, duration_s - 0.2):
                p = mel_root + int(rng.choice(scale))
                a = int(t_m * sr)
                d2 = min(int(period * float(rng.uniform(0.35, 0.6)) * sr), n - a)
                if d2 > 0:
                    seg2 = np.arange(d2) / sr
                    f = 440.0 * 2 ** ((p - 69) / 12)
                    y[a : a + d2] += mel_amp * _pluck(f, seg2, rng, decay=1.8 / period)
                    events.append((t_m, t_m + d2 / sr, p))
                t_m += period * float(rng.choice([0.5, 0.5, 1.0]))
        elif style == "strum":
            # strums every beat within the span; down-strums hit low→high
            # with ~4-8 ms per string, up-strums the reverse and lighter
            n_strums = max(1, int(span / period))
            for s_i in range(n_strums):
                ts = t + s_i * period
                if ts >= duration_s - 0.15:
                    break
                up = s_i % 2 == 1 and rng.random() < 0.5
                order = pitches[::-1] if up else pitches
                amp = float(rng.uniform(0.14, 0.3)) * (0.7 if up else 1.0)
                dt = float(rng.uniform(0.004, 0.009))
                dur = float(rng.uniform(0.7, 1.0)) * period
                for k, p in enumerate(order):
                    a = int((ts + k * dt) * sr)
                    d = min(int(dur * sr), n - a)
                    if d <= 0:
                        continue
                    seg = np.arange(d) / sr
                    f = 440.0 * 2 ** ((p - 69) / 12)
                    y[a : a + d] += amp * _pluck(f, seg, rng, decay=1.5 / period)
                    events.append((ts + k * dt, ts + k * dt + dur, p))
        else:
            # fingerpick: bass (lowest string) on the beat, upper strings on
            # the off-eighths — sparse but fully labeled
            n_beats = max(1, int(span / period))
            upper = pitches[-3:]
            for b_i in range(n_beats):
                ts = t + b_i * period
                if ts >= duration_s - 0.15:
                    break
                bass_p = pitches[0] if b_i % 2 == 0 else pitches[min(1, len(pitches) - 1)]
                a = int(ts * sr)
                d = min(int(period * 0.95 * sr), n - a)
                if d > 0:
                    seg = np.arange(d) / sr
                    f = 440.0 * 2 ** ((bass_p - 69) / 12)
                    y[a : a + d] += 0.3 * _pluck(f, seg, rng, decay=1.2 / period)
                    events.append((ts, ts + d / sr, bass_p))
                for frac in (0.25, 0.5, 0.75):
                    if rng.uniform() < 0.35:
                        continue
                    p = int(rng.choice(upper))
                    a2 = int((ts + frac * period) * sr)
                    d2 = min(int(period * 0.45 * sr), n - a2)
                    if d2 > 0:
                        seg = np.arange(d2) / sr
                        f = 440.0 * 2 ** ((p - 69) / 12)
                        y[a2 : a2 + d2] += 0.18 * _pluck(f, seg, rng, decay=2.0 / period)
                        events.append((ts + frac * period, ts + frac * period + d2 / sr, p))
        t += span + float(rng.uniform(0.0, 0.1))

    # optional melody over the chords (octave above, non-labeled distractors
    # would be wrong here: melody notes ARE real notes, so label them)
    if rng.uniform() < 0.4:
        t0 = float(rng.uniform(0.1, 0.5))
        scale = np.array([0, 2, 4, 5, 7, 9, 11])
        root = 64
        while t0 < duration_s - 0.3:
            p = root + int(rng.choice(scale))
            a = int(t0 * sr)
            d = min(int(period * 0.8 * sr), n - a)
            if d > 0:
                seg = np.arange(d) / sr
                f = 440.0 * 2 ** ((p - 69) / 12)
                y[a : a + d] += 0.16 * _pluck(f, seg, rng, decay=2.5 / period)
                events.append((t0, t0 + d / sr, p))
            t0 += period * float(rng.choice([0.5, 1.0]))

    y += rng.uniform(0.001, 0.006) * rng.standard_normal(n)
    peak = np.abs(y).max() + 1e-9
    return (0.9 * y / peak).astype(np.float32), events


_MAJOR_DEGREES = [(0, "maj"), (2, "min"), (4, "min"), (5, "maj"), (7, "maj"), (9, "min")]
_MINOR_DEGREES = [(0, "min"), (3, "maj"), (5, "min"), (7, "min"), (8, "maj"), (10, "maj")]


def synth_key_clip(
    rng: np.random.Generator,
    duration_s: float = 12.0,
    sr: int = 22050,
) -> tuple[np.ndarray, int, str]:
    """→ (mono audio, tonic_pc, mode) for key-classification training.
    Diatonic chord progressions anchored on the tonic, plus a scale melody."""
    n = int(duration_s * sr)
    y = np.zeros(n, dtype=np.float64)
    mode = str(rng.choice(["major", "minor"]))
    tonic = int(rng.integers(40, 52))
    degrees = _MAJOR_DEGREES if mode == "major" else _MINOR_DEGREES
    scale = (
        np.array([0, 2, 4, 5, 7, 9, 11]) if mode == "major" else np.array([0, 2, 3, 5, 7, 8, 10])
    )
    tempo = float(np.exp(rng.uniform(np.log(65.0), np.log(150.0))))
    period = 60.0 / tempo
    beats = np.arange(rng.uniform(0, period), duration_s, period)
    # triple meter included: a CNN trained only on duple-meter comping was
    # badly out of distribution on waltz fingerpicking (the held-out
    # waltz_fingerpick clip read as F minor — two accidentals the audio
    # never sounds)
    beats_per_chord = int(rng.choice([2, 3, 4]))
    # waltz voicing pattern for most triple-meter clips: one long bass on
    # beat 1, upper chord tones on beats 2/3 — the register/decay profile
    # that confused the duple-trained net
    waltz = beats_per_chord == 3 and rng.random() < 0.7

    # progression: start and end on the tonic, wander diatonically between
    n_chords = max(2, len(beats) // beats_per_chord)
    prog = [degrees[0]]
    for _ in range(n_chords - 2):
        prog.append(degrees[int(rng.integers(0, len(degrees)))])
    prog.append(degrees[0])

    # bass emphasis like real fingerpicked/strummed guitar: alternating
    # root/fifth bass an octave down — without this cue the key CNN learns
    # to read a prominent dominant in the bass register as the tonic
    bass_amp = rng.uniform(0.2, 0.45)
    for i, b in enumerate(beats):
        deg, qual = prog[min(i // beats_per_chord, len(prog) - 1)]
        ch = tonic + deg
        a = int(b * sr)
        dur = min(int(period * sr * 1.5), n - a)
        if dur <= 0:
            continue
        seg = np.arange(dur) / sr
        if waltz and i % 3:
            # beats 2/3: two upper chord tones, no bass
            for k, iv in enumerate(list(_CHORDS[qual])[1:3]):
                f = 440.0 * 2 ** ((ch + iv - 69) / 12)
                aa = min(a + int(0.004 * k * sr), n - 1)
                d2 = min(dur, n - aa)
                y[aa : aa + d2] += 0.22 * _pluck(f, seg[:d2], rng, decay=1.8 / period)
            continue
        for k, iv in enumerate(_CHORDS[qual]):
            f = 440.0 * 2 ** ((ch + iv - 69) / 12)
            aa = min(a + int(0.004 * k * sr), n - 1)
            d2 = min(dur, n - aa)
            y[aa : aa + d2] += 0.25 * _pluck(f, seg[:d2], rng, decay=1.5 / period)
        if waltz:
            # beat 1: the bass note rings through the whole measure
            fb = 440.0 * 2 ** ((ch - 12 - 69) / 12)
            db = min(int(period * sr * 2.8), n - a)
            if db > 0:
                y[a : a + db] += bass_amp * _pluck(fb, seg[:db] if db <= dur else np.arange(db) / sr, rng, decay=0.8 / period)
            continue
        bass_p = ch - 12 + (7 if i % 2 == 1 and rng.random() < 0.7 else 0)
        fb = 440.0 * 2 ** ((bass_p - 69) / 12)
        db = min(int(period * sr * 0.95), n - a)
        if db > 0:
            y[a : a + db] += bass_amp * _pluck(fb, seg[:db], rng, decay=1.2 / period)

    # scale melody reinforces the key
    t0 = float(beats[0]) if len(beats) else 0.0
    while t0 < duration_s - 0.3:
        p = tonic + 12 + int(rng.choice(scale))
        a = int(t0 * sr)
        d = min(int(period * 0.9 * sr), n - a)
        if d > 0:
            seg = np.arange(d) / sr
            f = 440.0 * 2 ** ((p - 69) / 12)
            y[a : a + d] += rng.uniform(0.1, 0.22) * _pluck(f, seg, rng, decay=2.5 / period)
        t0 += period / rng.choice([1, 2])

    y += rng.uniform(0.001, 0.006) * rng.standard_normal(n)
    peak = np.abs(y).max() + 1e-9
    return (0.9 * y / peak).astype(np.float32), tonic % 12, mode
