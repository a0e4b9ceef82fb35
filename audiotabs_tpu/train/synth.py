"""Synthetic labeled music generator.

Produces clips with exactly-known beat grids and note rolls, covering the
styles the pipeline must handle: drum-driven mixes, strummed chords with no
percussion (the golden WAV's style), and mixed arrangements — at tempi
spanning the DBN's 55–215 BPM range, with amplitude/noise variation so a
model trained here does not overfit a single timbre.
"""

from __future__ import annotations

import numpy as np

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
    beats = np.arange(phase, duration_s - 0.05, period)

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
            half = b + period / 2
            ha = int(half * sr)
            if off_amp > 0.05 and ha + dur // 3 < n:
                y[ha : ha + dur // 3] += off_amp * 0.25 * _noise_burst(rng, dur // 3, 10.0)

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
            for frac in (0.25, 0.5, 0.75):
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
    return (0.9 * y / peak).astype(np.float32), beats.astype(np.float32)


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


def synth_multitrack(
    rng: np.random.Generator,
    duration_s: float = 3.0,
    sr: int = 44100,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """→ (mix [2, T], stems [4, 2, T], beat_times [s]) in htdemucs stem
    order (drums, bass, other, vocals) — exact ground truth for separation
    training; stems are mono sources with random stereo panning."""
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

    for i, b in enumerate(beats):
        a = int(b * sr)
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
        if dur > 0:
            seg = np.arange(dur) / sr
            fb = 440.0 * 2 ** ((ch - 24 - 69) / 12)
            bass[a : a + dur] += 0.6 * _pluck(fb, seg, rng, decay=2.0 / period)
        # other: strummed chord every 2 beats
        if i % 2 == 0 and dur > 0:
            dur2 = min(int(period * sr * 1.8), n - a)
            seg = np.arange(dur2) / sr
            for k, iv in enumerate(_CHORDS[qual]):
                f = 440.0 * 2 ** ((ch + iv - 69) / 12)
                aa = min(a + int(0.005 * k * sr), n - 1)
                d2 = min(dur2, n - aa)
                other[aa : aa + d2] += 0.3 * _pluck(f, seg[:d2], rng, decay=1.0 / period)

    # vocals: vibrato melody phrases (the most "voiced" synthetic source)
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

    stems_mono = [drums, bass, other, vocals]
    levels = rng.uniform(0.5, 1.0, size=4)
    pans = rng.uniform(0.35, 0.65, size=4)  # near-center panning
    stems = np.zeros((4, 2, n), dtype=np.float32)
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

    i = 0
    while i < len(beats):
        ch = root + int(rng.choice(scale))
        qual = rng.choice(["maj", "min"])
        start = beats[i]
        end = beats[min(i + beats_per_chord, len(beats) - 1)] if i + beats_per_chord < len(beats) else duration_s
        labels.append((float(start), float(end), ch % 12, str(qual)))
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
            for k, iv in enumerate(_CHORDS[qual]):
                f = 440.0 * 2 ** ((ch + iv - 69) / 12)
                aa = min(a + int(0.004 * k * sr), n - 1)
                d2 = min(dur, n - aa)
                y[aa : aa + d2] += 0.25 * _pluck(f, seg[:d2], rng, decay=1.5 / period)
            bass_p = ch - 12 + (7 if j % 2 == 1 and rng.random() < 0.7 else 0)
            fb = 440.0 * 2 ** ((bass_p - 69) / 12)
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
    beats_per_chord = int(rng.choice([2, 4]))

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
        for k, iv in enumerate(_CHORDS[qual]):
            f = 440.0 * 2 ** ((ch + iv - 69) / 12)
            aa = min(a + int(0.004 * k * sr), n - 1)
            d2 = min(dur, n - aa)
            y[aa : aa + d2] += 0.25 * _pluck(f, seg[:d2], rng, decay=1.5 / period)
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
