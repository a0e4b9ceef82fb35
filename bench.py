"""Benchmark harness: audio-seconds transcribed per second per chip.

Runs the full pipeline (decode → harmonic → beats → pYIN/AMT → chords →
key → quantize → export) on a synthetic 30 s musical mix on the real
device, after a warm-up run so compile time is excluded, and prints ONE
JSON line for the driver:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against real-time (RTF): the reference's pipeline
is CPU-bound well below real time on the Demucs path; the BASELINE.md
north star is >30x real time for the full pipeline on one v5e chip.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np


def make_test_audio(duration_s: float = 30.0, sr: int = 22050) -> np.ndarray:
    """Synthetic pop-ish mix: chord pad + melody + percussive clicks."""
    rng = np.random.default_rng(0)
    n = int(duration_s * sr)
    t = np.arange(n) / sr
    y = np.zeros(n, dtype=np.float64)
    # chord pad: G D Am C loop, 2 s each
    chords = [(55, 59, 62), (50, 54, 57), (57, 60, 64), (48, 52, 55)]
    for i in range(int(duration_s // 2)):
        pitches = chords[i % 4]
        seg = slice(int(i * 2 * sr), int(min((i + 1) * 2, duration_s) * sr))
        ts = t[seg]
        for p in pitches:
            f = 440.0 * 2 ** ((p - 69) / 12)
            y[seg] += 0.12 * np.sin(2 * np.pi * f * ts)
    # melody: quarter notes at 120 bpm, G major scale walk
    scale = [67, 69, 71, 72, 74, 72, 71, 69]
    for i in range(int(duration_s * 2)):
        p = scale[i % 8]
        f = 440.0 * 2 ** ((p - 69) / 12)
        a, b = int(i * 0.5 * sr), int(min((i + 1) * 0.5, duration_s) * sr)
        ts = t[a:b] - t[a]
        y[a:b] += 0.3 * np.sin(2 * np.pi * f * ts) * np.exp(-ts * 3)
        y[a : a + 300] += 0.25 * rng.standard_normal(min(300, b - a))
    y /= np.abs(y).max() + 1e-9
    return (0.9 * y).astype(np.float32)


def _device_watchdog(timeout_s: float = 600.0) -> bool:
    """True iff the device answers a trivial round-trip within timeout_s.

    The axon relay can be down for hours at a stretch (r4: ~10 h outage);
    without this check a dead relay hangs the whole bench with no output,
    whereas an explicit JSON error line tells the driver what happened."""
    import threading

    ok = threading.Event()

    def probe():
        try:
            import jax
            import jax.numpy as jnp

            jax.device_get(jnp.ones((8,)) * 2.0)
            ok.set()
        except Exception:
            pass

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return ok.is_set()


def main() -> int:
    import shutil
    import tempfile

    if not _device_watchdog():
        print(
            json.dumps(
                {
                    "metric": "audio_seconds_transcribed_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "audio_s/s/chip",
                    "vs_baseline": 0.0,
                    "error": "device unavailable: trivial round-trip timed out (relay down?)",
                }
            )
        )
        return 1

    from audiotabs_tpu.io import write_wav
    from audiotabs_tpu.runtime.pipeline import run_pipeline

    duration = 30.0
    sr = 22050
    audio = make_test_audio(duration, sr)

    tmp = Path(tempfile.mkdtemp(prefix="audiotabs_bench_"))
    wav = tmp / "bench.wav"
    write_wav(wav, audio, sr)

    def run_once(tag: str) -> tuple[float, dict]:
        job = tmp / "jobs" / tag
        for sub in ("input", "work", "out"):
            (job / sub).mkdir(parents=True, exist_ok=True)
        t0 = time.perf_counter()
        result = run_pipeline(job, wav)
        wall = time.perf_counter() - t0
        assert result.score is not None
        prof = json.loads((job / "out" / "profile.json").read_text())
        return wall, prof

    # Warm up until timings stabilize: the first run compiles; further runs
    # re-warm the remote executable cache (its eviction is the main source
    # of non-reproducible numbers on the relay-attached TPU).
    prev = run_once("warmup0")[0]
    for i in range(1, 5):
        cur = run_once(f"warmup{i}")[0]
        if cur < prev * 1.2 and cur < duration / 5:  # stable and sane
            break
        prev = cur

    # min-of-5: relay round-trip latency swings +-50% between identical
    # dispatches; the minimum is the only stable estimator of program cost
    runs = [run_once(f"run{i}") for i in range(5)]
    wall, prof = min(runs, key=lambda r: r[0])

    audio_sec_per_sec = duration / wall
    # per-stage RTF (BASELINE.md: "RTF for the Demucs and CQT stages"):
    # "analysis" is the fused device program (CQT/HPSS/AMT/beats/chords in
    # one dispatch — the CQT-stage superset), "separation" the Demucs-or-
    # fallback stage; host stages reported alongside.
    stages = {
        k: round(duration / v, 2) for k, v in sorted(prof.items()) if v > 1e-4
    }

    # ---- the BASELINE.md north star, driver-visible: a 3-minute song
    # end-to-end in < 5 s on one chip. Separate bucket shape (180 s = 6x
    # the 30 s bucket) → its own warmup compile, then min-of-3 warm runs.
    long_dur = 180.0
    long_wav = tmp / "bench180.wav"
    write_wav(long_wav, make_test_audio(long_dur, sr), sr)

    def run_long(tag: str) -> float:
        job = tmp / "jobs" / tag
        for sub in ("input", "work", "out"):
            (job / sub).mkdir(parents=True, exist_ok=True)
        t0 = time.perf_counter()
        result = run_pipeline(job, long_wav)
        assert result.score is not None
        return time.perf_counter() - t0

    prev = run_long("long_warmup0")
    for i in range(1, 3):
        cur = run_long(f"long_warmup{i}")
        if cur < prev * 1.2 and cur < long_dur / 5:
            break
        prev = cur
    long_wall = min(run_long(f"long_run{i}") for i in range(3))

    # ---- BASELINE config 5 shape on one chip: 8×30 s songs through the
    # chunked/overlapped batch runner (runtime/batch_runner.py). Reported
    # best-effort: a compile-helper hiccup must not sink the headline line.
    batch_tp = None
    try:
        from audiotabs_tpu.runtime.batch_runner import transcribe_batch

        rng = np.random.default_rng(7)
        bpaths = []
        for i in range(8):
            y = audio + 0.01 * rng.standard_normal(len(audio)).astype(np.float32)
            p = tmp / f"b{i}.wav"
            write_wav(p, y.astype(np.float32), sr)
            bpaths.append(p)
        transcribe_batch(bpaths, tmp / "bwarm")  # compile + warm
        bwalls = []
        for i in range(3):
            t0 = time.perf_counter()
            transcribe_batch(bpaths, tmp / f"brun{i}")
            bwalls.append(time.perf_counter() - t0)
        batch_tp = round(8 * duration / min(bwalls), 3)
    except Exception:
        pass
    shutil.rmtree(tmp, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "audio_seconds_transcribed_per_sec_per_chip",
                "value": round(audio_sec_per_sec, 3),
                "unit": "audio_s/s/chip",
                "vs_baseline": round(audio_sec_per_sec / 1.0, 3),
                "stages_rtf": stages,
                "wall_s": round(wall, 3),
                "all_runs_s": [round(r[0], 3) for r in runs],
                "long_song_wall_s": round(long_wall, 3),
                "long_song_audio_s": long_dur,
                "long_song_audio_s_per_s": round(long_dur / long_wall, 3),
                **({"batch8_audio_s_per_s": batch_tp} if batch_tp else {}),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
