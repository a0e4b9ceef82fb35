"""audiotabs_tpu — a TPU-native audio→guitar-tabs transcription framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference app
``alvaroortegaangulo/audio-tabs`` (see SURVEY.md): upload a song, get back
chord progressions, beat-aligned note transcription, and six-string guitar
tablature as MusicXML / MIDI / PDF / CSV / JSON score.

Package layout (TPU-first, not a port):
  io/        host-side audio decode + device-side resampling
  ops/       fused DSP kernels: STFT, CQT-as-GEMM, HPSS, chroma, onset, pYIN
  models/    JAX model definitions: htdemucs, basic-pitch CNN, beat BLSTM,
             deep-chroma DNN, CRF chords, key CNN (+ torch-checkpoint porting)
  decode/    lax.scan sequential decoders: Viterbi, DBN beats, note HMM
  theory/    music-theory post-processing, quantizer, key spelling
  tab/       fretboard model, chord shapes, DP tab optimizer
  score/     ScoreData model + MusicXML/MIDI/CSV/LilyPond export (host CPU)
  analysis/  content classification, audio-quality calibration
  parallel/  mesh construction, shard_map batch runner
  runtime/   pipeline orchestrator, job storage/queue/API
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persist XLA executables across processes.

    Every pipeline stage is a jitted program with bucketed static shapes;
    first-compile dominates cold-start latency (e.g. ~40 s for the HPSS
    median program whose steady-state run is ~9 ms). The persistent cache
    makes every process after the first start warm.
    """
    import os

    try:
        import jax

        # CPU runs (tests/trainers force jax_platforms=cpu before importing
        # this package) get NO persistent cache: XLA:CPU executable
        # serialization can abort the whole process for some programs
        # (jax compilation_cache.put_executable_and_time →
        # executable.serialize() → SIGABRT, observed on the fused-analysis
        # program in the server test), and CPU compiles are cheap enough
        # that the fast tier ran in ~5 min cacheless for three rounds.
        platforms = str(getattr(jax.config, "jax_platforms", "") or os.environ.get("JAX_PLATFORMS", ""))
        if platforms.startswith("cpu"):
            return

        # the shared dir holds relay-compiled TPU executables from earlier
        # rounds (device-keyed, host-independent — warm starts survive
        # driver-host changes); only CPU entries were host-specific, and
        # CPU runs no longer cache at all (see above)
        cache_dir = os.environ.get(
            "AUDIOTABS_COMPILE_CACHE", os.path.expanduser("~/.cache/audiotabs_tpu/xla")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()
