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
