"""JAX model definitions (checkpoint-portable) for the five NN components the
reference invokes as native dependencies (SURVEY.md §2a N3-N8):

  htdemucs.py    — hybrid transformer Demucs source separation (N3)
  basicpitch.py  — Basic Pitch AMT CNN: onset/frame/contour posteriors (N4)
  beat_rnn.py    — BLSTM beat activation + DSP fallback (N5)
  deepchroma.py  — deep chroma DNN (N6)
  crf_chords.py  — CRF chord recognition over deep chroma (N7)
  key_cnn.py     — global key classification CNN (N8)

Every model ships (a) a faithful JAX architecture with an init + a
state-dict converter hook for porting released checkpoints, and (b) a
DSP-driven default path so the framework is fully functional in
environments without the pretrained weights (like this zero-egress image).
"""
