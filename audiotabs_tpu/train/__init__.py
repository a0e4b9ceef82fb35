"""Training utilities: synthetic labeled data + trainers for the models
whose reference counterparts ship pretrained (SURVEY.md §2a N3–N8).

This environment has no released checkpoints and no egress, so weights are
produced by training on synthesized audio with exactly-known labels (beat
grids, note rolls) — the generator lives in train/synth.py, the trainers in
train/beat_rnn_train.py. Checked-in weights land in audiotabs_tpu/weights/
and are picked up by the models' load_params defaults.
"""
