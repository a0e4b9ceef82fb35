"""Measure the quality delta of DEMUCS_SHIFTS=1 vs 2 on the shipped checkpoint.

The reference runs demucs with shifts=2 (demucs_sep.py:183-191); our default
is DEMUCS_SHIFTS=1 (config.py) because the shift-averaging gain measured
below the SI-SDR noise floor of the reduced checkpoint. This tool produces
the numbers that justify (or refute) that deviation:

  * held-out synthetic multitracks: guitar-stem SI-SDR at shifts 1 vs 2
    (the same val set as the trainer's acceptance gates, seed 31000)
  * the golden WAV: guitar-stem RMS routing fraction at shifts 1 vs 2
    (solo-guitar recording — the transcription stem the pipeline consumes)

Run on the TPU (no args):  python -m audiotabs_tpu.train.shifts_eval
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax.numpy as jnp

from ..models import htdemucs as hd
from .htdemucs_train import build_clips, si_sdr


def main() -> int:
    params = hd.load_params()
    if params is None:
        print("no checkpoint", file=sys.stderr)
        return 1
    n_sources = params["tdecoder"][-1]["convtr_w"].shape[1] // 2
    names = hd.MODEL_STEMS["htdemucs_6s"][:n_sources]
    trans = "guitar" if n_sources >= 6 else "other"
    ti = names.index(trans)

    val_m, val_s, _ = build_clips(8, 31_000, n_sources=n_sources)
    report: dict = {"n_sources": n_sources, "stem": trans}
    for shifts in (1, 2):
        t0 = time.time()
        sdrs = []
        for i in range(val_m.shape[0]):
            if float(np.abs(val_s[i, ti]).max()) <= 1e-6:
                continue
            mono = val_m[i].mean(axis=0).astype(np.float32)
            stems = hd.separate_stems_device(mono, 44100, shifts=shifts)
            est = np.asarray(stems[trans])[: mono.shape[0]]
            sdrs.append(si_sdr(est, val_s[i, ti].mean(axis=0)))
        report[f"val_{trans}_sisdr_shifts{shifts}"] = round(float(np.mean(sdrs)), 3)
        report[f"wall_s_shifts{shifts}"] = round(time.time() - t0, 1)

    from .golden import golden_audio, golden_available

    if golden_available():
        y, _yh, _yp = golden_audio()  # 22.05 kHz mono
        for shifts in (1, 2):
            stems = hd.separate_stems_device(
                np.asarray(y, np.float32), 22050, shifts=shifts
            )
            r_g = float(jnp.sqrt(jnp.mean(jnp.square(stems[trans]))))
            r_m = float(np.sqrt(np.mean(np.square(y))))
            report[f"golden_{trans}_rms_frac_shifts{shifts}"] = round(r_g / r_m, 4)

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
