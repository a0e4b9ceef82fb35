"""Shared golden-WAV harness for trainer acceptance gates.

Every trainer gates its checkpoint against the reference's golden job
(`/root/reference/data/jobs/c34b660d…`). The load → peak-normalize →
resample → HPSS preamble was copy-pasted four times before this module;
a missed edit in one copy silently gates checkpoints against a different
signal. The audio and HPSS split are cached per process so candidate +
ratchet evaluations don't redo the host-side work.
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path

import numpy as np

GOLDEN_DIR = Path("/root/reference/data/jobs/c34b660dfb454be486983b1913bab38c")
SR = 22050


def golden_available(*artifacts: str) -> bool:
    """True when the golden input WAV and every named out/ artifact exist."""
    if not (GOLDEN_DIR / "input" / "upload.wav").exists():
        return False
    return all((GOLDEN_DIR / "out" / a).exists() for a in artifacts)


@lru_cache(maxsize=1)
def golden_audio() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """→ (mix, harmonic, percussive) at 22.05 kHz, peak-normalized —
    the signals the production pipeline derives from the golden WAV."""
    import jax.numpy as jnp

    from ..io import load_wav, peak_normalize, resample_poly_host
    from ..ops.hpss import hpss

    y, sr = load_wav(GOLDEN_DIR / "input" / "upload.wav")
    y = resample_poly_host(peak_normalize(y), sr, SR)
    yh, yp = hpss(jnp.asarray(y))
    return y, np.asarray(yh), np.asarray(yp)
