import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiotabs_tpu.models.htdemucs import (
    ALIGN,
    apply_model,
    forward,
    init_params,
    separate_stems,
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_params(jax.random.PRNGKey(0), n_sources=4)


def test_forward_shapes(tiny_params):
    L = 4 * ALIGN
    mix = jnp.asarray(np.random.default_rng(0).standard_normal((2, L)).astype(np.float32) * 0.1)
    out = forward(tiny_params, mix)
    assert out.shape == (4, 2, L)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_apply_model_overlap_add(tiny_params):
    sr = 44100
    L = int(sr * 10.0)
    mix = (np.random.default_rng(1).standard_normal((2, L)) * 0.1).astype(np.float32)
    out = apply_model(tiny_params, mix, sr, shifts=1)
    assert out.shape == (4, 2, L)
    assert np.isfinite(out).all()


def test_separate_stems_none_without_weights(monkeypatch):
    monkeypatch.setenv("HTDEMUCS_WEIGHTS", "off")
    import audiotabs_tpu.models.htdemucs as hd

    monkeypatch.setattr(hd, "_PARAMS", None)  # bypass the process-wide cache
    y = np.zeros(44100, np.float32)
    assert separate_stems(y, 44100) is None
