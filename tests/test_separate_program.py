"""Unit tests for the single-dispatch separation program (models/htdemucs.py:
_separate_program and its MXU-friendly building blocks).

The program replaces the host-side apply_model window loop (reference runs
demucs' split/overlap-add on CPU, demucs_sep.py:183-191) with one jitted
resample → window → batched forward → OLA → resample pipeline.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import audiotabs_tpu.models.htdemucs as hd


@pytest.fixture(scope="module")
def tiny_params():
    return hd.init_params(jax.random.PRNGKey(0), channels=8, bottom=64, t_layers=2)


def test_up2_down2_match_fir_reference():
    """The banded-matmul resamplers are bit-level equivalents of the
    explicit FIR convolution they replaced."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(22050).astype(np.float32))
    up_ref = hd._fir_1d(x, 2.0 * jnp.asarray(hd._HALFBAND), lhs_dilation=2)
    up_new = hd._up2(x)
    assert up_new.shape == (44100,)
    np.testing.assert_allclose(np.asarray(up_new), np.asarray(up_ref), atol=2e-6)

    x2 = jnp.asarray(rng.standard_normal((3, 44100)).astype(np.float32))
    dn_ref = hd._fir_1d(x2, jnp.asarray(hd._HALFBAND), stride=2)
    dn_new = hd._down2(x2)
    assert dn_new.shape == (3, 22050)
    np.testing.assert_allclose(np.asarray(dn_new), np.asarray(dn_ref), atol=2e-6)


def test_resample_roundtrip_preserves_tone():
    sr = 22050
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 500 * t).astype(np.float32)
    down = hd._down2(hd._up2(jnp.asarray(tone)))
    err = np.abs(np.asarray(down)[200:-200] - tone[200:-200]).max()
    assert err < 1e-4, err


@pytest.mark.slow
def test_separate_program_matches_apply_model(tiny_params):
    """shifts=1 at the model rate: the fused program's windowing + OLA must
    reproduce the host apply_model loop exactly."""
    L = 44100
    y = (np.random.default_rng(0).standard_normal(L) * 0.1).astype(np.float32)
    prog = np.asarray(
        hd._separate_program(
            tiny_params, jnp.asarray(y), sr=44100, seg=8192, stride=6144,
            shifts=1, n_sources=4,
        )
    )
    p2 = dict(tiny_params)
    p2["meta_segment"] = np.asarray(8192, np.int64)
    ref = hd.apply_model(p2, np.stack([y, y]), 44100, shifts=1, overlap=0.25).mean(axis=1)
    rel = np.abs(prog - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 1e-5, rel


def test_program_config_single_source_of_truth():
    params = hd.load_params()
    if params is None:
        pytest.skip("no checked-in htdemucs checkpoint")
    cfg = hd.program_config(params, "htdemucs_6s", ["guitar", "other", "vocals"])
    assert cfg["seg"] % hd.ALIGN == 0
    assert cfg["stride"] % hd.ALIGN == 0
    assert cfg["names"][cfg["drums_idx"]] == "drums"
    # 4-source reduced checkpoint: priority resolves to "other"
    assert cfg["names"][cfg["stem_idx"]] == "other"
    assert "meta_segment" not in cfg["run_params"]


def test_load_params_cached_identity():
    """separate_stems_device keys its device upload on load_params identity;
    the loader must return the SAME object per path."""
    a = hd.load_params()
    b = hd.load_params()
    if a is None:
        pytest.skip("no checked-in htdemucs checkpoint")
    assert a is b


def test_separate_stems_device_shapes():
    params = hd.load_params()
    if params is None:
        pytest.skip("no checked-in htdemucs checkpoint")
    sr = 22050
    y = (np.random.default_rng(1).standard_normal(sr) * 0.1).astype(np.float32)
    stems = hd.separate_stems_device(y, sr, shifts=1)
    assert set(stems) == {"drums", "bass", "other", "vocals"}
    for v in stems.values():
        assert isinstance(v, jax.Array)
        assert v.shape == (sr,)
        assert np.isfinite(np.asarray(v)).all()
