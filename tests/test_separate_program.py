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
    # a 6-source checkpoint resolves the reference's first-priority GUITAR
    # stem (demucs_sep.py:107-135); a 4-source one falls through to "other"
    want = "guitar" if cfg["n_sources"] >= 6 else "other"
    assert cfg["names"][cfg["stem_idx"]] == want
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
    cfg = hd.program_config(params, "htdemucs_6s", ["guitar"])
    assert set(stems) == set(cfg["names"])
    for v in stems.values():
        assert isinstance(v, jax.Array)
        assert v.shape == (sr,)
        assert np.isfinite(np.asarray(v)).all()


@pytest.mark.slow
def test_guitar_stem_selected_on_synthetic_mix(tmp_path, monkeypatch):
    """With a 6-source checkpoint, the pipeline must pick the GUITAR stem
    for transcription on a full-band synthetic mix (reference priority
    semantics: demucs_sep.py:107-135 + core/config.py:21-24)."""
    import json

    params = hd.load_params()
    if params is None:
        pytest.skip("no checked-in htdemucs checkpoint")
    cfg = hd.program_config(params, "htdemucs_6s", ["guitar", "other", "vocals"])
    if cfg["n_sources"] < 6:
        pytest.skip("4-source checkpoint has no guitar stem")
    from audiotabs_tpu.config import reload_settings
    from audiotabs_tpu.io import write_wav
    from audiotabs_tpu.runtime.pipeline import run_pipeline
    from audiotabs_tpu.train.synth import synth_multitrack

    monkeypatch.setenv("TRANSCRIPTION_MODE", "notes")
    monkeypatch.setenv("PAD_SECONDS_BUCKET", "3")
    reload_settings()
    mix, _stems, _beats = synth_multitrack(
        np.random.default_rng(4), 3.0, 44100, n_sources=6
    )
    wav = tmp_path / "band.wav"
    write_wav(wav, mix.mean(axis=0).astype(np.float32), 44100)
    job = tmp_path / "jobs" / "band"
    for sub in ("input", "work", "out"):
        (job / sub).mkdir(parents=True)
    run_pipeline(job, wav)
    bt = json.loads((job / "out" / "beat_times.json").read_text())
    assert bt["stem_source"] == "guitar", bt["stem_source"]


def test_chunked_forward_matches_unchunked(tiny_params, monkeypatch):
    """The _FWD_CHUNK-bounded lax.map path (long songs / shifts>1 stack more
    windows than one vmapped forward may hold — a ~60-window program crashed
    the remote AOT compiler) must be numerically identical to the single
    full-batch vmap."""
    L = 44100
    y = (np.random.default_rng(1).standard_normal(L) * 0.1).astype(np.float32)
    kw = dict(sr=44100, seg=8192, stride=6144, shifts=2, n_sources=4)
    full = np.asarray(hd._separate_program(tiny_params, jnp.asarray(y), **kw))
    monkeypatch.setattr(hd, "_FWD_CHUNK", 3)  # forces chunking + tail padding
    hd._separate_program.clear_cache()
    try:
        chunked = np.asarray(hd._separate_program(tiny_params, jnp.asarray(y), **kw))
    finally:
        hd._separate_program.clear_cache()
    rel = np.abs(chunked - full).max() / (np.abs(full).max() + 1e-9)
    assert rel < 1e-5, rel
