import numpy as np
import jax
import jax.numpy as jnp

from audiotabs_tpu.models.beat_rnn import (
    beat_activation,
    blstm_apply,
    init_params,
    onset_activation,
    spectral_features,
)


def test_spectral_features_shape(sine_wave):
    y, sr = sine_wave
    feats = spectral_features(jnp.asarray(y), sr, 100)
    T, D = feats.shape
    assert 95 <= T <= 105  # ~100 fps over 1 s
    assert D > 100  # 2x bands x 3 fft sizes
    assert np.isfinite(np.asarray(feats)).all()


def test_blstm_apply_random_params(sine_wave):
    y, sr = sine_wave
    feats = spectral_features(jnp.asarray(y), sr, 100)
    params = init_params(jax.random.PRNGKey(0), feats.shape[-1])
    act = blstm_apply(params, feats)
    act = np.asarray(act)
    assert act.shape == (feats.shape[0],)
    assert np.all((act >= 0) & (act <= 1))


def test_beat_activation_uses_blstm_when_params_given(sine_wave):
    y, sr = sine_wave
    feats = spectral_features(jnp.asarray(y), sr, 100)
    params = init_params(jax.random.PRNGKey(1), feats.shape[-1])
    act_nn = np.asarray(beat_activation(jnp.asarray(y), sr, 100, params=params))
    act_dsp = np.asarray(onset_activation(jnp.asarray(y), sr, 100))
    assert act_nn.shape[0] == feats.shape[0]
    # different paths → different outputs
    n = min(len(act_nn), len(act_dsp))
    assert not np.allclose(act_nn[:n], act_dsp[:n])


def test_beat_activation_heterogeneous_ensemble(sine_wave):
    """madmom's 8-net ensemble mixes architectures; ours must too. Members
    with DIFFERENT hidden sizes are grouped by shape signature and their
    activations averaged — the result equals the mean of the members' solo
    activations."""
    y, sr = sine_wave
    feats = spectral_features(jnp.asarray(y), sr, 100)
    m25 = init_params(jax.random.PRNGKey(0), feats.shape[-1], hidden=25)
    m25b = init_params(jax.random.PRNGKey(1), feats.shape[-1], hidden=25)
    m40 = init_params(jax.random.PRNGKey(2), feats.shape[-1], hidden=40)
    combined = dict(m25)
    combined["ensemble"] = [m25b, m40]
    act = np.asarray(beat_activation(jnp.asarray(y), sr, 100, params=combined))
    solo = [
        np.asarray(beat_activation(jnp.asarray(y), sr, 100, params=m))
        for m in (m25, m25b, m40)
    ]
    assert act.shape == solo[0].shape
    assert np.allclose(act, np.mean(solo, axis=0), atol=1e-5)
