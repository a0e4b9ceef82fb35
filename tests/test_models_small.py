import numpy as np
import jax
import jax.numpy as jnp


def test_deepchroma_shapes():
    from audiotabs_tpu.models.deepchroma import apply, features, init_params

    sr = 22050
    y = jnp.asarray(np.random.default_rng(0).standard_normal(sr).astype(np.float32) * 0.1)
    feats = features(y, sr)
    T, D = feats.shape
    assert T >= 9  # ~10 fps over 1 s
    params = init_params(jax.random.PRNGKey(0), D)
    out = apply(params, feats)
    assert out.shape == (T, 12)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))


def test_crf_chords_template_emissions():
    from audiotabs_tpu.models.crf_chords import LABELS, decode, template_emission_params

    # synthetic chroma: C major for 30 frames, then A minor for 30
    T = 60
    chroma = np.zeros((T, 12), dtype=np.float32)
    chroma[:30, [0, 4, 7]] = 1.0
    chroma[30:, [9, 0, 4]] = 1.0
    chroma /= np.linalg.norm(chroma, axis=1, keepdims=True)
    params = template_emission_params()
    path, conf = decode(params, jnp.asarray(chroma))
    path = np.asarray(path)
    assert LABELS[path[10]] == "C:maj"
    assert LABELS[path[50]] in ("A:min", "C:maj")  # Am shares tones with C
    assert np.asarray(conf).min() > 0


def test_crf_chords_context_checkpoint_decode():
    """A checkpoint whose emission matrix is a multiple of the feature dim
    decodes through the SAME context window the trainer used: decode must
    context-stack [T, 12] → [T, 36] itself, and a context-lifted template
    (template on the center frame, zeros on the neighbors) must reproduce
    the plain template decode exactly."""
    from audiotabs_tpu.models.crf_chords import (
        context_stack,
        decode,
        template_emission_params,
    )

    T = 40
    chroma = np.zeros((T, 12), dtype=np.float32)
    chroma[:20, [0, 4, 7]] = 1.0
    chroma[20:, [7, 11, 2]] = 1.0
    chroma /= np.linalg.norm(chroma, axis=1, keepdims=True)

    # context_stack: identity at width 1; zero rows with zero neighbors stay
    # zero (the silence-gate uniform-emission contract)
    assert np.allclose(np.asarray(context_stack(jnp.asarray(chroma), 1)), chroma)
    z = context_stack(jnp.zeros((5, 12)), 3)
    assert z.shape == (5, 36) and not np.asarray(z).any()

    base = template_emission_params()
    lifted = dict(base)
    w = np.zeros((36, 25), dtype=np.float32)
    w[12:24] = np.asarray(base["emit_w"])
    lifted["emit_w"] = jnp.asarray(w)
    p0, c0 = decode(base, jnp.asarray(chroma))
    p1, c1 = decode(lifted, jnp.asarray(chroma))
    assert np.array_equal(np.asarray(p0), np.asarray(p1))
    assert np.allclose(np.asarray(c0), np.asarray(c1), atol=1e-6)


def test_deep_chord_backend_end_to_end(sine_wave):
    from audiotabs_tpu.chords import extract_chords

    # G major chord arpeggio-ish mix
    sr = 22050
    t = np.arange(3 * sr) / sr
    y = sum(
        0.3 * np.sin(2 * np.pi * 440 * 2 ** ((p - 69) / 12) * t) for p in (55, 59, 62)
    ).astype(np.float32)
    chroma, times, segs = extract_chords(y, sr, backend="deep")
    assert segs
    labels = {s.label for s in segs}
    assert "G:maj" in labels


def test_key_cnn_shapes():
    from audiotabs_tpu.models.key_cnn import apply, features, init_params, key_prediction_to_label

    sr = 22050
    y = jnp.asarray(np.random.default_rng(0).standard_normal(sr * 2).astype(np.float32) * 0.1)
    feats = features(y, sr)
    params = init_params(jax.random.PRNGKey(1))
    probs = apply(params, feats)
    assert probs.shape == (24,)
    np.testing.assert_allclose(float(np.asarray(probs).sum()), 1.0, atol=1e-4)
    label = key_prediction_to_label(np.asarray(probs))
    tonic, mode = label.split()
    assert mode in ("major", "minor")


def test_key_cnn_returns_none_without_weights(monkeypatch):
    monkeypatch.setenv("KEY_CNN_WEIGHTS", "off")
    from audiotabs_tpu.models.key_cnn import estimate_key_cnn

    assert estimate_key_cnn(np.zeros(22050, np.float32), 22050) is None


def test_key_cnn_trained_weights_load_and_predict():
    """The checked-in checkpoint (train/key_cnn_train.py gates: beats
    Krumhansl on held-out synthetic keys, golden WAV → G major) loads as
    numpy and produces a valid 24-class distribution."""
    from audiotabs_tpu.models.key_cnn import apply, features, load_params

    params = load_params()
    assert params is not None, "weights/key_cnn.npz missing"
    assert all(isinstance(v, np.ndarray) for v in params.values())
    y = jnp.asarray(np.random.default_rng(3).standard_normal(22050 * 2).astype(np.float32) * 0.1)
    probs = np.asarray(apply(params, features(y, 22050)))
    assert probs.shape == (24,)
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-4)
