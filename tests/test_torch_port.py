"""Validate torch→JAX weight conversion against live torch modules."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def test_conv1d_torch_layout(rng):
    """htdemucs keeps torch conv layouts verbatim (OIH dimension numbers)."""
    from audiotabs_tpu.models.htdemucs import _conv1d

    m = torch.nn.Conv1d(3, 8, kernel_size=5, padding=2)
    x = rng.standard_normal((3, 64)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)[None]).numpy()
    got = np.asarray(
        _conv1d(
            jnp.asarray(x)[None],
            jnp.asarray(m.weight.detach().numpy()),
            jnp.asarray(m.bias.detach().numpy()),
            pad=2,
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_convtranspose1d_torch_layout(rng):
    from audiotabs_tpu.models.htdemucs import _convtr1d

    m = torch.nn.ConvTranspose1d(4, 6, kernel_size=8, stride=4)
    x = rng.standard_normal((4, 16)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)[None]).numpy()
    got = np.asarray(
        _convtr1d(
            jnp.asarray(x)[None],
            jnp.asarray(m.weight.detach().numpy()),
            jnp.asarray(m.bias.detach().numpy()),
            stride=4,
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_dense_conversion(rng):
    from audiotabs_tpu.models.torch_port import convert_dense

    m = torch.nn.Linear(10, 7)
    x = rng.standard_normal((5, 10)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    w, b = convert_dense(m.weight.detach().numpy(), m.bias.detach().numpy())
    got = np.asarray(jnp.asarray(x) @ w + b)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_blstm_conversion(rng):
    """torch bidirectional LSTM ↔ beat_rnn scan parity."""
    from audiotabs_tpu.models.beat_rnn import _lstm_scan
    from audiotabs_tpu.models.torch_port import convert_torch_blstm

    D, H, T = 6, 5, 20
    m = torch.nn.LSTM(D, H, num_layers=1, bidirectional=True)
    x = rng.standard_normal((T, D)).astype(np.float32)
    with torch.no_grad():
        ref, _ = m(torch.from_numpy(x)[:, None, :])
    ref = ref.numpy()[:, 0, :]  # [T, 2H]

    params = convert_torch_blstm({k: v.detach().numpy() for k, v in m.state_dict().items()}, 1, H)
    fwd = np.asarray(_lstm_scan(params["layers"][0]["fwd"], jnp.asarray(x)))
    bwd = np.asarray(_lstm_scan(params["layers"][0]["bwd"], jnp.asarray(x), reverse=True))
    got = np.concatenate([fwd, bwd], axis=-1)
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_conv2d_conversion(rng):
    from audiotabs_tpu.models.basicpitch import _conv
    from audiotabs_tpu.models.torch_port import convert_conv2d

    m = torch.nn.Conv2d(2, 4, kernel_size=3, padding=1)
    x = rng.standard_normal((2, 16, 12)).astype(np.float32)  # [C, H, W]
    with torch.no_grad():
        ref = m(torch.from_numpy(x)[None]).numpy()[0]  # [C_out, H, W]
    w, b = convert_conv2d(m.weight.detach().numpy(), m.bias.detach().numpy())
    # our _conv takes [H, W, C_in] → [H, W, C_out]
    got = np.asarray(_conv(jnp.asarray(np.transpose(x, (1, 2, 0))), w, b))
    np.testing.assert_allclose(np.transpose(got, (2, 0, 1)), ref, atol=2e-5)
