"""Torch→JAX weight conversion helpers.

The reference's models ship as torch/TF checkpoints (demucs, madmom's
pickled NN, Basic Pitch). These helpers map the standard torch layer
layouts onto this package's parameter pytrees and are validated against
live torch modules in tests/test_torch_port.py (torch-cpu is available in
the image even though the pretrained checkpoints are not).

Layout conventions used by this package:
  conv1d/2d (htdemucs)  torch layout kept verbatim (OIH / OIHW / IOH[W]) —
                        see models/htdemucs.convert_torch_state_dict
  conv2d (basicpitch)   w: [H, W, C_in, C_out]   torch: [C_out, C_in, H, W]
  dense                 w: [D_in, D_out]         torch: [D_out, D_in]
  lstm                  fused gates [i, f, g, o] torch: [i, f, g, o] (same)
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def convert_dense(weight: np.ndarray, bias: np.ndarray | None = None):
    w = jnp.asarray(np.asarray(weight).T)
    b = jnp.asarray(np.asarray(bias)) if bias is not None else jnp.zeros((w.shape[1],))
    return w, b


def convert_conv2d(weight: np.ndarray, bias: np.ndarray | None = None):
    w = jnp.asarray(np.transpose(np.asarray(weight), (2, 3, 1, 0)))  # [H, W, C_in, C_out]
    b = jnp.asarray(np.asarray(bias)) if bias is not None else jnp.zeros((w.shape[3],))
    return w, b


def convert_lstm_layer(
    weight_ih: np.ndarray,
    weight_hh: np.ndarray,
    bias_ih: np.ndarray | None = None,
    bias_hh: np.ndarray | None = None,
) -> dict:
    """torch LSTM per-direction weights → beat_rnn._lstm_scan params.

    torch packs gates as [i, f, g, o] along dim 0 of [4H, D]; our scan uses
    x @ W + h @ U + b with a [D, 4H] fused matrix in the same gate order.
    """
    W = jnp.asarray(np.asarray(weight_ih).T)  # [D, 4H]
    U = jnp.asarray(np.asarray(weight_hh).T)  # [H, 4H]
    b = np.zeros(W.shape[1], dtype=np.float32)
    if bias_ih is not None:
        b = b + np.asarray(bias_ih)
    if bias_hh is not None:
        b = b + np.asarray(bias_hh)
    return {"W": W, "U": U, "b": jnp.asarray(b)}


def convert_torch_blstm(state_dict: dict, layers: int, hidden: int) -> dict:
    """torch nn.LSTM(bidirectional=True) state dict → beat_rnn params
    (without the output head, which converts via convert_dense)."""
    out = {"layers": []}
    for i in range(layers):
        fwd = convert_lstm_layer(
            state_dict[f"weight_ih_l{i}"],
            state_dict[f"weight_hh_l{i}"],
            state_dict.get(f"bias_ih_l{i}"),
            state_dict.get(f"bias_hh_l{i}"),
        )
        bwd = convert_lstm_layer(
            state_dict[f"weight_ih_l{i}_reverse"],
            state_dict[f"weight_hh_l{i}_reverse"],
            state_dict.get(f"bias_ih_l{i}_reverse"),
            state_dict.get(f"bias_hh_l{i}_reverse"),
        )
        out["layers"].append({"fwd": fwd, "bwd": bwd})
    return out
