"""htdemucs — Hybrid Transformer Demucs source separation in JAX.

Capability parity with the reference's separation stage (reference
dependency N3, SURVEY.md §2a; invoked at backend/app/services/separation/
demucs_sep.py:144-220 with shifts=2, split=True, overlap=0.25). This is a
ground-up JAX implementation of the published HTDemucs architecture
(Rouard et al. 2023, "Hybrid Transformers for Music Source Separation"):

  * spectral branch: STFT (n_fft 4096, hop 1024, demucs frame trimming),
    complex-as-channels, 4 frequency-strided conv encoder layers
    (channels 48→384, kernel 8 stride 4 over frequency) each followed by
    a 2-block dilated-residual DConv running ALONG TIME (frequency folded
    into the batch, matching torch htdemucs), then a 1×1 rewrite + GLU;
    a learned scaled frequency embedding after the first layer;
  * time branch: 4 stride-4 conv1d encoder layers with the same DConv/
    rewrite structure;
  * cross-domain transformer (5 layers, 8 heads, d=512 bottom channels
    with separate per-branch channel up/downsamplers): even layers are
    CROSS-attention between the branches, odd layers self-attention
    (torch htdemucs classic_parity=1); pre-norm, LayerScale residuals,
    per-layer output GroupNorm, LayerNorm+sinusoidal embeddings on entry
    (2-D embedding for the (freq, time) spectral tokens, 1-D for time);
  * mirrored transposed-conv decoders with skip connections; the spectral
    CaC output is denormalized, iSTFT'd and summed with the time branch.

Inference schedule (the reference's apply_model semantics re-expressed
TPU-first): the song is cut into fixed SEGMENT_SEC windows with 25%
overlap, all windows are stacked into ONE batch and vmapped through the
jitted forward, then combined by triangular-weighted overlap-add; shift
augmentation adds extra batch rows instead of sequential passes.

Weights: ``convert_torch_state_dict`` ports a torch HTDemucs state dict
(the key naming of released demucs checkpoints; see
models/torch_htdemucs.py for the torch mirror used to parity-test the
conversion end-to-end). Without weights ``separate_stems`` returns None
and the pipeline uses its HPSS fallback separation, matching the
reference's demucs-unavailable degradation (demucs_sep.py:11-22).
"""

from __future__ import annotations

import math
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
T_FF = 2048  # hidden_scale 4 × bottom channels 512
BOTTOM_CHANNELS = 512
DCONV_COMP = 8  # dconv hidden = channels // 8 (htdemucs dconv_comp)
FREQ_EMB_SCALE = 0.2
SEGMENT_SEC = 7.8
OVERLAP = 0.25
MODEL_SR = 44100
ALIGN = 1024  # segment lengths are multiples of this (HOP; time branch needs 256)


# ------------------------------------------------- sinusoidal embeddings ---


def create_sin_embedding(length: int, dim: int, max_period: float = 10000.0) -> np.ndarray:
    """demucs 1-D sinusoidal embedding: [length, dim] = [cos | sin]."""
    pos = np.arange(length, dtype=np.float64)[:, None]
    half = dim // 2
    adim = np.arange(half, dtype=np.float64)[None, :]
    phase = pos / (max_period ** (adim / max(half - 1, 1)))
    return np.concatenate([np.cos(phase), np.sin(phase)], axis=-1).astype(np.float32)


def create_2d_sin_embedding(
    d_model: int, height: int, width: int, max_period: float = 10000.0
) -> np.ndarray:
    """demucs 2-D sinusoidal embedding → [d_model, height, width]."""
    if d_model % 4 != 0:
        raise ValueError("d_model must be divisible by 4")
    pe = np.zeros((d_model, height, width), dtype=np.float64)
    half = d_model // 2
    div_term = np.exp(np.arange(0.0, half, 2) * -(math.log(max_period) / half))
    pos_w = np.arange(width, dtype=np.float64)[:, None]  # [W, half/2]
    pos_h = np.arange(height, dtype=np.float64)[:, None]
    pe[0:half:2] = np.sin(pos_w * div_term).T[:, None, :].repeat(height, axis=1)
    pe[1:half:2] = np.cos(pos_w * div_term).T[:, None, :].repeat(height, axis=1)
    pe[half::2] = np.sin(pos_h * div_term).T[:, :, None].repeat(width, axis=2)
    pe[half + 1 :: 2] = np.cos(pos_h * div_term).T[:, :, None].repeat(width, axis=2)
    return pe.astype(np.float32)


# ------------------------------------------------------------------ utils --


def _conv1d(x, w, b, stride=1, dilation=1, pad=0):
    """x [B, C_in, T] → [B, C_out, T']; w in torch layout [C_out, C_in, K]."""
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out + b[None, :, None]


def _conv2d(x, w, b, stride=(1, 1), pad=((0, 0), (0, 0))):
    """x [B, C_in, F, T]; w in torch layout [C_out, C_in, Kf, Kt]."""
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=pad,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b[None, :, None, None]


def _convtr1d(x, w, b, stride):
    """ConvTranspose1d, torch layout w [C_in, C_out, K], no padding:
    out length = (T-1)*stride + K. Expressed as an input-dilated conv with
    the kernel flipped and I/O swapped (exact ConvTranspose semantics)."""
    K = w.shape[-1]
    rhs = jnp.flip(jnp.transpose(w, (1, 0, 2)), axis=-1)  # [C_out, C_in, K]
    out = jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(1,),
        padding=[(K - 1, K - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out + b[None, :, None]


def _convtr2d_freq(x, w, b, stride):
    """ConvTranspose2d over the freq axis, torch layout w [C_in, C_out, K, 1]."""
    K = w.shape[-2]
    rhs = jnp.flip(jnp.transpose(w, (1, 0, 2, 3)), axis=-2)  # [C_out, C_in, K, 1]
    out = jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(1, 1),
        padding=[(K - 1, K - 1), (0, 0)],
        lhs_dilation=(stride, 1),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b[None, :, None, None]


def _group_norm1(x, gamma, beta, eps=1e-5):
    """GroupNorm(1, C) over [B, C, T]: normalize over (C, T) per sample.

    Statistics always in float32: under the bf16 compute path (DEMUCS_BF16)
    a bf16 mean over C*T ≈ 10^5 elements loses ~3 decimal digits. At f32
    input every cast below is the identity, so the f32 path is bit-exact."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=(1, 2), keepdims=True)
    var = x32.var(axis=(1, 2), keepdims=True)
    xn = (x32 - mean) * jax.lax.rsqrt(var + eps)
    g32 = gamma.astype(jnp.float32)
    b32 = beta.astype(jnp.float32)
    return (xn * g32[None, :, None] + b32[None, :, None]).astype(x.dtype)


def _layer_norm(x, gamma, beta, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)
    return (out + beta.astype(jnp.float32)).astype(x.dtype)


def _group_norm_tokens(x, gamma, beta, eps=1e-5):
    """torch MyGroupNorm(1, C) on tokens [T, C]: normalize over ALL of (T, C)."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean()
    var = x32.var()
    out = (x32 - mean) * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)
    return (out + beta.astype(jnp.float32)).astype(x.dtype)


# ------------------------------------------------------------------ DConv --


def _dconv(params: dict, x):
    """x [B, C, T] → [B, C, T]; 2 dilated residual blocks (htdemucs DConv:
    hidden C//8, GroupNorm(1,·), GELU, 1×1 → GLU, LayerScale)."""
    for j, blk in enumerate(params["blocks"]):
        d = 2**j
        h = _conv1d(x, blk["conv1_w"], blk["conv1_b"], dilation=d, pad=d)
        h = _group_norm1(h, blk["gn1_g"], blk["gn1_b"])
        h = jax.nn.gelu(h, approximate=False)
        h = _conv1d(h, blk["conv2_w"], blk["conv2_b"])
        h = _group_norm1(h, blk["gn2_g"], blk["gn2_b"])
        a, g = jnp.split(h, 2, axis=1)
        h = a * jax.nn.sigmoid(g)
        x = x + blk["scale"][None, :, None] * h
    return x


# -------------------------------------------------------------- enc / dec --


def _enc_freq(p: dict, x):
    """HEncLayer(freq): x [C_in, F, T] → [C_out, F/4, T]."""
    y = _conv2d(x[None], p["conv_w"], p["conv_b"], stride=(STRIDE, 1), pad=((2, 2), (0, 0)))
    y = jax.nn.gelu(y, approximate=False)
    # DConv along TIME, frequency folded into batch (torch htdemucs
    # hdemucs.py HEncLayer reshapes [B,C,F,T] → [B*F,C,T] before DConv)
    _, C, F, T = y.shape
    yb = jnp.transpose(y[0], (1, 0, 2))  # [F, C, T]
    yb = _dconv(p["dconv"], yb)
    y = jnp.transpose(yb, (1, 0, 2))[None]  # [1, C, F, T]
    z = _conv2d(y, p["rewrite_w"], p["rewrite_b"])
    a, g = jnp.split(z, 2, axis=1)
    return (a * jax.nn.sigmoid(g))[0]


def _enc_time(p: dict, x):
    """HEncLayer(time): x [B, C_in, T] → [B, C_out, T/4]."""
    y = _conv1d(x, p["conv_w"], p["conv_b"], stride=STRIDE, pad=2)
    y = jax.nn.gelu(y, approximate=False)
    y = _dconv(p["dconv"], y)
    z = _conv1d(y, p["rewrite_w"], p["rewrite_b"])
    a, g = jnp.split(z, 2, axis=1)
    return a * jax.nn.sigmoid(g)


def _dec_freq(p: dict, x, skip, last: bool):
    """HDecLayer(freq): x,skip [C, F, T] → [C_out, F*4, T]. The rewrite is
    a square 3×3 conv (torch HDecLayer context=1 with an int kernel)."""
    h = (x + skip)[None]
    z = _conv2d(h, p["rewrite_w"], p["rewrite_b"], pad=((1, 1), (1, 1)))
    a, g = jnp.split(z, 2, axis=1)
    y = a * jax.nn.sigmoid(g)
    z = _convtr2d_freq(y, p["convtr_w"], p["convtr_b"], STRIDE)
    z = z[:, :, 2:-2, :]  # torch trims pad=(kernel-stride)//2=2 from freq
    if not last:
        z = jax.nn.gelu(z, approximate=False)
    return z[0]


def _dec_time(p: dict, x, skip, last: bool):
    """HDecLayer(time): x,skip [B, C, T] → [B, C_out, T*4]."""
    h = x + skip
    z = _conv1d(h, p["rewrite_w"], p["rewrite_b"], pad=1)
    a, g = jnp.split(z, 2, axis=1)
    y = a * jax.nn.sigmoid(g)
    z = _convtr1d(y, p["convtr_w"], p["convtr_b"], STRIDE)
    z = z[:, :, 2:-2]
    if not last:
        z = jax.nn.gelu(z, approximate=False)
    return z


# ------------------------------------------------------------ transformer --


def _mha(p: dict, q_in, kv_in):
    """q_in [Tq, D], kv_in [Tk, D] → [Tq, D]; weights pre-transposed for x@W."""
    D = q_in.shape[-1]
    hd = D // T_HEADS
    q = (q_in @ p["q_w"] + p["q_b"]).reshape(-1, T_HEADS, hd)
    k = (kv_in @ p["k_w"] + p["k_b"]).reshape(-1, T_HEADS, hd)
    v = (kv_in @ p["v_w"] + p["v_b"]).reshape(-1, T_HEADS, hd)
    # softmax always in float32 (bf16 exp/normalize visibly degrades the
    # attention distribution; identity cast on the f32 path)
    logits = jnp.einsum("qhd,khd->hqk", q, k).astype(jnp.float32) / math.sqrt(hd)
    att = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("hqk,khd->qhd", att, v).reshape(-1, D)
    return out @ p["o_w"] + p["o_b"]


def _ff(p: dict, x):
    h = jax.nn.gelu(x @ p["lin1_w"] + p["lin1_b"], approximate=False)
    return h @ p["lin2_w"] + p["lin2_b"]


def _self_layer(p: dict, x):
    """torch MyTransformerEncoderLayer (norm_first, LayerScale, GroupNorm out)."""
    h = _layer_norm(x, p["norm1_g"], p["norm1_b"])
    x = x + p["gamma1"] * _mha(p, h, h)
    x = x + p["gamma2"] * _ff(p, _layer_norm(x, p["norm2_g"], p["norm2_b"]))
    return _group_norm_tokens(x, p["normout_g"], p["normout_b"])


def _cross_layer(p: dict, x, other):
    """torch CrossTransformerEncoderLayer: q = norm1(x), kv = norm2(other)."""
    q = _layer_norm(x, p["norm1_g"], p["norm1_b"])
    kv = _layer_norm(other, p["norm2_g"], p["norm2_b"])
    x = x + p["gamma1"] * _mha(p, q, kv)
    x = x + p["gamma2"] * _ff(p, _layer_norm(x, p["norm3_g"], p["norm3_b"]))
    return _group_norm_tokens(x, p["normout_g"], p["normout_b"])


# ----------------------------------------------------------------- spec ----


def _spec(x, L: int):
    """demucs _spec: x [ch, L] → complex [ch, F=2048, T=ceil(L/HOP)]."""
    from ..ops.spectral import stft

    le = -(-L // HOP)
    pad = HOP // 2 * 3
    x = jnp.pad(x, ((0, 0), (pad, pad + le * HOP - L)), mode="reflect")
    z = stft(x, n_fft=NFFT, hop=HOP)  # centered → [ch, 2049, T']
    return z[..., :-1, 2 : 2 + le]


def _ispec(z, length: int):
    """demucs _ispec: complex [..., F=2048, T] → [..., length]."""
    from ..ops.spectral import istft

    z = jnp.concatenate([z, jnp.zeros_like(z[..., :1, :])], axis=-2)  # Nyquist
    z = jnp.pad(z, [(0, 0)] * (z.ndim - 1) + [(2, 2)])  # 2 frames each side
    pad = HOP // 2 * 3
    le = HOP * int(math.ceil(length / HOP)) + 2 * pad
    x = istft(z, hop=HOP, length=le)
    return x[..., pad : pad + length]


# ------------------------------------------------------------- full model --


@partial(jax.jit, static_argnames=("n_sources", "audio_channels", "compute_dtype"))
def forward(params: dict, mix, n_sources: int = 4, audio_channels: int = 2,
            compute_dtype=jnp.float32):
    """mix [audio_channels, L] → stems [n_sources, audio_channels, L].

    L must be a multiple of ALIGN (=1024). Mirrors torch HTDemucs.forward
    (normalization, branch structure, CaC masking, denormalization).

    ``compute_dtype=jnp.bfloat16`` runs the encoder/transformer/decoder
    stack in bf16 on the MXU (STFT/iSTFT, normalization statistics,
    attention softmax, and the final denormalize+combine stay float32).
    The f32 path is bit-identical to the pre-knob program — every cast is
    the identity there (golden determinism gates rely on this).
    """
    params = {k: v for k, v in params.items() if k != "meta_segment"}
    S = n_sources
    a_ch = audio_channels
    L = mix.shape[-1]

    z = _spec(mix, L)  # [ch, 2048, T]
    F, T = z.shape[-2], z.shape[-1]
    # complex-as-channels, (channel-major, re/im-minor) like view_as_real
    mag = jnp.stack([z.real, z.imag], axis=1).reshape(2 * a_ch, F, T)
    mean = mag.mean()
    std = mag.std(ddof=1)
    x = ((mag - mean) / (1e-5 + std)).astype(compute_dtype)

    meant = mix.mean()
    stdt = mix.std(ddof=1)
    xt = (((mix - meant) / (1e-5 + stdt))[None]).astype(compute_dtype)  # [1, ch, L]
    if compute_dtype != jnp.float32:
        # cast the whole weight tree once at trace time; XLA folds these
        # converts into the first consumer of each leaf
        params = jax.tree.map(lambda a: jnp.asarray(a, compute_dtype), params)

    # --- encoders ---
    saved, saved_t = [], []
    for i in range(DEPTH):
        xt = _enc_time(params["tencoder"][i], xt)
        saved_t.append(xt)
        x = _enc_freq(params["encoder"][i], x)
        if i == 0:
            emb = jnp.asarray(params["freq_emb"])[: x.shape[1]]  # [F, C]
            x = x + FREQ_EMB_SCALE * emb.T[:, :, None]
        saved.append(x)

    # --- cross-domain transformer ---
    C, Fq, Ts = x.shape
    tok_s = x.transpose(2, 1, 0).reshape(Ts * Fq, C)  # time-major "(t f) c"
    tok_t = xt[0].T  # [Tt, C]
    tok_s = tok_s @ params["up_s_w"].T + params["up_s_b"]
    tok_t = tok_t @ params["up_t_w"].T + params["up_t_b"]
    D = tok_s.shape[-1]

    pe2 = create_2d_sin_embedding(D, Fq, Ts)  # [D, F, T]
    pe2 = jnp.asarray(pe2.transpose(2, 1, 0).reshape(Ts * Fq, D), dtype=compute_dtype)
    tok_s = _layer_norm(tok_s, params["norm_in_g"], params["norm_in_b"]) + pe2
    pe1 = jnp.asarray(create_sin_embedding(tok_t.shape[0], D), dtype=compute_dtype)
    tok_t = _layer_norm(tok_t, params["norm_in_t_g"], params["norm_in_t_b"]) + pe1

    for i in range(len(params["tlayers"])):
        ls, lt = params["tlayers"][i], params["tlayers_t"][i]
        if i % 2 == 1:  # classic_parity=1: odd layers are self-attention
            tok_s = _self_layer(ls, tok_s)
            tok_t = _self_layer(lt, tok_t)
        else:  # even layers cross-attend between branches
            old_s = tok_s
            tok_s = _cross_layer(ls, tok_s, tok_t)
            tok_t = _cross_layer(lt, tok_t, old_s)

    tok_s = tok_s @ params["down_s_w"].T + params["down_s_b"]
    tok_t = tok_t @ params["down_t_w"].T + params["down_t_b"]
    x = tok_s.reshape(Ts, Fq, C).transpose(2, 1, 0)
    xt = tok_t.T[None]

    # --- decoders ---
    for i in range(DEPTH):
        last = i == DEPTH - 1
        x = _dec_freq(params["decoder"][i], x, saved[DEPTH - 1 - i], last)
        xt = _dec_time(params["tdecoder"][i], xt, saved_t[DEPTH - 1 - i], last)

    # --- combine (torch tail: denorm, CaC → complex, iSTFT, sum) ---
    x = x.astype(jnp.float32).reshape(S, 2 * a_ch, F, T) * std + mean
    zout = x.reshape(S, a_ch, 2, F, T)
    z_cplx = zout[:, :, 0] + 1j * zout[:, :, 1]
    wav_spec = _ispec(z_cplx, L)  # [S, ch, L]
    wav_time = xt[0].astype(jnp.float32).reshape(S, a_ch, L) * stdt + meant
    return wav_spec + wav_time


# ------------------------------------------------------------ random init --


def init_params(
    rng: jax.Array,
    n_sources: int = 4,
    audio_channels: int = 2,
    channels: int = CHANNELS,
    bottom: int = BOTTOM_CHANNELS,
    t_layers: int = T_LAYERS,
    t_ff: int | None = None,
) -> dict:
    """Shape-correct random init of the full parameter pytree. Defaults give
    the released-htdemucs sizing (converter target); smaller ``channels``/
    ``bottom``/``t_layers`` give the reduced variant used for training from
    scratch on synthetic stems (the forward derives every size from the
    params, so variants need no code changes). ``bottom`` must be divisible
    by T_HEADS(=8) and 4."""
    t_ff = t_ff or 4 * bottom
    keys = iter(jax.random.split(rng, 256))

    def he(shape, fan_in=None):
        fan_in = fan_in or int(np.prod(shape[1:]))
        return jax.random.normal(next(keys), shape) * np.sqrt(2.0 / fan_in)

    def dconv_init(ch):
        hid = max(4, ch // DCONV_COMP)
        blocks = []
        for _ in range(2):
            blocks.append(
                {
                    "conv1_w": he((hid, ch, 3)),
                    "conv1_b": jnp.zeros((hid,)),
                    "gn1_g": jnp.ones((hid,)),
                    "gn1_b": jnp.zeros((hid,)),
                    "conv2_w": he((2 * ch, hid, 1)),
                    "conv2_b": jnp.zeros((2 * ch,)),
                    "gn2_g": jnp.ones((2 * ch,)),
                    "gn2_b": jnp.zeros((2 * ch,)),
                    "scale": jnp.full((ch,), 1e-3),
                }
            )
        return {"blocks": blocks}

    chans = [channels * GROWTH**i for i in range(DEPTH)]  # default 48..384
    spec_in = 2 * audio_channels

    p: dict = {"encoder": [], "tencoder": [], "decoder": [], "tdecoder": []}
    c_s, c_t = spec_in, audio_channels
    for d in range(DEPTH):
        co = chans[d]
        p["encoder"].append(
            {
                "conv_w": he((co, c_s, KERNEL, 1)),
                "conv_b": jnp.zeros((co,)),
                "rewrite_w": he((2 * co, co, 1, 1)),
                "rewrite_b": jnp.zeros((2 * co,)),
                "dconv": dconv_init(co),
            }
        )
        p["tencoder"].append(
            {
                "conv_w": he((co, c_t, KERNEL)),
                "conv_b": jnp.zeros((co,)),
                "rewrite_w": he((2 * co, co, 1)),
                "rewrite_b": jnp.zeros((2 * co,)),
                "dconv": dconv_init(co),
            }
        )
        c_s = c_t = co

    for i, d in enumerate(reversed(range(DEPTH))):
        ci = chans[d]
        co_s = n_sources * spec_in if d == 0 else chans[d - 1]
        co_t = n_sources * audio_channels if d == 0 else chans[d - 1]
        p["decoder"].append(
            {
                "rewrite_w": he((2 * ci, ci, 3, 3)),
                "rewrite_b": jnp.zeros((2 * ci,)),
                "convtr_w": he((ci, co_s, KERNEL, 1), fan_in=ci * KERNEL),
                "convtr_b": jnp.zeros((co_s,)),
            }
        )
        p["tdecoder"].append(
            {
                "rewrite_w": he((2 * ci, ci, 3)),
                "rewrite_b": jnp.zeros((2 * ci,)),
                "convtr_w": he((ci, co_t, KERNEL), fan_in=ci * KERNEL),
                "convtr_b": jnp.zeros((co_t,)),
            }
        )

    p["freq_emb"] = jnp.asarray(
        create_sin_embedding(NFFT // 2 // STRIDE, chans[0], max_period=10000.0)
    )

    dim = chans[-1]
    D = bottom
    p["up_s_w"] = he((D, dim))
    p["up_s_b"] = jnp.zeros((D,))
    p["up_t_w"] = he((D, dim))
    p["up_t_b"] = jnp.zeros((D,))
    p["down_s_w"] = he((dim, D))
    p["down_s_b"] = jnp.zeros((dim,))
    p["down_t_w"] = he((dim, D))
    p["down_t_b"] = jnp.zeros((dim,))
    p["norm_in_g"] = jnp.ones((D,))
    p["norm_in_b"] = jnp.zeros((D,))
    p["norm_in_t_g"] = jnp.ones((D,))
    p["norm_in_t_b"] = jnp.zeros((D,))

    def tlayer_init(cross: bool):
        lp = {
            "q_w": he((D, D)), "k_w": he((D, D)), "v_w": he((D, D)), "o_w": he((D, D)),
            "q_b": jnp.zeros((D,)), "k_b": jnp.zeros((D,)),
            "v_b": jnp.zeros((D,)), "o_b": jnp.zeros((D,)),
            "norm1_g": jnp.ones((D,)), "norm1_b": jnp.zeros((D,)),
            "norm2_g": jnp.ones((D,)), "norm2_b": jnp.zeros((D,)),
            "lin1_w": he((D, t_ff)), "lin1_b": jnp.zeros((t_ff,)),
            "lin2_w": he((t_ff, D)), "lin2_b": jnp.zeros((D,)),
            "gamma1": jnp.full((D,), 1e-4), "gamma2": jnp.full((D,), 1e-4),
            "normout_g": jnp.ones((D,)), "normout_b": jnp.zeros((D,)),
        }
        if cross:
            lp["norm3_g"] = jnp.ones((D,))
            lp["norm3_b"] = jnp.zeros((D,))
        return lp

    p["tlayers"] = [tlayer_init(cross=(i % 2 == 0)) for i in range(t_layers)]
    p["tlayers_t"] = [tlayer_init(cross=(i % 2 == 0)) for i in range(t_layers)]
    return p


# -------------------------------------------------------- chunked apply ----


def _segment_windows(length: int, seg: int, stride: int) -> list[int]:
    offsets = list(range(0, max(1, length - seg + stride), stride))
    return offsets


_FWD_CACHE: dict = {}


def _batched_forward(n_sources: int, ch: int):
    """Cached jit(vmap(forward)): a fresh lambda per apply_model call would
    miss the jit cache and recompile the whole transformer per song."""
    key = (n_sources, ch)
    fn = _FWD_CACHE.get(key)
    if fn is None:
        fn = jax.jit(
            jax.vmap(
                lambda params, m: forward(params, m, n_sources=n_sources, audio_channels=ch),
                in_axes=(None, 0),
            )
        )
        _FWD_CACHE[key] = fn
    return fn


# ---- single-dispatch separation program (relay-friendly) -------------------
#
# apply_model below issues one device call per shift and moves every window's
# input AND all four stereo stem outputs across the host link — ~300 MB per
# 30 s song over the axon relay, which made separation the pipeline's
# bottleneck (5+ s/song). _separate_program fuses resample → window →
# batched forward → triangular overlap-add → mono → resample back into ONE
# jitted program whose stem outputs stay on device: the pipeline hands the
# drums stem straight to fused_analysis without a host round-trip.


def _halfband_fir(taps: int = 129, beta: float = 8.0) -> np.ndarray:
    """Windowed-sinc half-band lowpass (cutoff = Nyquist/2) for exact 2x
    up/down resampling on device (22050 ↔ 44100)."""
    n = np.arange(taps) - taps // 2
    h = np.sinc(n / 2.0) / 2.0
    h *= np.kaiser(taps, beta)
    return (h / h.sum()).astype(np.float32)


_HALFBAND = _halfband_fir()


def _fir_1d(x, h, *, lhs_dilation: int = 1, stride: int = 1):
    """Length-preserving FIR along the last axis of [..., L] (SAME padding),
    with optional zero-stuffing upsample (lhs_dilation) or strided output."""
    shape = x.shape
    xb = x.reshape(-1, 1, shape[-1])
    K = h.shape[0]  # odd
    # explicit padding (lhs_dilation forbids "SAME"): chosen so the output
    # length is exactly L*lhs_dilation (stride 1) or L/stride (dilation 1)
    pad = (K // 2, K // 2 + lhs_dilation - 1)
    out = jax.lax.conv_general_dilated(
        xb,
        h[None, None, :],
        window_strides=(stride,),
        padding=(pad,),
        lhs_dilation=(lhs_dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out.reshape(*shape[:-1], out.shape[-1])


def _resample2_mats(taps: int = 129) -> tuple[np.ndarray, np.ndarray]:
    """Banded polyphase matrices for exact-2x resampling as MATMULS.

    The naive 1-channel FIR conv (_fir_1d) lowers to a VPU sliding window on
    TPU and cost ~0.55 s per song — more than the whole htdemucs forward.
    Reformulated as frame(hop) @ banded-matrix, the same filter runs on the
    MXU in ~1 ms. Wd: [384, 128] maps a 384-sample frame (hop 256) of the
    44.1k signal (padded 64 left) to 128 output samples at 22.05k.
    Wu: [192, 256] maps a 192-sample frame (hop 128) of the 22.05k signal
    (padded 32 left) to 256 output samples at 44.1k."""
    h = _HALFBAND if taps == _HALFBAND.shape[0] else _halfband_fir(taps)
    Wd = np.zeros((384, 128), np.float32)
    for n in range(128):
        Wd[2 * n : 2 * n + taps, n] = h
    Wu = np.zeros((192, 256), np.float32)
    for j in range(192):
        for n in range(max(0, 2 * j - taps + 1), min(256, 2 * j + 1)):
            Wu[j, n] = 2.0 * h[2 * j - n]
    return Wd, Wu


_W_DOWN, _W_UP = _resample2_mats()


def _down2(x):
    """[..., 2L] → [..., L] half-band decimation via frame @ banded matrix
    (bit-matches _fir_1d(x, _HALFBAND, stride=2))."""
    from ..ops.spectral import frame as frame_signal

    L2 = x.shape[-1]
    L = L2 // 2
    M = -(-L // 128)
    need = (M - 1) * 256 + 384
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(64, max(0, need - L2 - 64))])
    frames = frame_signal(xp, 384, 256, center=False)[..., :M, :]
    out = frames @ jnp.asarray(_W_DOWN)
    return out.reshape(*x.shape[:-1], M * 128)[..., :L]


def _up2(x):
    """[..., L] → [..., 2L] zero-stuff + half-band interpolation via
    frame @ banded matrix (bit-matches _fir_1d(x, 2h, lhs_dilation=2))."""
    from ..ops.spectral import frame as frame_signal

    L = x.shape[-1]
    M = -(-(2 * L) // 256)
    need = (M - 1) * 128 + 192
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(32, max(0, need - L - 32))])
    frames = frame_signal(xp, 192, 128, center=False)[..., :M, :]
    out = frames @ jnp.asarray(_W_UP)
    return out.reshape(*x.shape[:-1], M * 256)[..., : 2 * L]


# max windows per vmapped forward inside _separate_program (see below).
# 16 keeps a 30 s song un-chunked at shifts=2 (13 windows) and matches the
# largest batch the remote AOT compiler has handled reliably (a 31-window
# program compiled; ~60 windows crashed the compile helper).
_FWD_CHUNK = 16


@partial(jax.jit, static_argnames=("sr", "seg", "stride", "shifts", "n_sources", "bf16"))
def _separate_program(params, y, sr: int, seg: int, stride: int, shifts: int,
                      n_sources: int, bf16: bool = False):
    """y [L] mono at sr (MODEL_SR or MODEL_SR//2) → stems [n_sources, L].

    ``bf16=True`` runs the htdemucs net in bfloat16 on the MXU (resampling,
    windowing, and the overlap-add stay float32) — the DEMUCS_BF16 knob."""
    if sr == MODEL_SR:
        y44 = y
    else:  # exact 2x upsample: zero-stuff + half-band FIR (as a matmul)
        y44 = _up2(y)
    L44 = y44.shape[0]
    mix = jnp.stack([y44, y44])  # pseudo-stereo [2, L44]

    # deterministic shift offsets (demucs averages randomly-shifted passes;
    # determinism beats randomness for a serving pipeline)
    max_shift = int(0.5 * MODEL_SR)
    shift_offs = [0] + [((i * max_shift) // shifts) for i in range(1, max(1, shifts))]

    windows, metas = [], []
    for soff in shift_offs:
        shifted = jnp.pad(mix, ((0, 0), (soff, seg)))
        for o in _segment_windows(L44 + soff, seg, stride):
            windows.append(jax.lax.dynamic_slice_in_dim(shifted, o, seg, axis=1))
            metas.append(o - soff)
    batch = jnp.stack(windows)  # [B, 2, seg]
    # Bound the vmapped forward to fixed-size chunks via lax.map: a long
    # song × shifts stacks 60+ windows, and vmapping the full dual-branch
    # transformer over that batch blows up BOTH the remote AOT compile
    # (observed: 180 s × shifts=2 → compile-helper subprocess crash) and
    # activation memory. Chunking keeps compile cost and peak memory
    # O(_FWD_CHUNK) regardless of song length while staying ONE dispatch.
    B = batch.shape[0]
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    fwd1 = lambda m: forward(params, m, n_sources=n_sources, compute_dtype=cdt)
    if B > _FWD_CHUNK:
        pad = (-B) % _FWD_CHUNK
        chunks = jnp.pad(batch, ((0, pad), (0, 0), (0, 0))).reshape(
            -1, _FWD_CHUNK, 2, seg
        )
        stems = jax.lax.map(lambda mb: jax.vmap(fwd1)(mb), chunks)
        stems = stems.reshape(-1, *stems.shape[2:])[:B]
    else:
        stems = jax.vmap(fwd1)(batch)

    tri = jnp.concatenate(
        [jnp.linspace(0.1, 1.0, seg // 2), jnp.linspace(1.0, 0.1, seg - seg // 2)]
    )
    lead = max(0, -min(metas))
    acc = jnp.zeros((n_sources, 2, lead + L44 + seg))
    wacc = jnp.zeros((lead + L44 + seg,))
    for i, pos in enumerate(metas):  # static offsets → plain scatter-adds
        acc = acc.at[:, :, lead + pos : lead + pos + seg].add(stems[i] * tri)
        wacc = wacc.at[lead + pos : lead + pos + seg].add(tri)
    out44 = acc[:, :, lead : lead + L44] / jnp.maximum(wacc[lead : lead + L44], 1e-8)
    mono = out44.mean(axis=1)  # [S, L44]
    if sr == MODEL_SR:
        return mono
    return _down2(mono)


_PARAMS_DEV: tuple | None = None


def device_params(params: dict):
    """Checkpoint pytree (minus meta) resident on device — uploaded ONCE
    per process; keyed on the load_params() identity (which is cached)."""
    global _PARAMS_DEV
    if _PARAMS_DEV is None or _PARAMS_DEV[0] is not params:
        run = {k: v for k, v in params.items() if k != "meta_segment"}
        _PARAMS_DEV = (params, jax.device_put(run))
    return _PARAMS_DEV[1]


def separate_stems_device(
    y: np.ndarray, sr: int, model_name: str = "htdemucs_6s", shifts: int = 2,
    bf16: bool | None = None,
) -> dict | None:
    """Mono y [L] → {stem_name: DEVICE array [L]} via ONE jitted dispatch,
    or None when no weights are loaded. Outputs stay on device so downstream
    device consumers (fused_analysis beat tracking on drums) skip the host
    round-trip; np.asarray() any stem that needs to reach the host."""
    params = load_params()
    if params is None:
        return None
    if y.ndim != 1 or sr not in (MODEL_SR, MODEL_SR // 2):
        host = separate_stems(np.asarray(y), sr, model_name=model_name)
        return None if host is None else {k: jnp.asarray(v) for k, v in host.items()}
    if bf16 is None:
        from .. import config

        bf16 = bool(config.settings.DEMUCS_BF16)
    cfg = program_config(params, model_name, list(MODEL_STEMS["htdemucs"]))
    y_dev = y if isinstance(y, jax.Array) else jnp.asarray(np.asarray(y, np.float32))
    out = _separate_program(
        device_params(params), y_dev, sr=sr, seg=cfg["seg"],
        stride=cfg["stride"], shifts=shifts, n_sources=cfg["n_sources"],
        bf16=bool(bf16),
    )
    return {name: out[i] for i, name in enumerate(cfg["names"])}


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
    # transformers generalize poorly across token counts: infer at the
    # segment length the checkpoint was trained with when it records one
    # (demucs' use_train_segment semantics)
    if "meta_segment" in params:
        seg = int(np.asarray(params["meta_segment"]))
    else:
        seg = int(SEGMENT_SEC * sr)
    seg = ((seg + ALIGN - 1) // ALIGN) * ALIGN
    stride = max(ALIGN, int((1 - overlap) * seg) // ALIGN * ALIGN)
    max_shift = int(0.5 * sr)

    n_sources = params["tdecoder"][-1]["convtr_w"].shape[1] // ch
    out = np.zeros((n_sources, ch, L), dtype=np.float32)
    weight_total = np.zeros((L,), dtype=np.float32)
    tri = np.concatenate(
        [np.linspace(0.1, 1.0, seg // 2), np.linspace(1.0, 0.1, seg - seg // 2)]
    ).astype(np.float32)

    batched_forward = _batched_forward(n_sources, ch)

    for shift_i in range(max(1, shifts)):
        offset = int(rng.integers(0, max_shift)) if shifts > 1 and shift_i > 0 else 0
        padded = np.pad(mix, ((0, 0), (offset, seg)))
        offsets = _segment_windows(L + offset, seg, stride)
        windows = np.stack([padded[:, o : o + seg] for o in offsets])  # [N, ch, seg]
        stems = np.asarray(batched_forward(params, jnp.asarray(windows)))  # [N, S, ch, seg]
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


def _strip_prefix(state_dict: dict) -> dict:
    """Accept BagOfModels-style checkpoints ('models.0.' prefixed keys)."""
    for pref in ("models.0.", "model.", "module."):
        if any(k.startswith(pref) for k in state_dict):
            return {k[len(pref) :]: v for k, v in state_dict.items() if k.startswith(pref)}
    return state_dict


def convert_torch_state_dict(state_dict: dict, audio_channels: int = 2) -> dict:
    """Convert a torch HTDemucs state dict (released-checkpoint key naming;
    see models/torch_htdemucs.py) into this module's parameter pytree.

    Accepts tensors or numpy arrays. Linear/attention weights are
    transposed so the JAX forward uses x @ W; conv weights keep the torch
    layout (the JAX convs use OIH/OIHW/IOH dimension numbers).
    """
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu() if hasattr(v, "cpu") else v)
          for k, v in _strip_prefix(state_dict).items()}

    def arr(key):
        if key not in sd:
            raise KeyError(f"missing checkpoint key: {key}")
        return jnp.asarray(sd[key])

    def dconv_params(prefix):
        blocks = []
        for j in range(2):
            b = f"{prefix}.layers.{j}"
            blocks.append(
                {
                    "conv1_w": arr(f"{b}.0.weight"),
                    "conv1_b": arr(f"{b}.0.bias"),
                    "gn1_g": arr(f"{b}.1.weight"),
                    "gn1_b": arr(f"{b}.1.bias"),
                    "conv2_w": arr(f"{b}.3.weight"),
                    "conv2_b": arr(f"{b}.3.bias"),
                    "gn2_g": arr(f"{b}.4.weight"),
                    "gn2_b": arr(f"{b}.4.bias"),
                    "scale": arr(f"{b}.6.scale"),
                }
            )
        return {"blocks": blocks}

    p: dict = {"encoder": [], "tencoder": [], "decoder": [], "tdecoder": []}
    for i in range(DEPTH):
        p["encoder"].append(
            {
                "conv_w": arr(f"encoder.{i}.conv.weight"),
                "conv_b": arr(f"encoder.{i}.conv.bias"),
                "rewrite_w": arr(f"encoder.{i}.rewrite.weight"),
                "rewrite_b": arr(f"encoder.{i}.rewrite.bias"),
                "dconv": dconv_params(f"encoder.{i}.dconv"),
            }
        )
        p["tencoder"].append(
            {
                "conv_w": arr(f"tencoder.{i}.conv.weight"),
                "conv_b": arr(f"tencoder.{i}.conv.bias"),
                "rewrite_w": arr(f"tencoder.{i}.rewrite.weight"),
                "rewrite_b": arr(f"tencoder.{i}.rewrite.bias"),
                "dconv": dconv_params(f"tencoder.{i}.dconv"),
            }
        )
        p["decoder"].append(
            {
                "rewrite_w": arr(f"decoder.{i}.rewrite.weight"),
                "rewrite_b": arr(f"decoder.{i}.rewrite.bias"),
                "convtr_w": arr(f"decoder.{i}.conv_tr.weight"),
                "convtr_b": arr(f"decoder.{i}.conv_tr.bias"),
            }
        )
        p["tdecoder"].append(
            {
                "rewrite_w": arr(f"tdecoder.{i}.rewrite.weight"),
                "rewrite_b": arr(f"tdecoder.{i}.rewrite.bias"),
                "convtr_w": arr(f"tdecoder.{i}.conv_tr.weight"),
                "convtr_b": arr(f"tdecoder.{i}.conv_tr.bias"),
            }
        )

    # ScaledEmbedding: effective embedding = weight * scale (scale=10)
    p["freq_emb"] = arr("freq_emb.embedding.weight") * 10.0

    for ours, theirs in (
        ("up_s", "channel_upsampler"),
        ("up_t", "channel_upsampler_t"),
        ("down_s", "channel_downsampler"),
        ("down_t", "channel_downsampler_t"),
    ):
        w = arr(f"{theirs}.weight")  # Conv1d 1×1 [out, in, 1]
        p[f"{ours}_w"] = w[:, :, 0]
        p[f"{ours}_b"] = arr(f"{theirs}.bias")

    p["norm_in_g"] = arr("crosstransformer.norm_in.weight")
    p["norm_in_b"] = arr("crosstransformer.norm_in.bias")
    p["norm_in_t_g"] = arr("crosstransformer.norm_in_t.weight")
    p["norm_in_t_b"] = arr("crosstransformer.norm_in_t.bias")

    def tlayer_params(prefix, cross: bool):
        attn = "cross_attn" if cross else "self_attn"
        in_w = arr(f"{prefix}.{attn}.in_proj_weight")  # [3D, D]
        in_b = arr(f"{prefix}.{attn}.in_proj_bias")
        D = in_w.shape[1]
        lp = {
            "q_w": in_w[:D].T, "k_w": in_w[D : 2 * D].T, "v_w": in_w[2 * D :].T,
            "q_b": in_b[:D], "k_b": in_b[D : 2 * D], "v_b": in_b[2 * D :],
            "o_w": arr(f"{prefix}.{attn}.out_proj.weight").T,
            "o_b": arr(f"{prefix}.{attn}.out_proj.bias"),
            "norm1_g": arr(f"{prefix}.norm1.weight"), "norm1_b": arr(f"{prefix}.norm1.bias"),
            "norm2_g": arr(f"{prefix}.norm2.weight"), "norm2_b": arr(f"{prefix}.norm2.bias"),
            "lin1_w": arr(f"{prefix}.linear1.weight").T, "lin1_b": arr(f"{prefix}.linear1.bias"),
            "lin2_w": arr(f"{prefix}.linear2.weight").T, "lin2_b": arr(f"{prefix}.linear2.bias"),
            "gamma1": arr(f"{prefix}.gamma_1.scale"), "gamma2": arr(f"{prefix}.gamma_2.scale"),
            "normout_g": arr(f"{prefix}.norm_out.weight"),
            "normout_b": arr(f"{prefix}.norm_out.bias"),
        }
        if cross:
            lp["norm3_g"] = arr(f"{prefix}.norm3.weight")
            lp["norm3_b"] = arr(f"{prefix}.norm3.bias")
        return lp

    p["tlayers"] = [
        tlayer_params(f"crosstransformer.layers.{i}", cross=(i % 2 == 0))
        for i in range(T_LAYERS)
    ]
    p["tlayers_t"] = [
        tlayer_params(f"crosstransformer.layers_t.{i}", cross=(i % 2 == 0))
        for i in range(T_LAYERS)
    ]
    return p


def save_params(path: str, params: dict) -> None:
    from .params_io import save_pytree_npz

    save_pytree_npz(path, params)


def default_weights_path() -> str:
    """Checked-in trained weights; HTDEMUCS_WEIGHTS overrides ('off'
    disables separation and falls back to the HPSS split)."""
    env = os.environ.get("HTDEMUCS_WEIGHTS")
    if env is not None:
        return "" if env.lower() in ("off", "none", "0") else env
    from pathlib import Path

    return str(Path(__file__).resolve().parent.parent / "weights" / "htdemucs.npz")


_LOAD_CACHE: dict = {}


def load_params(path: str | None = None) -> dict | None:
    path = path or default_weights_path()
    if not path or not os.path.exists(path):
        return None
    # cache by path AND return the SAME dict each call: separate_stems_device
    # keys its device-put cache on identity, and the 9 MB npz parse is not
    # free either
    if path in _LOAD_CACHE:
        return _LOAD_CACHE[path]
    from .params_io import load_pytree_npz

    params = load_pytree_npz(path)  # flat path-keyed npz; no pickle
    params = params if isinstance(params, dict) and "encoder" in params else None
    _LOAD_CACHE[path] = params
    return params


def program_config(params: dict, model_name: str, stem_priority: list[str]) -> dict:
    """Derive the separation-program constants from a checkpoint: segment
    length, stride, source count, and the stem/drums indices for the given
    priority list. Single source of truth for separate_stems_device AND the
    batch runner (runtime/batch_runner._resolve_separation)."""
    if "meta_segment" in params:
        seg = int(np.asarray(params["meta_segment"]))
    else:
        seg = int(SEGMENT_SEC * MODEL_SR)
    seg = ((seg + ALIGN - 1) // ALIGN) * ALIGN
    stride = max(ALIGN, int((1 - OVERLAP) * seg) // ALIGN * ALIGN)
    run_params = {k: v for k, v in params.items() if k != "meta_segment"}
    n_sources = run_params["tdecoder"][-1]["convtr_w"].shape[1] // 2
    names = MODEL_STEMS.get(model_name, MODEL_STEMS["htdemucs"])[:n_sources]
    stem_idx = next((names.index(n) for n in stem_priority if n in names), 2)
    drums_idx = names.index("drums") if "drums" in names else 0
    return {
        "seg": seg,
        "stride": stride,
        "n_sources": n_sources,
        "names": names,
        "stem_idx": stem_idx,
        "drums_idx": drums_idx,
        "run_params": run_params,
    }


_PARAMS: dict | None = None


def separate_stems(y: np.ndarray, sr: int, model_name: str = "htdemucs_6s") -> dict | None:
    """→ {stem_name: mono waveform} or None when no weights are loaded."""
    global _PARAMS
    params = _PARAMS or load_params()
    if params is None:
        return None
    _PARAMS = params  # cache: don't re-read the checkpoint npz per song
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
