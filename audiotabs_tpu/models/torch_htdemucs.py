"""Torch mirror of HTDemucs used to parity-test the checkpoint converter.

This module builds the HTDemucs graph with torch-cpu using the SAME
state-dict key naming as released demucs checkpoints (encoder.N.conv.*,
tencoder.*, decoder.N.conv_tr.*, freq_emb.embedding.weight,
channel_upsampler{,_t}, crosstransformer.layers{,_t}.N.{self,cross}_attn.*),
so that (a) ``convert_torch_state_dict`` can be round-trip tested end to
end against a real torch forward, and (b) a genuine released checkpoint
loads into it via ``load_state_dict``.

It is NOT imported by the production path — only by the converter tests
(tests/test_htdemucs_convert.py) and by users porting a real checkpoint.

Reference behavior being mirrored: the separation dependency N3 of
SURVEY.md §2a (invoked at backend/app/services/separation/
demucs_sep.py:144-220); architecture per Rouard et al. 2023.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from .htdemucs import (
    ALIGN,
    BOTTOM_CHANNELS,
    CHANNELS,
    DCONV_COMP,
    DEPTH,
    FREQ_EMB_SCALE,
    GROWTH,
    HOP,
    KERNEL,
    NFFT,
    STRIDE,
    T_FF,
    T_HEADS,
    T_LAYERS,
    create_2d_sin_embedding,
    create_sin_embedding,
)


class LayerScale(nn.Module):
    def __init__(self, channels: int, init: float = 0.0, channel_last: bool = False):
        super().__init__()
        self.channel_last = channel_last
        self.scale = nn.Parameter(torch.full((channels,), init))

    def forward(self, x):
        if self.channel_last:
            return self.scale * x
        return self.scale[:, None] * x


class DConv(nn.Module):
    """2 dilated residual blocks; each = Conv1d → GroupNorm(1) → GELU →
    Conv1d 1×1 → GroupNorm(1) → GLU → LayerScale (demucs DConv layout)."""

    def __init__(self, channels: int):
        super().__init__()
        hidden = max(4, channels // DCONV_COMP)
        self.layers = nn.ModuleList()
        for j in range(2):
            dilation = 2**j
            self.layers.append(
                nn.Sequential(
                    nn.Conv1d(channels, hidden, 3, dilation=dilation, padding=dilation),
                    nn.GroupNorm(1, hidden),
                    nn.GELU(),
                    nn.Conv1d(hidden, 2 * channels, 1),
                    nn.GroupNorm(1, 2 * channels),
                    nn.GLU(1),
                    LayerScale(channels, init=1e-3),
                )
            )

    def forward(self, x):
        for layer in self.layers:
            x = x + layer(x)
        return x


class HEncLayer(nn.Module):
    def __init__(self, chin: int, chout: int, freq: bool):
        super().__init__()
        self.freq = freq
        if freq:
            self.conv = nn.Conv2d(chin, chout, (KERNEL, 1), (STRIDE, 1), (2, 0))
            self.rewrite = nn.Conv2d(chout, 2 * chout, (1, 1))
        else:
            self.conv = nn.Conv1d(chin, chout, KERNEL, STRIDE, 2)
            self.rewrite = nn.Conv1d(chout, 2 * chout, 1)
        self.dconv = DConv(chout)

    def forward(self, x):
        y = self.conv(x)
        y = F.gelu(y)
        if self.freq:
            B, C, Fr, T = y.shape
            yb = y.permute(0, 2, 1, 3).reshape(-1, C, T)
            yb = self.dconv(yb)
            y = yb.view(B, Fr, C, T).permute(0, 2, 1, 3)
        else:
            y = self.dconv(y)
        z = self.rewrite(y)
        return F.glu(z, dim=1)


class HDecLayer(nn.Module):
    def __init__(self, chin: int, chout: int, freq: bool, last: bool):
        super().__init__()
        self.freq = freq
        self.last = last
        self.pad = (KERNEL - STRIDE) // 2
        if freq:
            self.conv_tr = nn.ConvTranspose2d(chin, chout, (KERNEL, 1), (STRIDE, 1))
            # real HDecLayer passes integer kernel 1+2*context to Conv2d,
            # which makes the freq-decoder rewrite a SQUARE 3x3 conv
            self.rewrite = nn.Conv2d(chin, 2 * chin, 3, padding=1)
        else:
            self.conv_tr = nn.ConvTranspose1d(chin, chout, KERNEL, STRIDE)
            self.rewrite = nn.Conv1d(chin, 2 * chin, 3, padding=1)

    def forward(self, x, skip):
        x = x + skip
        y = F.glu(self.rewrite(x), dim=1)
        z = self.conv_tr(y)
        if self.freq:
            z = z[..., self.pad : -self.pad, :]
        else:
            z = z[..., self.pad : -self.pad]
        if not self.last:
            z = F.gelu(z)
        return z


class ScaledEmbedding(nn.Module):
    def __init__(self, num_embeddings: int, embedding_dim: int, scale: float = 10.0):
        super().__init__()
        self.embedding = nn.Embedding(num_embeddings, embedding_dim)
        self.embedding.weight.data /= scale
        self.scale = scale

    def forward(self, x):
        return self.embedding(x) * self.scale


class MyGroupNorm(nn.GroupNorm):
    """GroupNorm applied to [B, T, C] tokens (channel-last)."""

    def forward(self, x):
        x = x.transpose(1, 2)
        x = super().forward(x)
        return x.transpose(1, 2)


class MyTransformerEncoderLayer(nn.Module):
    """Pre-norm self-attention layer with LayerScale and output GroupNorm."""

    def __init__(self, d_model: int, nhead: int, dim_ff: int):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d_model, nhead, batch_first=True)
        self.linear1 = nn.Linear(d_model, dim_ff)
        self.linear2 = nn.Linear(dim_ff, d_model)
        self.norm1 = nn.LayerNorm(d_model)
        self.norm2 = nn.LayerNorm(d_model)
        self.gamma_1 = LayerScale(d_model, init=1e-4, channel_last=True)
        self.gamma_2 = LayerScale(d_model, init=1e-4, channel_last=True)
        self.norm_out = MyGroupNorm(1, d_model)

    def forward(self, x):
        h = self.norm1(x)
        attn, _ = self.self_attn(h, h, h, need_weights=False)
        x = x + self.gamma_1(attn)
        h = self.norm2(x)
        x = x + self.gamma_2(self.linear2(F.gelu(self.linear1(h))))
        return self.norm_out(x)


class CrossTransformerEncoderLayer(nn.Module):
    """Pre-norm cross-attention layer: q = norm1(x), kv = norm2(other)."""

    def __init__(self, d_model: int, nhead: int, dim_ff: int):
        super().__init__()
        self.cross_attn = nn.MultiheadAttention(d_model, nhead, batch_first=True)
        self.linear1 = nn.Linear(d_model, dim_ff)
        self.linear2 = nn.Linear(dim_ff, d_model)
        self.norm1 = nn.LayerNorm(d_model)
        self.norm2 = nn.LayerNorm(d_model)
        self.norm3 = nn.LayerNorm(d_model)
        self.gamma_1 = LayerScale(d_model, init=1e-4, channel_last=True)
        self.gamma_2 = LayerScale(d_model, init=1e-4, channel_last=True)
        self.norm_out = MyGroupNorm(1, d_model)

    def forward(self, x, other):
        q = self.norm1(x)
        kv = self.norm2(other)
        attn, _ = self.cross_attn(q, kv, kv, need_weights=False)
        x = x + self.gamma_1(attn)
        x = x + self.gamma_2(self.linear2(F.gelu(self.linear1(self.norm3(x)))))
        return self.norm_out(x)


class CrossTransformerEncoder(nn.Module):
    """5 layers per branch; even indices cross-attend, odd self-attend
    (torch htdemucs classic_parity=1)."""

    def __init__(self, dim: int):
        super().__init__()
        self.norm_in = nn.LayerNorm(dim)
        self.norm_in_t = nn.LayerNorm(dim)
        self.layers = nn.ModuleList()
        self.layers_t = nn.ModuleList()
        for i in range(T_LAYERS):
            cls = MyTransformerEncoderLayer if i % 2 == 1 else CrossTransformerEncoderLayer
            self.layers.append(cls(dim, T_HEADS, T_FF))
            self.layers_t.append(cls(dim, T_HEADS, T_FF))

    def forward(self, x, xt):
        B, C, Fr, T1 = x.shape
        pe2 = torch.from_numpy(create_2d_sin_embedding(C, Fr, T1))  # [C, F, T]
        pe2 = pe2.permute(2, 1, 0).reshape(T1 * Fr, C)[None]
        x = x.permute(0, 3, 2, 1).reshape(B, T1 * Fr, C)
        x = self.norm_in(x) + pe2

        T2 = xt.shape[-1]
        pe1 = torch.from_numpy(create_sin_embedding(T2, C))[None]
        xt = xt.transpose(1, 2)
        xt = self.norm_in_t(xt) + pe1

        for i in range(T_LAYERS):
            if i % 2 == 1:
                x = self.layers[i](x)
                xt = self.layers_t[i](xt)
            else:
                old_x = x
                x = self.layers[i](x, xt)
                xt = self.layers_t[i](xt, old_x)

        x = x.reshape(B, T1, Fr, C).permute(0, 3, 2, 1)
        xt = xt.transpose(1, 2)
        return x, xt


class TorchHTDemucs(nn.Module):
    """HTDemucs with released-checkpoint parameter naming, depth 4."""

    def __init__(self, n_sources: int = 4, audio_channels: int = 2):
        super().__init__()
        self.n_sources = n_sources
        self.audio_channels = audio_channels
        chans = [CHANNELS * GROWTH**i for i in range(DEPTH)]
        spec_in = 2 * audio_channels

        self.encoder = nn.ModuleList()
        self.tencoder = nn.ModuleList()
        c_s, c_t = spec_in, audio_channels
        for d in range(DEPTH):
            self.encoder.append(HEncLayer(c_s, chans[d], freq=True))
            self.tencoder.append(HEncLayer(c_t, chans[d], freq=False))
            c_s = c_t = chans[d]

        self.decoder = nn.ModuleList()
        self.tdecoder = nn.ModuleList()
        for d in reversed(range(DEPTH)):
            last = d == 0
            co_s = n_sources * spec_in if last else chans[d - 1]
            co_t = n_sources * audio_channels if last else chans[d - 1]
            self.decoder.append(HDecLayer(chans[d], co_s, freq=True, last=last))
            self.tdecoder.append(HDecLayer(chans[d], co_t, freq=False, last=last))

        self.freq_emb = ScaledEmbedding(NFFT // 2 // STRIDE, chans[0], scale=10.0)

        dim = chans[-1]
        self.channel_upsampler = nn.Conv1d(dim, BOTTOM_CHANNELS, 1)
        self.channel_downsampler = nn.Conv1d(BOTTOM_CHANNELS, dim, 1)
        self.channel_upsampler_t = nn.Conv1d(dim, BOTTOM_CHANNELS, 1)
        self.channel_downsampler_t = nn.Conv1d(BOTTOM_CHANNELS, dim, 1)
        self.crosstransformer = CrossTransformerEncoder(BOTTOM_CHANNELS)

    # --- demucs-style spectral helpers (match htdemucs._spec/_ispec) ---

    def _spec(self, x):
        L = x.shape[-1]
        le = int(math.ceil(L / HOP))
        pad = HOP // 2 * 3
        x = F.pad(x, (pad, pad + le * HOP - L), mode="reflect")
        z = torch.stft(
            x.reshape(-1, x.shape[-1]),
            NFFT,
            HOP,
            window=torch.hann_window(NFFT),
            center=True,
            return_complex=True,
            pad_mode="reflect",
        )
        z = z.view(x.shape[:-1] + z.shape[-2:])
        return z[..., :-1, 2 : 2 + le]

    def _ispec(self, z, length):
        z = F.pad(z, (0, 0, 0, 1))  # Nyquist bin
        z = F.pad(z, (2, 2))  # 2 frames each side
        pad = HOP // 2 * 3
        le = HOP * int(math.ceil(length / HOP)) + 2 * pad
        shape = z.shape
        x = torch.istft(
            z.reshape(-1, *shape[-2:]),
            NFFT,
            HOP,
            window=torch.hann_window(NFFT),
            center=True,
            length=le,
        )
        x = x.view(shape[:-2] + (le,))
        return x[..., pad : pad + length]

    def forward(self, mix):
        """mix [B, ch, L] → [B, S, ch, L]; L must be a multiple of ALIGN."""
        B, ch, L = mix.shape
        assert L % ALIGN == 0, f"length must be multiple of {ALIGN}"
        S = self.n_sources

        z = self._spec(mix)  # [B, ch, 2048, T]
        Fr, T = z.shape[-2], z.shape[-1]
        mag = torch.view_as_real(z).permute(0, 1, 4, 2, 3).reshape(B, ch * 2, Fr, T)
        mean = mag.mean(dim=(1, 2, 3), keepdim=True)
        std = mag.std(dim=(1, 2, 3), keepdim=True)
        x = (mag - mean) / (1e-5 + std)

        meant = mix.mean(dim=(1, 2), keepdim=True)
        stdt = mix.std(dim=(1, 2), keepdim=True)
        xt = (mix - meant) / (1e-5 + stdt)

        saved, saved_t = [], []
        for i in range(DEPTH):
            xt = self.tencoder[i](xt)
            saved_t.append(xt)
            x = self.encoder[i](x)
            if i == 0:
                frs = torch.arange(x.shape[2])
                emb = self.freq_emb(frs).t()[None, :, :, None].expand_as(x)
                x = x + FREQ_EMB_SCALE * emb
            saved.append(x)

        Bc, C, Fq, Ts = x.shape
        x = self.channel_upsampler(x.reshape(Bc, C, Fq * Ts)).reshape(
            Bc, BOTTOM_CHANNELS, Fq, Ts
        )
        xt = self.channel_upsampler_t(xt)
        x, xt = self.crosstransformer(x, xt)
        x = self.channel_downsampler(x.reshape(Bc, BOTTOM_CHANNELS, Fq * Ts)).reshape(
            Bc, C, Fq, Ts
        )
        xt = self.channel_downsampler_t(xt)

        for i in range(DEPTH):
            x = self.decoder[i](x, saved[DEPTH - 1 - i])
            xt = self.tdecoder[i](xt, saved_t[DEPTH - 1 - i])

        x = x.view(B, S, ch * 2, Fr, T)
        x = x * std[:, None] + mean[:, None]
        zout = x.view(B, S, ch, 2, Fr, T).permute(0, 1, 2, 4, 5, 3)
        zout = torch.view_as_complex(zout.contiguous())
        wav_spec = self._ispec(zout, L)
        wav_time = xt.view(B, S, ch, L) * stdt[:, None] + meant[:, None]
        return wav_spec + wav_time


def random_state_dict(seed: int = 0, n_sources: int = 4, audio_channels: int = 2) -> dict:
    """Randomly-initialized torch state dict for converter round-trip tests."""
    torch.manual_seed(seed)
    model = TorchHTDemucs(n_sources=n_sources, audio_channels=audio_channels)
    # non-degenerate norms/scales so a conversion bug can't hide behind zeros
    sd = model.state_dict()
    g = torch.Generator().manual_seed(seed + 1)
    for k, v in sd.items():
        if k.endswith(("scale",)) or ".norm" in k or "gamma" in k:
            sd[k] = v + 0.05 * torch.randn(v.shape, generator=g)
    model.load_state_dict(sd)
    return model.state_dict()
