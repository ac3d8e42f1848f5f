"""Torch mirror of vdm4cdm_tpu.models.CUNet — converter validation stand-in.

The reference loads its trained weights into ``mltools``' torch CUNet
(reference src/utils.py:434-471); ``mltools`` itself is not distributed with
the reference, so its exact state_dict key names cannot be read out of this
environment. This module provides a torch implementation that (a) computes
exactly the same function as our Flax CUNet and (b) uses module names that
tools/convert_torch_ckpt.py maps mechanically, so the torch->orbax conversion
and the eps_hat/ELBO parity harness (tests/test_torch_parity.py) are fully
exercised end-to-end on CPU. Pointing the converter at a real mltools
checkpoint then only requires a key-rename table (``--rename`` regexes), not
new machinery.

Matches models/cunet.py exactly: channels-first here vs channels-last there,
GroupNorm(eps=1e-6) -> SiLU ResBlocks with FiLM, nearest-up + conv, optional
bottleneck MHA, circular or zeros conv padding.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t: torch.Tensor, dim: int, max_freq: float = 1000.0):
    half = dim // 2
    freqs = torch.exp(torch.linspace(0.0, math.log(max_freq), half))
    ang = t[:, None].float() * freqs[None, :]
    emb = torch.cat([torch.sin(ang), torch.cos(ang)], dim=-1)
    if dim % 2:
        emb = F.pad(emb, (0, 1))
    return emb


def _conv(nd, cin, cout, k, stride=1, padding_mode="zeros"):
    cls = nn.Conv2d if nd == 2 else nn.Conv3d
    return cls(cin, cout, k, stride=stride, padding=k // 2,
               padding_mode="circular" if padding_mode == "circular" else "zeros")


class ResBlock(nn.Module):
    def __init__(self, nd, cin, cout, norm_groups, emb_dim, padding_mode):
        super().__init__()
        # attribute names chosen to equal the Flax module names so the
        # converter's key mapping is mechanical
        setattr(self, "_GroupNorm_0", nn.GroupNorm(norm_groups, cin, eps=1e-6))
        setattr(self, "_Conv_0", _conv(nd, cin, cout, 3, padding_mode=padding_mode))
        self.film = nn.Linear(emb_dim, 2 * cout)
        setattr(self, "_GroupNorm_1", nn.GroupNorm(norm_groups, cout, eps=1e-6))
        setattr(self, "_Conv_1", _conv(nd, cout, cout, 3, padding_mode=padding_mode))
        self.skip_proj = _conv(nd, cin, cout, 1) if cin != cout else None

    def forward(self, x, emb):
        h = F.silu(getattr(self, "_GroupNorm_0")(x))
        h = getattr(self, "_Conv_0")(h)
        film = self.film(F.silu(emb))
        scale, shift = film.chunk(2, dim=-1)
        bshape = (x.shape[0], -1) + (1,) * (x.ndim - 2)
        h = getattr(self, "_GroupNorm_1")(h)
        h = h * (1.0 + scale.reshape(bshape)) + shift.reshape(bshape)
        h = F.silu(h)
        h = getattr(self, "_Conv_1")(h)
        if self.skip_proj is not None:
            x = self.skip_proj(x)
        return x + h


class AttentionBlock(nn.Module):
    def __init__(self, channels, num_heads, norm_groups):
        super().__init__()
        self.num_heads = num_heads
        setattr(self, "_GroupNorm_0", nn.GroupNorm(norm_groups, channels, eps=1e-6))
        self.qkv = nn.Linear(channels, 3 * channels)
        self.proj = nn.Linear(channels, channels)

    def forward(self, x):
        b, c = x.shape[0], x.shape[1]
        spatial = x.shape[2:]
        h = getattr(self, "_GroupNorm_0")(x)
        seq = h.flatten(2).transpose(1, 2)                 # (B, S, C)
        qkv = self.qkv(seq).reshape(b, -1, 3, self.num_heads, c // self.num_heads)
        q, k, v = (qkv[:, :, i].transpose(1, 2) for i in range(3))  # (B, H, S, hd)
        attn = F.scaled_dot_product_attention(q, k, v)
        attn = attn.transpose(1, 2).reshape(b, -1, c)
        out = self.proj(attn).transpose(1, 2).reshape(b, c, *spatial)
        return x + out


class TorchCUNet(nn.Module):
    """Channels-first twin of models/cunet.py. ``shape`` = (C_out, *spatial)."""

    def __init__(self, shape, chs=(48, 96, 192, 384), s_conditioning_channels=0,
                 v_conditioning_dims=(), t_conditioning=True, norm_groups=8,
                 mid_attn=False, n_attention_heads=4, dropout_prob=0.0,
                 conv_padding_mode="zeros", num_res_blocks=2):
        super().__init__()
        self.shape = tuple(shape)
        nd = len(shape) - 1
        self.nd = nd
        self.chs = list(chs)
        self.t_conditioning = t_conditioning
        self.v_conditioning_dims = list(v_conditioning_dims)
        self.mid_attn = mid_attn
        self.num_res_blocks = num_res_blocks
        cin = shape[0] + s_conditioning_channels
        emb_dim = chs[0] * 4
        self.emb_dim = emb_dim
        pm = conv_padding_mode

        if t_conditioning:
            self.t_dense0 = nn.Linear(chs[0], emb_dim)
            self.t_dense1 = nn.Linear(emb_dim, emb_dim)
        for i, d in enumerate(v_conditioning_dims):
            setattr(self, f"v_dense0_{i}", nn.Linear(d, emb_dim))
            setattr(self, f"v_dense1_{i}", nn.Linear(emb_dim, emb_dim))

        self.conv_in = _conv(nd, cin, chs[0], 3, padding_mode=pm)
        prev = chs[0]
        enc_out = [chs[0]]
        for level, ch in enumerate(chs):
            for blk in range(num_res_blocks):
                setattr(self, f"down_{level}_{blk}",
                        ResBlock(nd, prev, ch, norm_groups, emb_dim, pm))
                prev = ch
                enc_out.append(ch)
            if level < len(chs) - 1:
                setattr(self, f"downsample_{level}",
                        _conv(nd, ch, ch, 3, stride=2, padding_mode=pm))
                enc_out.append(ch)
        self.mid_0 = ResBlock(nd, prev, chs[-1], norm_groups, emb_dim, pm)
        if mid_attn:
            self.mid_attn_blk = AttentionBlock(chs[-1], n_attention_heads, norm_groups)
        self.mid_1 = ResBlock(nd, chs[-1], chs[-1], norm_groups, emb_dim, pm)
        prev = chs[-1]
        for level, ch in reversed(list(enumerate(chs))):
            for blk in range(num_res_blocks + 1):
                skip_ch = enc_out.pop()
                setattr(self, f"up_{level}_{blk}",
                        ResBlock(nd, prev + skip_ch, ch, norm_groups, emb_dim, pm))
                prev = ch
            if level > 0:
                setattr(self, f"upsample_{level}",
                        _conv(nd, ch, ch, 3, padding_mode=pm))
        self.norm_out = nn.GroupNorm(norm_groups, chs[0], eps=1e-6)
        self.conv_out = _conv(nd, chs[0], shape[0], 3, padding_mode=pm)

    def forward(self, z, t=None, s_conditioning=None, v_conditionings=()):
        x = z
        if s_conditioning is not None:
            x = torch.cat([x, s_conditioning], dim=1)
        emb = None
        if self.t_conditioning:
            temb = timestep_embedding(
                torch.atleast_1d(t) * torch.ones(x.shape[0]), self.chs[0])
            emb = self.t_dense1(F.silu(self.t_dense0(temb)))
        for i, v in enumerate(v_conditionings):
            vemb = getattr(self, f"v_dense1_{i}")(
                F.silu(getattr(self, f"v_dense0_{i}")(v.float())))
            emb = vemb if emb is None else emb + vemb

        h = self.conv_in(x)
        skips = [h]
        for level, ch in enumerate(self.chs):
            for blk in range(self.num_res_blocks):
                h = getattr(self, f"down_{level}_{blk}")(h, emb)
                skips.append(h)
            if level < len(self.chs) - 1:
                h = getattr(self, f"downsample_{level}")(h)
                skips.append(h)
        h = self.mid_0(h, emb)
        if self.mid_attn:
            h = self.mid_attn_blk(h)
        h = self.mid_1(h, emb)
        for level, ch in reversed(list(enumerate(self.chs))):
            for blk in range(self.num_res_blocks + 1):
                h = torch.cat([h, skips.pop()], dim=1)
                h = getattr(self, f"up_{level}_{blk}")(h, emb)
            if level > 0:
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = getattr(self, f"upsample_{level}")(h)
        assert not skips
        h = self.conv_out(F.silu(self.norm_out(h)))
        return h
