"""Sharding-aware N-D convolution (channels-last, TPU MXU path).

The reference delegates all convs to cuDNN via torch (SURVEY.md §2d item 1;
e.g. reference trainVDM3D_c_c_from_field_name_thick_lowbatch.py:116-127 builds
a conv UNet with ``conv_padding_mode`` "circular" or "zeros"). Here convolution
is XLA's ``conv_general_dilated`` — which tiles directly onto the MXU — wrapped
with:

  * explicit symmetric padding (torch Conv(k, s, p=k//2) semantics, so shapes
    match the reference exactly for k=3, s in {1,2});
  * circular ("wrap") padding for periodic simulation boxes;
  * halo exchange over the sharded spatial dim (parallel/halo.py) instead of
    local padding, so spatially sharded grids convolve correctly across shard
    boundaries — including the periodic wraparound shard pair.

Accumulation is always float32 (``preferred_element_type``) regardless of the
activation dtype (bf16 compute supported).
"""

from __future__ import annotations

import itertools
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from ..parallel.halo import NO_SHARD, ShardCtx, halo_exchange

_SPATIAL_CHARS = "DHW"

# Convolution backend: "xla" = lax.conv_general_dilated; "taps" = explicit
# pad + per-tap shifted matmuls (M = all voxels, K = Cin, N = Cout per tap).
# The taps form can beat XLA's conv lowering for thin-channel 3D convs on TPU
# (MXU-dense GEMMs, no window logic); selected empirically per hardware.
_CONV_IMPL = os.environ.get("VDM4CDM_CONV_IMPL", "xla")


def _dim_numbers(nd: int):
    sp = _SPATIAL_CHARS[-nd:]
    return lax.conv_dimension_numbers(
        (1,) * (nd + 2), (1,) * (nd + 2), (f"N{sp}C", f"{sp}IO", f"N{sp}C")
    )


def conv_nd(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int | Sequence[int] = 1,
    padding_mode: str = "zeros",
    ctx: ShardCtx = NO_SHARD,
) -> jnp.ndarray:
    """Convolve channels-last ``x`` (B, *spatial, Cin) with ``w`` (*k, Cin, Cout).

    padding_mode: "zeros" | "circular". Padding per dim is the torch-style
    symmetric (k//2, (k-1)//2) so stride-1 preserves size and stride-2 halves
    even sizes — on every shard, at every mesh size.
    """
    nd = x.ndim - 2
    ksizes = w.shape[:-2]
    assert len(ksizes) == nd, f"kernel rank {len(ksizes)} != spatial rank {nd}"
    if isinstance(stride, int):
        stride = (stride,) * nd
    pads = [(k // 2, (k - 1) // 2) for k in ksizes]
    periodic = padding_mode == "circular"

    conv_pads = list(pads)
    if ctx.axis is not None:
        # sharded dim: halo exchange replaces local padding
        lo, hi = pads[ctx.spatial_dim]
        x = halo_exchange(x, ctx, lo, hi, periodic=periodic)
        conv_pads[ctx.spatial_dim] = (0, 0)
        if periodic:
            pad_width = [(0, 0)] * x.ndim
            for d in range(nd):
                if d != ctx.spatial_dim:
                    pad_width[1 + d] = conv_pads[d]
                    conv_pads[d] = (0, 0)
            if any(p != (0, 0) for p in pad_width):
                x = jnp.pad(x, pad_width, mode="wrap")
    elif periodic:
        pad_width = [(0, 0)] + list(conv_pads) + [(0, 0)]
        x = jnp.pad(x, pad_width, mode="wrap")
        conv_pads = [(0, 0)] * nd

    if _CONV_IMPL == "taps" and all(s == 1 for s in stride):
        out = _conv_taps(x, w.astype(x.dtype), conv_pads)
    else:
        # No explicit preferred_element_type: with bf16 operands the TPU MXU
        # still accumulates in f32 internally, and an explicit f32 upcast +
        # downcast breaks the conv transpose rule (cotangent arrives f32
        # against bf16 primals in the grad-w conv).
        out = lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=stride,
            padding=conv_pads,
            dimension_numbers=_dim_numbers(nd),
        )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _conv_taps(x: jnp.ndarray, w: jnp.ndarray, pads) -> jnp.ndarray:
    """Stride-1 conv as an explicit sum of per-tap GEMMs over a zero-padded
    volume: out = sum_t shift(x, t) @ w[t]. Each GEMM has M = prod(spatial)
    (huge), K = Cin, N = Cout — clean MXU tiles regardless of window shape."""
    nd = x.ndim - 2
    ksizes = w.shape[:-2]
    pad_width = [(0, 0)] + list(pads) + [(0, 0)]
    xp = jnp.pad(x, pad_width) if any(p != (0, 0) for p in pads) else x
    out_spatial = tuple(
        xp.shape[1 + d] - (ksizes[d] - 1) for d in range(nd)
    )
    out = None
    for taps in itertools.product(*(range(k) for k in ksizes)):
        sl = (slice(None),) + tuple(
            slice(t, t + out_spatial[d]) for d, t in enumerate(taps)
        ) + (slice(None),)
        term = xp[sl] @ w[taps]
        out = term if out is None else out + term
    return out
