"""Spatial-domain parallelism: halo exchange over a mesh axis.

This is the TPU-native capability the reference lacks entirely: the reference
pins ``devices=1`` and *downsamples the data* to fit 224^3/256^3 volumes on one
GPU (reference trainVDM3D_c_c_from_field_name_thick_lowbatch.py:41,60 and
scripts/make_down_grids.ipynb). Here, the field grid's first spatial dimension
is sharded across the ``sp`` mesh axis, and each convolution exchanges a
k//2-voxel halo with its mesh neighbors via ``jax.lax.ppermute`` (XLA lowers
this to ICI collective-permutes that overlap with compute).

Periodic boxes (the reference's ``conv_padding_mode="circular"``) map naturally:
the periodic halo is simply the wrapped neighbor on the ring. Zero padding maps
to dropping the wraparound edge from the permutation — ``ppermute`` fills
non-received shards with zeros, which is exactly the zero halo.

All functions here are designed to run INSIDE ``jax.shard_map``: they are
no-ops when ``ctx.axis`` is None, so the same model code runs single-device.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ShardCtx:
    """How the current computation is sharded.

    axis:        mesh axis name the spatial grid is sharded over (None = unsharded)
    spatial_dim: which *spatial* dimension is sharded (0 = first spatial dim).
                 Arrays are channels-last: (B, *spatial, C), so the sharded
                 array dimension is ``1 + spatial_dim``.
    data_axis:   mesh axis name for data parallelism (None = none). Used by the
                 train step for gradient reductions, not by the ops.
    """

    axis: Optional[str] = None
    spatial_dim: int = 0
    data_axis: Optional[str] = None

    @property
    def array_dim(self) -> int:
        return 1 + self.spatial_dim

    def axis_size(self) -> int:
        if self.axis is None:
            return 1
        return jax.lax.axis_size(self.axis)

    def axis_index(self):
        return jax.lax.axis_index(self.axis)


NO_SHARD = ShardCtx()


def _shift(x: jnp.ndarray, axis_name: str, direction: int, periodic: bool) -> jnp.ndarray:
    """Send ``x`` to the neighbor ``direction`` steps up the ring; return what
    this shard receives (zeros at open boundaries when not periodic)."""
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        if periodic:
            return x
        return jnp.zeros_like(x)
    if periodic:
        perm = [(i, (i + direction) % n) for i in range(n)]
    else:
        perm = [(i, i + direction) for i in range(n) if 0 <= i + direction < n]
    return jax.lax.ppermute(x, axis_name, perm)


def halo_exchange(
    x: jnp.ndarray,
    ctx: ShardCtx,
    lo: int,
    hi: int,
    periodic: bool,
) -> jnp.ndarray:
    """Pad the sharded dimension of ``x`` with ``lo``/``hi`` halo voxels fetched
    from mesh neighbors (or zeros at open boundaries).

    x is the per-shard block, channels-last. Returns the block extended to
    local_size + lo + hi along ``ctx.array_dim``. When ctx.axis is None this is
    plain jnp padding (wrap or zeros) — the single-device reference semantics.
    """
    dim = ctx.array_dim
    if lo == 0 and hi == 0:
        return x
    if ctx.axis is None:
        pad = [(0, 0)] * x.ndim
        pad[dim] = (lo, hi)
        mode = "wrap" if periodic else "constant"
        return jnp.pad(x, pad, mode=mode)

    parts = []
    if lo > 0:
        # our left halo = right edge of the left (index-1) neighbor: every shard
        # sends its right edge one step UP the ring (i -> i+1).
        right_edge = jax.lax.slice_in_dim(x, x.shape[dim] - lo, x.shape[dim], axis=dim)
        parts.append(_shift(right_edge, ctx.axis, +1, periodic))
    parts.append(x)
    if hi > 0:
        left_edge = jax.lax.slice_in_dim(x, 0, hi, axis=dim)
        parts.append(_shift(left_edge, ctx.axis, -1, periodic))
    return jnp.concatenate(parts, axis=dim)


def all_gather_spatial(x: jnp.ndarray, ctx: ShardCtx) -> jnp.ndarray:
    """Gather the sharded spatial dimension onto every shard (used only at the
    tiny UNet bottleneck, e.g. for full self-attention)."""
    if ctx.axis is None:
        return x
    return jax.lax.all_gather(x, ctx.axis, axis=ctx.array_dim, tiled=True)


def take_local_spatial(x: jnp.ndarray, ctx: ShardCtx) -> jnp.ndarray:
    """Inverse of all_gather_spatial: slice this shard's chunk back out."""
    if ctx.axis is None:
        return x
    n = ctx.axis_size()
    dim = ctx.array_dim
    local = x.shape[dim] // n
    idx = ctx.axis_index()
    return jax.lax.dynamic_slice_in_dim(x, idx * local, local, axis=dim)
