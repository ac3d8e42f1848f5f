"""shard_map wrappers: run a model apply / train step spatially+data sharded.

Params are replicated; the batch is sharded (batch dim over ``data``, first
spatial dim over ``sp``). Everything inside runs per-shard with the ops layer
doing halo exchange / psum through the ShardCtx.
"""

from __future__ import annotations

from jax.sharding import Mesh, PartitionSpec as P

from ..utils.mesh import AXES
from .halo import ShardCtx


def make_shard_ctx(mesh: Mesh) -> ShardCtx:
    """ShardCtx for the standard (data, sp) mesh."""
    sp = AXES.sp if AXES.sp in mesh.axis_names and mesh.shape[AXES.sp] > 1 else None
    data = AXES.data if AXES.data in mesh.axis_names and mesh.shape[AXES.data] > 1 else None
    return ShardCtx(axis=sp, spatial_dim=0, data_axis=data)


def batch_pspec(ndim_spatial: int) -> P:
    """PartitionSpec for a channels-last batch array (B, *spatial, C)."""
    spatial = (AXES.sp,) + (None,) * (ndim_spatial - 1)
    return P(AXES.data, *spatial, None)


