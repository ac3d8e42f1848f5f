"""Down/upsampling for the UNet, sharding-aware.

Down: stride-2 k=3 convolution (halves every spatial dim; per-shard sizes must
be even on the sharded dim — guaranteed by requiring shard sizes divisible by
2^(levels-1), checked in models/cunet.py).

Up: nearest-neighbor x2 (purely local, even under sharding) followed by a k=3
convolution. Chosen over transposed conv to avoid checkerboard artifacts and
because the repeat+conv pair fuses cleanly in XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..parallel.halo import NO_SHARD, ShardCtx
from .conv import conv_nd


def downsample_conv(x, w, b=None, padding_mode="zeros", ctx: ShardCtx = NO_SHARD):
    return conv_nd(x, w, b, stride=2, padding_mode=padding_mode, ctx=ctx)


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    nd = x.ndim - 2
    for d in range(1, 1 + nd):
        x = jnp.repeat(x, factor, axis=d)
    return x
