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


def upsample_nearest_packed(pk):
    """Nearest ×2 upsample DIRECTLY on the packed carrier — one broadcast.

    The per-dim ``jnp.repeat`` chain on the unpacked tensor materializes a
    full volume per spatial dim PLUS the unpack/repack relayouts around it
    (HLO byte audit: ~2.5 GB of writes per step at the decoder's two big
    upsample sites). On the lane-dense carrier the whole ×2³ upsample is a
    single broadcast whose row-major order IS the output packed layout:
    within a row, the upsampled W index 2(q·p+j)+s is lexicographic in
    (q, j, s), so grouping consecutive 2p elements into two p-blocks is a
    free reshape; D and H interleave as leading (dim, 2) pairs. One 537 MB
    write at the flagship's 64³→128³ site instead of ~1.6 GB + relayouts."""
    from .packed import Packed

    B = pk.batch
    D, H, W = pk.spatial
    p, C = pk.p, pk.channels
    v = pk.data.reshape(B, D, 1, H, 1, W // p, p, 1, C)
    v = jnp.broadcast_to(v, (B, D, 2, H, 2, W // p, p, 2, C))
    out = v.reshape(B, 2 * D, (2 * H) * (2 * W) // p, p * C)
    return Packed(out, (2 * D, 2 * H, 2 * W), C, p)
