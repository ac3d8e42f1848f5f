from .halo import ShardCtx, halo_exchange, NO_SHARD
from .shard import make_shard_ctx, batch_pspec
from .sampling import make_sharded_vdm_sampler, make_sharded_sfm_sampler

__all__ = [
    "ShardCtx",
    "halo_exchange",
    "NO_SHARD",
    "make_shard_ctx",
    "batch_pspec",
    "make_sharded_vdm_sampler",
    "make_sharded_sfm_sampler",
]
