from .halo import ShardCtx, halo_exchange, NO_SHARD
from .shard import shard_module_apply, make_shard_ctx
from .sampling import make_sharded_vdm_sampler, make_sharded_sfm_sampler

__all__ = [
    "ShardCtx",
    "halo_exchange",
    "NO_SHARD",
    "shard_module_apply",
    "make_shard_ctx",
    "make_sharded_vdm_sampler",
    "make_sharded_sfm_sampler",
]
