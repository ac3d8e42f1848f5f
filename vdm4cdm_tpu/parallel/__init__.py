from .halo import ShardCtx, halo_exchange, NO_SHARD
from .shard import shard_module_apply

__all__ = ["ShardCtx", "halo_exchange", "NO_SHARD", "shard_module_apply"]
