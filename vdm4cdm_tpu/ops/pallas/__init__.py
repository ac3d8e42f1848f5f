from .groupnorm import fused_group_norm, fused_group_norm_vjp, pallas_available

__all__ = ["fused_group_norm", "fused_group_norm_vjp", "pallas_available"]
