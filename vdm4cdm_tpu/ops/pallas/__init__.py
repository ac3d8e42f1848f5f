from .conv3d import conv3d_pallas
from .conv3d import supports as conv3d_supports
from .fused_norm import fused_norm_affine
from .fused_norm import supports as fused_norm_supports

__all__ = [
    "conv3d_pallas",
    "conv3d_supports",
    "fused_norm_affine",
    "fused_norm_supports",
]
