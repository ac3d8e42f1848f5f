from .conv import conv_nd
from .norm import group_norm
from .resample import downsample_conv, upsample_nearest

__all__ = ["conv_nd", "group_norm", "downsample_conv", "upsample_nearest"]
