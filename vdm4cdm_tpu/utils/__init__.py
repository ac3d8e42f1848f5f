from .array import to_np, nchw_to_nlast, nlast_to_nchw, count_params
from .rng import RngStream
from .mesh import make_mesh, best_device, MeshAxes

__all__ = [
    "to_np",
    "nchw_to_nlast",
    "nlast_to_nchw",
    "count_params",
    "RngStream",
    "make_mesh",
    "best_device",
    "MeshAxes",
]
