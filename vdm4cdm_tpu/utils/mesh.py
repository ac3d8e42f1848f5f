"""Device mesh setup.

Replaces the reference's ``mltools.utils.cuda_tools.get_freer_device``
(reference generate_3D.py:31-32) with JAX device/mesh selection. The standard
mesh for this framework has two axes:

    data : data parallelism (batch sharding; gradient all-reduce)
    sp   : spatial-domain parallelism (first spatial dim of the field grid is
           sharded; convolutions halo-exchange over this axis — the conv-net
           analog of context parallelism; see parallel/halo.py)
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    data: str = "data"
    sp: str = "sp"


AXES = MeshAxes()


def best_device() -> jax.Device:
    """First accelerator device (all chips are symmetric on TPU)."""
    return jax.devices()[0]


def make_mesh(n_data: int = 1, n_sp: int = 1, devices=None) -> Mesh:
    """Build a (data, sp) mesh over the given (or all) devices.

    n_data * n_sp must equal the number of devices used. ``sp`` is laid out as
    the minor (fastest-varying) axis so halo exchange between spatially adjacent
    shards rides neighboring devices (ICI on real slices).
    """
    if devices is None:
        devices = jax.devices()
    n = n_data * n_sp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.array(devices[:n]).reshape(n_data, n_sp)
    return Mesh(dev, (AXES.data, AXES.sp))
