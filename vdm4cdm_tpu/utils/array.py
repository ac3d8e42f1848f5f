"""Array helpers.

Replaces the reference's ``mltools.ml_utils.to_np`` (used ubiquitously, e.g.
reference train_uc_uc_from_field_name.py:87) and provides the layout adapters
between the reference's channels-first storage convention (N, C, *spatial) and
this framework's TPU-native channels-last compute convention (N, *spatial, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def to_np(x) -> np.ndarray:
    """Device array -> host numpy (reference: mltools.ml_utils.to_np)."""
    return np.asarray(jax.device_get(x))


def nchw_to_nlast(x: jnp.ndarray) -> jnp.ndarray:
    """(N, C, *spatial) -> (N, *spatial, C). Works for 2D and 3D fields."""
    ndim = x.ndim
    perm = (0,) + tuple(range(2, ndim)) + (1,)
    return jnp.transpose(x, perm)


def nlast_to_nchw(x: jnp.ndarray) -> jnp.ndarray:
    """(N, *spatial, C) -> (N, C, *spatial)."""
    ndim = x.ndim
    perm = (0, ndim - 1) + tuple(range(1, ndim - 1))
    return jnp.transpose(x, perm)


def count_params(tree) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))
