"""Log-PDF histograms (reference calc_SS.py:51-65)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def log_pdf(fields: jnp.ndarray, bins: np.ndarray) -> jnp.ndarray:
    """Per-sample histogram of log10(field + 1). fields: (B, ...) ->
    (B, len(bins)-1). Jittable."""
    logf = jnp.log10(fields.reshape(fields.shape[0], -1) + 1.0)
    edges = jnp.asarray(bins)

    def hist(row):
        return jnp.histogram(row, bins=edges)[0]

    return jax.vmap(hist)(logf)


BINS_3D = np.linspace(8.5, 15.0, 100)   # reference calc_SS.py:52
BINS_2D = np.linspace(10.5, 15.5, 100)  # reference calc_SS.py:60
