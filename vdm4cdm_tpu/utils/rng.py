"""PRNG-key threading.

JAX-native replacement for the reference's global-state seeding
(``lightning.seed_everything(42)``, reference train_uc_uc_from_field_name.py:52):
one root key, split explicitly; a small stream helper for imperative call sites
(data loaders, eval scripts) that want sequential keys.
"""

from __future__ import annotations

import jax


class RngStream:
    """Sequential PRNG-key source. NOT for use inside jit — for host-side code."""

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.PRNGKey(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self) -> jax.Array:
        self._key, out = jax.random.split(self._key)
        return out

    def next_n(self, n: int):
        self._key, *out = jax.random.split(self._key, n + 1)
        return out
