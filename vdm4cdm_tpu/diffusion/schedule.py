"""Noise schedules gamma(t) for variance-preserving diffusion.

The reference trains with ``noise_schedule="learned_linear"`` bounded by
gamma_min=-13.3 / gamma_max=13.3 (reference train_uc_uc_from_field_name.py:58-59,118
and trainVDM3D_c_c_from_field_name_thick_lowbatch.py:68). Per the VDM math
(Kingma et al. 2021, SURVEY.md §2b LightVDM row):

    sigma^2(t) = sigmoid(gamma(t)),   alpha^2(t) = sigmoid(-gamma(t))

gamma must be monotonically increasing in t. The learned-linear schedule keeps
monotonicity by construction:

    gamma(t) = b + |w| * t,   with init b = gamma_min, w = gamma_max - gamma_min

Schedules are plain pytrees of parameters + pure functions, so they live inside
jitted/scanned samplers and the training grad path (the loss weight gamma'(t)
and the noise injection both differentiate through them).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    kind: str  # "learned_linear" | "fixed_linear"
    gamma_min: float
    gamma_max: float

    def init_params(self) -> Dict[str, jnp.ndarray]:
        if self.kind == "learned_linear":
            return {
                "b": jnp.asarray(self.gamma_min, jnp.float32),
                "w": jnp.asarray(self.gamma_max - self.gamma_min, jnp.float32),
            }
        if self.kind == "fixed_linear":
            return {}
        raise ValueError(f"unknown schedule kind {self.kind!r}")

    def gamma(self, params: Dict[str, jnp.ndarray], t: jnp.ndarray) -> jnp.ndarray:
        t = jnp.asarray(t, jnp.float32)
        if self.kind == "learned_linear":
            return params["b"] + jnp.abs(params["w"]) * t
        return self.gamma_min + (self.gamma_max - self.gamma_min) * t

    def gamma_prime(self, params: Dict[str, jnp.ndarray], t: jnp.ndarray) -> jnp.ndarray:
        """d gamma / d t (differentiable wrt params)."""
        t = jnp.asarray(t, jnp.float32)
        if self.kind == "learned_linear":
            return jnp.abs(params["w"]) * jnp.ones_like(t)
        return (self.gamma_max - self.gamma_min) * jnp.ones_like(t)


def make_schedule(kind: str, gamma_min: float = -13.3, gamma_max: float = 13.3) -> NoiseSchedule:
    return NoiseSchedule(kind=kind, gamma_min=gamma_min, gamma_max=gamma_max)


def alpha_sigma(gamma: jnp.ndarray):
    """alpha(t), sigma(t) from gamma(t) — variance preserving."""
    alpha = jnp.sqrt(jax.nn.sigmoid(-gamma))
    sigma = jnp.sqrt(jax.nn.sigmoid(gamma))
    return alpha, sigma
