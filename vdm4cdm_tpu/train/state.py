"""Train state and optimizer.

Reference training recipe (BASELINE.md): Adam(-family) lr 3e-4, global-norm
gradient clip 0.5 (reference trainVDM3D_c_c_from_field_name_thick_lowbatch.py:45,131).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import optax


@flax.struct.dataclass
class TrainState:
    step: int
    params: Any
    opt_state: Any
    # Exponential moving average of params (None = disabled). Standard
    # diffusion-quality practice the reference lacks; sampled from when
    # present (generation prefers EMA weights).
    ema_params: Any = None


def make_lr_schedule(learning_rate: float, warmup_steps: int = 0):
    """The learning-rate schedule used by make_optimizer, exposed so loggers
    can report the REAL per-step LR (the reference had a LearningRateMonitor
    callback; logging the config constant would be wrong during warmup)."""
    if warmup_steps > 0:
        return optax.linear_schedule(0.0, learning_rate, warmup_steps)
    return optax.constant_schedule(learning_rate)


def make_optimizer(
    learning_rate: float = 3.0e-4,
    grad_clip: float = 0.5,
    weight_decay: float = 0.0,
    warmup_steps: int = 0,
    moment_dtype: Any = None,
) -> optax.GradientTransformation:
    """moment_dtype: dtype for Adam's first moment (optax ``mu_dtype``), e.g.
    jnp.bfloat16 to shave HBM at large model/volume sizes; None = float32."""
    lr = make_lr_schedule(learning_rate, warmup_steps)
    parts = []
    if grad_clip and grad_clip > 0:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(optax.adamw(lr, weight_decay=weight_decay, mu_dtype=moment_dtype))
    return optax.chain(*parts)
