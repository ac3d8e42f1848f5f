"""GroupNorm (+ fused activation), sharding-aware.

The reference's ResBlocks use GroupNorm(8) + SiLU (SURVEY.md §2b CUNet row,
``norm_groups=8`` at reference trainVDM3D_c_c_from_field_name_thick_lowbatch.py:61).
Statistics reduce over all spatial positions and the channels of each group —
under spatial sharding that is a cross-shard reduction, implemented as local
moments + ``lax.psum`` over the ``sp`` mesh axis.

A fused Pallas TPU kernel for the unsharded hot path lives in
ops/pallas/groupnorm.py; this module is the XLA reference implementation and
the correctness oracle for it.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..parallel.halo import NO_SHARD, ShardCtx

# Pallas fused kernel opt-in (TPU, unsharded only). The kernel's forward is a
# single VMEM-resident two-sweep pass; its backward reuses this module via
# custom_vjp, so training works. Toggle: VDM4CDM_PALLAS_GN=1 to enable
# (default off until benchmarked ahead of XLA's fusion on real hardware).
_PALLAS_GN = os.environ.get("VDM4CDM_PALLAS_GN", "0") == "1"


def group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    groups: int,
    eps: float = 1e-6,
    act: Optional[str] = None,
    ctx: ShardCtx = NO_SHARD,
) -> jnp.ndarray:
    """x: (B, *spatial, C) channels-last; scale/bias: (C,).

    act: None | "silu" (fused activation).
    """
    if _PALLAS_GN and ctx.axis is None and jax.default_backend() == "tpu":
        from .pallas.groupnorm import fused_group_norm_vjp

        return fused_group_norm_vjp(x, scale, bias, groups, eps, act, False)
    b = x.shape[0]
    c = x.shape[-1]
    assert c % groups == 0, f"channels {c} not divisible by groups {groups}"

    # Moments accumulate in f32 via the reduction dtype — the activation tensor
    # itself is NEVER upcast (a full f32 copy of a bf16 128^3 volume is what
    # blows HBM at scale).
    xg = x.reshape(b, -1, groups, c // groups)  # (B, S_local, G, C/G)
    s1 = jnp.sum(xg, axis=(1, 3), dtype=jnp.float32)  # (B, G)
    s2 = jnp.sum(jnp.square(xg), axis=(1, 3), dtype=jnp.float32)
    count = xg.shape[1] * xg.shape[3]
    if ctx.axis is not None:
        s1 = jax.lax.psum(s1, ctx.axis)
        s2 = jax.lax.psum(s2, ctx.axis)
        count = count * ctx.axis_size()
    mean = s1 / count
    var = s2 / count - mean * mean
    inv = jax.lax.rsqrt(var + eps)  # (B, G) f32

    # fold scale into inv and bias into shift: out = x * a + b, all in x.dtype
    shape_bc = (b,) + (1,) * (x.ndim - 2) + (c,)
    inv_c = jnp.repeat(inv, c // groups, axis=-1).reshape(shape_bc)
    mean_c = jnp.repeat(mean, c // groups, axis=-1).reshape(shape_bc)
    a = inv_c * scale.astype(jnp.float32)
    sh = bias.astype(jnp.float32) - mean_c * a
    out = x * a.astype(x.dtype) + sh.astype(x.dtype)
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
    elif act is not None:
        raise ValueError(f"unknown act {act!r}")
    return out
