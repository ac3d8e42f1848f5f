"""Pallas TPU kernel: fused GroupNorm + (optional) SiLU.

GroupNorm is the UNet's main memory-bound op (SURVEY.md §2d item 2): XLA runs
it as two full passes over the activation volume in HBM (moments, then
normalize) plus the activation pass. This kernel keeps each (batch, spatial-
tile) block resident in VMEM across both phases of a two-sweep grid — HBM
traffic drops to read-once + write-once.

Grid layout: (B, 2, S_tiles) iterated sequentially per core (Pallas TPU grids
are loops, not parallel blocks):
  phase 0 sweeps the spatial tiles accumulating per-group sums/sumsqs into a
  VMEM scratch accumulator;
  phase 1 re-sweeps, normalizing with the finalized statistics and applying
  scale/bias (+ SiLU), writing the output tile.

The XLA implementation in ops/norm.py is the correctness oracle
(tests/test_pallas_groupnorm.py compares them, in interpret mode on CPU and
compiled on TPU). Unsharded path only — the sharded GroupNorm needs a psum
between the phases and stays on the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, acc_ref, *, groups: int,
               eps: float, act: Optional[str], n_tiles: int, count: float):
    """Mosaic-safe formulation: per-CHANNEL sums only (no lane-dim reshape —
    Mosaic can't shape-cast the lane dimension), with channel<->group mixing
    done by one-hot indicator matmuls (MXU ops)."""
    phase = pl.program_id(1)
    tile = pl.program_id(2)

    c = x_ref.shape[-1]
    cpg = c // groups

    @pl.when(jnp.logical_and(phase == 0, tile == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # (1, TILE_S, C)

    @pl.when(phase == 0)
    def _():
        xf = x.astype(jnp.float32)
        acc_ref[0:1, :] += jnp.sum(xf, axis=1)      # (1, C)
        acc_ref[1:2, :] += jnp.sum(xf * xf, axis=1)

    @pl.when(phase == 1)
    def _():
        # channel -> group indicator M[c, g] = (c // cpg == g); all operands
        # stay 2D (Mosaic requires >=2D vector ops on TPU).
        cids = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cpg
        gids = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
        M = (cids == gids).astype(jnp.float32)  # (C, G)
        s1 = acc_ref[0:1, :]  # (1, C)
        s2 = acc_ref[1:2, :]
        s1_g = jnp.dot(s1, M, preferred_element_type=jnp.float32)  # (1, G)
        s2_g = jnp.dot(s2, M, preferred_element_type=jnp.float32)
        mean_g = s1_g / count
        var_g = s2_g / count - mean_g * mean_g
        inv_g = jax.lax.rsqrt(var_g + eps)  # (1, G)
        # group -> channel broadcast via M^T (as (G, C) dot)
        inv_c = jnp.dot(inv_g, M.T, preferred_element_type=jnp.float32)  # (1, C)
        mean_c = jnp.dot(mean_g, M.T, preferred_element_type=jnp.float32)
        a = inv_c * scale_ref[:].astype(jnp.float32)       # (1, C)
        b = bias_ref[:].astype(jnp.float32) - mean_c * a
        out = x.astype(jnp.float32) * a[None] + b[None]    # (1, S, C)
        if act == "silu":
            out = out * jax.nn.sigmoid(out)
        o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def fused_group_norm_vjp(x, scale, bias, groups, eps, act, interpret):
    return fused_group_norm(x, scale, bias, groups, eps=eps, act=act,
                            interpret=interpret)


def _fgn_fwd(x, scale, bias, groups, eps, act, interpret):
    out = fused_group_norm(x, scale, bias, groups, eps=eps, act=act,
                           interpret=interpret)
    return out, (x, scale, bias)


def _fgn_bwd(groups, eps, act, interpret, res, g):
    """XLA backward (the fused forward is the memory win; backward reuses the
    differentiable oracle via jax.vjp — numerically identical to ops/norm.py)."""
    from ..norm import group_norm as xla_group_norm

    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: xla_group_norm(x_, s_, b_, groups, eps=eps, act=act),
        x, scale, bias,
    )
    return vjp(g)


fused_group_norm_vjp.defvjp(_fgn_fwd, _fgn_bwd)


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "act", "interpret")
)
def fused_group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    groups: int,
    eps: float = 1e-6,
    act: Optional[str] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (B, *spatial, C) -> same shape. Two-sweep fused GroupNorm(+SiLU)."""
    orig_shape = x.shape
    b, c = x.shape[0], x.shape[-1]
    s = int(np.prod(x.shape[1:-1]))
    xf = x.reshape(b, s, c)

    # spatial tile: multiple of 8 sublanes. Budget ~64K elements per block —
    # phase 1 holds the block plus f32 temps, double-buffered, inside the
    # 16 MB scoped-VMEM limit.
    tile_s = min(s, max(8, (1 << 16) // max(c, 1) // 8 * 8))
    while s % tile_s:
        tile_s //= 2
    tile_s = max(tile_s, 1)
    n_tiles = s // tile_s

    out = pl.pallas_call(
        functools.partial(
            _gn_kernel, groups=groups, eps=eps, act=act, n_tiles=n_tiles,
            count=float(s * (c // groups)),
        ),
        grid=(b, 2, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile_s, c), lambda b, p, t: (b, t, 0)),
            pl.BlockSpec((1, c), lambda b, p, t: (0, 0)),
            pl.BlockSpec((1, c), lambda b, p, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_s, c), lambda b, p, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=interpret,
    )(xf, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(orig_shape)
