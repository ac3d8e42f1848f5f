"""Pallas TPU kernel: fused GroupNorm + affine + SiLU + dropout (fwd AND bwd).

Why (measured, experiments/bisect_step.py on v5e at the flagship 128^3 batch-2
VDM step): GroupNorm costs 279 ms and dropout RNG 133 ms of a 653 ms forward —
2/3 of the whole forward is this memory-bound epilogue chain, not the convs.
XLA executes it as many separate HBM passes on thin-lane (C=32 of 128) tensors
with threefry dropout bits; this kernel does the entire chain in 3 HBM passes
(2 reads + 1 write) on a lane-dense packed view with the TPU's hardware PRNG.

The op surface covers every normalization site in the UNet with ONE kernel:

    y = dropout(act((x - mu_g) * r_g * a_{b,c} + b_{b,c}))

where mu/r are GroupNorm statistics over (spatial x channels-of-group) and
a, b are arbitrary per-(batch, channel) affine coefficients. The call sites
compose them in plain JAX (tiny (B, C) math, so gradients to the underlying
parameters flow through the custom_vjp's da/db automatically):

    plain GroupNorm         a = gamma,             b = beta
    GroupNorm + FiLM        a = gamma * (1 + fs),  b = beta * (1 + fs) + fsh

(The reference reaches the same semantics through separate torch GroupNorm /
elementwise / Dropout modules inside its mltools ResBlocks — SURVEY.md §2b/2d.)

Design, TPU-first:

  * packed lanes: x is viewed (free row-major reshape) as (B, S/p, p*C) with
    p*C a multiple of 128 — channel-last C=32 tensors otherwise waste 3/4 of
    every vector register and every DMA'd tile on lane padding;
  * two-sweep grid (B, 2, tiles), VMEM accumulator: sweep 0 reduces per-lane
    sums/sumsqs; sweep 1 folds lanes->groups (one (pC, G) indicator matmul),
    broadcasts the finalized stats back to lanes (indicator matmul again), and
    streams normalize+affine+act+dropout tiles out;
  * dropout mask from ``pltpu.prng_random_bits`` seeded per (batch, tile) —
    regenerated bit-identically in the backward, so no mask is materialized;
  * backward is the same two-sweep structure: sweep 0 accumulates S_dy and
    S_dy_xhat per lane (recomputing xhat/y/mask from x on the fly), sweep 1
    emits  dx = r * (dy*a - m1_g - xhat * m2_g)  and the per-lane sums from
    which da/db (and hence dgamma/dbeta/dFiLM) are folded OUTSIDE in XLA.

Scope: unsharded, C such that p*C % 128 == 0 for p in {1,2,4,8} and the
flattened spatial size divides into 8-row tiles. Everything else falls back to
the XLA path in ops/norm.py (which is also the correctness oracle for
tests/test_fused_norm.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# elements per tile (upper bound; actual tile rows are the largest divisor of
# S/p whose row count * lane count stays under this). The kernel's live set is
# ~13 f32/bf16 temps+buffers of tile size (Mosaic stack), so 512K elements
# keeps the scoped-VMEM stack well under the 64 MB limit at any lane width.
_MAX_TILE_ELEMS = 512 * 1024


def _pack_factor(C: int) -> Optional[int]:
    for p in (1, 2, 4, 8):
        if (p * C) % 128 == 0:
            return p
    return None


def _tile_rows(s_rows: int, sublane: int, pC: int) -> Optional[int]:
    cap = min(s_rows, max(sublane, _MAX_TILE_ELEMS // pC))
    best = None
    for t in range(sublane, cap + 1, sublane):
        if s_rows % t == 0:
            best = t
    return best


def supports(shape: Tuple[int, ...], dtype) -> bool:
    """Can the fused kernel handle x of this shape/dtype?"""
    if len(shape) < 3:
        return False
    C = shape[-1]
    p = _pack_factor(C)
    if p is None:
        return False
    s = int(np.prod(shape[1:-1]))
    if s % p:
        return False
    sublane = 16 if dtype == jnp.bfloat16 else 8
    return _tile_rows(s // p, sublane, p * C) is not None


def _lane_group_matrices(pC: int, C: int, groups: int):
    """(pC, G) indicator: lane l belongs to group (l % C) // (C // groups).
    Built from iota in-kernel (Pallas forbids captured array constants)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (pC, groups), 0)
    gcol = jax.lax.broadcasted_iota(jnp.int32, (pC, groups), 1)
    gid = jax.lax.rem(lane, C) // (C // groups)
    return (gid == gcol).astype(jnp.float32)  # (pC, G)


def _silu_and_grad(y):
    s = jax.nn.sigmoid(y)
    return y * s, s * (1.0 + y * (1.0 - s))


def _dropout_mask(seed_ref, b, t, n_tiles, shape, keep_prob: float):
    """Deterministic per-(batch, tile) mask; bit-identical in fwd and bwd."""
    pltpu.prng_seed(seed_ref[0] + b * n_tiles + t)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = jnp.uint32(min(int(keep_prob * 2**32), 2**32 - 1))
    return bits < thresh


# --------------------------------------------------------------------- forward


def _fwd_kernel(seed_ref, x_ref, a_ref, b_ref, o_ref, stats_ref, acc_ref, *,
                groups: int, eps: float, act: Optional[str],
                dropout_p: float, n_tiles: int, count: float, C: int):
    b, phase, t = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    pC = x_ref.shape[-1]

    @pl.when((phase == 0) & (t == 0))
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    @pl.when(phase == 0)
    def _():
        xf = x_ref[0].astype(jnp.float32)
        acc_ref[0:1, :] += jnp.sum(xf, axis=0, keepdims=True)
        acc_ref[1:2, :] += jnp.sum(xf * xf, axis=0, keepdims=True)

    @pl.when((phase == 1) & (t == 0))
    def _():
        fold = _lane_group_matrices(pC, C, groups)
        s1 = jnp.dot(acc_ref[0:1, :], fold, preferred_element_type=jnp.float32)
        s2 = jnp.dot(acc_ref[1:2, :], fold, preferred_element_type=jnp.float32)
        mean_g = s1 / count
        var_g = s2 / count - mean_g * mean_g
        r_g = jax.lax.rsqrt(var_g + eps)
        # broadcast back to lanes and persist for the tiles of this sweep
        acc_ref[0:1, :] = jnp.dot(mean_g, fold.T, preferred_element_type=jnp.float32)
        acc_ref[1:2, :] = jnp.dot(r_g, fold.T, preferred_element_type=jnp.float32)
        stats_ref[0, :, :] = acc_ref[:, :]

    @pl.when(phase == 1)
    def _():
        xf = x_ref[0].astype(jnp.float32)
        xhat = (xf - acc_ref[0:1, :]) * acc_ref[1:2, :]
        y = xhat * a_ref[0, 0:1, :] + b_ref[0, 0:1, :]
        if act == "silu":
            y, _ = _silu_and_grad(y)
        if dropout_p > 0.0:
            keep = _dropout_mask(seed_ref, b, t, n_tiles, y.shape, 1.0 - dropout_p)
            y = jnp.where(keep, y * (1.0 / (1.0 - dropout_p)), 0.0)
        o_ref[0] = y.astype(o_ref.dtype)


def _run_fwd(xq, a, b, seed, *, groups, eps, act, dropout_p, C, interpret):
    B, s_rows, pC = xq.shape
    sublane = 16 if xq.dtype == jnp.bfloat16 else 8
    T = _tile_rows(s_rows, sublane, pC)
    n_tiles = s_rows // T
    count = float(s_rows * pC // groups)
    kernel = functools.partial(
        _fwd_kernel, groups=groups, eps=eps, act=act, dropout_p=dropout_p,
        n_tiles=n_tiles, count=count, C=C)
    out, stats = pl.pallas_call(
        kernel,
        grid=(B, 2, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            pl.BlockSpec((1, T, pC), lambda b, p, t: (b, t, 0)),
            pl.BlockSpec((1, 1, pC), lambda b, p, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, pC), lambda b, p, t: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, T, pC), lambda b, p, t: (b, t, 0)),
            pl.BlockSpec((1, 2, pC), lambda b, p, t: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(xq.shape, xq.dtype),
            jax.ShapeDtypeStruct((B, 2, pC), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, pC), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * s_rows * pC,
            bytes_accessed=3 * B * s_rows * pC * xq.dtype.itemsize,
            transcendentals=B * s_rows * pC if act else 0,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, xq, a, b)
    return out, stats


# -------------------------------------------------------------------- backward


def _bwd_kernel(seed_ref, x_ref, ct_ref, a_ref, b_ref, stats_ref,
                dx_ref, sums_ref, acc_ref, *,
                groups: int, act: Optional[str], dropout_p: float,
                n_tiles: int, count: float, C: int):
    b, phase, t = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    pC = x_ref.shape[-1]

    mean_l = stats_ref[0, 0:1, :]
    r_l = stats_ref[0, 1:2, :]

    def recompute_dy_xhat():
        xf = x_ref[0].astype(jnp.float32)
        xhat = (xf - mean_l) * r_l
        dy = ct_ref[0].astype(jnp.float32)
        if dropout_p > 0.0:
            keep = _dropout_mask(seed_ref, b, t, n_tiles, dy.shape,
                                 1.0 - dropout_p)
            dy = jnp.where(keep, dy * (1.0 / (1.0 - dropout_p)), 0.0)
        if act == "silu":
            y = xhat * a_ref[0, 0:1, :] + b_ref[0, 0:1, :]
            _, dsilu = _silu_and_grad(y)
            dy = dy * dsilu
        return dy, xhat

    @pl.when((phase == 0) & (t == 0))
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    @pl.when(phase == 0)
    def _():
        dy, xhat = recompute_dy_xhat()
        acc_ref[0:1, :] += jnp.sum(dy, axis=0, keepdims=True)
        acc_ref[1:2, :] += jnp.sum(dy * xhat, axis=0, keepdims=True)

    @pl.when((phase == 1) & (t == 0))
    def _():
        sums_ref[0, :, :] = acc_ref[:, :]
        # group-means of dxhat and dxhat*xhat: dxhat = dy * a, so fold the
        # per-lane sums against a through the (pC, G) indicator.
        fold = _lane_group_matrices(pC, C, groups)
        m1 = jnp.dot(acc_ref[0:1, :] * a_ref[0, 0:1, :], fold,
                     preferred_element_type=jnp.float32) / count
        m2 = jnp.dot(acc_ref[1:2, :] * a_ref[0, 0:1, :], fold,
                     preferred_element_type=jnp.float32) / count
        acc_ref[0:1, :] = jnp.dot(m1, fold.T, preferred_element_type=jnp.float32)
        acc_ref[1:2, :] = jnp.dot(m2, fold.T, preferred_element_type=jnp.float32)

    @pl.when(phase == 1)
    def _():
        dy, xhat = recompute_dy_xhat()
        dxhat = dy * a_ref[0, 0:1, :]
        dx = r_l * (dxhat - acc_ref[0:1, :] - xhat * acc_ref[1:2, :])
        dx_ref[0] = dx.astype(dx_ref.dtype)


def _run_bwd(xq, ctq, a, b, stats, seed, *, groups, act, dropout_p, C,
             interpret):
    B, s_rows, pC = xq.shape
    sublane = 16 if xq.dtype == jnp.bfloat16 else 8
    T = _tile_rows(s_rows, sublane, pC)
    n_tiles = s_rows // T
    count = float(s_rows * pC // groups)
    kernel = functools.partial(
        _bwd_kernel, groups=groups, act=act, dropout_p=dropout_p,
        n_tiles=n_tiles, count=count, C=C)
    dx, sums = pl.pallas_call(
        kernel,
        grid=(B, 2, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T, pC), lambda b, p, t: (b, t, 0)),
            pl.BlockSpec((1, T, pC), lambda b, p, t: (b, t, 0)),
            pl.BlockSpec((1, 1, pC), lambda b, p, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, pC), lambda b, p, t: (b, 0, 0)),
            pl.BlockSpec((1, 2, pC), lambda b, p, t: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, T, pC), lambda b, p, t: (b, t, 0)),
            pl.BlockSpec((1, 2, pC), lambda b, p, t: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(xq.shape, xq.dtype),
            jax.ShapeDtypeStruct((B, 2, pC), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, pC), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=20 * B * s_rows * pC,
            bytes_accessed=5 * B * s_rows * pC * xq.dtype.itemsize,
            transcendentals=2 * B * s_rows * pC if act else 0,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, xq, ctq, a, b, stats)
    return dx, sums


# ------------------------------------------------------------------ public op


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def fused_norm_affine(x, a, b, seed, groups: int, eps: float,
                      act: Optional[str], dropout_p: float,
                      interpret: bool = False):
    """y = dropout(act(groupnorm(x) * a + b)) in one fused TPU kernel.

    x: (B, *spatial, C); a, b: (B, C) float32 per-batch-channel affine
    (fold GroupNorm's gamma/beta and any FiLM scale/shift into them);
    seed: (1,) int32 dropout seed (ignored when dropout_p == 0).
    act: None | "silu". Check :func:`supports` first.
    """
    y, _ = _fwd(x, a, b, seed, groups, eps, act, dropout_p, interpret)
    return y


def _pack(x, p):
    B, C = x.shape[0], x.shape[-1]
    s = int(np.prod(x.shape[1:-1]))
    return x.reshape(B, s // p, p * C)


def _tile_affine(v, p):
    # (B, C) -> (B, 1, p*C): channel c of packed slot j sits at lane j*C + c
    return jnp.tile(v.astype(jnp.float32), (1, p))[:, None, :]


def _fwd(x, a, b, seed, groups, eps, act, dropout_p, interpret):
    C = x.shape[-1]
    p = _pack_factor(C)
    xq = _pack(x, p)
    out, stats = _run_fwd(
        xq, _tile_affine(a, p), _tile_affine(b, p), seed,
        groups=groups, eps=eps, act=act, dropout_p=dropout_p, C=C,
        interpret=interpret)
    return out.reshape(x.shape), (x, a, b, stats, seed)


def _vjp_fwd(x, a, b, seed, groups, eps, act, dropout_p, interpret):
    y, res = _fwd(x, a, b, seed, groups, eps, act, dropout_p, interpret)
    return y, res


def _vjp_bwd(groups, eps, act, dropout_p, interpret, res, ct):
    x, a, b, stats, seed = res
    C = x.shape[-1]
    p = _pack_factor(C)
    dxq, sums = _run_bwd(
        _pack(x, p), _pack(ct.astype(x.dtype), p),
        _tile_affine(a, p), _tile_affine(b, p), stats, seed,
        groups=groups, act=act, dropout_p=dropout_p, C=C,
        interpret=interpret)
    # fold per-lane sums (B, 2, p*C) -> per-channel (B, 2, C)
    B = x.shape[0]
    folded = sums.reshape(B, 2, p, C).sum(axis=2)
    db = folded[:, 0].astype(a.dtype)   # sum dy
    da = folded[:, 1].astype(a.dtype)   # sum dy * xhat
    return dxq.reshape(x.shape), da, db, None


fused_norm_affine.defvjp(_vjp_fwd, _vjp_bwd)


# ------------------------------------------------------- packed-carrier entry


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def fused_norm_affine_packed(xq, a, b, seed, C: int, groups: int, eps: float,
                             act: Optional[str], dropout_p: float,
                             interpret: bool = False):
    """Same op as :func:`fused_norm_affine` on an ALREADY-PACKED carrier:
    xq (B, R, p*C) with p = pack factor of C (R = total spatial / p, possibly
    flattened over several leading dims by the caller). Models that keep
    activations packed between ops skip the boundary reshapes entirely."""
    y, _ = _fwd_packed(xq, a, b, seed, C, groups, eps, act, dropout_p,
                       interpret)
    return y


def _fwd_packed(xq, a, b, seed, C, groups, eps, act, dropout_p, interpret):
    p = (xq.shape[-1]) // C
    out, stats = _run_fwd(
        xq, _tile_affine(a, p), _tile_affine(b, p), seed,
        groups=groups, eps=eps, act=act, dropout_p=dropout_p, C=C,
        interpret=interpret)
    return out, (xq, a, b, stats, seed)


def _vjp_fwd_packed(xq, a, b, seed, C, groups, eps, act, dropout_p, interpret):
    return _fwd_packed(xq, a, b, seed, C, groups, eps, act, dropout_p,
                       interpret)


def _vjp_bwd_packed(C, groups, eps, act, dropout_p, interpret, res, ct):
    xq, a, b, stats, seed = res
    p = xq.shape[-1] // C
    dxq, sums = _run_bwd(
        xq, ct.astype(xq.dtype),
        _tile_affine(a, p), _tile_affine(b, p), stats, seed,
        groups=groups, act=act, dropout_p=dropout_p, C=C,
        interpret=interpret)
    B = xq.shape[0]
    folded = sums.reshape(B, 2, p, C).sum(axis=2)
    db = folded[:, 0].astype(a.dtype)
    da = folded[:, 1].astype(a.dtype)
    return dxq, da, db, None


fused_norm_affine_packed.defvjp(_vjp_fwd_packed, _vjp_bwd_packed)
