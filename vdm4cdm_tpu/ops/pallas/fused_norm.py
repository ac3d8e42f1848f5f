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
    """Deterministic per-(batch, tile) mask; bit-identical in fwd and bwd.

    The per-call site seed and the (batch, tile) counter go in as SEPARATE
    seed words: streams from different dropout sites collide only on an exact
    32-bit site-seed collision, not whenever two sites' sequential counter
    ranges overlap (advisor round-2 finding)."""
    pltpu.prng_seed(seed_ref[0], b * n_tiles + t)
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
        # f32 cancellation can drive the two-pass variance slightly
        # negative for near-constant groups (mean^2 >> var), and
        # rsqrt(var + eps) then NaNs the whole tensor — clamp to 0
        var_g = jnp.maximum(s2 / count - mean_g * mean_g, 0.0)
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


# -------------------------------------------- split kernels (sharded CP path)
#
# The monolithic two-sweep kernel cannot host the cross-shard ``psum`` that
# spatially sharded (`sp`) GroupNorm statistics require. The sharded path
# splits the op into stats/apply kernel pairs with the collective (and the
# tiny (B, 2, p*C) -> groups folding) in plain JAX between them. HBM traffic
# is IDENTICAL to the monolith: fwd = 2 reads + 1 write, bwd = 2x(read x, ct)
# + 1 write; only the per-call launch overhead is paid twice. The same split
# also accepts EXTERNAL stats (e.g. conv-kernel-emitted sums) on the
# unsharded path.


def _sums_kernel(x_ref, out_ref, acc_ref, *, n_tiles: int):
    """Per-lane local sums: out (1, 2, pC) f32 = (sum x, sum x^2) over tiles."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    xf = x_ref[0].astype(jnp.float32)
    acc_ref[0:1, :] += jnp.sum(xf, axis=0, keepdims=True)
    acc_ref[1:2, :] += jnp.sum(xf * xf, axis=0, keepdims=True)

    @pl.when(t == n_tiles - 1)
    def _():
        out_ref[0, :, :] = acc_ref[:, :]


def _apply_kernel(seed_ref, x_ref, stats_ref, a_ref, b_ref, o_ref, *,
                  act: Optional[str], dropout_p: float, n_tiles: int):
    """One streaming sweep: y = dropout(act(xhat * a + b)) from finalized
    lane-broadcast stats (mean, inv)."""
    b, t = pl.program_id(0), pl.program_id(1)
    xf = x_ref[0].astype(jnp.float32)
    xhat = (xf - stats_ref[0, 0:1, :]) * stats_ref[0, 1:2, :]
    y = xhat * a_ref[0, 0:1, :] + b_ref[0, 0:1, :]
    if act == "silu":
        y, _ = _silu_and_grad(y)
    if dropout_p > 0.0:
        keep = _dropout_mask(seed_ref, b, t, n_tiles, y.shape, 1.0 - dropout_p)
        y = jnp.where(keep, y * (1.0 / (1.0 - dropout_p)), 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


def _recompute_dy_xhat(seed_ref, x_ref, ct_ref, a_ref, b_ref, stats_ref,
                       b, t, n_tiles, act, dropout_p):
    xf = x_ref[0].astype(jnp.float32)
    xhat = (xf - stats_ref[0, 0:1, :]) * stats_ref[0, 1:2, :]
    dy = ct_ref[0].astype(jnp.float32)
    if dropout_p > 0.0:
        keep = _dropout_mask(seed_ref, b, t, n_tiles, dy.shape, 1.0 - dropout_p)
        dy = jnp.where(keep, dy * (1.0 / (1.0 - dropout_p)), 0.0)
    if act == "silu":
        y = xhat * a_ref[0, 0:1, :] + b_ref[0, 0:1, :]
        _, dsilu = _silu_and_grad(y)
        dy = dy * dsilu
    return dy, xhat


def _bwd_sums_kernel(seed_ref, x_ref, ct_ref, a_ref, b_ref, stats_ref,
                     out_ref, acc_ref, *,
                     act: Optional[str], dropout_p: float, n_tiles: int):
    """Per-lane (sum dy, sum dy*xhat) — the backward's reduction sweep."""
    b, t = pl.program_id(0), pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    dy, xhat = _recompute_dy_xhat(seed_ref, x_ref, ct_ref, a_ref, b_ref,
                                  stats_ref, b, t, n_tiles, act, dropout_p)
    acc_ref[0:1, :] += jnp.sum(dy, axis=0, keepdims=True)
    acc_ref[1:2, :] += jnp.sum(dy * xhat, axis=0, keepdims=True)

    @pl.when(t == n_tiles - 1)
    def _():
        out_ref[0, :, :] = acc_ref[:, :]


def _bwd_apply_kernel(seed_ref, x_ref, ct_ref, a_ref, b_ref, stats_ref,
                      m_ref, dx_ref, *,
                      act: Optional[str], dropout_p: float, n_tiles: int):
    """dx = r * (dy*a - m1 - xhat*m2) with lane-broadcast group means m."""
    b, t = pl.program_id(0), pl.program_id(1)
    dy, xhat = _recompute_dy_xhat(seed_ref, x_ref, ct_ref, a_ref, b_ref,
                                  stats_ref, b, t, n_tiles, act, dropout_p)
    dxhat = dy * a_ref[0, 0:1, :]
    dx = stats_ref[0, 1:2, :] * (dxhat - m_ref[0, 0:1, :]
                                 - xhat * m_ref[0, 1:2, :])
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _tiling(xq):
    B, s_rows, pC = xq.shape
    sublane = 16 if xq.dtype == jnp.bfloat16 else 8
    T = _tile_rows(s_rows, sublane, pC)
    return B, s_rows, pC, T, s_rows // T


def _run_sums(xq, interpret):
    B, s_rows, pC, T, n_tiles = _tiling(xq)
    return pl.pallas_call(
        functools.partial(_sums_kernel, n_tiles=n_tiles),
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec((1, T, pC), lambda b, t: (b, t, 0))],
        out_specs=pl.BlockSpec((1, 2, pC), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 2, pC), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, pC), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=3 * B * s_rows * pC,
            bytes_accessed=B * s_rows * pC * xq.dtype.itemsize,
            transcendentals=0),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(xq)


def _run_apply(xq, stats, a, b, seed, *, act, dropout_p, interpret):
    B, s_rows, pC, T, n_tiles = _tiling(xq)
    bc = pl.BlockSpec((1, 2, pC), lambda b, t: (b, 0, 0))
    row = pl.BlockSpec((1, 1, pC), lambda b, t: (b, 0, 0))
    return pl.pallas_call(
        functools.partial(_apply_kernel, act=act, dropout_p=dropout_p,
                          n_tiles=n_tiles),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T, pC), lambda b, t: (b, t, 0)),
            bc, row, row,
        ],
        out_specs=pl.BlockSpec((1, T, pC), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct(xq.shape, xq.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * s_rows * pC,
            bytes_accessed=2 * B * s_rows * pC * xq.dtype.itemsize,
            transcendentals=B * s_rows * pC if act else 0),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, xq, stats, a, b)


def _run_bwd_sums(xq, ctq, stats, a, b, seed, *, act, dropout_p, interpret):
    B, s_rows, pC, T, n_tiles = _tiling(xq)
    tiled = pl.BlockSpec((1, T, pC), lambda b, t: (b, t, 0))
    bc = pl.BlockSpec((1, 2, pC), lambda b, t: (b, 0, 0))
    row = pl.BlockSpec((1, 1, pC), lambda b, t: (b, 0, 0))
    return pl.pallas_call(
        functools.partial(_bwd_sums_kernel, act=act, dropout_p=dropout_p,
                          n_tiles=n_tiles),
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  tiled, tiled, row, row, bc],
        out_specs=pl.BlockSpec((1, 2, pC), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 2, pC), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, pC), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=12 * B * s_rows * pC,
            bytes_accessed=2 * B * s_rows * pC * xq.dtype.itemsize,
            transcendentals=B * s_rows * pC if act else 0),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, xq, ctq, a, b, stats)


def _run_bwd_apply(xq, ctq, stats, m, a, b, seed, *, act, dropout_p,
                   interpret):
    B, s_rows, pC, T, n_tiles = _tiling(xq)
    tiled = pl.BlockSpec((1, T, pC), lambda b, t: (b, t, 0))
    bc = pl.BlockSpec((1, 2, pC), lambda b, t: (b, 0, 0))
    row = pl.BlockSpec((1, 1, pC), lambda b, t: (b, 0, 0))
    return pl.pallas_call(
        functools.partial(_bwd_apply_kernel, act=act, dropout_p=dropout_p,
                          n_tiles=n_tiles),
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  tiled, tiled, row, row, bc, bc],
        out_specs=pl.BlockSpec((1, T, pC), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct(xq.shape, xq.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=14 * B * s_rows * pC,
            bytes_accessed=3 * B * s_rows * pC * xq.dtype.itemsize,
            transcendentals=B * s_rows * pC if act else 0),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, xq, ctq, a, b, stats, m)


def _fold_matrix(pC: int, C: int, groups: int):
    """Host-side (pC, G) lane->group indicator (JAX constant, tiny)."""
    lanes = np.arange(pC)
    gid = (lanes % C) // (C // groups)
    return jnp.asarray(gid[:, None] == np.arange(groups)[None, :], jnp.float32)


def _finalize_stats(sums, C, groups, eps, count):
    """(B, 2, pC) psum'd per-lane sums -> lane-broadcast (B, 2, pC) [mean, inv]."""
    pC = sums.shape[-1]
    fold = _fold_matrix(pC, C, groups)
    s1g = sums[:, 0] @ fold
    s2g = sums[:, 1] @ fold
    mean_g = s1g / count
    # clamp two-pass cancellation (see _fwd_kernel): var >= 0 always
    var_g = jnp.maximum(s2g / count - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    return jnp.stack([mean_g @ fold.T, inv_g @ fold.T], axis=1)


def _group_means(sums, a, C, groups, count):
    """Backward group means m1/m2 from (psum'd) per-lane (S_dy, S_dy_xhat):
    dxhat = dy * a, folded through the lane->group indicator."""
    pC = sums.shape[-1]
    fold = _fold_matrix(pC, C, groups)
    m1 = ((sums[:, 0] * a) @ fold) / count
    m2 = ((sums[:, 1] * a) @ fold) / count
    return jnp.stack([m1 @ fold.T, m2 @ fold.T], axis=1)


def _global_count(x, groups, axis):
    count = float(int(np.prod(x.shape[1:-1])) * x.shape[-1] // groups)
    if axis is not None:
        count = count * jax.lax.axis_size(axis)
    return count


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def fused_norm_affine_cp(x, a, b, seed, groups: int, eps: float,
                         act: Optional[str], dropout_p: float,
                         axis: Optional[str] = None,
                         interpret: bool = False):
    """Context-parallel fused GroupNorm+affine+act+dropout: same semantics as
    :func:`fused_norm_affine`, with the statistics (and the backward's group
    means) ``psum``'d over the ``axis`` mesh axis — the Pallas fast path for
    the spatially sharded (`sp`) UNet (round-2 VERDICT item 2). Must run
    inside ``shard_map`` when ``axis`` is set. ``x`` is the per-shard block
    (B, *spatial, C_ch); a/b are (B, C_ch) as in the unsharded op."""
    y, _ = _fwd_cp(x, a, b, seed, groups, eps, act, dropout_p, axis,
                   interpret)
    return y


def _fwd_cp(x, a, b, seed, groups, eps, act, dropout_p, axis, interpret):
    C_ch = x.shape[-1]
    p = _pack_factor(C_ch)
    xq = _pack(x, p)
    sums = _run_sums(xq, interpret)
    if axis is not None:
        sums = jax.lax.psum(sums, axis)
    stats = _finalize_stats(sums, C_ch, groups, eps,
                            _global_count(x, groups, axis))
    y = _run_apply(xq, stats, _tile_affine(a, p), _tile_affine(b, p), seed,
                   act=act, dropout_p=dropout_p, interpret=interpret)
    return y.reshape(x.shape), (x, a, b, stats, seed)


def _vjp_fwd_cp(x, a, b, seed, groups, eps, act, dropout_p, axis, interpret):
    return _fwd_cp(x, a, b, seed, groups, eps, act, dropout_p, axis,
                   interpret)


def _vjp_bwd_cp(groups, eps, act, dropout_p, axis, interpret, res, ct):
    x, a, b, stats, seed = res
    count = _global_count(x, groups, axis)
    C_ch = x.shape[-1]
    p = _pack_factor(C_ch)
    xq = _pack(x, p)
    ctq = _pack(ct.astype(x.dtype), p)
    at = _tile_affine(a, p)
    bt = _tile_affine(b, p)
    sums = _run_bwd_sums(xq, ctq, stats, at, bt, seed,
                         act=act, dropout_p=dropout_p, interpret=interpret)
    gsums = jax.lax.psum(sums, axis) if axis is not None else sums
    m = _group_means(gsums, at[:, 0, :], C_ch, groups, count)
    dxq = _run_bwd_apply(xq, ctq, stats, m, at, bt, seed,
                         act=act, dropout_p=dropout_p, interpret=interpret)
    # da/db from the LOCAL sums: each shard's loss term touches a/b only
    # through its local voxels; the train step's pmean over the mesh then
    # averages the per-shard partials exactly as for every other parameter.
    B = x.shape[0]
    folded = sums.reshape(B, 2, p, C_ch).sum(axis=2)
    db = folded[:, 0].astype(a.dtype)
    da = folded[:, 1].astype(a.dtype)
    return dxq.reshape(x.shape), da, db, None


fused_norm_affine_cp.defvjp(_vjp_fwd_cp, _vjp_bwd_cp)


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


# ------------------------------------- packed-carrier CP entry (sharded `sp`)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def fused_norm_affine_packed_cp(xq, a, b, seed, C: int, groups: int,
                                eps: float, act: Optional[str],
                                dropout_p: float, axis: Optional[str] = None,
                                interpret: bool = False):
    """:func:`fused_norm_affine_cp` on an ALREADY-PACKED carrier: xq (B, R,
    p*C) per-shard flat rows, statistics ``psum``'d over ``axis`` — the
    composition that keeps the spatially sharded (`sp`) UNet on the packed
    fast path (round-3: sharded packed carriers). Same split stats/apply
    kernels as the unpacked CP entry; only the boundary reshapes differ.
    Must run inside ``shard_map`` when ``axis`` is set. Dropout seed
    semantics match the CP entry (the per-tile kernel PRNG streams are a
    function of LOCAL tile indices, so shards reuse mask patterns — the mask
    is still marginally Bernoulli per voxel)."""
    y, _ = _fwd_packed_cp(xq, a, b, seed, C, groups, eps, act, dropout_p,
                          axis, interpret)
    return y


def _packed_count(xq, groups, axis):
    count = float(xq.shape[1] * xq.shape[2] // groups)
    if axis is not None:
        count = count * jax.lax.axis_size(axis)
    return count


def _fwd_packed_cp(xq, a, b, seed, C, groups, eps, act, dropout_p, axis,
                   interpret):
    p = xq.shape[-1] // C
    sums = _run_sums(xq, interpret)
    if axis is not None:
        sums = jax.lax.psum(sums, axis)
    stats = _finalize_stats(sums, C, groups, eps,
                            _packed_count(xq, groups, axis))
    y = _run_apply(xq, stats, _tile_affine(a, p), _tile_affine(b, p), seed,
                   act=act, dropout_p=dropout_p, interpret=interpret)
    return y, (xq, a, b, stats, seed)


def _vjp_fwd_packed_cp(xq, a, b, seed, C, groups, eps, act, dropout_p, axis,
                       interpret):
    return _fwd_packed_cp(xq, a, b, seed, C, groups, eps, act, dropout_p,
                          axis, interpret)


def _vjp_bwd_packed_cp(C, groups, eps, act, dropout_p, axis, interpret, res,
                       ct):
    xq, a, b, stats, seed = res
    count = _packed_count(xq, groups, axis)
    p = xq.shape[-1] // C
    ctq = ct.astype(xq.dtype)
    at = _tile_affine(a, p)
    bt = _tile_affine(b, p)
    sums = _run_bwd_sums(xq, ctq, stats, at, bt, seed,
                         act=act, dropout_p=dropout_p, interpret=interpret)
    gsums = jax.lax.psum(sums, axis) if axis is not None else sums
    m = _group_means(gsums, at[:, 0, :], C, groups, count)
    dxq = _run_bwd_apply(xq, ctq, stats, m, at, bt, seed,
                         act=act, dropout_p=dropout_p, interpret=interpret)
    # da/db from the LOCAL sums (see _vjp_bwd_cp: the mesh pmean averages the
    # per-shard partials exactly as for every other parameter).
    B = xq.shape[0]
    folded = sums.reshape(B, 2, p, C).sum(axis=2)
    db = folded[:, 0].astype(a.dtype)
    da = folded[:, 1].astype(a.dtype)
    return dxq, da, db, None


fused_norm_affine_packed_cp.defvjp(_vjp_fwd_packed_cp, _vjp_bwd_packed_cp)


# -------------------------- external-stats entry (conv-emitted GN statistics)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def fused_norm_affine_packed_ext(xq, a, b, seed, sums, C: int, groups: int,
                                 eps: float, act: Optional[str],
                                 dropout_p: float,
                                 axis: Optional[str] = None,
                                 interpret: bool = False):
    """:func:`fused_norm_affine_packed` with EXTERNALLY SUPPLIED per-lane
    sums: ``sums`` (B, 2, p*C) f32 = (sum x, sum x^2) over the local rows,
    as emitted by the stats-folding conv kernel
    (pallas/conv3d.conv3d_pallas_packed_bs) — the stats sweep (one full HBM
    read of x) is skipped entirely (ROADMAP round-3 item 1a). ``axis``
    additionally psums the sums over a mesh axis (sharded `sp` path; the
    conv emits LOCAL sums per shard).

    Gradient contract: the returned vjp gives ``sums`` a ZERO cotangent —
    the GN dx formula already carries the full stats(x) dependence, so the
    cotangent flowing back through x is complete and nothing may flow through
    the sums a second time. The conv kernel's bwd relies on this (it ignores
    its sums-output cotangent)."""
    y, _ = _fwd_packed_ext(xq, a, b, seed, sums, C, groups, eps, act,
                           dropout_p, axis, interpret)
    return y


def _fwd_packed_ext(xq, a, b, seed, sums, C, groups, eps, act, dropout_p,
                    axis, interpret):
    p = xq.shape[-1] // C
    if axis is not None:
        sums = jax.lax.psum(sums, axis)
    stats = _finalize_stats(sums, C, groups, eps,
                            _packed_count(xq, groups, axis))
    y = _run_apply(xq, stats, _tile_affine(a, p), _tile_affine(b, p), seed,
                   act=act, dropout_p=dropout_p, interpret=interpret)
    return y, (xq, a, b, stats, seed, sums)


def _vjp_fwd_packed_ext(xq, a, b, seed, sums, C, groups, eps, act, dropout_p,
                        axis, interpret):
    return _fwd_packed_ext(xq, a, b, seed, sums, C, groups, eps, act,
                           dropout_p, axis, interpret)


def _vjp_bwd_packed_ext(C, groups, eps, act, dropout_p, axis, interpret, res,
                        ct):
    xq, a, b, stats, seed, sums = res
    count = _packed_count(xq, groups, axis)
    p = xq.shape[-1] // C
    ctq = ct.astype(xq.dtype)
    at = _tile_affine(a, p)
    bt = _tile_affine(b, p)
    bsums = _run_bwd_sums(xq, ctq, stats, at, bt, seed,
                          act=act, dropout_p=dropout_p, interpret=interpret)
    gsums = jax.lax.psum(bsums, axis) if axis is not None else bsums
    m = _group_means(gsums, at[:, 0, :], C, groups, count)
    dxq = _run_bwd_apply(xq, ctq, stats, m, at, bt, seed,
                         act=act, dropout_p=dropout_p, interpret=interpret)
    # da/db from the LOCAL sums (see _vjp_bwd_cp for the mesh-pmean argument)
    B = xq.shape[0]
    folded = bsums.reshape(B, 2, p, C).sum(axis=2)
    db = folded[:, 0].astype(a.dtype)
    da = folded[:, 1].astype(a.dtype)
    # sums: ZERO cotangent by the module contract (see docstring)
    return dxq, da, db, None, jnp.zeros_like(sums)


fused_norm_affine_packed_ext.defvjp(_vjp_fwd_packed_ext, _vjp_bwd_packed_ext)


# ------------------------------------- two-carrier entry (lazy concat, pairs)
#
# GroupNorm over the VIRTUAL concat of two packed carriers (ops.packed
# .PackedPair) without materializing the join: per-carrier lane sums from the
# same split stats/apply kernels, folded through lane -> JOINT-group
# indicator matrices (the carrier's channels occupy [offset, offset+C) of the
# joint channel space — groups may straddle the carrier boundary). This is
# exactly the CP pattern with "concat the two carriers' channel sums" where
# CP has "psum the shards' sums"; both compose (``axis``). HBM traffic equals
# the monolith on the materialized concat — minus the concat itself.


def _fold_matrix_at(pC: int, C: int, offset: int, C_joint: int, groups: int):
    """Host-side (pC, G) lane -> joint-group indicator for a carrier whose
    channels sit at [offset, offset+C) of the joint C_joint channels."""
    lanes = np.arange(pC)
    gid = ((lanes % C) + offset) // (C_joint // groups)
    return jnp.asarray(gid[:, None] == np.arange(groups)[None, :], jnp.float32)


def _pair_seed(seed):
    # a second dropout-site seed for carrier b: same avalanche family as
    # norm._seed_from_key, so the two carriers' in-kernel PRNG streams are
    # decorrelated even though their (batch, tile) counters overlap.
    return jax.lax.bitcast_convert_type(
        (jax.lax.bitcast_convert_type(seed, jnp.uint32) ^ jnp.uint32(0x9E3779B9))
        * jnp.uint32(0x85EBCA6B), jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def fused_norm_affine_packed2(xa, xb, a, b, seed, Ca: int, Cb: int,
                              groups: int, eps: float, act: Optional[str],
                              dropout_p: float, axis: Optional[str] = None,
                              interpret: bool = False):
    """GroupNorm+affine+act+dropout over concat(xa, xb) channels, computed on
    the two packed carriers separately (no materialized concat). xa: (B, Ra,
    p*Ca) flat rows, xb: (B, Rb, p*Cb) at the same p; a, b: (B, Ca+Cb) joint
    affines (channel order = concat order). Returns (ya, yb) — the normalized
    halves, still separate. ``axis`` additionally psums statistics over a
    mesh axis (sharded `sp` decoder)."""
    (ya, yb), _ = _fwd_packed2(xa, xb, a, b, seed, Ca, Cb, groups, eps, act,
                               dropout_p, axis, interpret)
    return ya, yb


def _pair_count(xa, xb, groups, axis):
    count = float((xa.shape[1] * xa.shape[2] + xb.shape[1] * xb.shape[2])
                  // groups)
    if axis is not None:
        count = count * jax.lax.axis_size(axis)
    return count


def _fwd_packed2(xa, xb, a, b, seed, Ca, Cb, groups, eps, act, dropout_p,
                 axis, interpret):
    p = xa.shape[-1] // Ca
    assert xb.shape[-1] == p * Cb, (xa.shape, xb.shape, Ca, Cb)
    C = Ca + Cb
    sums_a = _run_sums(xa, interpret)
    sums_b = _run_sums(xb, interpret)
    if axis is not None:
        sums_a = jax.lax.psum(sums_a, axis)
        sums_b = jax.lax.psum(sums_b, axis)
    fold_a = _fold_matrix_at(p * Ca, Ca, 0, C, groups)
    fold_b = _fold_matrix_at(p * Cb, Cb, Ca, C, groups)
    count = _pair_count(xa, xb, groups, axis)
    s1g = sums_a[:, 0] @ fold_a + sums_b[:, 0] @ fold_b
    s2g = sums_a[:, 1] @ fold_a + sums_b[:, 1] @ fold_b
    mean_g = s1g / count
    # clamp two-pass cancellation (see _fwd_kernel): var >= 0 always
    var_g = jnp.maximum(s2g / count - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    stats_a = jnp.stack([mean_g @ fold_a.T, inv_g @ fold_a.T], axis=1)
    stats_b = jnp.stack([mean_g @ fold_b.T, inv_g @ fold_b.T], axis=1)
    seed_b = _pair_seed(seed)
    ya = _run_apply(xa, stats_a, _tile_affine(a[:, :Ca], p),
                    _tile_affine(b[:, :Ca], p), seed,
                    act=act, dropout_p=dropout_p, interpret=interpret)
    yb = _run_apply(xb, stats_b, _tile_affine(a[:, Ca:], p),
                    _tile_affine(b[:, Ca:], p), seed_b,
                    act=act, dropout_p=dropout_p, interpret=interpret)
    return (ya, yb), (xa, xb, a, b, stats_a, stats_b, seed)


def _vjp_fwd_packed2(xa, xb, a, b, seed, Ca, Cb, groups, eps, act, dropout_p,
                     axis, interpret):
    return _fwd_packed2(xa, xb, a, b, seed, Ca, Cb, groups, eps, act,
                        dropout_p, axis, interpret)


def _vjp_bwd_packed2(Ca, Cb, groups, eps, act, dropout_p, axis, interpret,
                     res, ct):
    xa, xb, a, b, stats_a, stats_b, seed = res
    cta, ctb = ct
    p = xa.shape[-1] // Ca
    C = Ca + Cb
    count = _pair_count(xa, xb, groups, axis)
    at_a = _tile_affine(a[:, :Ca], p)
    bt_a = _tile_affine(b[:, :Ca], p)
    at_b = _tile_affine(a[:, Ca:], p)
    bt_b = _tile_affine(b[:, Ca:], p)
    seed_b = _pair_seed(seed)
    sums_a = _run_bwd_sums(xa, cta.astype(xa.dtype), stats_a, at_a, bt_a,
                           seed, act=act, dropout_p=dropout_p,
                           interpret=interpret)
    sums_b = _run_bwd_sums(xb, ctb.astype(xb.dtype), stats_b, at_b, bt_b,
                           seed_b, act=act, dropout_p=dropout_p,
                           interpret=interpret)
    gs_a = jax.lax.psum(sums_a, axis) if axis is not None else sums_a
    gs_b = jax.lax.psum(sums_b, axis) if axis is not None else sums_b
    fold_a = _fold_matrix_at(p * Ca, Ca, 0, C, groups)
    fold_b = _fold_matrix_at(p * Cb, Cb, Ca, C, groups)
    m1g = ((gs_a[:, 0] * at_a[:, 0, :]) @ fold_a
           + (gs_b[:, 0] * at_b[:, 0, :]) @ fold_b) / count
    m2g = ((gs_a[:, 1] * at_a[:, 0, :]) @ fold_a
           + (gs_b[:, 1] * at_b[:, 0, :]) @ fold_b) / count
    m_a = jnp.stack([m1g @ fold_a.T, m2g @ fold_a.T], axis=1)
    m_b = jnp.stack([m1g @ fold_b.T, m2g @ fold_b.T], axis=1)
    dxa = _run_bwd_apply(xa, cta.astype(xa.dtype), stats_a, m_a, at_a, bt_a,
                         seed, act=act, dropout_p=dropout_p,
                         interpret=interpret)
    dxb = _run_bwd_apply(xb, ctb.astype(xb.dtype), stats_b, m_b, at_b, bt_b,
                         seed_b, act=act, dropout_p=dropout_p,
                         interpret=interpret)
    # da/db from LOCAL sums (see _vjp_bwd_cp for the mesh-pmean argument)
    B = xa.shape[0]
    fa = sums_a.reshape(B, 2, p, Ca).sum(axis=2)
    fb = sums_b.reshape(B, 2, p, Cb).sum(axis=2)
    db = jnp.concatenate([fa[:, 0], fb[:, 0]], axis=-1).astype(a.dtype)
    da = jnp.concatenate([fa[:, 1], fb[:, 1]], axis=-1).astype(a.dtype)
    return dxa, dxb, da, db, None


fused_norm_affine_packed2.defvjp(_vjp_fwd_packed2, _vjp_bwd_packed2)
