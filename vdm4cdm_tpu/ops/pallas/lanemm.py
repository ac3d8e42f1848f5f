"""Pallas TPU kernel: streaming per-row matmul on packed carriers (1x1 conv).

Why (HLO audit, round 3, docs/DESIGN.md §7): the decoder ResBlocks' 1x1
skip projection on the packed carrier is a plain ``rows @ W`` matmul, but
XLA lowers it to a convolution whose chosen operand layout is rows-minor
``{2,3,1,0}`` — materializing an 805 MB physical TRANSPOSE of the carrier in
the forward and again for the weight gradient in the backward, at every
decoder block with a channel change. This kernel streams the carrier in its
native dense layout instead: one read of x, one write of y, no relayouts.

    y[b, r, :] = x[b, r, :] @ w (+ bias)        x: (B, R, K), w: (K, N)

Scope: K and N multiples of 128 (lane-dense packed rows), R tileable into
8/16-row multiples. The weight is whatever the caller builds — for the
block-diagonal packed 1x1 conv the zero padding wastes (p-1)/p of the MXU
flops, which at these shapes is ~2 ms/step against ~50-75 ms of transpose
copies saved. Forward + dx share one kernel (dx = ct @ w.T); dw accumulates
x_tile^T @ ct_tile (K = tile rows: full MXU) across the sequential grid with
the per-lane bias gradient riding along, exactly like conv3d's dw.

No reference analog: the reference's skip projections are cuDNN 1x1 convs
(mltools ResBlocks, SURVEY.md §2b).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_TILE_ELEMS = 512 * 1024


def _tile_rows(R: int, sublane: int, lanes: int) -> Optional[int]:
    cap = min(R, max(sublane, _MAX_TILE_ELEMS // lanes))
    best = None
    for t in range(sublane, cap + 1, sublane):
        if R % t == 0:
            best = t
    return best


def supports(x_shape, K: int, N: int, dtype) -> bool:
    if len(x_shape) != 3 or x_shape[-1] != K:
        return False
    if K % 128 or N % 128:
        return False
    sublane = 16 if dtype == jnp.bfloat16 else 8
    return _tile_rows(x_shape[1], sublane, max(K, N)) is not None


def _fwd_kernel(x_ref, w_ref, b_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[0], w_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (acc + b_ref[0:1, :]).astype(o_ref.dtype)


def _dw_kernel(x_ref, ct_ref, dw_ref, db_ref, accw_ref, accb_ref):
    b, t = pl.program_id(0), pl.program_id(1)

    @pl.when((b == 0) & (t == 0))
    def _():
        accw_ref[:, :] = jnp.zeros_like(accw_ref)
        accb_ref[:, :] = jnp.zeros_like(accb_ref)

    ct = ct_ref[0].astype(jnp.float32)
    accw_ref[:, :] += jax.lax.dot_general(
        x_ref[0], ct,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    accb_ref[:, :] += jnp.sum(ct, axis=0, keepdims=True)

    @pl.when((b == pl.num_programs(0) - 1) & (t == pl.num_programs(1) - 1))
    def _():
        dw_ref[:, :] = accw_ref[:, :]
        db_ref[:, :] = accb_ref[:, :]


def _run_fwd(x, w, bias):
    B, R, K = x.shape
    N = w.shape[1]
    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    T = _tile_rows(R, sublane, max(K, N))
    return pl.pallas_call(
        _fwd_kernel,
        grid=(B, R // T),
        in_specs=[
            pl.BlockSpec((1, T, K), lambda b, t: (b, t, 0)),
            pl.BlockSpec((K, N), lambda b, t: (0, 0)),
            pl.BlockSpec((1, N), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, N), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, R, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * R * K * N,
            bytes_accessed=B * R * (K + N) * x.dtype.itemsize,
            transcendentals=0),
    )(x, w.astype(x.dtype), bias.astype(jnp.float32)[None])


def _run_dw(x, ct):
    B, R, K = x.shape
    N = ct.shape[-1]
    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    T = _tile_rows(R, sublane, max(K, N))
    dw, db = pl.pallas_call(
        _dw_kernel,
        grid=(B, R // T),
        in_specs=[
            pl.BlockSpec((1, T, K), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, T, N), lambda b, t: (b, t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((K, N), lambda b, t: (0, 0)),
            pl.BlockSpec((1, N), lambda b, t: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, N), jnp.float32),
            jax.ShapeDtypeStruct((1, N), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, N), jnp.float32),
            pltpu.VMEM((1, N), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * R * K * N,
            bytes_accessed=B * R * (K + N) * x.dtype.itemsize,
            transcendentals=0),
    )(x, ct.astype(x.dtype))
    return dw, db


@jax.custom_vjp
def lane_matmul(x, w, bias):
    """y = x @ w + bias on dense packed rows. x: (B, R, K); w: (K, N) —
    any weight, typically the zero-padded block-diagonal of a packed 1x1
    conv; bias: (N,). Check :func:`supports` first."""
    return _run_fwd(x, w, bias)


def _vjp_fwd(x, w, bias):
    return _run_fwd(x, w, bias), (x, w)


def _vjp_bwd(res, ct):
    x, w = res
    # dx = ct @ w^T: the same streaming kernel, no transposed layouts
    dx = _run_fwd(ct.astype(x.dtype), w.swapaxes(0, 1),
                  jnp.zeros((x.shape[-1],), jnp.float32))
    dw, db = _run_dw(x, ct)
    return dx, dw.astype(w.dtype), db[0].astype(jnp.float32)


lane_matmul.defvjp(_vjp_fwd, _vjp_bwd)
