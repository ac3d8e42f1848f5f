"""GroupNorm (+ fused FiLM / activation / dropout epilogue), sharding-aware.

The reference's ResBlocks use GroupNorm(8) + SiLU (SURVEY.md §2b CUNet row,
``norm_groups=8`` at reference trainVDM3D_c_c_from_field_name_thick_lowbatch.py:61),
with a FiLM (scale-shift) embedding injection and dropout between the two convs.
Statistics reduce over all spatial positions and the channels of each group —
under spatial sharding that is a cross-shard reduction, implemented as local
moments + ``lax.psum`` over the ``sp`` mesh axis.

Two execution paths:

  * **Pallas fused kernel** (ops/pallas/fused_norm.py) — unsharded TPU hot
    path: the whole normalize+affine(+FiLM)+SiLU+dropout chain in one kernel
    on a lane-packed view, forward and backward. Measured motivation in that
    module's docstring (GN+dropout = 2/3 of the flagship forward when left
    to XLA). Gate: VDM4CDM_PALLAS_GN=0 disables.
  * **XLA composition** (this module) — the correctness oracle, and the only
    path under spatial sharding (needs the psum) or on CPU.

The per-(batch, channel) affine generalization: every site is

    y = dropout(act(groupnorm(x) * a + b)),   a/b (B, C)

with a = gamma, b = beta for plain GroupNorm and a = gamma*(1+film_scale),
b = beta*(1+film_scale)+film_shift for the FiLM site — so gradients to
gamma/beta/FiLM flow through ordinary (B, C) JAX ops around the fused op.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..parallel.halo import NO_SHARD, ShardCtx

# Pallas fused-norm gate: "1" (default) = ON for TPU (unsharded monolith +
# sharded split-kernel CP path), "0" = XLA composition everywhere, "force" =
# ON even off-TPU (interpret mode — used by the CPU-mesh sharded tests).
_PALLAS_GN_ENV = os.environ.get("VDM4CDM_PALLAS_GN", "1")
_PALLAS_GN = _PALLAS_GN_ENV in ("1", "force")


def _seed_from_key(key: jax.Array) -> jnp.ndarray:
    """(1,) int32 seed for the in-kernel TPU PRNG, from a JAX PRNG key.

    Both key halves are mixed through a murmur-style avalanche so distinct
    fold_in chains land on well-separated 32-bit site seeds (the kernel keeps
    its per-tile counter in a separate seed word, fused_norm._dropout_mask)."""
    try:
        data = jax.random.key_data(key)
    except TypeError:
        data = key
    data = jnp.asarray(data).ravel().astype(jnp.uint32)
    h = data[0] * jnp.uint32(0x9E3779B9)
    if data.shape[0] > 1:
        h = h ^ (data[1] * jnp.uint32(0x85EBCA6B))
    h = (h ^ (h >> 16)) * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    return jax.lax.bitcast_convert_type(h.reshape(1), jnp.int32)


def _use_fused(x: jnp.ndarray, ctx: ShardCtx) -> bool:
    if not _PALLAS_GN or ctx.axis is not None:
        return False
    if jax.default_backend() != "tpu":
        return False
    from .pallas.fused_norm import supports

    return supports(x.shape, x.dtype)


def _use_fused_cp(x: jnp.ndarray, ctx: ShardCtx) -> bool:
    """Sharded (`sp`) fused path: split stats/apply kernels with the psum in
    between (pallas/fused_norm.py CP section)."""
    if not _PALLAS_GN or ctx.axis is None:
        return False
    if jax.default_backend() != "tpu" and _PALLAS_GN_ENV != "force":
        return False
    from .pallas.fused_norm import supports

    return supports(x.shape, x.dtype)


def _xla_group_norm_stats(x, groups, eps, ctx):
    """(mean, inv) per (batch, group), f32, with cross-shard psum."""
    b, c = x.shape[0], x.shape[-1]
    xg = x.reshape(b, -1, groups, c // groups)  # (B, S_local, G, C/G)
    s1 = jnp.sum(xg, axis=(1, 3), dtype=jnp.float32)  # (B, G)
    s2 = jnp.sum(jnp.square(xg), axis=(1, 3), dtype=jnp.float32)
    count = xg.shape[1] * xg.shape[3]
    if ctx.axis is not None:
        s1 = jax.lax.psum(s1, ctx.axis)
        s2 = jax.lax.psum(s2, ctx.axis)
        count = count * ctx.axis_size()
    mean = s1 / count
    # two-pass variance: f32 cancellation for near-constant groups can
    # push it below zero and NaN the rsqrt — clamp (true var >= 0)
    var = jnp.maximum(s2 / count - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    return mean, inv


def norm_affine_act(
    x: jnp.ndarray,
    a: jnp.ndarray,
    b: jnp.ndarray,
    groups: int,
    eps: float = 1e-6,
    act: Optional[str] = None,
    dropout_p: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    ctx: ShardCtx = NO_SHARD,
) -> jnp.ndarray:
    """y = dropout(act(groupnorm(x) * a + b)); x (B, *spatial, C), a/b (B, C)."""
    if act not in (None, "silu"):
        raise ValueError(f"unknown act {act!r}")
    if dropout_p > 0.0 and dropout_rng is None:
        raise ValueError("dropout_p > 0 requires dropout_rng")
    c = x.shape[-1]
    assert c % groups == 0, f"channels {c} not divisible by groups {groups}"

    if _use_fused(x, ctx):
        from .pallas.fused_norm import fused_norm_affine

        seed = (
            _seed_from_key(dropout_rng)
            if dropout_p > 0.0
            else jnp.zeros((1,), jnp.int32)
        )
        return fused_norm_affine(
            x, a.astype(jnp.float32), b.astype(jnp.float32), seed,
            groups, eps, act, float(dropout_p))

    if _use_fused_cp(x, ctx):
        from .pallas.fused_norm import fused_norm_affine_cp

        seed = (
            _seed_from_key(dropout_rng)
            if dropout_p > 0.0
            else jnp.zeros((1,), jnp.int32)
        )
        return fused_norm_affine_cp(
            x, a.astype(jnp.float32), b.astype(jnp.float32), seed,
            groups, eps, act, float(dropout_p), ctx.axis,
            jax.default_backend() != "tpu")

    # ---- XLA composition (oracle; sharded and CPU path) ---------------------
    # Moments accumulate in f32; the activation tensor itself is NEVER upcast
    # (a full f32 copy of a bf16 128^3 volume is what blows HBM at scale).
    bsz = x.shape[0]
    mean, inv = _xla_group_norm_stats(x, groups, eps, ctx)
    shape_bc = (bsz,) + (1,) * (x.ndim - 2) + (c,)
    inv_c = jnp.repeat(inv, c // groups, axis=-1)    # (B, C)
    mean_c = jnp.repeat(mean, c // groups, axis=-1)
    # fold the normalization into the per-(batch, channel) affine
    aa = (inv_c * a.astype(jnp.float32)).reshape(shape_bc)
    bb = (b.astype(jnp.float32) - mean_c * a.astype(jnp.float32) * inv_c).reshape(
        shape_bc
    )
    out = x * aa.astype(x.dtype) + bb.astype(x.dtype)
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
    if dropout_p > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_p, out.shape)
        out = jnp.where(keep, out / (1.0 - dropout_p), jnp.zeros((), out.dtype))
    return out


def group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    groups: int,
    eps: float = 1e-6,
    act: Optional[str] = None,
    ctx: ShardCtx = NO_SHARD,
) -> jnp.ndarray:
    """Plain GroupNorm: x (B, *spatial, C) channels-last; scale/bias (C,).

    act: None | "silu" (fused activation).
    """
    bsz = x.shape[0]
    a = jnp.broadcast_to(scale.astype(jnp.float32)[None], (bsz, scale.shape[0]))
    b = jnp.broadcast_to(bias.astype(jnp.float32)[None], (bsz, bias.shape[0]))
    return norm_affine_act(x, a, b, groups, eps=eps, act=act, ctx=ctx)


def group_norm_film(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    film_scale: jnp.ndarray,
    film_shift: jnp.ndarray,
    groups: int,
    eps: float = 1e-6,
    act: Optional[str] = "silu",
    dropout_p: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    ctx: ShardCtx = NO_SHARD,
) -> jnp.ndarray:
    """The ResBlock FiLM site: dropout(act(GN(x) * (1+fs) + fsh)) with GN's own
    gamma/beta folded in. film_scale/film_shift: (B, C)."""
    one_fs = 1.0 + film_scale.astype(jnp.float32)
    a = scale.astype(jnp.float32)[None] * one_fs
    b = bias.astype(jnp.float32)[None] * one_fs + film_shift.astype(jnp.float32)
    return norm_affine_act(
        x, a, b, groups, eps=eps, act=act,
        dropout_p=dropout_p, dropout_rng=dropout_rng, ctx=ctx)


# ----------------------------------------------------- packed-carrier entries


def packed_norm_affine_act(
    pk,
    a: jnp.ndarray,
    b: jnp.ndarray,
    groups: int,
    eps: float = 1e-6,
    act: Optional[str] = None,
    dropout_p: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    ctx: ShardCtx = NO_SHARD,
    ext_sums: Optional[jnp.ndarray] = None,
):
    """norm_affine_act on a :class:`~vdm4cdm_tpu.ops.packed.Packed` carrier —
    the fused kernel runs directly on the packed rows (no reshape, no
    relayout). Under spatial sharding the packed CP entry psums the stats
    over ``ctx.axis`` (round-3: sharded packed carriers). A
    :class:`~vdm4cdm_tpu.ops.packed.PackedPair` (lazy concat) normalizes with
    JOINT group statistics over the two carriers and stays a pair — the
    decoder's skip join never materializes (round-3: concat-free decoder).
    Falls back to the XLA composition via unpack/repack when the fused kernel
    is unavailable (CPU tests, interpret mode).

    ``ext_sums``: optional per-lane (B, 2, p*C) f32 local (sum x, sum x^2)
    emitted by the producing conv kernel (ops/conv.conv_packed emit_stats) —
    the stats sweep is skipped entirely (round-3 ROADMAP 1a: conv-emitted GN
    statistics). Only honored on the single-carrier fused path; ignored (the
    sweep runs) wherever the fused kernel can't host the shape."""
    from .packed import Packed, PackedPair, pack, unpack

    if act not in (None, "silu"):
        raise ValueError(f"unknown act {act!r}")
    if dropout_p > 0.0 and dropout_rng is None:
        raise ValueError("dropout_p > 0 requires dropout_rng")
    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu

    if isinstance(pk, PackedPair):
        if _PALLAS_GN and (on_tpu or _PALLAS_GN_ENV == "force"):
            from .pallas.fused_norm import (
                _tile_rows,
                fused_norm_affine_packed2,
            )

            fa, fb = pk.a.flat_rows(), pk.b.flat_rows()
            sublane = 16 if fa.dtype == jnp.bfloat16 else 8
            ok = (
                fa.shape[-1] % 128 == 0 and fb.shape[-1] % 128 == 0
                and pk.channels % groups == 0
                and _tile_rows(fa.shape[1], sublane, fa.shape[2]) is not None
                and _tile_rows(fb.shape[1], sublane, fb.shape[2]) is not None
            )
            if ok:
                seed = (
                    _seed_from_key(dropout_rng)
                    if dropout_p > 0.0
                    else jnp.zeros((1,), jnp.int32)
                )
                ya, yb = fused_norm_affine_packed2(
                    fa, fb, a.astype(jnp.float32), b.astype(jnp.float32),
                    seed, pk.a.channels, pk.b.channels, groups, eps, act,
                    float(dropout_p), ctx.axis, interpret)
                return PackedPair(
                    Packed(ya.reshape(pk.a.data.shape), pk.a.spatial,
                           pk.a.channels, pk.a.p),
                    Packed(yb.reshape(pk.b.data.shape), pk.b.spatial,
                           pk.b.channels, pk.b.p),
                )
        return packed_norm_affine_act(
            pk.materialize(), a, b, groups, eps=eps, act=act,
            dropout_p=dropout_p, dropout_rng=dropout_rng, ctx=ctx)

    assert isinstance(pk, Packed)
    if _PALLAS_GN and (on_tpu or _PALLAS_GN_ENV == "force"):
        from .pallas.fused_norm import (
            _tile_rows,
            fused_norm_affine_packed,
            fused_norm_affine_packed_cp,
            fused_norm_affine_packed_ext,
        )

        flat = pk.flat_rows()
        sublane = 16 if flat.dtype == jnp.bfloat16 else 8
        # A carrier built outside CUNet's block_packable gating may not be
        # tileable — fall through to the XLA unpack path rather than crash
        # inside the kernel launch (advisor round-2 finding).
        if (pk.p * pk.channels) % 128 == 0 and _tile_rows(
                flat.shape[1], sublane, flat.shape[2]) is not None:
            seed = (
                _seed_from_key(dropout_rng)
                if dropout_p > 0.0
                else jnp.zeros((1,), jnp.int32)
            )
            if ext_sums is not None:
                out = fused_norm_affine_packed_ext(
                    flat, a.astype(jnp.float32), b.astype(jnp.float32), seed,
                    ext_sums, pk.channels, groups, eps, act, float(dropout_p),
                    ctx.axis, interpret)
            elif ctx.axis is not None:
                out = fused_norm_affine_packed_cp(
                    flat, a.astype(jnp.float32), b.astype(jnp.float32), seed,
                    pk.channels, groups, eps, act, float(dropout_p),
                    ctx.axis, interpret)
            else:
                out = fused_norm_affine_packed(
                    flat, a.astype(jnp.float32), b.astype(jnp.float32), seed,
                    pk.channels, groups, eps, act, float(dropout_p),
                    interpret)
            return Packed(out.reshape(pk.data.shape), pk.spatial, pk.channels,
                          pk.p)
    out = norm_affine_act(
        unpack(pk), a, b, groups, eps=eps, act=act,
        dropout_p=dropout_p, dropout_rng=dropout_rng, ctx=ctx)
    return pack(out, p=pk.p)


def packed_group_norm_film(
    pk,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    film,
    groups: int,
    eps: float = 1e-6,
    act: Optional[str] = "silu",
    dropout_p: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    ctx: ShardCtx = NO_SHARD,
    ext_sums: Optional[jnp.ndarray] = None,
):
    """ResBlock epilogue on a Packed carrier (or a PackedPair lazy concat);
    ``film`` is an optional (scale, shift) pair of (B, C) arrays. ``ext_sums``
    as in :func:`packed_norm_affine_act` (conv-emitted GN statistics)."""
    bsz, c = pk.batch, pk.channels
    a = jnp.broadcast_to(scale.astype(jnp.float32)[None], (bsz, c))
    b = jnp.broadcast_to(bias.astype(jnp.float32)[None], (bsz, c))
    if film is not None:
        fs, fsh = film
        one_fs = 1.0 + fs.astype(jnp.float32)
        a = a * one_fs
        b = b * one_fs + fsh.astype(jnp.float32)
    return packed_norm_affine_act(
        pk, a, b, groups, eps=eps, act=act,
        dropout_p=dropout_p, dropout_rng=dropout_rng, ctx=ctx,
        ext_sums=ext_sums)
