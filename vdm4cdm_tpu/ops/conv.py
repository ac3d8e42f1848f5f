"""Sharding-aware N-D convolution (channels-last, TPU MXU path).

The reference delegates all convs to cuDNN via torch (SURVEY.md §2d item 1;
e.g. reference trainVDM3D_c_c_from_field_name_thick_lowbatch.py:116-127 builds
a conv UNet with ``conv_padding_mode`` "circular" or "zeros"). Here convolution
is XLA's ``conv_general_dilated`` — which tiles directly onto the MXU — wrapped
with:

  * explicit symmetric padding (torch Conv(k, s, p=k//2) semantics, so shapes
    match the reference exactly for k=3, s in {1,2});
  * circular ("wrap") padding for periodic simulation boxes;
  * halo exchange over the sharded spatial dim (parallel/halo.py) instead of
    local padding, so spatially sharded grids convolve correctly across shard
    boundaries — including the periodic wraparound shard pair.

Accumulation is always float32 (``preferred_element_type``) regardless of the
activation dtype (bf16 compute supported).
"""

from __future__ import annotations

import itertools
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from ..parallel.halo import NO_SHARD, ShardCtx, halo_exchange

_SPATIAL_CHARS = "DHW"

# Convolution backend:
#   "auto"   (default) — the Pallas packed-im2col kernel (ops/pallas/conv3d)
#            for supported unsharded 3D k3/s1 convs ON TPU (measured 1.8-2.8x
#            XLA at the flagship thin-channel shapes), XLA otherwise;
#   "pallas" — force the Pallas kernel wherever supports() allows;
#   "xla"    — lax.conv_general_dilated only (the correctness oracle);
#   "taps"   — explicit per-tap shifted matmuls (kept for experiments).
_CONV_IMPL = os.environ.get("VDM4CDM_CONV_IMPL", "auto")
# Opt-in switch for the packed 1x1 lane_matmul kernel (VDM4CDM_LANEMM=1).
# Default OFF: it removes the 805 MB carrier transposes XLA materializes
# around the skip_proj matmul, but an interleaved A/B/A on hardware measured
# it a ~1% net LOSS (5.297/5.302 vs 5.347 Mvox/s, spread 0.2-0.3% — the
# block-diagonal MXU waste and kernel overheads cost more than the copies;
# docs/DESIGN.md §7). Kept oracle-tested for the bandwidth-throttled eras,
# where saved bytes should win.
_LANEMM = os.environ.get("VDM4CDM_LANEMM", "0") == "1"

# Bias-folded, stats-emitting packed conv entries (conv3d_pallas_*_bs):
# default ON ("1") — in-kernel bias (kills the standalone out+b HBM pass) and
# conv-emitted GroupNorm sums (the downstream fused norm skips its stats
# sweep). "0" restores the round-2 entries + outer bias add, for A/B.
_CONV_BS = os.environ.get("VDM4CDM_CONV_BS", "1") != "0"

# Circular padding strategy: "facefix" computes the zero-padded conv (XLA's
# fast internal-padding path, no materialized copy, aligned shapes) and adds
# the exact wraparound contributions via thin per-face convolutions — measured
# ~17% faster forward at 128^3 than materializing a wrap-padded 130^3 tensor
# before every conv. "pad" is the straightforward jnp.pad(mode="wrap") path
# (the correctness oracle).
_CIRCULAR_IMPL = os.environ.get("VDM4CDM_CIRCULAR_IMPL", "facefix")


def _dim_numbers(nd: int):
    sp = _SPATIAL_CHARS[-nd:]
    return lax.conv_dimension_numbers(
        (1,) * (nd + 2), (1,) * (nd + 2), (f"N{sp}C", f"{sp}IO", f"N{sp}C")
    )


def conv_nd(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int | Sequence[int] = 1,
    padding_mode: str = "zeros",
    ctx: ShardCtx = NO_SHARD,
) -> jnp.ndarray:
    """Convolve channels-last ``x`` (B, *spatial, Cin) with ``w`` (*k, Cin, Cout).

    padding_mode: "zeros" | "circular". Padding per dim is the torch-style
    symmetric (k//2, (k-1)//2) so stride-1 preserves size and stride-2 halves
    even sizes — on every shard, at every mesh size.
    """
    nd = x.ndim - 2
    ksizes = w.shape[:-2]
    assert len(ksizes) == nd, f"kernel rank {len(ksizes)} != spatial rank {nd}"
    if isinstance(stride, int):
        stride = (stride,) * nd
    pads = [(k // 2, (k - 1) // 2) for k in ksizes]
    periodic = padding_mode == "circular"

    if (
        ctx.axis is None
        and nd == 3
        and _CONV_IMPL in ("auto", "pallas")
        and (_CONV_IMPL == "pallas" or jax.default_backend() == "tpu")
    ):
        from .pallas.conv3d import conv3d_pallas, supports

        if supports(x.shape, w.shape, stride, itemsize=x.dtype.itemsize):
            out = conv3d_pallas(x, w, padding_mode)
            if b is not None:
                out = out + b.astype(out.dtype)
            return out

    conv_pads = list(pads)
    facefix_dims: list[int] = []
    if ctx.axis is not None:
        # sharded dim: halo exchange replaces local padding
        lo, hi = pads[ctx.spatial_dim]
        if (
            nd == 3
            and ctx.spatial_dim == 0
            and (lo, hi) == (1, 1)
            and tuple(stride) == (1, 1, 1)
            and _CONV_IMPL in ("auto", "pallas")
            and (_CONV_IMPL == "pallas" or jax.default_backend() == "tpu")
        ):
            # Pallas fast path for the sharded (`sp`) dimension: the exchanged
            # halo planes feed the valid-in-z kernel directly — no local
            # z padding, no facefix, full MXU path (round-2 VERDICT item 2).
            from .pallas.conv3d import conv3d_pallas_zhalo, supports_zhalo

            halo_shape = list(x.shape)
            halo_shape[1] += 2
            if supports_zhalo(tuple(halo_shape), w.shape,
                              itemsize=x.dtype.itemsize):
                xh = halo_exchange(x, ctx, 1, 1, periodic=periodic)
                out = conv3d_pallas_zhalo(xh, w, padding_mode)
                if b is not None:
                    out = out + b.astype(out.dtype)
                return out
        x = halo_exchange(x, ctx, lo, hi, periodic=periodic)
        conv_pads[ctx.spatial_dim] = (0, 0)
        if periodic:
            pad_width = [(0, 0)] * x.ndim
            for d in range(nd):
                if d != ctx.spatial_dim:
                    pad_width[1 + d] = conv_pads[d]
                    conv_pads[d] = (0, 0)
            if any(p != (0, 0) for p in pad_width):
                x = jnp.pad(x, pad_width, mode="wrap")
    elif periodic:
        # facefix's per-face scatter-adds rewrite the OUTPUT once per spatial
        # dim; a materialized wrap-pad costs one INPUT copy. For thin-input
        # convs (conv_in: 2 -> 32 channels) the output is many times larger
        # than the input, so the pad path wins — the HLO byte audit measured
        # ~2.9 GB/step of facefix scatter-add/mask traffic at conv_in alone.
        thin_input = w.shape[-2] * 4 <= w.shape[-1]
        if (_CIRCULAR_IMPL == "facefix" and not thin_input
                and all(s == 1 for s in stride) and all(
            k % 2 == 1 and x.shape[1 + d] >= k for d, k in enumerate(ksizes)
        )):
            facefix_dims = list(range(nd))  # zero-conv + per-face corrections
        elif (
            _CIRCULAR_IMPL == "facefix"
            and all(s == 2 for s in stride)
            and all(k == 3 for k in ksizes)
            and all(x.shape[1 + d] % 2 == 0 and x.shape[1 + d] >= 4
                    for d in range(nd))
        ):
            # stride-2 k=3: only the LOW output face wraps (ROADMAP round-2
            # item 4) — one-plane corrections instead of a materialized
            # wrap-padded copy of the whole volume.
            out = _conv_circular_facefix_s2(x, w.astype(x.dtype))
            if b is not None:
                out = out + b.astype(out.dtype)
            return out
        else:
            pad_width = [(0, 0)] + list(conv_pads) + [(0, 0)]
            x = jnp.pad(x, pad_width, mode="wrap")
            conv_pads = [(0, 0)] * nd

    if _CONV_IMPL == "taps" and all(s == 1 for s in stride) and not facefix_dims:
        out = _conv_taps(x, w.astype(x.dtype), conv_pads)
    elif facefix_dims:
        out = _conv_circular_facefix(x, w.astype(x.dtype))
    else:
        # No explicit preferred_element_type: with bf16 operands the TPU MXU
        # still accumulates in f32 internally, and an explicit f32 upcast +
        # downcast breaks the conv transpose rule (cotangent arrives f32
        # against bf16 primals in the grad-w conv).
        out = lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=stride,
            padding=conv_pads,
            dimension_numbers=_dim_numbers(nd),
        )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _conv_mixed(x: jnp.ndarray, w: jnp.ndarray, circ_dims,
                stride: int = 1) -> jnp.ndarray:
    """SAME conv with circular padding on ``circ_dims`` (wrap-pad; these are
    thin slabs here, so the copies are negligible) and zero padding elsewhere."""
    nd = x.ndim - 2
    if nd == 0:  # no spatial dims left: the "conv" is a plain channel matmul
        return x @ w
    ksizes = w.shape[:-2]
    pads = [(k // 2, (k - 1) // 2) for k in ksizes]
    pad_width = [(0, 0)] * x.ndim
    conv_pads = []
    for d in range(nd):
        if d in circ_dims and pads[d] != (0, 0):
            pad_width[1 + d] = pads[d]
            conv_pads.append((0, 0))
        else:
            conv_pads.append(pads[d])
    if any(p != (0, 0) for p in pad_width):
        x = jnp.pad(x, pad_width, mode="wrap")
    return lax.conv_general_dilated(
        x, w, (stride,) * nd, conv_pads, dimension_numbers=_dim_numbers(nd)
    )


def _conv_circular_facefix_s2(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Exact circular stride-2 k=3 conv without a materialized wrap-pad.

    With torch-style (1, 1) padding at stride 2, output o reads inputs
    2o-1..2o+1: only o = 0's tap -1 wraps (to x[n-1]); 2o+1 <= n-1 never
    wraps high. So y = zero-padded stride-2 conv + per-dim corrections that
    convolve the single wrapped plane x[n-1] with kernel slice w[0], applied
    to the o = 0 output face — partitioned by FIRST wrapping dim exactly as
    in :func:`_conv_circular_facefix` (circular in later dims, zero in
    earlier ones)."""
    nd = x.ndim - 2
    y = lax.conv_general_dilated(
        x, w, (2,) * nd, [(1, 1)] * nd, dimension_numbers=_dim_numbers(nd)
    )
    for d in range(nd):
        n = x.shape[1 + d]
        sl = [slice(None)] * x.ndim
        sl[1 + d] = n - 1
        src = x[tuple(sl)]  # wrapped plane, dim d squeezed out
        wsl = [slice(None)] * w.ndim
        wsl[d] = 0
        contrib = _conv_mixed(
            src, w[tuple(wsl)], {dd - 1 for dd in range(d + 1, nd)}, stride=2
        )
        y = y.at[tuple([slice(None)] * (1 + d) + [0])].add(contrib)
    return y


def _conv_circular_facefix(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Exact circular stride-1 conv without materializing a wrap-padded volume.

    y = zero-padded SAME conv + per-dimension boundary corrections. The taps a
    zero conv misses are exactly those whose window wrapped in >=1 dims;
    partition them by the FIRST dimension they wrap in: the dim-d correction
    convolves the p-thick boundary slabs of x with the corresponding kernel
    slices, circular in later dims (covers joint wraps with them) and zero in
    earlier dims (already covered by their corrections).
    """
    nd = x.ndim - 2
    ksizes = w.shape[:-2]
    y = lax.conv_general_dilated(
        x, w, (1,) * nd,
        [(k // 2, (k - 1) // 2) for k in ksizes],
        dimension_numbers=_dim_numbers(nd),
    )
    for d in range(nd):
        k = ksizes[d]
        p = k // 2
        if p == 0:
            continue
        n = x.shape[1 + d]
        later = set(range(d + 1, nd))

        def take(arr, idx_lo, idx_hi, dim=d):
            sl = [slice(None)] * arr.ndim
            sl[1 + dim] = slice(idx_lo, idx_hi)
            return arr[tuple(sl)]

        # kernel slices along dim d: w_t has the remaining dims' extents
        def wslice(t):
            sl = [slice(None)] * w.ndim
            sl[d] = t
            return w[tuple(sl)]

        # low output faces o in [0, p): taps t in [-p, -1-o] wrap to x[n+o+t]
        for o in range(p):
            term = None
            for t in range(-p, -o):
                src = take(x, (n + o + t), (n + o + t) + 1)  # one slice, thickness 1
                contrib = _conv_mixed(
                    jnp.squeeze(src, axis=1 + d), wslice(t + p),
                    {dd - 1 for dd in later},
                )
                term = contrib if term is None else term + contrib
            y = y.at[tuple([slice(None)] * (1 + d) + [o])].add(term)
        # high output faces o in [n-p, n): taps t in [n-o, p] wrap to x[o+t-n]
        for o in range(n - p, n):
            term = None
            for t in range(n - o, p + 1):
                src = take(x, (o + t - n), (o + t - n) + 1)
                contrib = _conv_mixed(
                    jnp.squeeze(src, axis=1 + d), wslice(t + p),
                    {dd - 1 for dd in later},
                )
                term = contrib if term is None else term + contrib
            y = y.at[tuple([slice(None)] * (1 + d) + [o])].add(term)
    return y


def _conv_taps(x: jnp.ndarray, w: jnp.ndarray, pads) -> jnp.ndarray:
    """Stride-1 conv as an explicit sum of per-tap GEMMs over a zero-padded
    volume: out = sum_t shift(x, t) @ w[t]. Each GEMM has M = prod(spatial)
    (huge), K = Cin, N = Cout — clean MXU tiles regardless of window shape."""
    nd = x.ndim - 2
    ksizes = w.shape[:-2]
    pad_width = [(0, 0)] + list(pads) + [(0, 0)]
    xp = jnp.pad(x, pad_width) if any(p != (0, 0) for p in pads) else x
    out_spatial = tuple(
        xp.shape[1 + d] - (ksizes[d] - 1) for d in range(nd)
    )
    out = None
    for taps in itertools.product(*(range(k) for k in ksizes)):
        sl = (slice(None),) + tuple(
            slice(t, t + out_spatial[d]) for d, t in enumerate(taps)
        ) + (slice(None),)
        term = xp[sl] @ w[taps]
        out = term if out is None else out + term
    return out


# ----------------------------------------------------- packed-carrier entries


def conv_packed(pk, w, b=None, padding_mode: str = "zeros",
                ctx: ShardCtx = NO_SHARD, emit_stats: bool = False):
    """conv_nd on a :class:`~vdm4cdm_tpu.ops.packed.Packed` carrier (stride 1,
    k in {1, 3}): k=3 runs the Pallas packed conv directly on the carrier
    (no reshape/relayout); k=1 is a single block-diagonal matmul on the
    packed rows. Under spatial sharding (``ctx.axis``, sharded dim = z), k=3
    halo-exchanges the packed plane axis and runs the packed z-halo kernel
    (round-3: sharded packed carriers); k=1 is pointwise and needs no halo.
    Falls back to unpack -> conv_nd -> repack off-TPU.

    The k=3 Pallas path folds the bias IN-KERNEL and emits per-lane GroupNorm
    sums of its output for free (conv3d_pallas_*_bs); ``emit_stats=True``
    changes the return to ``(Packed, sums | None)`` — sums is the (B, 2,
    p*Cout) f32 local (sum y, sum y^2) accepted by
    ops.norm.packed_norm_affine_act's ``ext_sums`` (which skips the norm's
    stats sweep), or None on any path that can't emit them (pair input, XLA
    fallback). The sums carry NO gradient (see the kernel module's contract).

    A :class:`~vdm4cdm_tpu.ops.packed.PackedPair` (lazy concat) splits the
    kernel along its input channels — conv(concat(h, s), W) = conv(h, W_h) +
    conv(s, W_s) — so the joined tensor is never written (round-3:
    concat-free decoder). Same bytes read; the pair collapses to a single
    Packed here (its post-add stats can't come from either half's kernel, so
    emit_stats yields None)."""
    from .packed import Packed, PackedPair, pack, unpack

    if isinstance(pk, PackedPair):
        ca = pk.a.channels
        assert w.shape[-2] == pk.channels, (w.shape, pk.channels)
        ya = conv_packed(pk.a, w[..., :ca, :], b, padding_mode=padding_mode,
                         ctx=ctx)
        yb = conv_packed(pk.b, w[..., ca:, :], None,
                         padding_mode=padding_mode, ctx=ctx)
        out = Packed(ya.data + yb.data, ya.spatial, ya.channels, ya.p)
        return (out, None) if emit_stats else out

    assert isinstance(pk, Packed)
    nd = 3
    ksizes = w.shape[:-2]
    cin, cout = w.shape[-2], w.shape[-1]
    assert cin == pk.channels, (cin, pk.channels)
    p = pk.p

    if ksizes == (1, 1, 1):
        # block-diagonal lane matmul: packed slot j maps through w[0,0,0]
        w0 = w[0, 0, 0].astype(pk.data.dtype)  # (Cin, Cout)
        bd = jnp.zeros((p * cin, p * cout), pk.data.dtype)
        for j in range(p):
            bd = bd.at[j * cin:(j + 1) * cin, j * cout:(j + 1) * cout].set(w0)
        bias = (jnp.tile(b.astype(jnp.float32), p) if b is not None
                else jnp.zeros((p * cout,), jnp.float32))
        flat = pk.flat_rows()
        if (
            _LANEMM
            and _CONV_IMPL in ("auto", "pallas")
            and (_CONV_IMPL == "pallas" or jax.default_backend() == "tpu")
        ):
            # Streaming Pallas kernel: XLA lowers this matmul to a conv whose
            # chosen layout TRANSPOSES the carrier (805 MB copies fwd + bwd
            # at every decoder skip projection — HLO audit, DESIGN §7).
            from .pallas.lanemm import lane_matmul, supports as _mm_ok

            if _mm_ok(flat.shape, p * cin, p * cout, flat.dtype):
                out = lane_matmul(flat, bd, bias)
                out = Packed(out.reshape(pk.data.shape[:-1] + (p * cout,)),
                             pk.spatial, cout, p)
                return (out, None) if emit_stats else out
        out = pk.data @ bd + bias.astype(pk.data.dtype)
        out = Packed(out, pk.spatial, cout, p)
        return (out, None) if emit_stats else out

    if (
        ksizes == (3, 3, 3)
        and _CONV_IMPL in ("auto", "pallas")
        and (_CONV_IMPL == "pallas" or jax.default_backend() == "tpu")
    ):
        from .pallas.conv3d import (
            conv3d_pallas_packed,
            conv3d_pallas_packed_bs,
            conv3d_pallas_zhalo_packed,
            conv3d_pallas_zhalo_packed_bs,
        )

        periodic = padding_mode == "circular"
        bias = (b.astype(jnp.float32) if b is not None
                else jnp.zeros((cout,), jnp.float32))
        if ctx.axis is not None and ctx.spatial_dim == 0:
            # packed planes halo-exchange exactly like unpacked ones: the
            # carrier's axis 1 IS the z-plane axis (packing is in-plane).
            xh = halo_exchange(pk.data, ctx, 1, 1, periodic=periodic)
            if _CONV_BS:
                # stats only when the caller consumes them (emit_stats) —
                # otherwise the kernel runs bias-only: no discarded HBM sums
                # write, smaller VMEM working set (advisor round-3 finding)
                res = conv3d_pallas_zhalo_packed_bs(
                    xh, w, bias, padding_mode, pk.spatial,
                    with_stats=emit_stats)
                out, sums = res if emit_stats else (res, None)
                if sums is not None:
                    # sums carry NO gradient by kernel contract; make that
                    # structural so misuse yields zero grads, never silently
                    # wrong ones (advisor round-3 finding)
                    sums = jax.lax.stop_gradient(sums)
            else:
                out = conv3d_pallas_zhalo_packed(xh, w, padding_mode,
                                                 pk.spatial)
                if b is not None:
                    out = out + jnp.tile(b.astype(out.dtype), p)
                sums = None
            out = Packed(out, pk.spatial, cout, p)
            return (out, sums) if emit_stats else out
        if ctx.axis is None:
            if _CONV_BS:
                res = conv3d_pallas_packed_bs(
                    pk.data, w, bias, padding_mode, pk.spatial,
                    with_stats=emit_stats)
                out, sums = res if emit_stats else (res, None)
                if sums is not None:
                    sums = jax.lax.stop_gradient(sums)
            else:
                out = conv3d_pallas_packed(pk.data, w, padding_mode,
                                           pk.spatial)
                if b is not None:
                    out = out + jnp.tile(b.astype(out.dtype), p)
                sums = None
            out = Packed(out, pk.spatial, cout, p)
            return (out, sums) if emit_stats else out

    out = conv_nd(unpack(pk), w, b, stride=1, padding_mode=padding_mode,
                  ctx=ctx)
    out = pack(out, p=p)
    return (out, None) if emit_stats else out
