"""Pallas TPU kernel: thin-channel 3x3x3 convolution via packed im2col-in-VMEM.

Why this exists (measured, experiments/microbench_ops.py): XLA lowers a
channels-last conv3d with Cin=Cout=32 to per-tap GEMMs with K=N=32, using
~6% of the MXU — 11.4 TFLOP/s at 128^3 where a 128-channel conv hits 103.
The reference's flagship 3D UNets (chs [32,64,128,256] at 128^3, reference
trainVDM3D128_c_c, configs.yaml:1-18) spend most of their step time in exactly
these thin convolutions.

Design (TPU-first, no reference analog — the reference delegates to cuDNN):

  * each D-plane is viewed FLAT and CHANNEL-PACKED: ``(H*W/p, p*C)`` with
    p = 128//C — a free reshape that makes the lane dimension dense at 128
    (the natural ``(..., W, 32)`` layout pads 32 -> 128 lanes, wasting 4x of
    every byte moved). One packed row = p consecutive w-voxels;
  * in this "helical" flat layout a (dy, u) tap is a CONTIGUOUS slice at a
    static row offset — no reshapes (Mosaic cannot lane<->sublane shape-cast),
    no gathers. The p inner window slots are ONE dense 128-lane copy; only
    the two edge slots (u=0, u=p+1) are thin C-lane copies, and only they
    need the helical-vs-periodic w-wrap fix (a masked select from the same
    buffer ±W/p rows away);
  * halos: the packed plane is wrap-padded (circular) or zero-padded (zeros)
    in XLA and gathered into per-tile overlapping windows, so the kernel sees
    disjoint blocks and Pallas double-buffers the HBM traffic automatically.
    dz = ±1 planes arrive as two extra (d±1) mod D wrap-indexed BlockSpec
    refs — circular padding costs nothing anywhere;
  * ONE MXU GEMM per tile: im2col (M, 9*(p+2)*C) @ Wq ((p+2)*9*C, p*Cout).
    K >= 1296 and N = p*Cout = 128 fill the MXU completely; the (p+2)/3-fold
    tap-window redundancy (zeros in Wq) is the price — net ~6x more useful
    MXU throughput than XLA's K=N=32 form at C=32;
  * backward: dx is the same kernel with spatially-flipped, io-transposed
    weights (transpose of a SAME k3/s1 conv; circular stays circular), and dw
    is ``im2col^T @ cotangent`` accumulated across the sequential grid in a
    VMEM scratch and un-packed on the host — wired via jax.custom_vjp.

Scope: 3D, kernel 3^3, stride 1, circular or zeros padding. Anything else
falls back to the XLA path in ops/conv.py (which is also the oracle for the
equivalence tests in tests/test_pallas_conv3d.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# im2col tile budget (bytes); the DMA slots and out blocks sit on top, all
# well under the raised 64 MB scoped-vmem limit. Bigger tiles = fewer grid
# steps = less per-step overhead. Env-tunable for experiments.
import os as _os

_IM2COL_BUDGET = int(_os.environ.get("VDM4CDM_PALLAS_IM2COL_MB", "14")) * 1024 * 1024


def _pack_factor(W: int, C: int):
    # smallest pack factor whose packed row is a whole number of 128-lane
    # tiles (sliced DMA requires it) — smallest minimizes the (p+2)/3-fold
    # tap-window flop redundancy
    for p in (1, 2, 4, 8):
        if (p * C) % 128 == 0 and W % p == 0:
            return p
    return None


def _geometry(H: int, W: int, C: int):
    """(p, U, Wp, M) for the packed layout; M = packed rows per tile."""
    p = _pack_factor(W, C)
    if p is None:
        return None, None, None, None
    U = p + 2
    Wp = W // p
    M = None
    for th in range(1, H + 1):
        if H % th:
            continue
        m = th * Wp
        # DMA window sizes/offsets must align to the 8-sublane tiling
        if m % 8 == 0 and m * 9 * U * C * 2 <= _IM2COL_BUDGET:
            M = m
    return p, U, Wp, M


def supports(x_shape: Tuple[int, ...], w_shape: Tuple[int, ...], stride) -> bool:
    """Can the Pallas path handle this conv? (3D, k=3, s=1, thin-ish chans.)"""
    if len(x_shape) != 5 or len(w_shape) != 5:
        return False
    if tuple(w_shape[:3]) != (3, 3, 3):
        return False
    if tuple(stride) != (1, 1, 1):
        return False
    _, D, H, W, cin = x_shape
    cout = w_shape[-1]
    if cin != w_shape[3]:
        return False
    if cin < 8 or cout < 8 or H < 2 or W < 8:
        return False
    p, U, Wp, M = _geometry(H, W, cin)
    if M is None or p * cout > 512:
        return False
    return True


def _pack_weights(w, p: int, dtype):
    """w (3,3,3,C,Cout) -> Wq (9*(p+2)*C, p*Cout): window slot u feeds output
    slot j through kernel tap kx = u - j when 0 <= kx <= 2, else zero."""
    C, Cout = w.shape[3], w.shape[4]
    U = p + 2
    u_idx = np.arange(U)[:, None]
    j_idx = np.arange(p)[None, :]
    kx = u_idx - j_idx                      # (U, p)
    valid = (kx >= 0) & (kx <= 2)
    # (3dz, 3dy, U, p, C, Cout) gathered from kernel tap kx
    wq = w[:, :, np.clip(kx, 0, 2), :, :] * jnp.asarray(
        valid[..., None, None], w.dtype)
    wq = wq.transpose(0, 1, 2, 4, 3, 5)     # (dz, dy, U, C, p, Cout)
    return wq.reshape(9 * U * C, p * Cout).astype(dtype)


def _unpack_dw(dwq, p: int, C: int, Cout: int, w_dtype):
    """Inverse of _pack_weights for gradients: sum each (u, j) diagonal."""
    U = p + 2
    g = dwq.reshape(3, 3, U, C, p, Cout)    # (dz, dy, u, ci, j, co)
    taps = []
    for kx in range(3):
        taps.append(sum(g[:, :, kx + j, :, j, :] for j in range(p)))
    return jnp.stack(taps, axis=2).astype(w_dtype)  # (3, 3, 3, C, Cout)


def _fill_im2col(im2col_ref, slots_ref, d, *, M, O, D, Wp, p, C, zeros):
    """Build the (M, 9*(p+2)*C) packed im2col tile from the three DMA'd packed
    flat-plane windows slots_ref (3, M + 2O, p*C). Reads slice the ref
    directly (one live block at a time) to keep Mosaic's vector stack flat."""
    U = p + 2
    lanes_u0 = slice((p - 1) * C, p * C)
    # supervoxel w-index of each row (tiles are Wp-aligned)
    wcol = jax.lax.broadcasted_iota(jnp.int32, (M, C), 0) % Wp
    for dz in range(3):
        scale = None
        if zeros and dz != 1:
            edge = (d == 0) if dz == 0 else (d == D - 1)
            scale = jnp.where(edge, 0, 1).astype(im2col_ref.dtype)

        def rows(lo, lanes=slice(None), _dz=dz):
            blk = slots_ref[_dz, lo:lo + M, lanes]
            return blk if scale is None else blk * scale

        for dyi in range(3):
            base = O + (dyi - 1) * Wp
            kblk = (dz * 3 + dyi) * U * C
            # u = 1..p: one dense p*C-lane copy, never w-wrapped
            im2col_ref[:, kblk + C:kblk + (p + 1) * C] = rows(base)
            # u = 0: previous voxel = last lane-block of the previous row
            blk = rows(base - 1, lanes_u0)
            wrapped = wcol == 0
            if zeros:
                blk = jnp.where(wrapped, 0, blk)
            else:
                blk = jnp.where(wrapped, rows(base - 1 + Wp, lanes_u0), blk)
            im2col_ref[:, kblk:kblk + C] = blk
            # u = p+1: next voxel = first lane-block of the next row
            blk = rows(base + 1, slice(0, C))
            wrapped = wcol == Wp - 1
            if zeros:
                blk = jnp.where(wrapped, 0, blk)
            else:
                blk = jnp.where(wrapped, rows(base + 1 - Wp, slice(0, C)), blk)
            im2col_ref[:, kblk + (p + 1) * C:kblk + U * C] = blk


def _dma_windows(xq_ref, slots_ref, sems, b, d, m, *, M, O, D, rows, n, zeros):
    """Fill the three VMEM plane windows (M + 2O rows each) straight from the
    UNPADDED packed planes in HBM — no padded copy is ever materialized.
    slot[dz] holds plane rows [mM - O, mM + M + O); each window is three DMA
    segments (O | M | O rows) whose source offsets wrap mod the plane length,
    which IS the circular boundary condition. Zeros mode overwrites the
    wrapped edge rows afterwards. All offsets/sizes are multiples of 8 rows
    (DMA tiling); the 9 segments are started together and waited together."""
    copies = []
    for dz in range(3):
        dplane = jax.lax.rem(d + dz - 1 + D, D)
        for s, (src, dst, size) in enumerate((
            (jax.lax.rem(m * M - O + rows, rows), 0, O),
            (m * M, O, M),
            (jax.lax.rem(m * M + M, rows), O + M, O),
        )):
            # M, O, rows are all multiples of 8, so every offset is too —
            # Mosaic can't prove that through the rem, hence the hint
            cp = pltpu.make_async_copy(
                xq_ref.at[b, dplane, pl.ds(pl.multiple_of(src, 8), size), :],
                slots_ref.at[dz, pl.ds(dst, size), :],
                sems.at[dz, s],
            )
            cp.start()
            copies.append(cp)
    for cp in copies:
        cp.wait()
    if zeros:
        for dz in range(3):
            @pl.when(m == 0)
            def _(_dz=dz):
                slots_ref[_dz, 0:O, :] = jnp.zeros_like(slots_ref[_dz, 0:O, :])

            @pl.when(m == n - 1)
            def _(_dz=dz):
                slots_ref[_dz, O + M:, :] = jnp.zeros_like(
                    slots_ref[_dz, O + M:, :])


def _fwd_kernel(xq_ref, w_ref, out_ref, im2col_ref, slots_ref, sems, *,
                M, O, D, Wp, p, C, rows, n, zeros):
    b, d, m = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    _dma_windows(xq_ref, slots_ref, sems, b, d, m,
                 M=M, O=O, D=D, rows=rows, n=n, zeros=zeros)
    _fill_im2col(im2col_ref, slots_ref, d,
                 M=M, O=O, D=D, Wp=Wp, p=p, C=C, zeros=zeros)
    acc = jnp.dot(im2col_ref[:, :], w_ref[:, :],
                  preferred_element_type=jnp.float32)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _dw_kernel(xq_ref, ct_ref, dw_ref, im2col_ref, slots_ref, sems, acc_ref, *,
               M, O, D, Wp, p, C, rows, n, zeros):
    b, d, m = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when((b == 0) & (d == 0) & (m == 0))
    def _init():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    _dma_windows(xq_ref, slots_ref, sems, b, d, m,
                 M=M, O=O, D=D, rows=rows, n=n, zeros=zeros)
    _fill_im2col(im2col_ref, slots_ref, d,
                 M=M, O=O, D=D, Wp=Wp, p=p, C=C, zeros=zeros)
    acc_ref[:, :] += jax.lax.dot_general(
        im2col_ref[:, :], ct_ref[0, 0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    last = ((b == pl.num_programs(0) - 1) & (d == D - 1)
            & (m == pl.num_programs(2) - 1))

    @pl.when(last)
    def _flush():
        dw_ref[:, :] = acc_ref[:, :]


def _common_specs(p, M, O, U, C, Cout, dtype):
    xp_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    w_spec = pl.BlockSpec((9 * U * C, p * Cout), lambda b, d, m: (0, 0),
                          memory_space=pltpu.VMEM)
    io_spec = pl.BlockSpec((1, 1, M, p * Cout), lambda b, d, m: (b, d, m, 0),
                           memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((M, 9 * U * C), dtype),
        pltpu.VMEM((3, M + 2 * O, p * C), dtype),
        pltpu.SemaphoreType.DMA((3, 3)),
    ]
    return xp_spec, w_spec, io_spec, scratch


def _conv_pallas_raw(x, w, padding_mode: str):
    B, D, H, W, C = x.shape
    Cout = w.shape[-1]
    p, U, Wp, M = _geometry(H, W, C)
    O = -(-(2 * Wp + 2) // 8) * 8  # 8-aligned DMA window
    zeros = padding_mode != "circular"
    rows = H * W // p
    n = rows // M
    xq = x.reshape(B, D, rows, p * C)  # free view, no copy
    wq = _pack_weights(w, p, x.dtype)
    xp_spec, w_spec, io_spec, scratch = _common_specs(p, M, O, U, C, Cout, x.dtype)

    kernel = functools.partial(
        _fwd_kernel, M=M, O=O, D=D, Wp=Wp, p=p, C=C, rows=rows, n=n,
        zeros=zeros)
    out = pl.pallas_call(
        kernel,
        grid=(B, D, n),
        in_specs=[xp_spec, w_spec],
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct((B, D, rows, p * Cout), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * H * W * 9 * U * C * Cout,
            bytes_accessed=3 * B * D * H * W * C * x.dtype.itemsize
            + B * D * H * W * Cout * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xq, wq)
    return out.reshape(B, D, H, W, Cout)


def _conv_pallas_dw(x, ct, padding_mode: str, w_dtype):
    """dL/dw for the k3/s1 SAME conv: sum over voxels of im2col^T @ ct."""
    B, D, H, W, C = x.shape
    Cout = ct.shape[-1]
    p, U, Wp, M = _geometry(H, W, C)
    O = -(-(2 * Wp + 2) // 8) * 8  # 8-aligned DMA window
    zeros = padding_mode != "circular"
    rows = H * W // p
    n = rows // M
    xq = x.reshape(B, D, rows, p * C)  # free view, no copy
    ctq = ct.astype(x.dtype).reshape(B, D, rows, p * Cout)
    xp_spec, _, io_spec, scratch = _common_specs(p, M, O, U, C, Cout, x.dtype)
    scratch = scratch + [pltpu.VMEM((9 * U * C, p * Cout), jnp.float32)]

    kernel = functools.partial(
        _dw_kernel, M=M, O=O, D=D, Wp=Wp, p=p, C=C, rows=rows, n=n,
        zeros=zeros)
    dwq = pl.pallas_call(
        kernel,
        grid=(B, D, n),
        in_specs=[xp_spec, io_spec],
        out_specs=pl.BlockSpec((9 * U * C, p * Cout), lambda b, d, m: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * U * C, p * Cout), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * H * W * 9 * U * C * Cout,
            bytes_accessed=4 * B * D * H * W * C * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xq, ctq)
    return _unpack_dw(dwq, p, C, Cout, w_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_pallas(x, w, padding_mode: str = "circular"):
    """SAME 3x3x3 stride-1 conv, channels-last (B, D, H, W, Cin) bf16/f32.
    ``w``: (3, 3, 3, Cin, Cout). Circular or zeros padding. Use
    :func:`supports` to check applicability first."""
    return _conv_pallas_raw(x, w.astype(x.dtype), padding_mode)


def _fwd(x, w, padding_mode):
    return conv3d_pallas(x, w, padding_mode), (x, w)


def _bwd(padding_mode, res, ct):
    x, w = res
    # dx: transpose of a SAME k3/s1 conv = conv of ct with the spatially
    # flipped, in/out-transposed kernel, same padding family.
    w_t = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    dx = _conv_pallas_raw(ct.astype(x.dtype), w_t.astype(x.dtype), padding_mode)
    dw = _conv_pallas_dw(x, ct, padding_mode, w.dtype)
    return dx.astype(x.dtype), dw


conv3d_pallas.defvjp(_fwd, _bwd)
