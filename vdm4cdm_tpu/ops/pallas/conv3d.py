"""Pallas TPU kernel: thin-channel 3x3x3 convolution via banded packed GEMMs.

Why this exists (measured, experiments/microbench_ops.py): XLA lowers a
channels-last conv3d with Cin=Cout=32 to per-tap GEMMs with K=N=32, using a
sliver of the MXU — ~10 TFLOP/s at 128^3 where a 128-channel conv hits 103.
The reference's flagship 3D UNets (chs [32,64,128,256] at 128^3, reference
trainVDM3D128_c_c, configs.yaml:1-18) spend most of their step time in exactly
these thin convolutions. On this platform the binding resource is measured
HBM bandwidth (~150 GB/s ceiling under XLA, ~95 GB/s through Pallas block
pipelines — see docs/DESIGN.md), so the kernel is organized to move each
input byte ~(dT+2)/dT times instead of 3x.

Design v2 (TPU-first, no reference analog — the reference delegates to cuDNN):

  * each D-plane is viewed FLAT and CHANNEL-PACKED: ``(H*W/p, p*C)`` with
    the smallest p in {1,2,4,8} making p*C a multiple of 128 — a free
    row-major reshape that makes the lane dimension dense (the natural
    ``(..., W, 32)`` layout wastes 3/4 of every byte moved on lane padding).
    One packed row y*(W/p) + s holds the p voxels w = s*p + j;
  * per grid step, a block of dT consecutive output planes is computed from
    dT+2 FULL-PLANE windows (rows + 2*O each) DMA'd from the UNPADDED packed
    planes in HBM. Window row indices wrap mod the plane (= the circular y
    boundary); the plane index wraps mod D (= the circular z boundary).
    Zeros mode instead zeroes the O-overlap rows and skips the wrapped
    boundary planes' GEMMs;
  * v3 (round 3): the windows live in a RING of 2*dT+2 slots (slot of plane
    g is (g+1) mod R). Consecutive blocks share two boundary planes — those
    slots are simply kept, so each grid step DMAs only the dT NEW planes, and
    it issues them for block dd+1 BEFORE computing block dd (the start is
    waited at the top of the next step). HBM reads drop from (dT+2)/dT x the
    volume (v2) to ~1.0x, and the window DMAs overlap the GEMMs instead of
    serializing with them (measured ~40% of v2 kernel runtime). Only the
    first block of each batch element pays a cold synchronous fill;
  * the 27 taps factor into 9 (dz, dy) pairs x 3 in-row w-taps. For each
    (dz, dy), ONE banded GEMM  A @ Wq  with A = (rows, p*C) of the window at
    static row offset (dy-1)*W/p and Wq (p*C, p*Cout) holding w[dz,dy,kx] on
    band (j+kx-1) -> j (K = p*C >= 128, N = p*Cout: full MXU tiles, no
    copies — v1's im2col materialization is gone, see git history). The two
    cross-row taps (output slot j=0 needs voxel w-1 from the previous row's
    last lane block; j=p-1 needs w+1 from the next row's first block) become
    two thin (rows, C) edge copies — the only place the helical-vs-periodic
    w-wrap needs fixing (a masked select from +-W/p rows away) — batched
    per dz across the 3 dy into two (rows, 3*C) scratches and per-dz edge
    GEMMs with K = 3*C (chunked per dz in round 3: the earlier (rows, 9*C)
    batch overflowed the VMEM budget at the decoder's concat widths, cin
    64-96 at 128^3, silently dropping the whole decoder to the XLA path);
  * backward: dx is the same kernel with spatially-flipped, io-transposed
    weights (transpose of a SAME k3/s1 conv; circular stays circular), and
    dw accumulates the SAME banded/edge GEMM structure transposed (K = rows:
    full MXU) into f32 scratches across the sequential grid, un-banded on
    the host — wired via jax.custom_vjp.

Scope: 3D, kernel 3^3, stride 1, circular or zeros padding, full plane in
VMEM. Anything else falls back to the XLA path in ops/conv.py (which is also
the oracle for the equivalence tests in tests/test_pallas_conv3d.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM working-set budget (bytes) for tile sizing. Env-tunable.
import os as _os

_VMEM_BUDGET = int(_os.environ.get("VDM4CDM_PALLAS_CONV_MB", "40")) * 1024 * 1024
# Scoped-VMEM ceiling handed to Mosaic. v5e has 128 MB physical VMEM; the
# 64 MB default is too tight for the decoder widths because Mosaic's stack
# materializes dynamic-slot window slices (measured: the 96->32 kernel's
# stack alone is ~80 MB with scratch included). 100 MB leaves room for the
# double-buffered in/out blocks outside the scope.
_VMEM_LIMIT = int(_os.environ.get("VDM4CDM_PALLAS_CONV_LIMIT_MB", "100")) * 1024 * 1024


def _pack_factor(W: int, C: int):
    # smallest pack factor whose packed row is a whole number of 128-lane
    # tiles; smallest minimizes the band-zero flop redundancy
    for p in (1, 2, 4, 8):
        if (p * C) % 128 == 0 and W % p == 0:
            return p
    return None


def _edge_cache_len(rows: int, Wp: int) -> int:
    """Sublane-padded length of the per-slot edge cache (rows + 2*Wp window
    rows, see _fill_edge_cache)."""
    return -(-(rows + 2 * Wp) // 8) * 8


def _tile_bytes(dT: int, rows: int, O: int, p: int, C: int, Cout: int,
                itemsize: int, stats: bool = False, cache_Wp: int = 0):
    slots = (2 * dT + 2) * (rows + 2 * O) * p * C * itemsize
    acc = rows * p * Cout * 4
    edges = 2 * rows * 3 * C * itemsize
    out_blk = 2 * dT * rows * p * Cout * itemsize
    wq = 9 * p * C * p * Cout * itemsize + 2 * 9 * C * Cout * itemsize
    # Mosaic stack temps the kernel body keeps live: the f32 dot result being
    # accumulated, plus the edge-select working set (wcol iota + two selects)
    temps = rows * p * Cout * 4 + 12 * rows * C
    if stats:
        # bias-added f32 block + the squared temp feeding the sums reduction
        temps += 2 * rows * p * Cout * 4
    if cache_Wp:
        # per-slot precomputed lo/hi edge columns (ring-resident, see
        # _fill_edge_cache): 2 buffers of (2*dT+2, cache_len, C)
        slots += 2 * (2 * dT + 2) * _edge_cache_len(rows, cache_Wp) * C * itemsize
    return slots + acc + edges + out_blk + wq + temps


def _geometry(D: int, H: int, W: int, C: int, Cout: int, itemsize: int = 2,
              p_override: int = None, stats: bool = False):
    """(p, Wp, dT): packed layout + planes per grid step (full-plane tiles).
    ``p_override``: honor a caller-chosen pack factor (packed carriers keep a
    level-wide p even where the canonical per-C factor would differ).
    ``stats``: size for the bias+stats-emitting forward variant (extra f32
    temps per output block)."""
    p = p_override or _pack_factor(W, C)
    if p is None or (p * C) % 128 or W % p:
        return None, None, None
    Wp = W // p
    rows = H * Wp
    if rows % 8:
        return None, None, None
    O = -(-(2 * Wp + 2) // 8) * 8
    # dT capped at 4: the kernel body unrolls 9*dT GEMMs + 18*dT edge copies,
    # and Mosaic compile time explodes past that (dT=8 measured >15 min).
    dT = None
    for cand in (1, 2, 4):
        if D % cand:
            continue
        if _tile_bytes(cand, rows, O, p, C, Cout, itemsize, stats) <= _VMEM_BUDGET:
            dT = cand
    return p, Wp, dT


_EDGE_CACHE_ENV = _os.environ.get("VDM4CDM_CONV_EDGE_CACHE", "0")


def _use_edge_cache(dT: int, rows: int, O: int, Wp: int, p: int, C: int,
                    Cout: int, itemsize: int, stats: bool) -> bool:
    """Per-slot edge-operand caching (see _fill_edge_cache) — measured and
    kept OPT-IN OFF: at the flagship 128^3 step the cached variant benched
    5.768 vs 6.053 Mvox/s back-to-back (-4.7%; the per-consume selects were
    already hidden under the MXU pipeline, while the fills serialize at
    DMA-wait time and the extra ring scratch raises Mosaic stack pressure —
    the decoder dx kernel needed the scoped-vmem limit raised to compile).
    Env A/B: VDM4CDM_CONV_EDGE_CACHE=0|1|auto ("auto": ON whenever the extra
    ring scratch still fits the VMEM budget at the SAME dT — the cache must
    never shrink the plane block)."""
    if _EDGE_CACHE_ENV == "0":
        return False
    if _EDGE_CACHE_ENV == "1":
        return True
    return _tile_bytes(dT, rows, O, p, C, Cout, itemsize, stats,
                       cache_Wp=Wp) <= _VMEM_BUDGET


def supports(x_shape: Tuple[int, ...], w_shape: Tuple[int, ...], stride,
             itemsize: int = 2) -> bool:
    """Can the Pallas path handle this conv? (3D, k=3, s=1, packable chans.)
    ``itemsize``: activation element size in bytes — tile sizing (dT) depends
    on it, so callers must pass the real dtype's itemsize."""
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
    p, Wp, dT = _geometry(D, H, W, cin, cout, itemsize=itemsize)
    if dT is None or p * cout > 512:
        return False
    # forward geometry only: the custom_vjp's dx runs the SAME kernel with
    # io-transposed weights when the transposed geometry (cout -> cin) packs,
    # and otherwise falls back to one XLA conv (_transposed_ok / _bwd) — a
    # 16->24 conv stays on the fast forward even though 24 has no pack factor
    return True


def _transposed_ok(D, H, W, cin, cout, itemsize, p_override=None) -> bool:
    """Does the dx kernel's geometry (cout -> cin, io-transposed) pack?"""
    p, _, dT = _geometry(D, H, W, cout, cin, itemsize=itemsize,
                         p_override=p_override)
    return dT is not None and p * cin <= 512


def _conv_xla_fallback(x, w, padding_mode: str, z_same: bool = True):
    """dx fallback when the transposed banded geometry doesn't pack: one XLA
    conv with the kernel's exact semantics — SAME in-plane (circular wraps,
    zeros pads), SAME or VALID (pre-haloed) in z."""
    zp = (1, 1) if z_same else (0, 0)
    if padding_mode == "circular":
        x = jnp.pad(x, ((0, 0), zp, (1, 1), (1, 1), (0, 0)), mode="wrap")
        pads = [(0, 0)] * 3
    else:
        pads = [zp, (1, 1), (1, 1)]
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def _pack_weights(w, p: int, dtype):
    """w (3,3,3,C,Cout) -> (wq (9, pC, pCout) banded, w_lo (9C, Cout),
    w_hi (9C, Cout)). Band: output slot j takes in-row tap kx from input slot
    u = j + kx - 1 when 0 <= u <= p-1; u = -1 / p are the edge GEMMs."""
    C, Cout = w.shape[3], w.shape[4]
    wf = w.reshape(9, 3, C, Cout)
    wq = jnp.zeros((9, p * C, p * Cout), w.dtype)
    for j in range(p):
        for kx in range(3):
            u = j + kx - 1
            if 0 <= u <= p - 1:
                wq = wq.at[:, u * C:(u + 1) * C,
                           j * Cout:(j + 1) * Cout].set(wf[:, kx])
    w_lo = wf[:, 0].reshape(9 * C, Cout)   # tap kx=0 feeding slot j=0
    w_hi = wf[:, 2].reshape(9 * C, Cout)   # tap kx=2 feeding slot j=p-1
    return wq.astype(dtype), w_lo.astype(dtype), w_hi.astype(dtype)


def _unpack_dw(dwq, dwlo, dwhi, p: int, C: int, Cout: int, w_dtype):
    """Inverse of _pack_weights for gradients: sum the band diagonals."""
    g = dwq.reshape(3, 3, p * C, p, Cout)        # (dz, dy, u*C+ci, j, co)
    taps = []
    for kx in range(3):
        acc = None
        for j in range(p):
            u = j + kx - 1
            if 0 <= u <= p - 1:
                term = g[:, :, u * C:(u + 1) * C, j, :]
                acc = term if acc is None else acc + term
        if acc is None:
            acc = jnp.zeros((3, 3, C, Cout), dwq.dtype)
        taps.append(acc)
    taps[0] = taps[0] + dwlo.reshape(3, 3, C, Cout)
    taps[2] = taps[2] + dwhi.reshape(3, 3, C, Cout)
    return jnp.stack(taps, axis=2).astype(w_dtype)  # (3, 3, 3, C, Cout)


def _plane_copies(xq_ref, slots_ref, sems, b, dplane, slot, *, O, rows):
    """Copy descriptors for input plane ``dplane`` of batch b into ring slot
    ``slot``: three segments (O | rows | O) whose row indices wrap mod the
    plane — the wrap segments ARE the circular y boundary. Start/wait are the
    caller's."""
    out = []
    for s, (src, dst, size) in enumerate((
        (rows - O, 0, O),
        (0, O, rows),
        (0, O + rows, O),
    )):
        out.append(pltpu.make_async_copy(
            xq_ref.at[b, dplane, pl.ds(pl.multiple_of(src, 8), size), :],
            slots_ref.at[slot, pl.ds(dst, size), :],
            sems.at[slot, s],
        ))
    return out


def _zero_overlap(slots_ref, slot, O, rows):
    """Zeros-padding: the O-overlap rows are exactly the wrapped y rows."""
    slots_ref[slot, 0:O, :] = jnp.zeros_like(slots_ref[slot, 0:O, :])
    slots_ref[slot, O + rows:, :] = jnp.zeros_like(slots_ref[slot, O + rows:, :])


def _fill_edge_cache(slots_ref, elo_ref, ehi_ref, sl, *, O, Wp, p, C, rows,
                     zeros):
    """Precompute one plane's cross-row edge operands ONCE into ring-resident
    scratch (the plane is re-read by up to 3 consuming output blocks as
    dz = 0/1/2 — computing the operands at consume time re-did the iota +
    masked selects 3x per plane: the 'VPU edge fill' cost of ROADMAP item 2).

    Layout: index k holds the operand for OUTPUT window row r = k + O - Wp,
    k in [0, rows + 2*Wp) — the union of the 3 dy parts' row ranges; the
    consume-side operand for dy part ``dyi`` is the STATIC slice
    [dyi*Wp, dyi*Wp + rows), so the hot loop does no selects at all.
      lo[k] = slots[r-1, last lane block]  (slot j=0's w-1 voxel), helical
              wrap fixed where k % Wp == 0 -> slots[r-1+Wp] (zeros mode: 0);
      hi[k] = slots[r+1, first lane block] (slot j=p-1's w+1 voxel), fixed
              where k % Wp == Wp-1 -> slots[r+1-Wp] (zeros mode: 0)."""
    Lw = rows + 2 * Wp
    lanes_last = slice((p - 1) * C, p * C)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (Lw, C), 0) % Wp
    lo = slots_ref[sl, O - Wp - 1:O + Wp + rows - 1, lanes_last]
    if zeros:
        lo = jnp.where(kcol == 0, 0, lo)
    else:
        lo = jnp.where(
            kcol == 0,
            slots_ref[sl, O - 1:O + 2 * Wp + rows - 1, lanes_last], lo)
    elo_ref[sl, 0:Lw, :] = lo
    hi = slots_ref[sl, O - Wp + 1:O + Wp + rows + 1, 0:C]
    if zeros:
        hi = jnp.where(kcol == Wp - 1, 0, hi)
    else:
        hi = jnp.where(
            kcol == Wp - 1,
            slots_ref[sl, O - 2 * Wp + 1:O + rows + 1, 0:C], hi)
    ehi_ref[sl, 0:Lw, :] = hi


def _ring_windows(xq_ref, slots_ref, sems, b, dd, n_dd, *, dT, O, D, rows,
                  zeros, zmode="wrap", edge=None):
    """Ring-buffered window management for grid step (b, dd); returns nothing,
    leaves block dd's dT+2 windows ready in slots (dd*dT + pz) mod R.

    Block dd consumes logical planes [dd*dT - 1, dd*dT + dT]; slot of plane g
    is (g + 1) mod R with R = 2*dT + 2, so consecutive blocks KEEP their two
    shared boundary planes and only the dT new planes move. The new planes
    for block dd+1 are issued here, BEFORE block dd's GEMMs run, and waited
    at the top of step dd+1 — DMA rides under compute. Slot ranges never
    collide: block dd occupies dT+2 consecutive slots mod R, the prefetch the
    next dT — together exactly R. The first block of each batch element
    (dd == 0) performs a cold synchronous fill of all dT+2 windows.

    zmode: "wrap" — logical plane g reads input plane g mod D (periodic z, or
    zeros z via _dz_pred skipping); "halo" — the input carries D+2 planes
    (pre-exchanged z halos, parallel/halo.py), logical plane g reads input
    plane g+1 and no plane ever wraps or is skipped.

    edge: optional (elo_ref, ehi_ref, Wp, p, C) — fill each newly arrived
    plane's edge-operand cache right after its DMA lands (and after the
    zeros-mode overlap zeroing, which the fill reads)."""
    R = 2 * dT + 2

    def copies_for(block, pz):
        g = block * dT + pz - 1
        dplane = (g + 1) if zmode == "halo" else jax.lax.rem(g + D, D)
        slot = jax.lax.rem(block * dT + pz, R)
        return _plane_copies(xq_ref, slots_ref, sems, b, dplane, slot,
                             O=O, rows=rows)

    def fill_edges(pz):
        if edge is None:
            return
        elo_ref, ehi_ref, Wp, p, C = edge
        _fill_edge_cache(slots_ref, elo_ref, ehi_ref,
                         jax.lax.rem(dd * dT + pz, R),
                         O=O, Wp=Wp, p=p, C=C, rows=rows, zeros=zeros)

    # prefetch the NEXT block's dT new planes first (targets are disjoint
    # from everything read or awaited this step)
    @pl.when(dd < n_dd - 1)
    def _prefetch():
        for pz in range(2, dT + 2):
            for cp in copies_for(dd + 1, pz):
                cp.start()

    @pl.when(dd == 0)
    def _cold():
        for pz in range(dT + 2):
            for cp in copies_for(dd, pz):
                cp.start()
        for pz in range(dT + 2):
            for cp in copies_for(dd, pz):
                cp.wait()
        if zeros:
            for pz in range(dT + 2):
                _zero_overlap(slots_ref, jax.lax.rem(dd * dT + pz, R), O, rows)
        for pz in range(dT + 2):
            fill_edges(pz)

    @pl.when(dd > 0)
    def _steady():
        for pz in range(2, dT + 2):
            for cp in copies_for(dd, pz):
                cp.wait()
        if zeros:
            for pz in range(2, dT + 2):
                _zero_overlap(slots_ref, jax.lax.rem(dd * dT + pz, R), O, rows)
        for pz in range(2, dT + 2):
            fill_edges(pz)


def _dz_pred(dd, di, dz, dT, n_dd, zeros, zmode="wrap"):
    """Skip predicate for zeros mode at the z boundary; None = never skip.
    Static in di/dz: only the first/last plane of the first/last block can
    read a wrapped plane. Halo zmode never skips — the exchanged halo planes
    carry the true z boundary (zeros arrive as ppermute's zero fill)."""
    if zmode == "halo" or not zeros or dz == 1:
        return None
    if dz == 0 and di == 0:
        return dd != 0
    if dz == 2 and di == dT - 1:
        return dd != n_dd - 1
    return None


def _edge_operands_dz(slots_ref, sl, *, O, Wp, p, C, rows, zeros):
    """The cross-row edge operands for one input plane (ring slot ``sl``), as
    SSA VALUES, one (rows, C) part per dy: slot j=0's w-1 voxel (previous
    row, last lane block) and slot j=p-1's w+1 voxel (next row, first block),
    with the helical w-wrap fixed by a masked select +-Wp rows away (zeroed
    for zeros padding). Chunked per dz (round 3; was one (rows, 9C) scratch
    batch): the 9C scratch overflowed the VMEM budget at the decoder's concat
    widths (cin 64-96 at 128^3), silently dropping the whole decoder off the
    fast path (HLO byte audit, DESIGN §7) — and the scratch-reuse rewrite of
    the per-dz chunks miscompiled on Mosaic (fill -> GEMM -> overwrite per
    chunk), so the operands are built as values instead. The parts are
    returned UNCONCATENATED: when Wp is not 8-aligned the per-dy slices start
    at different sublane offsets (bases O ± Wp, shifted ± 1 row) and Mosaic's
    tpu.concatenate rejects operands with mismatched non-concat-dim offsets
    ("result/input offset mismatch", real-TPU compile at small shapes —
    interpret mode tolerates it). The consumers concat + single-GEMM when
    Wp % 8 == 0 (equal offsets; K=3C keeps the MXU fed — the per-part K=C
    variant measured a 9% flagship step regression) and fall back to
    per-part GEMMs otherwise."""
    lanes_last = slice((p - 1) * C, p * C)
    wcol = jax.lax.broadcasted_iota(jnp.int32, (rows, C), 0) % Wp
    lo_parts, hi_parts = [], []
    for dyi in range(3):
        base = O + (dyi - 1) * Wp
        lo = slots_ref[sl, base - 1:base + rows - 1, lanes_last]
        if zeros:
            lo = jnp.where(wcol == 0, 0, lo)
        else:
            lo = jnp.where(
                wcol == 0,
                slots_ref[sl, base - 1 + Wp:base + rows - 1 + Wp,
                          lanes_last],
                lo)
        lo_parts.append(lo)
        hi = slots_ref[sl, base + 1:base + rows + 1, 0:C]
        if zeros:
            hi = jnp.where(wcol == Wp - 1, 0, hi)
        else:
            hi = jnp.where(
                wcol == Wp - 1,
                slots_ref[sl, base + 1 - Wp:base + rows + 1 - Wp, 0:C],
                hi)
        hi_parts.append(hi)
    return lo_parts, hi_parts


def _fwd_kernel(*refs, dT, O, D, Wp, p, C, Cout, rows, zeros, zmode="wrap",
                has_bias=False, with_stats=False, edge_cache=False):
    # positional refs vary with the (static) has_bias/with_stats/edge_cache
    # flags:
    #   inputs:  xq, wq, wlo, whi, [bias]
    #   outputs: out, [sums]
    #   scratch: slots, sems, acc, [sacc], [elo, ehi]
    it = iter(refs)
    xq_ref, wq_ref, wlo_ref, whi_ref = (next(it) for _ in range(4))
    bias_ref = next(it) if has_bias else None
    out_ref = next(it)
    sums_ref = next(it) if with_stats else None
    slots_ref, sems, acc_ref = (next(it) for _ in range(3))
    sacc_ref = next(it) if with_stats else None
    edge = ((next(it), next(it), Wp, p, C) if edge_cache else None)

    b, dd = pl.program_id(0), pl.program_id(1)
    n_dd = pl.num_programs(1)
    R = 2 * dT + 2
    _ring_windows(xq_ref, slots_ref, sems, b, dd, n_dd,
                  dT=dT, O=O, D=D, rows=rows, zeros=zeros, zmode=zmode,
                  edge=edge)
    if with_stats:
        @pl.when(dd == 0)
        def _():
            sacc_ref[:, :] = jnp.zeros_like(sacc_ref)
    for di in range(dT):
        acc_ref[:, :] = jnp.zeros_like(acc_ref)
        for dz in range(3):
            pred = _dz_pred(dd, di, dz, dT, n_dd, zeros, zmode)

            def chunk(_dz=dz):
                sl = jax.lax.rem(dd * dT + di + _dz, R)
                if edge_cache:
                    elo_ref, ehi_ref = edge[0], edge[1]
                    elo = [elo_ref[sl, dyi * Wp:dyi * Wp + rows, :]
                           for dyi in range(3)]
                    ehi = [ehi_ref[sl, dyi * Wp:dyi * Wp + rows, :]
                           for dyi in range(3)]
                else:
                    elo, ehi = _edge_operands_dz(
                        slots_ref, sl, O=O, Wp=Wp, p=p, C=C, rows=rows,
                        zeros=zeros)
                if Wp % 8 == 0:  # equal sublane offsets: one K=3C GEMM
                    elo = [jnp.concatenate(elo, axis=1)]
                    ehi = [jnp.concatenate(ehi, axis=1)]
                kc = 3 * C if Wp % 8 == 0 else C
                for dyi in range(len(elo)):
                    k = _dz * 3 * C + dyi * kc
                    acc_ref[:, 0:Cout] += jax.lax.dot_general(
                        elo[dyi], wlo_ref[k:k + kc, :],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc_ref[:, (p - 1) * Cout:p * Cout] += (
                        jax.lax.dot_general(
                            ehi[dyi], whi_ref[k:k + kc, :],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32))
                for dyi in range(3):
                    base = O + (dyi - 1) * Wp
                    acc_ref[:, :] += jax.lax.dot_general(
                        slots_ref[sl, base:base + rows, :],
                        wq_ref[_dz * 3 + dyi],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

            if pred is None:
                chunk()
            else:
                pl.when(pred)(chunk)
        ob = acc_ref[:, :]
        if has_bias:
            ob = ob + bias_ref[0:1, :]
        out_ref[0, di] = ob.astype(out_ref.dtype)
        if with_stats:
            # per-lane (sum y, sum y^2) of the f32 pre-cast output — feeds
            # GroupNorm's statistics so the norm kernel skips its stats sweep
            sacc_ref[0:1, :] += jnp.sum(ob, axis=0, keepdims=True)
            sacc_ref[1:2, :] += jnp.sum(ob * ob, axis=0, keepdims=True)
    if with_stats:
        @pl.when(dd == n_dd - 1)
        def _():
            sums_ref[0, :, :] = sacc_ref[:, :]


def _dw_kernel(*refs, dT, O, D, Wp, p, C, Cout, rows, zeros, zmode="wrap",
               edge_cache=False):
    it = iter(refs)
    (xq_ref, ct_ref, dwq_ref, dwlo_ref, dwhi_ref, dbl_ref,
     slots_ref, sems,
     accq_ref, acclo_ref, acchi_ref, accb_ref) = (next(it) for _ in range(12))
    edge = ((next(it), next(it), Wp, p, C) if edge_cache else None)
    b, dd = pl.program_id(0), pl.program_id(1)
    n_dd = pl.num_programs(1)
    R = 2 * dT + 2

    @pl.when((b == 0) & (dd == 0))
    def _init():
        accq_ref[:, :, :] = jnp.zeros_like(accq_ref)
        acclo_ref[:, :] = jnp.zeros_like(acclo_ref)
        acchi_ref[:, :] = jnp.zeros_like(acchi_ref)
        accb_ref[:, :] = jnp.zeros_like(accb_ref)

    _ring_windows(xq_ref, slots_ref, sems, b, dd, n_dd,
                  dT=dT, O=O, D=D, rows=rows, zeros=zeros, zmode=zmode,
                  edge=edge)
    for di in range(dT):
        ct = ct_ref[0, di]
        # bias gradient rides along: per-lane column sums of ct, folded to
        # (Cout,) on the host — saves the separate XLA reduction pass over ct
        # for the bias-folded conv entries (the older entries discard it and
        # let autodiff of the outer `out + b` handle the bias).
        accb_ref[0:1, :] += jnp.sum(ct.astype(jnp.float32), axis=0,
                                    keepdims=True)
        for dz in range(3):
            pred = _dz_pred(dd, di, dz, dT, n_dd, zeros, zmode)

            def chunk(_dz=dz):
                sl = jax.lax.rem(dd * dT + di + _dz, R)
                if edge_cache:
                    elo_ref, ehi_ref = edge[0], edge[1]
                    elo = [elo_ref[sl, dyi * Wp:dyi * Wp + rows, :]
                           for dyi in range(3)]
                    ehi = [ehi_ref[sl, dyi * Wp:dyi * Wp + rows, :]
                           for dyi in range(3)]
                else:
                    elo, ehi = _edge_operands_dz(
                        slots_ref, sl, O=O, Wp=Wp, p=p, C=C, rows=rows,
                        zeros=zeros)
                for dyi in range(3):
                    base = O + (dyi - 1) * Wp
                    accq_ref[_dz * 3 + dyi] += jax.lax.dot_general(
                        slots_ref[sl, base:base + rows, :], ct,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                if Wp % 8 == 0:  # equal sublane offsets: one M=3C GEMM
                    elo = [jnp.concatenate(elo, axis=1)]
                    ehi = [jnp.concatenate(ehi, axis=1)]
                kc = 3 * C if Wp % 8 == 0 else C
                for dyi in range(len(elo)):
                    k = _dz * 3 * C + dyi * kc
                    acclo_ref[k:k + kc, :] += jax.lax.dot_general(
                        elo[dyi], ct[:, 0:Cout],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acchi_ref[k:k + kc, :] += jax.lax.dot_general(
                        ehi[dyi], ct[:, (p - 1) * Cout:p * Cout],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

            if pred is None:
                chunk()
            else:
                pl.when(pred)(chunk)

    last = (b == pl.num_programs(0) - 1) & (dd == n_dd - 1)

    @pl.when(last)
    def _flush():
        dwq_ref[:, :, :] = accq_ref[:, :, :]
        dwlo_ref[:, :] = acclo_ref[:, :]
        dwhi_ref[:, :] = acchi_ref[:, :]
        dbl_ref[:, :] = accb_ref[:, :]


def _conv_pallas_raw_packed(xq, w, padding_mode: str, spatial, zmode="wrap",
                            bias=None, with_stats=False):
    """Packed-in/packed-out core: xq (B, D_in, H*W/p, p*C) channel-packed rows.
    Returns (B, D, H*W/p, p*Cout) with D = spatial[0] the OUTPUT plane count
    (zmode "wrap": D_in == D; zmode "halo": D_in == D + 2 pre-haloed planes).
    The packed form is the kernel's native layout — models that keep
    activations packed between ops skip the (physical, on padded-lane
    layouts) reshape copies entirely. The pack factor comes from the carrier
    (xq's lane count / Cin).

    ``bias``: optional (Cout,) f32 folded into the output IN-KERNEL (the
    outer `out + b` add is otherwise a standalone HBM read+write pass — XLA
    cannot fuse an elementwise epilogue into a custom call). ``with_stats``:
    additionally emit per-lane (B, 2, p*Cout) f32 (sum y, sum y^2) of the
    pre-cast f32 output, accumulated across the grid — GroupNorm statistics
    for free, so the downstream fused-norm skips its stats sweep (ROADMAP
    round-3 item 1a: conv-emitted GN statistics); returns (out, sums)."""
    D, H, W = spatial
    B = xq.shape[0]
    C = w.shape[3]
    Cout = w.shape[-1]
    p_in = xq.shape[-1] // C
    p, Wp, dT = _geometry(D, H, W, C, Cout, itemsize=xq.dtype.itemsize,
                          p_override=p_in, stats=with_stats)
    O = -(-(2 * Wp + 2) // 8) * 8  # 8-aligned DMA window
    zeros = padding_mode != "circular"
    rows = H * Wp
    wq, wlo, whi = _pack_weights(w, p, xq.dtype)
    has_bias = bias is not None
    edge_cache = _use_edge_cache(dT, rows, O, Wp, p, C, Cout,
                                 xq.dtype.itemsize, with_stats)

    kernel = functools.partial(
        _fwd_kernel, dT=dT, O=O, D=D, Wp=Wp, p=p, C=C, Cout=Cout, rows=rows,
        zeros=zeros, zmode=zmode, has_bias=has_bias, with_stats=with_stats,
        edge_cache=edge_cache)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((9, p * C, p * Cout), lambda b, dd: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9 * C, Cout), lambda b, dd: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9 * C, Cout), lambda b, dd: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [xq, wq, wlo, whi]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, p * Cout), lambda b, dd: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.tile(bias.astype(jnp.float32), p)[None, :])
    out_specs = [pl.BlockSpec((1, dT, rows, p * Cout),
                              lambda b, dd: (b, dd, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((B, D, rows, p * Cout), xq.dtype)]
    scratch = [
        pltpu.VMEM((2 * dT + 2, rows + 2 * O, p * C), xq.dtype),
        pltpu.SemaphoreType.DMA((2 * dT + 2, 3)),
        pltpu.VMEM((rows, p * Cout), jnp.float32),
    ]
    if with_stats:
        out_specs.append(pl.BlockSpec((1, 2, p * Cout),
                                      lambda b, dd: (b, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, 2, p * Cout), jnp.float32))
        scratch.append(pltpu.VMEM((2, p * Cout), jnp.float32))
    if edge_cache:
        Lc = _edge_cache_len(rows, Wp)
        scratch.append(pltpu.VMEM((2 * dT + 2, Lc, C), xq.dtype))
        scratch.append(pltpu.VMEM((2 * dT + 2, Lc, C), xq.dtype))
    res = pl.pallas_call(
        kernel,
        grid=(B, D // dT),
        in_specs=in_specs,
        out_specs=out_specs if with_stats else out_specs[0],
        out_shape=out_shape if with_stats else out_shape[0],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * H * W * (9 * p + 6) * C * Cout,
            bytes_accessed=B * D * H * W * (C + Cout) * xq.dtype.itemsize,
            transcendentals=0,
        ),
    )(*args)
    return res


def _conv_pallas_raw(x, w, padding_mode: str):
    B, D, H, W, C = x.shape
    p = _pack_factor(W, C)
    xq = x.reshape(B, D, H * W // p, p * C)
    out = _conv_pallas_raw_packed(xq, w, padding_mode, (D, H, W))
    return out.reshape(B, D, H, W, w.shape[-1])


def _conv_pallas_dw(x, ct, padding_mode: str, w_dtype, p_override=None,
                    zmode="wrap"):
    """dL/dw for the k3/s1 SAME conv: the forward's banded/edge GEMM structure
    transposed (contract over voxels), accumulated across the grid in f32.
    zmode "halo": x carries D+2 pre-haloed planes for ct's D output planes."""
    B, D_in, H, W, C = x.shape
    D = D_in - 2 if zmode == "halo" else D_in
    Cout = ct.shape[-1]
    p, Wp, dT = _geometry(D, H, W, C, Cout, itemsize=x.dtype.itemsize,
                          p_override=p_override)
    O = -(-(2 * Wp + 2) // 8) * 8
    zeros = padding_mode != "circular"
    rows = H * Wp
    xq = x.reshape(B, D_in, rows, p * C)  # free view, no copy
    ctq = ct.astype(x.dtype).reshape(B, D, rows, p * Cout)
    edge_cache = _use_edge_cache(dT, rows, O, Wp, p, C, Cout,
                                 x.dtype.itemsize, False)

    kernel = functools.partial(
        _dw_kernel, dT=dT, O=O, D=D, Wp=Wp, p=p, C=C, Cout=Cout, rows=rows,
        zeros=zeros, zmode=zmode, edge_cache=edge_cache)
    scratch = [
        pltpu.VMEM((2 * dT + 2, rows + 2 * O, p * C), x.dtype),
        pltpu.SemaphoreType.DMA((2 * dT + 2, 3)),
        pltpu.VMEM((9, p * C, p * Cout), jnp.float32),
        pltpu.VMEM((9 * C, Cout), jnp.float32),
        pltpu.VMEM((9 * C, Cout), jnp.float32),
        pltpu.VMEM((1, p * Cout), jnp.float32),
    ]
    if edge_cache:
        Lc = _edge_cache_len(rows, Wp)
        scratch.append(pltpu.VMEM((2 * dT + 2, Lc, C), x.dtype))
        scratch.append(pltpu.VMEM((2 * dT + 2, Lc, C), x.dtype))
    dwq, dwlo, dwhi, dbl = pl.pallas_call(
        kernel,
        grid=(B, D // dT),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, dT, rows, p * Cout), lambda b, dd: (b, dd, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((9, p * C, p * Cout), lambda b, dd: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C, Cout), lambda b, dd: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C, Cout), lambda b, dd: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p * Cout), lambda b, dd: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, p * C, p * Cout), jnp.float32),
            jax.ShapeDtypeStruct((9 * C, Cout), jnp.float32),
            jax.ShapeDtypeStruct((9 * C, Cout), jnp.float32),
            jax.ShapeDtypeStruct((1, p * Cout), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * H * W * (9 * p + 6) * C * Cout,
            bytes_accessed=B * D * H * W * (C + Cout) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xq, ctq)
    dw = _unpack_dw(dwq, dwlo, dwhi, p, C, Cout, w_dtype)
    db = dbl.reshape(p, Cout).sum(axis=0)
    return dw, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3d_pallas_packed(xq, w, padding_mode: str, spatial):
    """SAME 3x3x3 stride-1 conv on the PACKED carrier: xq (B, D, H*W/p, p*C),
    ``w`` (3,3,3,Cin,Cout), returns (B, D, H*W/p, p*Cout). ``spatial`` is the
    static (D, H, W). Same semantics as :func:`conv3d_pallas` without the
    pack/unpack reshapes at the boundary."""
    return _conv_pallas_raw_packed(xq, w.astype(xq.dtype), padding_mode, spatial)


def _fwd_packed(xq, w, padding_mode, spatial):
    return conv3d_pallas_packed(xq, w, padding_mode, spatial), (xq, w)


def _bwd_packed(padding_mode, spatial, res, ct):
    xq, w = res
    D, H, W = spatial
    C, Cout = w.shape[3], w.shape[4]
    p = xq.shape[-1] // C
    B = xq.shape[0]
    w_t = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    ctf = ct.reshape(B, D, H, W, Cout)
    if _transposed_ok(D, H, W, C, Cout, xq.dtype.itemsize, p_override=p):
        dxq = _conv_pallas_raw_packed(ct.astype(xq.dtype),
                                      w_t.astype(xq.dtype),
                                      padding_mode, spatial)
    else:
        dx = _conv_xla_fallback(ctf.astype(xq.dtype), w_t, padding_mode)
        dxq = dx.reshape(B, D, H * W // p, p * C)
    x = xq.reshape(B, D, H, W, C)
    dw, _ = _conv_pallas_dw(x, ctf, padding_mode, w.dtype, p_override=p)
    return dxq.astype(xq.dtype), dw


conv3d_pallas_packed.defvjp(_fwd_packed, _bwd_packed)


# ------------------------------ bias-folded, stats-emitting packed entries
#
# The ResBlock-facing fast path (ops/conv.conv_packed): the bias is added
# IN-KERNEL (the outer `out + b` is otherwise a standalone HBM read+write
# pass — XLA cannot fuse elementwise epilogues into custom calls) and the
# kernel emits per-lane (sum y, sum y^2) of its f32 output for free — the
# downstream fused GroupNorm consumes them and skips its stats sweep
# (fused_norm.fused_norm_affine_packed_ext). In the backward, db comes out
# of the dw kernel's grid accumulation (no separate XLA reduction over ct).
#
# CONTRACT: the ``sums`` output exists ONLY to feed the ext fused-norm, whose
# vjp returns a zero cotangent for it (the GN dx formula already carries the
# full stats->x dependence). The bwd here accordingly IGNORES the sums
# cotangent — and the emit site (ops.conv.conv_packed) additionally wraps
# sums in lax.stop_gradient, so any other consumer gets structurally-zero
# gradients instead of silently wrong ones.
#
# PRECISION NOTE (bf16 runs): sums accumulate from the PRE-CAST f32 output,
# while the downstream ext norm normalizes the bf16-cast carrier — the stats
# are those of the exact values, not of their bf16 rounding. This is a
# deliberate precision improvement over a monolithic GN (whose own sweep
# reads bf16 x): mean/var of y and of round_bf16(y) differ by O(2^-8)
# relative, absorbed into GN's eps-scale tolerance. Pinned by
# tests/test_packed.py::test_conv_bs_sums_bf16_tolerance.


def _bs_bwd_core(padding_mode, spatial, xq, w, ct, zmode):
    """Shared backward for the _bs entries: (dxq, dw, db)."""
    D, H, W = spatial
    C, Cout = w.shape[3], w.shape[4]
    p = xq.shape[-1] // C
    B = xq.shape[0]
    w_t = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    if zmode == "halo":
        ct_pad = jnp.pad(ct.astype(xq.dtype),
                         ((0, 0), (2, 2), (0, 0), (0, 0)))
        if _transposed_ok(D + 2, H, W, C, Cout, xq.dtype.itemsize,
                          p_override=p):
            dxq = _conv_pallas_raw_packed(ct_pad, w_t.astype(xq.dtype),
                                          padding_mode, (D + 2, H, W),
                                          zmode="halo")
        else:
            ctf_pad = ct_pad.reshape(B, D + 4, H, W, Cout)
            dx = _conv_xla_fallback(ctf_pad, w_t, padding_mode, z_same=False)
            dxq = dx.reshape(B, D + 2, H * W // p, p * C)
        x = xq.reshape(B, D + 2, H, W, C)
    else:
        ctf = ct.reshape(B, D, H, W, Cout)
        if _transposed_ok(D, H, W, C, Cout, xq.dtype.itemsize, p_override=p):
            dxq = _conv_pallas_raw_packed(ct.astype(xq.dtype),
                                          w_t.astype(xq.dtype),
                                          padding_mode, spatial)
        else:
            dx = _conv_xla_fallback(ctf.astype(xq.dtype), w_t, padding_mode)
            dxq = dx.reshape(B, D, H * W // p, p * C)
        x = xq.reshape(B, D, H, W, C)
    ctf = ct.reshape(B, D, H, W, Cout)
    dw, db = _conv_pallas_dw(x, ctf, padding_mode, w.dtype, p_override=p,
                             zmode=zmode)
    return dxq.astype(xq.dtype), dw, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3d_pallas_packed_bs(xq, w, bias, padding_mode: str, spatial,
                            with_stats: bool = True):
    """:func:`conv3d_pallas_packed` with the (Cout,) bias folded in-kernel,
    returning ``(out, sums)`` where sums is the per-lane (B, 2, p*Cout) f32
    (sum y, sum y^2) of the f32 pre-cast output (see block comment above for
    the sums-gradient contract). ``with_stats=False`` keeps the in-kernel
    bias but skips the stats accumulation (smaller VMEM working set, no
    discarded HBM write) and returns the bare ``out`` — for conv sites whose
    consumer is not a GroupNorm (e.g. a ResBlock's second conv)."""
    return _conv_pallas_raw_packed(xq, w.astype(xq.dtype), padding_mode,
                                   spatial, bias=bias, with_stats=with_stats)


def _fwd_packed_bs(xq, w, bias, padding_mode, spatial, with_stats=True):
    return (conv3d_pallas_packed_bs(xq, w, bias, padding_mode, spatial,
                                    with_stats), (xq, w))


def _bwd_packed_bs(padding_mode, spatial, with_stats, res, cts):
    xq, w = res
    ct = cts[0] if with_stats else cts  # sums ct zero by the ext-norm contract
    dxq, dw, db = _bs_bwd_core(padding_mode, spatial, xq, w, ct, "wrap")
    return dxq, dw, db


conv3d_pallas_packed_bs.defvjp(_fwd_packed_bs, _bwd_packed_bs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3d_pallas_zhalo_packed_bs(xq, w, bias, padding_mode: str, spatial,
                                  with_stats: bool = True):
    """:func:`conv3d_pallas_zhalo_packed` with in-kernel bias + emitted stats:
    xq (B, D+2, H*W/p, p*Cin) pre-haloed planes, ``spatial`` the static OUTPUT
    (D, H, W); returns ``(out, sums)``. The per-shard sums feed the CP ext
    fused-norm, which psums them over the mesh axis. ``with_stats=False``:
    bias-only, returns bare ``out`` (see :func:`conv3d_pallas_packed_bs`)."""
    return _conv_pallas_raw_packed(xq, w.astype(xq.dtype), padding_mode,
                                   spatial, zmode="halo", bias=bias,
                                   with_stats=with_stats)


def _fwd_zh_packed_bs(xq, w, bias, padding_mode, spatial, with_stats=True):
    return (conv3d_pallas_zhalo_packed_bs(xq, w, bias, padding_mode, spatial,
                                          with_stats), (xq, w))


def _bwd_zh_packed_bs(padding_mode, spatial, with_stats, res, cts):
    xq, w = res
    ct = cts[0] if with_stats else cts  # sums ct zero by the ext-norm contract
    dxq, dw, db = _bs_bwd_core(padding_mode, spatial, xq, w, ct, "halo")
    return dxq, dw, db


conv3d_pallas_zhalo_packed_bs.defvjp(_fwd_zh_packed_bs, _bwd_zh_packed_bs)


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
    # flipped, in/out-transposed kernel, same padding family. Falls back to
    # one XLA conv when the transposed geometry doesn't pack (supports() only
    # requires the forward geometry).
    _, D, H, W, C = x.shape
    Cout = w.shape[-1]
    w_t = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    if _transposed_ok(D, H, W, C, Cout, x.dtype.itemsize):
        dx = _conv_pallas_raw(ct.astype(x.dtype), w_t.astype(x.dtype),
                              padding_mode)
    else:
        dx = _conv_xla_fallback(ct.astype(x.dtype), w_t, padding_mode)
    dw, _ = _conv_pallas_dw(x, ct, padding_mode, w.dtype)
    return dx.astype(x.dtype), dw


conv3d_pallas.defvjp(_fwd, _bwd)


# --------------------------------------------------- pre-haloed (sharded) form


def supports_zhalo(x_shape: Tuple[int, ...], w_shape: Tuple[int, ...],
                   itemsize: int = 2) -> bool:
    """Applicability of :func:`conv3d_pallas_zhalo`: x_shape carries D+2
    pre-haloed planes; geometry is evaluated on the D output planes."""
    if len(x_shape) != 5 or len(w_shape) != 5:
        return False
    if tuple(w_shape[:3]) != (3, 3, 3):
        return False
    B, Dh, H, W, cin = x_shape
    D = Dh - 2
    if D < 1:
        return False
    return supports((B, D, H, W, cin), w_shape, (1, 1, 1), itemsize=itemsize)


def _zhalo_raw(x, w, padding_mode: str):
    """(B, N, H, W, C) pre-haloed -> (B, N-2, H, W, Cout), z taken entirely
    from the input planes (valid-in-z), y/w boundaries per padding_mode."""
    B, Dh, H, W, C = x.shape
    p = _pack_factor(W, C)
    xq = x.reshape(B, Dh, H * W // p, p * C)
    out = _conv_pallas_raw_packed(xq, w.astype(x.dtype), padding_mode,
                                  (Dh - 2, H, W), zmode="halo")
    return out.reshape(B, Dh - 2, H, W, w.shape[-1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_pallas_zhalo(x, w, padding_mode: str = "circular"):
    """SAME-in-plane 3x3x3 conv on a PRE-HALOED volume: x (B, D+2, H, W, Cin)
    whose first/last plane are the z halos (from parallel/halo.halo_exchange
    over the ``sp`` mesh axis — periodic neighbors or ppermute zero fill), so
    the kernel never wraps the plane index. Returns (B, D, H, W, Cout).
    This is the Pallas fast path for spatially sharded (`sp`) convolutions —
    the capability the reference lacks entirely (it pins devices=1,
    trainVDM3D_c_c...:41). y/w boundaries follow ``padding_mode`` locally
    (in-plane wraps are shard-local). Check :func:`supports_zhalo` first."""
    return _zhalo_raw(x, w, padding_mode)


def _fwd_zh(x, w, padding_mode):
    return conv3d_pallas_zhalo(x, w, padding_mode), (x, w)


def _bwd_zh(padding_mode, res, ct):
    x, w = res
    # dx w.r.t. the HALOED input (D+2 planes): the transpose of valid-in-z is
    # full-in-z — pad ct by 2 zero planes each side and run the same
    # valid-in-z kernel with flipped, io-transposed weights (in-plane
    # transpose keeps the padding family, as for conv3d_pallas).
    w_t = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    ct_pad = jnp.pad(ct.astype(x.dtype),
                     ((0, 0), (2, 2), (0, 0), (0, 0), (0, 0)))
    _, D, H, W, Cout = ct.shape
    if _transposed_ok(D + 2, H, W, x.shape[-1], Cout, x.dtype.itemsize):
        dx = _zhalo_raw(ct_pad, w_t.astype(x.dtype), padding_mode)
    else:
        dx = _conv_xla_fallback(ct_pad, w_t, padding_mode, z_same=False)
    dw, _ = _conv_pallas_dw(x, ct, padding_mode, w.dtype, zmode="halo")
    return dx.astype(x.dtype), dw


conv3d_pallas_zhalo.defvjp(_fwd_zh, _bwd_zh)


# ------------------------------------- packed z-halo entry (sharded carriers)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3d_pallas_zhalo_packed(xq, w, padding_mode: str, spatial):
    """:func:`conv3d_pallas_zhalo` on the PACKED carrier: xq (B, D+2, H*W/p,
    p*Cin) whose first/last plane rows are the z halos (halo_exchange over
    the packed data's plane axis 1 — packed planes exchange exactly like
    unpacked ones, the in-plane packing is orthogonal to z). ``spatial`` is
    the static OUTPUT (D, H, W). Returns (B, D, H*W/p, p*Cout). This is what
    keeps the spatially sharded (`sp`) UNet on the packed fast path (round-3:
    sharded packed carriers). Gate with ops.packed.conv_packable on the
    LOCAL spatial."""
    return _conv_pallas_raw_packed(xq, w.astype(xq.dtype), padding_mode,
                                   spatial, zmode="halo")


def _fwd_zh_packed(xq, w, padding_mode, spatial):
    return conv3d_pallas_zhalo_packed(xq, w, padding_mode, spatial), (xq, w)


def _bwd_zh_packed(padding_mode, spatial, res, ct):
    xq, w = res
    D, H, W = spatial
    C, Cout = w.shape[3], w.shape[4]
    p = xq.shape[-1] // C
    B = xq.shape[0]
    w_t = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    # dxq w.r.t. the HALOED input (D+2 planes): transpose of valid-in-z is
    # full-in-z — pad ct by 2 zero planes each side, same valid-in-z kernel.
    ct_pad = jnp.pad(ct.astype(xq.dtype),
                     ((0, 0), (2, 2), (0, 0), (0, 0)))
    if _transposed_ok(D + 2, H, W, C, Cout, xq.dtype.itemsize, p_override=p):
        dxq = _conv_pallas_raw_packed(ct_pad, w_t.astype(xq.dtype),
                                      padding_mode, (D + 2, H, W),
                                      zmode="halo")
    else:
        ctf = ct_pad.reshape(B, D + 4, H, W, Cout)
        dx = _conv_xla_fallback(ctf, w_t, padding_mode, z_same=False)
        dxq = dx.reshape(B, D + 2, H * W // p, p * C)
    x = xq.reshape(B, D + 2, H, W, C)
    ctf = ct.reshape(B, D, H, W, Cout)
    dw, _ = _conv_pallas_dw(x, ctf, padding_mode, w.dtype, p_override=p,
                         zmode="halo")
    return dxq.astype(xq.dtype), dw


conv3d_pallas_zhalo_packed.defvjp(_fwd_zh_packed, _bwd_zh_packed)
