"""Packed activation carrier: channel-packed dense rows for the 3D hot path.

Why (measured, docs/DESIGN.md round 2): XLA stores channels-last (…, W, C)
activations with the minor dim padded to 128 lanes — a C=32 bf16 volume
occupies 4x its logical bytes in HBM, and every Pallas custom call (which
requires the default dense layout) inserts a physical relayout copy around
it. At the flagship 128^3 step this padding inflation is what forces
rematerialization (activations alone exceed the 16 GB chip) and the relayout
copies are among the largest data movers in the HLO.

The fix: between resample/concat boundaries, keep each UNet level's
activations in the kernels' native PACKED form

    (B, D, H*W/p, p*C)   with p*C a multiple of 128

— lane-dense, default layout, zero padding. ``Packed`` carries the static
geometry; the Pallas conv / fused-norm ops consume and produce it directly
(conv3d_pallas_packed / fused_norm_affine_packed), so inside a ResBlock no
reshape or relayout ever materializes. Packing/unpacking happens only at
level boundaries (downsample, upsample, concat, attention, conv_in/out),
where a layout change would have happened anyway.

The pack factor ``p`` is a property of the tensor, not of C alone: ops
propagate the carrier's p (e.g. a 96-channel decoder concat packs at p=4, so
the conv that maps it to 64 channels emits 64-channel rows still packed at
p=4 — valid, since 4*64 is a multiple of 128).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def pack_factor(C: int) -> Optional[int]:
    for p in (1, 2, 4, 8):
        if (p * C) % 128 == 0:
            return p
    return None


def block_pack_factor(cin: int, features: int) -> Optional[int]:
    """Smallest p valid for BOTH a block's input and output channel counts —
    a ResBlock's carrier keeps one p end to end, and the conv's OUTPUT rows
    (p * features lanes) must be a whole number of 128-lane tiles too (e.g.
    the decoder's 64 -> 32 blocks need p = 4: p = pack_factor(64) = 2 gives
    64-lane output rows, which don't pack)."""
    for p in (1, 2, 4, 8):
        if (p * cin) % 128 == 0 and (p * features) % 128 == 0:
            return p
    return None


@struct.dataclass
class Packed:
    """Channel-packed activation: data (B, D, H*W/p, p*C)."""

    data: jnp.ndarray
    spatial: Tuple[int, int, int] = struct.field(pytree_node=False)
    channels: int = struct.field(pytree_node=False)
    p: int = struct.field(pytree_node=False)

    @property
    def batch(self) -> int:
        return self.data.shape[0]

    def flat_rows(self) -> jnp.ndarray:
        """(B, D*H*W/p, p*C) view — free reshape on the dense carrier."""
        b, d, r, l = self.data.shape
        return self.data.reshape(b, d * r, l)


def pack(x: jnp.ndarray, p: Optional[int] = None) -> Packed:
    """x (B, D, H, W, C) -> Packed. On lane-padded layouts this is a physical
    relayout (that is the point: do it once per level boundary, not per op)."""
    b, d, h, w, c = x.shape
    p = p or pack_factor(c)
    assert p is not None and w % p == 0, (x.shape, p)
    return Packed(x.reshape(b, d, h * w // p, p * c), (d, h, w), c, p)


def unpack(pk: Packed) -> jnp.ndarray:
    d, h, w = pk.spatial
    return pk.data.reshape(pk.batch, d, h, w, pk.channels)


def pack_concat(a: Packed, b: Packed) -> Packed:
    """Channel-concat two carriers at the SAME pack factor without unpacking:
    the (B, D, R, p*C) rows are viewed (B, D, R, p, C), concatenated on the
    channel axis, and re-flattened — one dense pass writing the fused result,
    equal to pack(concat(unpack(a), unpack(b), axis=-1), p). This is how the
    decoder's skip joins stay lane-dense (the unpack->concat->repack chain
    otherwise materializes a lane-padded intermediate)."""
    assert a.p == b.p and a.spatial == b.spatial and a.batch == b.batch
    B, D, R = a.data.shape[:3]
    av = a.data.reshape(B, D, R, a.p, a.channels)
    bv = b.data.reshape(B, D, R, b.p, b.channels)
    c = a.channels + b.channels
    out = jnp.concatenate([av, bv.astype(av.dtype)], axis=-1)
    return Packed(out.reshape(B, D, R, a.p * c), a.spatial, c, a.p)


@struct.dataclass
class PackedPair:
    """A LAZY channel-concat of two carriers at the same pack factor.

    Stands in for ``pack(concat(unpack(a), unpack(b)), p)`` without ever
    materializing the join. Why: the materialized pack_concat lowers through
    a 5D channels-minor view whose minor dim is below 128 lanes, so XLA
    physically lane-pads and re-copies it — the HLO byte audit showed ~805 MB
    pad/copy chains at every full-resolution decoder skip join (~25-30
    GB/step; docs/ROADMAP.md round-3 item 1b). Consumers split instead:

      * GroupNorm: joint group statistics from per-carrier lane sums via
        lane->joint-group fold matrices (fused_norm_affine_packed2) — exactly
        the CP split-kernel pattern with concat in place of psum;
      * conv (k1/k3): split weights, conv(concat(h,s), W) = conv(h, W_h) +
        conv(s, W_s) — same bytes read, no joined intermediate written.

    The pair therefore flows from the decoder's ``skip_concat`` through GN ->
    conv / skip_proj and collapses to a single ``Packed`` at the first conv.
    """

    a: Packed
    b: Packed

    @property
    def channels(self) -> int:
        return self.a.channels + self.b.channels

    @property
    def spatial(self) -> Tuple[int, int, int]:
        return self.a.spatial

    @property
    def p(self) -> int:
        return self.a.p

    @property
    def batch(self) -> int:
        return self.a.batch

    def materialize(self) -> Packed:
        return pack_concat(self.a, self.b)


def pair_packable(spatial, ca: int, cb: int, feat: int, p: int,
                  dtype) -> bool:
    """Can a decoder ResBlock consume a PackedPair(ca, cb) -> feat at pack
    factor p without ever materializing the concat? Requires the joint block
    to be packable (the pair collapses to Packed(feat) after the first conv)
    plus, per half: tileable GN rows and a supported split conv."""
    if p is None:
        return False
    if not block_packable(spatial, ca + cb, feat, p, dtype):
        return False
    return (
        norm_packable(spatial, ca, p, 0, dtype)
        and norm_packable(spatial, cb, p, 0, dtype)
        and conv_packable(spatial, ca, feat, p, dtype)
        and conv_packable(spatial, cb, feat, p, dtype)
    )


def conv_packable(spatial, cin: int, cout: int, p: int, dtype) -> bool:
    from .pallas import conv3d as _c3

    d, h, w = spatial
    if p is None or w % p or (p * cin) % 128 or p * cout > 512:
        return False
    if cin < 8 or cout < 8 or h < 2 or w < 8:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    # Gate with the geometry of the kernel that will actually launch: under
    # VDM4CDM_CONV_BS the stats-emitting forward's VMEM working set is larger
    # (its geometry is the worst case — the ResBlock's conv1 emits stats);
    # with the bs entries disabled the plain kernel's smaller set applies,
    # so the A/B baseline arm is not gated off shapes it can actually run
    # (advisor round-3 finding).
    from .conv import _CONV_BS

    geo = _c3._geometry(d, h, w, cin, cout, itemsize=itemsize, p_override=p,
                        stats=_CONV_BS)
    if geo[2] is None:
        return False
    # the packed custom_vjp's dx keeps the carrier's pack factor with io
    # swapped — that transposed geometry must exist too
    geo2 = _c3._geometry(d, h, w, cout, cin, itemsize=itemsize, p_override=p)
    return geo2[2] is not None


def norm_packable(spatial, c: int, p: int, rows_batchdim: int, dtype) -> bool:
    from .pallas import fused_norm as _fn

    d, h, w = spatial
    if p is None or (p * c) % 128 or w % p:
        return False
    s_rows = d * h * w // p
    sublane = 16 if dtype == jnp.bfloat16 else 8
    return _fn._tile_rows(s_rows, sublane, p * c) is not None


def block_packable(spatial, cin: int, features: int, p: Optional[int],
                   dtype) -> bool:
    """Can a whole ResBlock (GN(cin) -> conv(cin->F) -> GN(F) -> conv(F->F))
    run on the packed carrier at pack factor p?"""
    if p is None:
        return False
    return (
        norm_packable(spatial, cin, p, 0, dtype)
        and norm_packable(spatial, features, p, 0, dtype)
        and conv_packable(spatial, cin, features, p, dtype)
        and conv_packable(spatial, features, features, p, dtype)
    )
