"""CUNet — conditional 2D/3D UNet, the shared backbone for VDM and SFM.

Re-implements (TPU-first, not a port) the capability surface of the reference's
``mltools.networks.CUNet`` (SURVEY.md §2b; constructed at reference
trainVDM3D_c_c_from_field_name_thick_lowbatch.py:116-127 and
src/utils.py:451-462):

  * dimensionality (2D/3D) inferred from ``shape=(C, *spatial)``;
  * 4 channel widths ``chs`` with 3 down/up samplings;
  * three conditioning channels:
      s — spatial field, concatenated along channels at the input,
      v — list of value vectors (e.g. 6 cosmological params), embedded and
          summed into the time embedding,
      t — continuous time/noise level in [0, 1];
  * GroupNorm(norm_groups) + SiLU ResBlocks with FiLM (scale-shift) embedding
    injection and dropout;
  * optional 4-head self-attention at the bottleneck (``mid_attn``);
  * "circular" (periodic box) or "zeros" convolution padding.

TPU-native design choices (differ from any torch translation):
  * channels-last layout (N, *spatial, C) — XLA's native conv layout;
  * all spatial ops route through the sharding-aware ops layer, so the same
    module runs single-chip or spatially sharded inside shard_map (the sharded
    dim halo-exchanges over ICI; bottleneck attention all-gathers — it is tiny);
  * float32 parameters with optional bfloat16 activations (MXU-friendly);
  * final conv zero-initialized (standard diffusion practice).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

import os

from ..ops.conv import conv_nd, conv_packed
from ..ops.norm import (
    group_norm,
    group_norm_film,
    packed_group_norm_film,
    packed_norm_affine_act,
)
from ..ops.packed import (
    Packed,
    PackedPair,
    block_pack_factor,
    block_packable,
    pack,
    pack_concat,
    pair_packable,
    unpack,
)
from ..ops.resample import (
    downsample_conv,
    upsample_nearest,
    upsample_nearest_packed,
)
from ..parallel.halo import (
    NO_SHARD,
    ShardCtx,
    all_gather_spatial,
    take_local_spatial,
)


def timestep_embedding(t: jnp.ndarray, dim: int, max_freq: float = 1000.0) -> jnp.ndarray:
    """Sinusoidal embedding of continuous t in [0, 1]. t: (B,) -> (B, dim)."""
    half = dim // 2
    freqs = jnp.exp(jnp.linspace(0.0, jnp.log(max_freq), half))
    ang = t[:, None].astype(jnp.float32) * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class _Conv(nn.Module):
    """Parameter container for a sharding-aware conv (weights live in linen,
    compute goes through ops.conv_nd).

    ``emit_stats=True`` changes the return to ``(out, sums | None)``: on the
    packed Pallas path the kernel emits per-lane GroupNorm sums of its output
    (conv-emitted GN statistics — the consuming _GroupNorm skips its stats
    sweep); every other path returns None sums."""

    features: int
    kernel_size: int
    stride: int = 1
    padding_mode: str = "zeros"
    ctx: ShardCtx = NO_SHARD
    zero_init: bool = False
    emit_stats: bool = False

    @nn.compact
    def __call__(self, x):
        packed = isinstance(x, (Packed, PackedPair))
        nd = 3 if packed else x.ndim - 2
        cin = x.channels if packed else x.shape[-1]
        kshape = (self.kernel_size,) * nd + (cin, self.features)
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        w = self.param("kernel", init, kshape, jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if packed:
            assert self.stride == 1
            return conv_packed(x, w, b, padding_mode=self.padding_mode,
                               ctx=self.ctx, emit_stats=self.emit_stats)
        if self.stride == 2:
            out = downsample_conv(x, w, b, padding_mode=self.padding_mode, ctx=self.ctx)
        else:
            out = conv_nd(x, w, b, stride=self.stride, padding_mode=self.padding_mode, ctx=self.ctx)
        return (out, None) if self.emit_stats else out


class _GroupNorm(nn.Module):
    """GroupNorm with an optional fused FiLM + dropout epilogue.

    The whole chain (normalize, gamma/beta, FiLM scale-shift, activation,
    dropout) executes as ONE fused Pallas kernel on unsharded TPU
    (ops/pallas/fused_norm.py) and as the XLA composition elsewhere."""

    groups: int
    act: Optional[str] = None
    ctx: ShardCtx = NO_SHARD

    @nn.compact
    def __call__(self, x, film=None, dropout_p: float = 0.0, dropout_rng=None,
                 ext_sums=None):
        packed = isinstance(x, (Packed, PackedPair))
        c = x.channels if packed else x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if packed:
            return packed_group_norm_film(
                x, scale, bias, film, self.groups, act=self.act,
                dropout_p=dropout_p, dropout_rng=dropout_rng, ctx=self.ctx,
                ext_sums=ext_sums)
        assert ext_sums is None  # conv emits stats only on the packed path
        if film is None and dropout_p == 0.0:
            return group_norm(x, scale, bias, self.groups, act=self.act,
                              ctx=self.ctx)
        fs, fsh = film if film is not None else (
            jnp.zeros((x.shape[0], c), jnp.float32),
            jnp.zeros((x.shape[0], c), jnp.float32),
        )
        return group_norm_film(
            x, scale, bias, fs, fsh, self.groups, act=self.act,
            dropout_p=dropout_p, dropout_rng=dropout_rng, ctx=self.ctx)


class ResBlock(nn.Module):
    """GroupNorm -> SiLU -> conv -> FiLM(emb) -> GroupNorm -> SiLU -> dropout
    -> conv, with a (1x1-conv-projected) residual connection.

    ``train`` is a module attribute (not a call arg) so nn.remat sees only
    array arguments when rematerialization is enabled."""

    features: int
    norm_groups: int
    dropout_prob: float
    padding_mode: str
    ctx: ShardCtx = NO_SHARD
    train: bool = False

    @nn.compact
    def __call__(self, x, emb):
        train = self.train
        h = _GroupNorm(self.norm_groups, act="silu", ctx=self.ctx)(x)
        # conv1 feeds the second GroupNorm DIRECTLY, so its Pallas kernel
        # emits the GN statistics alongside the output and the norm skips
        # its stats sweep — one full HBM read of h saved per ResBlock
        # (conv-emitted GN statistics, ROADMAP round-3 item 1a).
        h, hsums = _Conv(self.features, 3, padding_mode=self.padding_mode,
                         ctx=self.ctx, emit_stats=True)(h)

        p = self.dropout_prob if train else 0.0
        rng = self.make_rng("dropout") if p > 0 else None
        film = None
        if emb is not None:
            film_out = nn.Dense(2 * self.features, name="film")(nn.silu(emb))
            film = tuple(jnp.split(film_out, 2, axis=-1))
        # GN + FiLM + SiLU + dropout: one fused epilogue (Pallas on TPU)
        h = _GroupNorm(self.norm_groups, ctx=self.ctx, act="silu")(
            h, film=film, dropout_p=p, dropout_rng=rng,
            ext_sums=hsums if isinstance(h, Packed) else None)
        h = _Conv(self.features, 3, padding_mode=self.padding_mode, ctx=self.ctx, zero_init=True)(h)

        if isinstance(x, (Packed, PackedPair)):
            if x.channels != self.features:
                # pair-aware: skip_proj splits its 1x1 weights over the two
                # carriers (conv_packed), collapsing the pair to a Packed
                x = _Conv(self.features, 1, ctx=self.ctx, name="skip_proj")(x)
            elif isinstance(x, PackedPair):
                x = x.materialize()
            return Packed(x.data + h.data, h.spatial, h.channels, h.p)
        if x.shape[-1] != self.features:
            x = _Conv(self.features, 1, ctx=self.ctx, name="skip_proj")(x)
        return x + h


class AttentionBlock(nn.Module):
    """Full self-attention over all (gathered) spatial positions — used only at
    the UNet bottleneck where the grid is tiny (reference ``mid_attn``,
    ``n_attention_heads=4``)."""

    num_heads: int
    norm_groups: int
    ctx: ShardCtx = NO_SHARD

    @nn.compact
    def __call__(self, x):
        b, c = x.shape[0], x.shape[-1]
        spatial = x.shape[1:-1]
        h = _GroupNorm(self.norm_groups, ctx=self.ctx)(x)
        h = all_gather_spatial(h, self.ctx)
        full_spatial = h.shape[1:-1]
        seq = h.reshape(b, -1, c)
        head_dim = c // self.num_heads
        qkv = nn.DenseGeneral((3, self.num_heads, head_dim), name="qkv")(seq)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jax.nn.dot_product_attention(q, k, v)
        out = nn.DenseGeneral(c, axis=(-2, -1), name="proj",
                              kernel_init=nn.initializers.zeros)(attn)
        out = out.reshape(b, *full_spatial, c)
        out = take_local_spatial(out, self.ctx)
        return x + out.astype(x.dtype)


class CUNet(nn.Module):
    """See module docstring. ``shape`` is (C_out, *spatial) following the
    reference's constructor (reference src/utils.py:450-462 exposes
    ``score_model.shape`` for samplers — mirrored here)."""

    shape: Tuple[int, ...]
    chs: Sequence[int] = (48, 96, 192, 384)
    s_conditioning_channels: int = 0
    v_conditioning_dims: Sequence[int] = ()
    t_conditioning: bool = True
    norm_groups: int = 8
    mid_attn: bool = False
    n_attention_heads: int = 4
    dropout_prob: float = 0.1
    conv_padding_mode: str = "zeros"
    num_res_blocks: int = 2
    compute_dtype: jnp.dtype = jnp.float32
    ctx: ShardCtx = NO_SHARD
    # Rematerialize ResBlocks in the backward pass: mandatory headroom for
    # native-resolution 3D volumes (a 128^3 batch-2 train step OOMs a 16 GB
    # chip without it; with it there is room to spare). ~25-30% extra FLOPs.
    remat: bool = False
    # Selective remat: only levels < remat_levels rematerialize (the shallow,
    # full-resolution levels hold nearly all activation bytes; deeper levels'
    # activations are cheap to keep). None = all levels when remat is set.
    remat_levels: Optional[int] = None
    # Block-granular remat: names of specific ResBlocks to rematerialize
    # REGARDLESS of `remat` (e.g. ("down_0_0", "down_0_1") — the encoder's
    # full-resolution blocks, whose activations live longest in the backward).
    # The cheapest point on the memory/recompute curve when full no-remat
    # misses HBM by a few hundred MB.
    remat_blocks: Sequence[str] = ()

    @property
    def ndim_spatial(self) -> int:
        return len(self.shape) - 1

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,
        t: Optional[jnp.ndarray] = None,
        s_conditioning: Optional[jnp.ndarray] = None,
        v_conditionings: Sequence[jnp.ndarray] = (),
        train: bool = False,
    ) -> jnp.ndarray:
        """z: (B, *spatial, C); t: (B,) in [0,1]; s_conditioning: (B, *spatial,
        Cs); v_conditionings: list of (B, dim_i). Returns (B, *spatial, C)."""
        if self.s_conditioning_channels:
            if s_conditioning is None:
                raise ValueError("model expects s_conditioning")
            assert s_conditioning.shape[-1] == self.s_conditioning_channels
            z = jnp.concatenate([z, s_conditioning.astype(z.dtype)], axis=-1)
        if len(v_conditionings) != len(self.v_conditioning_dims):
            raise ValueError(
                f"expected {len(self.v_conditioning_dims)} v_conditionings, "
                f"got {len(v_conditionings)}"
            )

        x = z.astype(self.compute_dtype)
        pm, ctx, ng = self.conv_padding_mode, self.ctx, self.norm_groups

        # -- embeddings -------------------------------------------------------
        emb_dim = self.chs[0] * 4
        emb = None
        if self.t_conditioning:
            if t is None:
                raise ValueError("model expects t conditioning")
            temb = timestep_embedding(jnp.atleast_1d(t) * jnp.ones(x.shape[0]), self.chs[0])
            temb = nn.Dense(emb_dim, name="t_dense0")(temb)
            temb = nn.Dense(emb_dim, name="t_dense1")(nn.silu(temb))
            emb = temb
        for i, (v, d) in enumerate(zip(v_conditionings, self.v_conditioning_dims)):
            assert v.shape[-1] == d, f"v_conditioning {i} dim {v.shape[-1]} != {d}"
            vemb = nn.Dense(emb_dim, name=f"v_dense0_{i}")(v.astype(jnp.float32))
            vemb = nn.Dense(emb_dim, name=f"v_dense1_{i}")(nn.silu(vemb))
            emb = vemb if emb is None else emb + vemb

        rematted = nn.remat(ResBlock)

        def Res(level, *args, **kw):
            use = self.remat and (
                self.remat_levels is None or level < self.remat_levels
            )
            use = use or kw.get("name") in tuple(self.remat_blocks)
            return (rematted if use else ResBlock)(*args, **kw)

        # -- packed-carrier plumbing (TPU 3D hot path) ------------------------
        # Between resample/concat boundaries, activations ride the lane-dense
        # packed form the Pallas kernels natively consume (ops/packed.py):
        # no 128-lane padding in HBM, no relayout copies around custom calls.
        packed_env = os.environ.get("VDM4CDM_PACKED", "auto")
        # Sharded (`sp`) carriers ride the packed fast path too (round 3):
        # the sharded dim must be z (= the carrier's plane axis 1); prep's
        # block_packable gating evaluates the LOCAL spatial shapes.
        use_packed = (
            packed_env != "0"
            and (packed_env == "1" or jax.default_backend() == "tpu")
            and (ctx.axis is None or ctx.spatial_dim == 0)
            and self.ndim_spatial == 3
        )
        # Lazy skip concats (PackedPair): default ON with packed carriers;
        # VDM4CDM_PAIR=0 restores the materialized pack_concat for A/B.
        use_pair = use_packed and os.environ.get("VDM4CDM_PAIR", "1") != "0"

        def _arr(h):
            if isinstance(h, PackedPair):
                h = h.materialize()
            return unpack(h) if isinstance(h, Packed) else h

        def prep(h, feat):
            """Pack h for an upcoming ResBlock(C -> feat) when the whole block
            can run on the carrier; otherwise hand it over unpacked. The pack
            factor must suit BOTH C and feat (block_pack_factor); a carrier
            arriving with an unsuitable p is repacked — a free reshape chain,
            both packed forms are dense row-major views of the same order.
            A PackedPair (lazy skip concat) passes through untouched when the
            pair path supports the block; otherwise it materializes here."""
            if not use_packed:
                return _arr(h)
            if isinstance(h, PackedPair):
                if pair_packable(h.spatial, h.a.channels, h.b.channels, feat,
                                 h.p, self.compute_dtype):
                    return h
                h = h.materialize()
            if isinstance(h, Packed):
                sp, c = h.spatial, h.channels
                if block_packable(sp, c, feat, h.p, self.compute_dtype):
                    return h
            else:
                sp, c = tuple(h.shape[1:-1]), h.shape[-1]
            p = block_pack_factor(c, feat)
            if p is not None and sp[-1] % p == 0 and block_packable(
                    sp, c, feat, p, self.compute_dtype):
                return pack(_arr(h), p)
            return _arr(h)

        def skip_concat(h, s, feat):
            """Channel-concat h with a skip for an upcoming ResBlock(-> feat).
            When the joined block can run packed, both operands are (re)packed
            at the block's joint pack factor — free reshapes on dense
            carriers — and the join stays LAZY (ops.packed.PackedPair): the
            block's GN computes joint statistics over the two carriers and
            its convs split their weights, so the concat intermediate — which
            XLA lowers through ~805 MB lane-pad/copy chains per full-res site
            (HLO audit, docs/DESIGN.md §7) — is never written. Falls back to
            the materialized lane-dense pack_concat when the pair path can't
            host the block, then to a plain XLA concat."""
            hc = h.channels if isinstance(h, Packed) else h.shape[-1]
            sc = s.channels if isinstance(s, Packed) else s.shape[-1]
            if use_packed:
                sp = (h.spatial if isinstance(h, Packed)
                      else tuple(h.shape[1:-1]))
                c = hc + sc
                p = block_pack_factor(c, feat)
                if (p is not None and sp[-1] % p == 0
                        and block_packable(sp, c, feat, p,
                                           self.compute_dtype)):
                    hp = h if isinstance(h, Packed) and h.p == p \
                        else pack(_arr(h), p)
                    spk = s if isinstance(s, Packed) and s.p == p \
                        else pack(_arr(s), p)
                    if use_pair and pair_packable(sp, hc, sc, feat, p,
                                                  self.compute_dtype):
                        return PackedPair(hp, spk)
                    return pack_concat(hp, spk)
            return jnp.concatenate([_arr(h), _arr(s)], axis=-1)

        # -- encoder ----------------------------------------------------------
        h = _Conv(self.chs[0], 3, padding_mode=pm, ctx=ctx, name="conv_in")(x)
        skips = [h]
        for level, ch in enumerate(self.chs):
            for blk in range(self.num_res_blocks):
                h = prep(h, ch)
                h = Res(level, ch, ng, self.dropout_prob, pm, ctx, train,
                        name=f"down_{level}_{blk}")(h, emb)
                skips.append(h)
            if level < len(self.chs) - 1:
                h = _Conv(ch, 3, stride=2, padding_mode=pm, ctx=ctx,
                          name=f"downsample_{level}")(_arr(h))
                skips.append(h)

        # -- bottleneck ---------------------------------------------------------
        mid_level = len(self.chs) - 1
        h = prep(h, self.chs[-1])
        h = Res(mid_level, self.chs[-1], ng, self.dropout_prob, pm, ctx, train,
                name="mid_0")(h, emb)
        if self.mid_attn:
            h = AttentionBlock(self.n_attention_heads, ng, ctx,
                               name="mid_attn")(_arr(h))
        h = prep(h, self.chs[-1])
        h = Res(mid_level, self.chs[-1], ng, self.dropout_prob, pm, ctx, train,
                name="mid_1")(h, emb)

        # -- decoder ----------------------------------------------------------
        for level, ch in reversed(list(enumerate(self.chs))):
            for blk in range(self.num_res_blocks + 1):
                h = skip_concat(h, skips.pop(), ch)
                h = prep(h, ch)
                h = Res(level, ch, ng, self.dropout_prob, pm, ctx, train,
                        name=f"up_{level}_{blk}")(h, emb)
            if level > 0:
                if isinstance(h, Packed):
                    # one-broadcast upsample on the carrier: no unpack/repack
                    # relayouts, no per-dim repeat chain (ops/resample.py)
                    h = upsample_nearest_packed(h)
                else:
                    h = upsample_nearest(_arr(h))
                h = prep(h, ch)
                h = _Conv(ch, 3, padding_mode=pm, ctx=ctx,
                          name=f"upsample_{level}")(h)
        assert not skips

        h = _GroupNorm(ng, act="silu", ctx=ctx, name="norm_out")(h)
        h = _Conv(self.shape[0], 3, padding_mode=pm, ctx=ctx, zero_init=True,
                  name="conv_out")(_arr(h))
        return h.astype(jnp.float32)
