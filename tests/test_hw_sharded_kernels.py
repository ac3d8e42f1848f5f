"""Hardware (Mosaic) execution of the SHARDED Pallas kernel entry points on a
single real TPU chip — closing the round-3 evidence gap: the z-halo conv and
the split-kernel CP fused norm were validated only under interpret mode on
virtual CPU meshes, and docs/DESIGN.md §7 documents a case where interpret
mode passed while Mosaic miscompiled.

No multi-chip mesh is needed for kernel-level evidence:

  * ``conv3d_pallas_zhalo*`` consume PRE-exchanged halo planes, so a single
    chip feeds them synthetically haloed volumes — bit-identical to what
    ``parallel.halo.halo_exchange`` produces on a real mesh (periodic wrap /
    zero planes);
  * the CP fused-norm entries accept ``axis=None``: the split
    stats -> psum -> apply pipeline runs with the psum elided (the identity
    on one shard), executing both split kernels on hardware;
  * a 1-device ``shard_map`` mesh additionally compiles the FULL sharded SPMD
    program (ppermute halo exchange + psum'd stats + the kernels) for the
    real chip.

The whole module skips off-TPU (run: VDM4CDM_TEST_TPU=1 pytest this-file);
the CPU-mesh interpret coverage of the same entries lives in
tests/test_sharded_pallas.py. Reference capability: SURVEY.md §2c SP row
(absent in the reference, which pins devices=1 at
trainVDM3D_c_c_from_field_name_thick_lowbatch.py:41).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.sharding import PartitionSpec as P

import vdm4cdm_tpu.ops.conv as convmod
import vdm4cdm_tpu.ops.norm as normmod
from vdm4cdm_tpu.ops.conv import conv_nd
from vdm4cdm_tpu.ops.norm import norm_affine_act
from vdm4cdm_tpu.ops.packed import pack, unpack
from vdm4cdm_tpu.parallel import ShardCtx
from vdm4cdm_tpu.utils import make_mesh

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="hardware evidence for the sharded kernels needs the real chip",
)


def _rand(key, shape, scale=1.0):
    return scale * jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def _halo_pad(x, periodic: bool, axis: int = 1):
    """Synthetic halo planes on ``axis``: exactly what halo_exchange returns
    for a shard whose mesh neighbors are itself (periodic) or the boundary
    (zero fill)."""
    if periodic:
        lo = lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
        hi = lax.slice_in_dim(x, 0, 1, axis=axis)
    else:
        shape = list(x.shape)
        shape[axis] = 1
        lo = hi = jnp.zeros(shape, x.dtype)
    return jnp.concatenate([lo, x, hi], axis=axis)


def _oracle_zhalo(xh, w, pm: str):
    """Reference semantics of the z-halo kernels: valid in z (the halos ARE
    the padding), SAME in H/W following ``pm`` — as plain XLA ops."""
    if pm == "circular":
        xh = jnp.pad(xh, [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)], mode="wrap")
        pads = [(0, 0), (0, 0), (0, 0)]
    else:
        pads = [(0, 0), (1, 1), (1, 1)]
    return lax.conv_general_dilated(
        xh, w, (1, 1, 1), pads,
        dimension_numbers=lax.conv_dimension_numbers(
            (1,) * 5, (1,) * 5, ("NDHWC", "DHWIO", "NDHWC")),
    )


class TestZHaloConvHW:
    """conv3d_pallas_zhalo(+packed, +bias/stats) under real Mosaic."""

    @pytest.mark.parametrize("pm", ["circular", "zeros"])
    def test_forward_matches_oracle(self, pm):
        from vdm4cdm_tpu.ops.pallas.conv3d import (
            conv3d_pallas_zhalo,
            supports_zhalo,
        )

        x = _rand(0, (2, 8, 8, 16, 32))
        w = _rand(1, (3, 3, 3, 32, 32), 0.2)
        xh = _halo_pad(x, periodic=(pm == "circular"))
        assert supports_zhalo(xh.shape, w.shape, itemsize=4)

        out = jax.jit(lambda xh, w: conv3d_pallas_zhalo(xh, w, pm))(xh, w)
        ref = _oracle_zhalo(xh, w, pm)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("pm", ["circular", "zeros"])
    def test_grads_match_oracle(self, pm):
        from vdm4cdm_tpu.ops.pallas.conv3d import conv3d_pallas_zhalo

        x = _rand(2, (1, 8, 8, 16, 32))
        w = _rand(3, (3, 3, 3, 32, 32), 0.2)
        ct = _rand(4, (1, 8, 8, 16, 32))
        xh = _halo_pad(x, periodic=(pm == "circular"))

        def loss(fn, xh, w):
            return jnp.sum(fn(xh, w) * ct)

        g = jax.jit(jax.grad(lambda xh, w: loss(
            lambda a, b: conv3d_pallas_zhalo(a, b, pm), xh, w),
            argnums=(0, 1)))(xh, w)
        r = jax.jit(jax.grad(lambda xh, w: loss(
            lambda a, b: _oracle_zhalo(a, b, pm), xh, w),
            argnums=(0, 1)))(xh, w)
        for got, ref in zip(g, r):
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("pm", ["circular", "zeros"])
    def test_packed_bs_forward_and_sums(self, pm):
        """The production sharded fast-path entry: packed carrier, in-kernel
        bias, emitted per-lane GN sums."""
        from vdm4cdm_tpu.ops.pallas.conv3d import conv3d_pallas_zhalo_packed_bs

        B, D, H, W, C, p = 2, 8, 8, 16, 32, 4
        x = _rand(5, (B, D, H, W, C))
        w = _rand(6, (3, 3, 3, C, C), 0.2)
        bias = _rand(7, (C,), 0.3)
        pk = pack(x, p=p)
        xhq = _halo_pad(pk.data, periodic=(pm == "circular"))

        out, sums = jax.jit(
            lambda xhq, w, bias: conv3d_pallas_zhalo_packed_bs(
                xhq, w, bias, pm, (D, H, W)))(xhq, w, bias)
        ref = _oracle_zhalo(_halo_pad(x, periodic=(pm == "circular")), w, pm)
        ref = ref + bias
        got = unpack(type(pk)(out, (D, H, W), C, p))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

        # emitted stats == per-lane (sum y, sum y^2) of the output rows
        flat = out.reshape(B, -1, p * C).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(sums[:, 0]),
                                   np.asarray(jnp.sum(flat, axis=1)),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(sums[:, 1]),
                                   np.asarray(jnp.sum(flat * flat, axis=1)),
                                   rtol=1e-3, atol=1e-3)

    @pytest.mark.parametrize("pm", ["circular", "zeros"])
    def test_packed_grads_match_oracle(self, pm):
        from vdm4cdm_tpu.ops.pallas.conv3d import conv3d_pallas_zhalo_packed

        B, D, H, W, C, p = 1, 8, 8, 16, 32, 4
        x = _rand(8, (B, D, H, W, C))
        w = _rand(9, (3, 3, 3, C, C), 0.2)
        ct = _rand(10, (B, D, H * W // p, p * C))
        pk = pack(x, p=p)
        xhq = _halo_pad(pk.data, periodic=(pm == "circular"))

        def loss_pallas(xhq, w):
            return jnp.sum(conv3d_pallas_zhalo_packed(xhq, w, pm, (D, H, W)) * ct)

        def loss_oracle(xhq, w):
            # unpack the haloed carrier back to planes, run the XLA oracle
            xh = xhq.reshape(B, D + 2, H, W, C)
            y = _oracle_zhalo(xh, w, pm)
            return jnp.sum(y.reshape(B, D, H * W // p, p * C) * ct)

        g = jax.jit(jax.grad(loss_pallas, argnums=(0, 1)))(xhq, w)
        r = jax.jit(jax.grad(loss_oracle, argnums=(0, 1)))(xhq, w)
        for got, ref in zip(g, r):
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)


class TestCPFusedNormHW:
    """The split-kernel CP fused norm (stats kernel -> [psum] -> apply kernel)
    under real Mosaic, with axis=None eliding the single-shard psum."""

    @pytest.mark.parametrize("act", [None, "silu"])
    def test_forward_matches_xla(self, act, monkeypatch):
        from vdm4cdm_tpu.ops.pallas.fused_norm import fused_norm_affine_cp

        x = _rand(11, (2, 8, 8, 16, 32), 1.5) + 0.3
        a = 1.0 + 0.2 * _rand(12, (2, 32))
        b = 0.1 * _rand(13, (2, 32))
        seed = jnp.zeros((1,), jnp.int32)

        monkeypatch.setattr(normmod, "_PALLAS_GN", False)
        ref = norm_affine_act(x, a, b, 8, act=act)
        out = jax.jit(lambda x, a, b: fused_norm_affine_cp(
            x, a, b, seed, 8, 1e-6, act, 0.0, None, False))(x, a, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_grads_match_xla(self, monkeypatch):
        from vdm4cdm_tpu.ops.pallas.fused_norm import fused_norm_affine_cp

        x = _rand(14, (2, 8, 8, 16, 32))
        a = 1.0 + 0.2 * _rand(15, (2, 32))
        b = 0.1 * _rand(16, (2, 32))
        ct = _rand(17, (2, 8, 8, 16, 32))
        seed = jnp.zeros((1,), jnp.int32)

        def loss_cp(x, a, b):
            y = fused_norm_affine_cp(x, a, b, seed, 8, 1e-6, "silu", 0.0,
                                     None, False)
            return jnp.sum(y * ct)

        def loss_xla(x, a, b):
            monkeypatch.setattr(normmod, "_PALLAS_GN", False)
            return jnp.sum(norm_affine_act(x, a, b, 8, act="silu") * ct)

        g = jax.jit(jax.grad(loss_cp, argnums=(0, 1, 2)))(x, a, b)
        monkeypatch.setattr(normmod, "_PALLAS_GN", False)
        r = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(x, a, b)
        for got, ref in zip(g, r):
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("act", [None, "silu"])
    def test_packed_cp_matches_xla(self, act, monkeypatch):
        from vdm4cdm_tpu.ops.pallas.fused_norm import (
            fused_norm_affine_packed_cp,
        )

        B, D, H, W, C, p = 2, 8, 8, 16, 32, 4
        x = _rand(18, (B, D, H, W, C), 1.5) + 0.3
        a = 1.0 + 0.2 * _rand(19, (B, C))
        b = 0.1 * _rand(20, (B, C))
        seed = jnp.zeros((1,), jnp.int32)
        pk = pack(x, p=p)

        monkeypatch.setattr(normmod, "_PALLAS_GN", False)
        ref = norm_affine_act(x, a, b, 8, act=act)
        out = jax.jit(lambda xq, a, b: fused_norm_affine_packed_cp(
            xq, a, b, seed, C, 8, 1e-6, act, 0.0, None, False))(
                pk.flat_rows(), a, b)
        got = out.reshape(pk.data.shape)
        np.testing.assert_allclose(
            np.asarray(unpack(type(pk)(got, (D, H, W), C, p))),
            np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_conv_emitted_stats_chain_on_hw(self, monkeypatch):
        """The full production chain on hardware: packed z-halo conv_bs emits
        per-shard GN sums -> ext fused norm consumes them (axis=None single
        shard) — output equals XLA GroupNorm(conv(x) + bias)."""
        from vdm4cdm_tpu.ops.pallas.conv3d import conv3d_pallas_zhalo_packed_bs
        from vdm4cdm_tpu.ops.pallas.fused_norm import (
            fused_norm_affine_packed_ext,
        )

        B, D, H, W, C, p = 1, 8, 8, 16, 32, 4
        x = _rand(21, (B, D, H, W, C))
        w = _rand(22, (3, 3, 3, C, C), 0.2)
        bias = _rand(23, (C,), 0.3)
        a = 1.0 + 0.2 * _rand(24, (B, C))
        b = 0.1 * _rand(25, (B, C))
        seed = jnp.zeros((1,), jnp.int32)
        pk = pack(x, p=p)
        xhq = _halo_pad(pk.data, periodic=True)

        def chain(xhq, w, bias, a, b):
            out, sums = conv3d_pallas_zhalo_packed_bs(
                xhq, w, bias, "circular", (D, H, W))
            y = fused_norm_affine_packed_ext(
                out.reshape(B, -1, p * C), a, b, seed, sums, C, 8, 1e-6,
                "silu", 0.0, None, False)
            return y.reshape(out.shape)

        got = jax.jit(chain)(xhq, w, bias, a, b)

        monkeypatch.setattr(convmod, "_CONV_IMPL", "xla")
        monkeypatch.setattr(normmod, "_PALLAS_GN", False)
        href = conv_nd(x, w, bias, padding_mode="circular")
        ref = norm_affine_act(href, a, b, 8, act="silu")
        np.testing.assert_allclose(
            np.asarray(unpack(type(pk)(got, (D, H, W), C, p))),
            np.asarray(ref), rtol=1e-4, atol=1e-4)


class TestShardMapOnChipHW:
    """The complete sharded SPMD program (shard_map + ppermute halo exchange +
    psum'd stats + Pallas kernels) compiled by Mosaic/XLA:TPU for the real
    chip, on a 1-device mesh — sharded semantics with single-chip hardware."""

    def test_sharded_cunet_forced_pallas_matches_xla(self, monkeypatch):
        from vdm4cdm_tpu.models import CUNet

        mesh = make_mesh(n_data=1, n_sp=1)
        ctx = ShardCtx(axis="sp", spatial_dim=0)
        size = 16
        kw = dict(
            shape=(1, size, size, size), chs=(16, 12, 12, 12),
            v_conditioning_dims=(3,), norm_groups=4, mid_attn=False,
            dropout_prob=0.0, conv_padding_mode="circular",
            num_res_blocks=1,
        )
        x = _rand(26, (1, size, size, size, 1))
        t = jnp.full((1,), 0.4, jnp.float32)
        v = [_rand(27, (1, 3))]

        monkeypatch.setenv("VDM4CDM_PACKED", "0")
        monkeypatch.setattr(convmod, "_CONV_IMPL", "xla")
        monkeypatch.setattr(normmod, "_PALLAS_GN", False)
        net_ref = CUNet(**kw)
        params = net_ref.init(jax.random.PRNGKey(0), x, t, v_conditionings=v)
        ref = net_ref.apply(params, x, t, v_conditionings=v)

        monkeypatch.setenv("VDM4CDM_PACKED", "1")
        monkeypatch.setattr(convmod, "_CONV_IMPL", "pallas")
        monkeypatch.setattr(normmod, "_PALLAS_GN", True)
        monkeypatch.setattr(normmod, "_PALLAS_GN_ENV", "1")
        net_sh = CUNet(**kw, ctx=ctx)

        def f(params, xs, t, v0):
            return net_sh.apply(params, xs, t, v_conditionings=[v0])

        out = jax.jit(jax.shard_map(
            f, mesh=mesh,
            in_specs=(P(), P(None, "sp"), P(), P()),
            out_specs=P(None, "sp"), check_vma=False,
        ))(params, x, t, v[0])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-4, atol=5e-4)
