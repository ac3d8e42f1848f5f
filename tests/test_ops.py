"""Numerics tests for the sharding-aware ops layer.

Strategy (SURVEY.md §4): every sharded op is tested for exact/close equality
against its single-device XLA execution on the same data — the unsharded path
is the correctness oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vdm4cdm_tpu.ops import conv_nd, group_norm, downsample_conv, upsample_nearest
from vdm4cdm_tpu.parallel import ShardCtx, halo_exchange
from vdm4cdm_tpu.utils import make_mesh


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


# --------------------------------------------------------------------- conv
class TestConvSingleDevice:
    def test_same_shape_stride1(self):
        x = _rand(0, (2, 8, 8, 3))
        w = _rand(1, (3, 3, 3, 5))
        for pm in ["zeros", "circular"]:
            out = conv_nd(x, w, padding_mode=pm)
            assert out.shape == (2, 8, 8, 5)

    def test_3d(self):
        x = _rand(0, (1, 4, 4, 4, 2))
        w = _rand(1, (3, 3, 3, 2, 4))
        assert conv_nd(x, w).shape == (1, 4, 4, 4, 4)

    def test_stride2_halves(self):
        x = _rand(0, (1, 8, 8, 2))
        w = _rand(1, (3, 3, 2, 4))
        assert conv_nd(x, w, stride=2).shape == (1, 4, 4, 4)
        assert conv_nd(x, w, stride=2, padding_mode="circular").shape == (1, 4, 4, 4)

    def test_circular_equals_manual_wrap(self):
        x = _rand(0, (1, 8, 8, 1))
        w = _rand(1, (3, 3, 1, 1))
        out = conv_nd(x, w, padding_mode="circular")
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="wrap")
        ref = jax.lax.conv_general_dilated(
            xp, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(out, ref, rtol=1e-6)

    def test_translation_equivariance_circular(self):
        """Circular conv must commute with periodic shifts."""
        x = _rand(0, (1, 8, 8, 1))
        w = _rand(1, (3, 3, 1, 1))
        shifted = jnp.roll(x, 3, axis=1)
        a = jnp.roll(conv_nd(x, w, padding_mode="circular"), 3, axis=1)
        b = conv_nd(shifted, w, padding_mode="circular")
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


class TestCircularFacefix:
    """The facefix circular conv (zero conv + per-face wrap corrections) must
    equal the wrap-pad oracle exactly — values and gradients, any rank/kernel."""

    @pytest.mark.parametrize("shape,kshape", [
        ((2, 8, 8, 3), (3, 3, 3, 4)),
        ((1, 6, 6, 6, 2), (3, 3, 3, 2, 2)),
        ((1, 5, 7, 2), (3, 3, 2, 3)),       # odd, non-square
        ((1, 8, 2), (3, 2, 2)),             # 1D
        ((1, 8, 8, 1), (5, 5, 1, 1)),       # k=5 (2-thick faces)
    ])
    def test_matches_pad_oracle(self, shape, kshape):
        import vdm4cdm_tpu.ops.conv as convmod

        x = _rand(0, shape)
        w = _rand(1, kshape)
        convmod._CIRCULAR_IMPL = "pad"
        try:
            ref = conv_nd(x, w, padding_mode="circular")
        finally:
            convmod._CIRCULAR_IMPL = "facefix"
        got = conv_nd(x, w, padding_mode="circular")
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_grad_matches_oracle(self):
        import vdm4cdm_tpu.ops.conv as convmod

        x = _rand(0, (1, 6, 6, 2))
        w = _rand(1, (3, 3, 2, 2))
        loss = lambda w: jnp.sum(conv_nd(x, w, padding_mode="circular") ** 2)
        convmod._CIRCULAR_IMPL = "pad"
        try:
            g_ref = jax.grad(loss)(w)
        finally:
            convmod._CIRCULAR_IMPL = "facefix"
        g_fix = jax.grad(loss)(w)
        np.testing.assert_allclose(g_fix, g_ref, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("shape,kshape", [
        ((2, 8, 8, 3), (3, 3, 3, 4)),
        ((1, 6, 6, 6, 2), (3, 3, 3, 2, 2)),
        ((1, 8, 4, 2), (3, 3, 2, 3)),       # non-square, min sizes
        ((1, 8, 2), (3, 2, 2)),             # 1D
    ])
    def test_stride2_matches_pad_oracle(self, shape, kshape):
        """Stride-2 facefix (only the LOW face wraps) vs the wrap-pad oracle,
        values and gradients — ROADMAP round-2 item 4."""
        import vdm4cdm_tpu.ops.conv as convmod

        x = _rand(3, shape)
        w = _rand(4, kshape)

        def loss(x, w):
            return jnp.sum(conv_nd(x, w, stride=2, padding_mode="circular") ** 2)

        convmod._CIRCULAR_IMPL = "pad"
        try:
            ref = conv_nd(x, w, stride=2, padding_mode="circular")
            gx_ref, gw_ref = jax.grad(loss, argnums=(0, 1))(x, w)
        finally:
            convmod._CIRCULAR_IMPL = "facefix"
        got = conv_nd(x, w, stride=2, padding_mode="circular")
        gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(gx, gx_ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(gw, gw_ref, rtol=1e-4, atol=1e-4)


class TestConvTapsBackend:
    """The 'taps' conv backend (per-tap GEMMs) must match the XLA conv exactly
    for stride-1, both paddings, 2D and 3D, and under grad."""

    def _both(self, x, w, pm):
        import vdm4cdm_tpu.ops.conv as convmod

        ref = conv_nd(x, w, padding_mode=pm)
        convmod._CONV_IMPL = "taps"
        try:
            got = conv_nd(x, w, padding_mode=pm)
        finally:
            convmod._CONV_IMPL = "xla"
        return ref, got

    @pytest.mark.parametrize("pm", ["zeros", "circular"])
    def test_2d_3d(self, pm):
        ref, got = self._both(_rand(0, (2, 8, 8, 3)), _rand(1, (3, 3, 3, 4)), pm)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
        ref, got = self._both(_rand(2, (1, 6, 6, 6, 2)), _rand(3, (3, 3, 3, 2, 2)), pm)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_grad_matches(self):
        import vdm4cdm_tpu.ops.conv as convmod

        x = _rand(0, (1, 8, 8, 2))
        w = _rand(1, (3, 3, 2, 2))
        g_ref = jax.grad(lambda w: jnp.sum(conv_nd(x, w, padding_mode="circular") ** 2))(w)
        convmod._CONV_IMPL = "taps"
        try:
            g_taps = jax.grad(lambda w: jnp.sum(conv_nd(x, w, padding_mode="circular") ** 2))(w)
        finally:
            convmod._CONV_IMPL = "xla"
        np.testing.assert_allclose(g_taps, g_ref, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------- halo exchange
class TestHalo:
    def test_unsharded_wrap(self):
        x = jnp.arange(8.0).reshape(1, 8, 1)
        ctx = ShardCtx()
        out = halo_exchange(x, ctx, 1, 1, periodic=True)
        np.testing.assert_array_equal(out[0, :, 0], [7, 0, 1, 2, 3, 4, 5, 6, 7, 0])
        out = halo_exchange(x, ctx, 1, 1, periodic=False)
        np.testing.assert_array_equal(out[0, :, 0], [0, 0, 1, 2, 3, 4, 5, 6, 7, 0])

    @pytest.mark.parametrize("periodic", [True, False])
    def test_sharded_matches_unsharded(self, periodic):
        mesh = make_mesh(n_data=1, n_sp=4)
        ctx = ShardCtx(axis="sp", spatial_dim=0)
        x = jnp.arange(16.0).reshape(1, 16, 1)

        def f(xs):
            return halo_exchange(xs, ctx, 2, 2, periodic=periodic)

        out = jax.shard_map(
            f, mesh=mesh, in_specs=P(None, "sp", None),
            out_specs=P(None, "sp", None), check_vma=False,
        )(x)
        # per-shard blocks of 4 padded to 8; reassemble and compare to reference
        blocks = np.asarray(out).reshape(4, 8)[:, :]  # shards along dim
        ref = np.asarray(
            halo_exchange(x, ShardCtx(), 2, 2, periodic=periodic)
        )[0, :, 0]
        full = np.asarray(x[0, :, 0])
        for i in range(4):
            lo = full[(np.arange(i * 4 - 2, i * 4)) % 16] if periodic else None
            if periodic:
                exp = full[np.arange(i * 4 - 2, i * 4 + 6) % 16]
            else:
                idx = np.arange(i * 4 - 2, i * 4 + 6)
                exp = np.where((idx >= 0) & (idx < 16), full[np.clip(idx, 0, 15)], 0.0)
            np.testing.assert_array_equal(blocks[i], exp)


class TestConvSharded:
    @pytest.mark.parametrize("pm", ["zeros", "circular"])
    @pytest.mark.parametrize("stride", [1, 2])
    def test_matches_unsharded_2d(self, pm, stride):
        mesh = make_mesh(n_data=2, n_sp=4)
        ctx = ShardCtx(axis="sp", spatial_dim=0, data_axis="data")
        x = _rand(0, (2, 16, 8, 3))
        w = _rand(1, (3, 3, 3, 4))
        b = _rand(2, (4,))
        ref = conv_nd(x, w, b, stride=stride, padding_mode=pm)

        def f(xs, w, b):
            return conv_nd(xs, w, b, stride=stride, padding_mode=pm, ctx=ctx)

        out = jax.shard_map(
            f, mesh=mesh,
            in_specs=(P("data", "sp", None, None), P(), P()),
            out_specs=P("data", "sp", None, None), check_vma=False,
        )(x, w, b)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("pm", ["zeros", "circular"])
    def test_matches_unsharded_3d(self, pm):
        mesh = make_mesh(n_data=1, n_sp=4)
        ctx = ShardCtx(axis="sp", spatial_dim=0)
        x = _rand(0, (1, 8, 4, 4, 2))
        w = _rand(1, (3, 3, 3, 2, 2))
        ref = conv_nd(x, w, padding_mode=pm)

        def f(xs, w):
            return conv_nd(xs, w, padding_mode=pm, ctx=ctx)

        out = jax.shard_map(
            f, mesh=mesh,
            in_specs=(P(None, "sp", None, None, None), P()),
            out_specs=P(None, "sp", None, None, None), check_vma=False,
        )(x, w)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- group norm
class TestGroupNorm:
    def test_matches_manual(self):
        x = _rand(0, (2, 8, 8, 6))
        scale = _rand(1, (6,)) * 0.1 + 1.0
        bias = _rand(2, (6,)) * 0.1
        out = group_norm(x, scale, bias, groups=3)
        xg = np.asarray(x).reshape(2, 64, 3, 2)
        m = xg.mean(axis=(1, 3), keepdims=True)
        v = xg.var(axis=(1, 3), keepdims=True)
        ref = ((xg - m) / np.sqrt(v + 1e-6)).reshape(2, 8, 8, 6)
        ref = ref * np.asarray(scale) + np.asarray(bias)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_silu_fusion(self):
        x = _rand(0, (1, 4, 4, 4))
        base = group_norm(x, jnp.ones(4), jnp.zeros(4), 2)
        fused = group_norm(x, jnp.ones(4), jnp.zeros(4), 2, act="silu")
        np.testing.assert_allclose(fused, jax.nn.silu(base), rtol=1e-6)

    def test_sharded_matches_unsharded(self):
        mesh = make_mesh(n_data=2, n_sp=4)
        ctx = ShardCtx(axis="sp", spatial_dim=0, data_axis="data")
        x = _rand(0, (2, 16, 4, 8))
        scale, bias = jnp.ones(8), jnp.zeros(8)
        ref = group_norm(x, scale, bias, 4, act="silu")

        def f(xs, scale, bias):
            return group_norm(xs, scale, bias, 4, act="silu", ctx=ctx)

        out = jax.shard_map(
            f, mesh=mesh,
            in_specs=(P("data", "sp", None, None), P(), P()),
            out_specs=P("data", "sp", None, None), check_vma=False,
        )(x, scale, bias)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------ resample
class TestResample:
    def test_upsample_nearest(self):
        x = jnp.arange(4.0).reshape(1, 2, 2, 1)
        out = upsample_nearest(x)
        assert out.shape == (1, 4, 4, 1)
        np.testing.assert_array_equal(out[0, :2, :2, 0], [[0, 0], [0, 0]])

    def test_down_up_roundtrip_shapes(self):
        x = _rand(0, (1, 16, 16, 4))
        w = _rand(1, (3, 3, 4, 8))
        down = downsample_conv(x, w)
        assert down.shape == (1, 8, 8, 8)
        assert upsample_nearest(down).shape == (1, 16, 16, 8)

    @pytest.mark.parametrize("p", [2, 4])
    def test_upsample_packed_exact(self, p):
        """The one-broadcast packed upsample is elementwise IDENTICAL to the
        per-dim repeat chain (it duplicates, never recombines), and its
        backward (one 2^3-window reduce) matches to reduce-order rounding."""
        from vdm4cdm_tpu.ops.packed import pack, unpack
        from vdm4cdm_tpu.ops.resample import upsample_nearest_packed

        x = _rand(2, (2, 4, 8, 8, 32))
        ref = upsample_nearest(x)
        pk = upsample_nearest_packed(pack(x, p=p))
        assert pk.spatial == (8, 16, 16) and pk.p == p and pk.channels == 32
        np.testing.assert_array_equal(np.asarray(unpack(pk)), np.asarray(ref))

        ct = _rand(3, ref.shape)
        g_ref = jax.grad(lambda x: jnp.vdot(upsample_nearest(x), ct))(x)
        g_pk = jax.grad(lambda x: jnp.vdot(
            unpack(upsample_nearest_packed(pack(x, p=p))), ct))(x)
        np.testing.assert_allclose(np.asarray(g_pk), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-5)


class TestThinInputCircular:
    """Thin-input circular convs (cin*4 <= cout, e.g. conv_in's 2 -> 32) take
    the wrap-pad path instead of facefix (whose per-face scatter-adds rewrite
    the much larger OUTPUT once per dim) — must stay exact vs the oracle."""

    def test_routes_and_matches_oracle(self):
        import vdm4cdm_tpu.ops.conv as convmod

        x = _rand(4, (1, 8, 8, 8, 2))
        w = _rand(5, (3, 3, 3, 2, 16))
        b = _rand(6, (16,))

        def loss(x, w):
            return jnp.sum(conv_nd(x, w, b, padding_mode="circular") ** 2)

        convmod._CIRCULAR_IMPL = "pad"
        try:
            ref = conv_nd(x, w, b, padding_mode="circular")
            gx_ref, gw_ref = jax.grad(loss, argnums=(0, 1))(x, w)
        finally:
            convmod._CIRCULAR_IMPL = "facefix"
        got = conv_nd(x, w, b, padding_mode="circular")
        gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(gx, gx_ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(gw, gw_ref, rtol=1e-4, atol=1e-4)
