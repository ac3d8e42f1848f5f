"""Packed-carrier path (ops/packed.py + CUNet plumbing) vs the plain path.

The packed carrier keeps 3D activations in the Pallas kernels' native
lane-dense form between level boundaries (see ops/packed.py docstring for the
HBM-padding/relayout economics). On CPU the carrier plumbing runs with the
XLA fallback ops (unpack -> op -> repack), so these tests exercise the full
pack-factor propagation, the block-diagonal 1x1 skip projection, and the
boundary bookkeeping — the Pallas kernels themselves are oracle-tested in
test_pallas_conv3d.py / test_fused_norm.py."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdm4cdm_tpu.models import CUNet
from vdm4cdm_tpu.ops.packed import Packed, block_packable, pack, pack_factor, unpack


def _apply(packed_env, dropout=0.0, train=False, rngs=None,
           chs=(16, 16, 32, 32), padding="circular"):
    os.environ["VDM4CDM_PACKED"] = packed_env
    try:
        net = CUNet(shape=(1, 16, 16, 16), chs=chs, norm_groups=4,
                    s_conditioning_channels=1, v_conditioning_dims=(6,),
                    dropout_prob=dropout, conv_padding_mode=padding)
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))
        sc = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 16, 1))
        vv = [jnp.ones((2, 6))]
        t = jnp.asarray([0.3, 0.7])
        params = net.init({"params": jax.random.PRNGKey(2)}, z, t,
                          s_conditioning=sc, v_conditionings=vv)["params"]
        params = jax.tree_util.tree_map(lambda a: a + 0.01, params)
        out = net.apply({"params": params}, z, t, s_conditioning=sc,
                        v_conditionings=vv, train=train, rngs=rngs)
        return np.asarray(out), params
    finally:
        os.environ.pop("VDM4CDM_PACKED", None)


@pytest.mark.parametrize("padding", ["circular", "zeros"])
@pytest.mark.slow
def test_cunet_packed_matches_unpacked(padding):
    a, pa = _apply("0", padding=padding)
    b, pb = _apply("1", padding=padding)
    assert jax.tree_util.tree_structure(pa) == jax.tree_util.tree_structure(pb)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_cunet_packed_grads_match():
    def grad_of(packed_env):
        os.environ["VDM4CDM_PACKED"] = packed_env
        try:
            net = CUNet(shape=(1, 8, 8, 8), chs=(16, 16, 16, 16), norm_groups=4,
                        dropout_prob=0.0, conv_padding_mode="circular")
            z = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 8, 1))
            t = jnp.asarray([0.4])
            params = net.init({"params": jax.random.PRNGKey(4)}, z, t)["params"]
            params = jax.tree_util.tree_map(lambda a: a + 0.01, params)
            g = jax.grad(
                lambda p: jnp.sum(jnp.square(net.apply({"params": p}, z, t))))(
                    params)
            return jax.tree_util.tree_map(np.asarray, g)
        finally:
            os.environ.pop("VDM4CDM_PACKED", None)

    ga, gb = grad_of("0"), grad_of("1")
    flat_a = jax.tree_util.tree_leaves_with_path(ga)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(gb))
    for path, leaf in flat_a:
        # atol covers f32 reassociation noise: the packed path computes the
        # same math in a different order (block-diagonal 1x1 skip projection,
        # lane-dense concat), and sum-of-squares grads through the full UNet
        # accumulate ~1e-4-level absolute jitter on ~1e-2-scale elements.
        # (atol 3e-4: the packed one-broadcast upsample's backward reduces
        # the 2^3 cotangent window in one sum instead of the repeat chain's
        # per-dim order — ~1e-6 per-op rounding that compounds through the
        # decoder; the op itself is pinned exactly in test_ops.py.)
        np.testing.assert_allclose(
            leaf, flat_b[path], rtol=5e-3, atol=3e-4,
            err_msg=str(path))


class TestCarrier:
    def test_pack_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 8, 8, 32))
        pk = pack(x)
        assert pk.p == pack_factor(32) == 4
        assert pk.data.shape == (2, 4, 16, 128)
        np.testing.assert_array_equal(np.asarray(unpack(pk)), np.asarray(x))

    def test_pack_layout_identity(self):
        """Packed rows interleave p consecutive w-voxels' channels in lanes."""
        x = jnp.arange(2 * 4 * 4 * 8 * 16, dtype=jnp.float32).reshape(
            2, 4, 4, 8, 16)
        pk = pack(x)  # p = 8
        row0 = np.asarray(pk.data[0, 0, 0])
        expect = np.asarray(x[0, 0, 0]).reshape(-1)  # 8 voxels x 16 channels
        np.testing.assert_array_equal(row0, expect)

    def test_noncanonical_p(self):
        x = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 4, 8, 64))
        pk = pack(x, p=4)  # canonical would be 2
        assert pk.p == 4 and pk.data.shape[-1] == 256
        np.testing.assert_array_equal(np.asarray(unpack(pk)), np.asarray(x))

    def test_block_packable_gating(self):
        assert block_packable((16, 16, 16), 32, 32, 4, jnp.float32)
        assert not block_packable((16, 16, 16), 3, 32, None, jnp.float32)
        # channels with no 128-multiple pack at this p
        assert not block_packable((16, 16, 16), 48, 32, 2, jnp.float32)
