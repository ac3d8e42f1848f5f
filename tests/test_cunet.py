"""CUNet behavior tests: shapes, conditioning surface, sharded equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vdm4cdm_tpu.models import CUNet
from vdm4cdm_tpu.parallel import ShardCtx
from vdm4cdm_tpu.utils import make_mesh

# Repeated widths dedupe XLA's per-op compile cache (CPU compiles dominate
# test wall time); the UNet is generic over len(chs) — reference parity (4
# levels) is covered by test_3d_conditioned and the sharded test.
CHS = (8, 8, 8, 8)


def _build(shape, **kw):
    kw.setdefault("chs", CHS)
    kw.setdefault("norm_groups", 4)
    model = CUNet(shape=shape, **kw)
    b = 2
    c, *spatial = shape
    z = jax.random.normal(jax.random.PRNGKey(0), (b, *spatial, c))
    t = jnp.linspace(0.1, 0.9, b)
    s = (
        jax.random.normal(jax.random.PRNGKey(1), (b, *spatial, kw.get("s_conditioning_channels", 0)))
        if kw.get("s_conditioning_channels")
        else None
    )
    v = [jnp.ones((b, d)) for d in kw.get("v_conditioning_dims", ())]
    params = model.init({"params": jax.random.PRNGKey(2)}, z, t, s_conditioning=s, v_conditionings=v)
    return model, params, z, t, s, v


class TestShapes:
    def test_2d(self):
        model, params, z, t, s, v = _build((1, 16, 16))
        out = model.apply(params, z, t)
        assert out.shape == z.shape

    def test_3d_conditioned(self):
        model, params, z, t, s, v = _build(
            (1, 8, 8, 8), s_conditioning_channels=1, v_conditioning_dims=(6,)
        )
        out = model.apply(params, z, t, s_conditioning=s, v_conditionings=v)
        assert out.shape == z.shape

    def test_mid_attn(self):
        model, params, z, t, s, v = _build((2, 16, 16), mid_attn=True)
        out = model.apply(params, z, t)
        assert out.shape == z.shape

    def test_circular(self):
        model, params, z, t, s, v = _build((1, 16, 16), conv_padding_mode="circular")
        out = model.apply(params, z, t)
        assert out.shape == z.shape

    def test_zero_init_output(self):
        """Final conv is zero-init: a fresh model predicts ~0 (standard
        diffusion practice; keeps early training stable)."""
        model, params, z, t, s, v = _build((1, 16, 16))
        out = model.apply(params, z, t)
        np.testing.assert_allclose(out, 0.0, atol=1e-6)

    def test_missing_conditioning_raises(self):
        model, params, z, t, s, v = _build((1, 16, 16), v_conditioning_dims=(6,))
        with pytest.raises(ValueError):
            model.apply(params, z, t, v_conditionings=[])


class TestCircularEquivariance:
    def test_periodic_shift(self):
        """With circular padding and no attention, the UNet commutes with
        shifts by multiples of the total downsampling factor (8)."""
        model, params, z, t, s, v = _build((1, 16, 16), conv_padding_mode="circular",
                                           dropout_prob=0.0)
        # perturb params so the output is non-zero
        params = jax.tree.map(lambda p: p + 0.01, params)
        out = model.apply(params, z, t)
        out_shift = model.apply(params, jnp.roll(z, 8, axis=1), t)
        np.testing.assert_allclose(jnp.roll(out, 8, axis=1), out_shift, rtol=2e-3, atol=2e-5)


class TestSharded:
    @pytest.mark.parametrize("pm", ["zeros", "circular"])
    def test_matches_unsharded(self, pm):
        mesh = make_mesh(n_data=2, n_sp=4)
        ctx = ShardCtx(axis="sp", spatial_dim=0, data_axis="data")
        kw = dict(
            chs=CHS, norm_groups=4, conv_padding_mode=pm, dropout_prob=0.0,
            s_conditioning_channels=1, v_conditioning_dims=(6,), mid_attn=True,
        )
        ref_model = CUNet(shape=(1, 32, 16), **kw)
        sh_model = CUNet(shape=(1, 32, 16), ctx=ctx, **kw)

        b = 2
        z = jax.random.normal(jax.random.PRNGKey(0), (b, 32, 16, 1))
        t = jnp.array([0.3, 0.7])
        s = jax.random.normal(jax.random.PRNGKey(1), (b, 32, 16, 1))
        v = [jnp.arange(12.0).reshape(b, 6)]
        params = ref_model.init({"params": jax.random.PRNGKey(2)}, z, t,
                                s_conditioning=s, v_conditionings=v)
        params = jax.tree.map(lambda p: p + 0.01, params)
        ref = ref_model.apply(params, z, t, s_conditioning=s, v_conditionings=v)

        def f(params, z, t, s, v):
            return sh_model.apply(params, z, t, s_conditioning=s, v_conditionings=[v])

        out = jax.shard_map(
            f, mesh=mesh,
            in_specs=(P(), P("data", "sp", None, None), P("data"),
                      P("data", "sp", None, None), P("data", None)),
            out_specs=P("data", "sp", None, None), check_vma=False,
        )(params, z, t, s, v[0])
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-5)
