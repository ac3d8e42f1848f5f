"""Pallas fused GroupNorm vs the XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdm4cdm_tpu.ops import group_norm
from vdm4cdm_tpu.ops.pallas import fused_group_norm


@pytest.mark.parametrize("act", [None, "silu"])
@pytest.mark.parametrize("shape,groups", [((2, 16, 16, 32), 8), ((1, 8, 8, 8, 16), 4)])
def test_matches_xla(shape, groups, act):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, shape, jnp.float32) * 2 + 0.5
    scale = jnp.linspace(0.5, 1.5, shape[-1])
    bias = jnp.linspace(-0.2, 0.2, shape[-1])
    ref = group_norm(x, scale, bias, groups, act=act)
    got = fused_group_norm(x, scale, bias, groups, act=act, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_custom_vjp_matches_xla_grad():
    from vdm4cdm_tpu.ops.pallas import fused_group_norm_vjp

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 16))
    scale = jnp.linspace(0.5, 1.5, 16)
    bias = jnp.zeros(16)

    def loss_pallas(x, s, b):
        return jnp.sum(jnp.square(fused_group_norm_vjp(x, s, b, 4, 1e-6, "silu", True)))

    def loss_xla(x, s, b):
        return jnp.sum(jnp.square(group_norm(x, s, b, 4, act="silu")))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, scale, bias)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_bf16_io():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32), jnp.bfloat16)
    scale = jnp.ones(32)
    bias = jnp.zeros(32)
    ref = group_norm(x, scale, bias, 8, act="silu")
    got = fused_group_norm(x, scale, bias, 8, act="silu", interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )
