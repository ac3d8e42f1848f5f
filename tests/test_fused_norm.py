"""Fused Pallas GroupNorm+affine+SiLU+dropout vs the XLA oracle (interpret
mode on CPU). The oracle is ops/norm.py's norm_affine_act XLA composition."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vdm4cdm_tpu.ops.norm as norm_mod
from vdm4cdm_tpu.ops.norm import group_norm, group_norm_film, norm_affine_act
from vdm4cdm_tpu.ops.pallas.fused_norm import fused_norm_affine, supports

# heavy tier: interpreter-mode kernels / process spawns / e2e drives dominate
# 1-CPU wall time; `make test-fast` excludes them (round-4 VERDICT weak #4)
pytestmark = pytest.mark.slow

ZERO_SEED = jnp.zeros((1,), jnp.int32)

# See test_pallas_conv3d.py: interpret-mode oracle tests stay on CPU (the
# interpreted kernel graph is pathological to compile on the tunneled TPU).
# The real-kernel coverage in TPU mode is TestDropout (in-kernel PRNG) and
# the group_norm entrypoint tests below, which route through the REAL fused
# kernel on a TPU backend.
interpret_oracle = pytest.mark.skipif(
    os.environ.get("VDM4CDM_TEST_TPU") == "1",
    reason="interpret-mode oracle test (CPU)")


def _affine(rng, b, c):
    ka, kb = jax.random.split(rng)
    a = 1.0 + 0.3 * jax.random.normal(ka, (b, c), jnp.float32)
    bb = 0.2 * jax.random.normal(kb, (b, c), jnp.float32)
    return a, bb


@pytest.mark.parametrize("act", [None, "silu"])
@pytest.mark.parametrize(
    "shape,groups", [((2, 16, 16, 32), 8), ((1, 8, 8, 8, 16), 4), ((2, 64, 128), 8)]
)
@interpret_oracle
def test_forward_matches_xla(shape, groups, act):
    assert supports(shape, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32) * 2 + 0.5
    a, b = _affine(jax.random.PRNGKey(1), shape[0], shape[-1])
    ref = norm_affine_act(x, a, b, groups, act=act)
    got = fused_norm_affine(x, a, b, ZERO_SEED, groups, 1e-6, act, 0.0, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@interpret_oracle
@pytest.mark.parametrize("act", [None, "silu"])
def test_backward_matches_xla(act):
    shape, groups = (2, 8, 8, 32), 8
    x = jax.random.normal(jax.random.PRNGKey(2), shape, jnp.float32)
    a, b = _affine(jax.random.PRNGKey(3), shape[0], shape[-1])
    ct = jax.random.normal(jax.random.PRNGKey(4), shape, jnp.float32)

    def loss_pallas(x, a, b):
        y = fused_norm_affine(x, a, b, ZERO_SEED, groups, 1e-6, act, 0.0, True)
        return jnp.sum(y * ct)

    def loss_xla(x, a, b):
        return jnp.sum(norm_affine_act(x, a, b, groups, act=act) * ct)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, a, b)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, a, b)
    for got, ref in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


@interpret_oracle
def test_bf16_io():
    shape, groups = (2, 64, 64), 8
    x = jax.random.normal(jax.random.PRNGKey(5), shape, jnp.bfloat16)
    a, b = _affine(jax.random.PRNGKey(6), 2, 64)
    ref = norm_affine_act(x, a, b, groups, act="silu")
    got = fused_norm_affine(x, a, b, ZERO_SEED, groups, 1e-6, "silu", 0.0, True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


@interpret_oracle
def test_dropout_interpret_smoke():
    """Interpret mode's prng_random_bits are all-zero (every element kept), so
    this only checks the keep-scale plumbing; the real mask statistics run on
    TPU below."""
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 16, 32), jnp.float32)
    a = jnp.zeros((2, 32), jnp.float32)
    b = jnp.ones((2, 32), jnp.float32)  # pre-dropout value == 1
    y = fused_norm_affine(x, a, b, jnp.asarray([3], jnp.int32), 8, 1e-6, None,
                          0.25, True)
    np.testing.assert_allclose(np.asarray(y), 1.0 / 0.75, rtol=1e-6)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="in-kernel PRNG needs real TPU (interpret bits are 0)")
class TestDropout:
    """In-kernel PRNG dropout: statistics, determinism, and the backward's
    bit-identical mask regeneration. TPU-hardware-only."""

    shape, groups, p = (2, 32, 32, 32), 8, 0.25

    def _run(self, seed):
        # a=0, b=1: the pre-dropout value is exactly 1 everywhere, so y IS
        # the scaled keep mask (a=1/b=0 with constant x would make GN's xhat
        # — and y — identically zero, hiding the mask).
        x = jax.random.normal(jax.random.PRNGKey(0), self.shape, jnp.float32)
        a = jnp.zeros((2, 32), jnp.float32)
        b = jnp.ones((2, 32), jnp.float32)
        return fused_norm_affine(
            x, a, b, jnp.asarray([seed], jnp.int32), self.groups, 1e-6, None,
            self.p, False)

    def test_mask_statistics(self):
        # constant input normalizes to ~0; use affine b to get a nonzero value
        x = jax.random.normal(jax.random.PRNGKey(7), self.shape, jnp.float32)
        a = jnp.zeros((2, 32), jnp.float32)
        b = jnp.ones((2, 32), jnp.float32)  # pre-dropout value == 1
        y = fused_norm_affine(
            x, a, b, jnp.asarray([3], jnp.int32), self.groups, 1e-6, None,
            self.p, False)
        y = np.asarray(y)
        kept = y != 0
        # dropped fraction ~ p, kept values scaled by 1/(1-p)
        assert abs(kept.mean() - (1 - self.p)) < 0.02
        np.testing.assert_allclose(y[kept], 1.0 / (1 - self.p), rtol=1e-6)
        # unbiased: E[y] ~ 1
        assert abs(y.mean() - 1.0) < 0.03

    def test_deterministic_given_seed(self):
        y1, y2, y3 = self._run(11), self._run(11), self._run(12)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        assert np.any(np.asarray(y1) != np.asarray(y3))

    def test_backward_uses_same_mask(self):
        """grad wrt x through dropout must be 0 exactly where the forward
        dropped — proves the backward regenerates the identical mask."""
        x = jax.random.normal(jax.random.PRNGKey(8), self.shape, jnp.float32)
        a = jnp.zeros((2, 32), jnp.float32)  # kill the GN-stat grad paths
        # b=1 so y == mask/(1-p): the kept set must be inferable from y != 0
        # (b=0 makes y identically zero and kept_frac degenerate).
        b = jnp.ones((2, 32), jnp.float32)
        seed = jnp.asarray([21], jnp.int32)

        def f(bb):
            return fused_norm_affine(x, a, bb, seed, self.groups, 1e-6, None,
                                     self.p, False)

        y = f(b)
        # db = sum over spatial of dy*mask; with ct=1, db/count = kept fraction
        db = jax.grad(lambda bb: jnp.sum(f(bb)))(b)
        kept_frac = (np.asarray(y) != 0).reshape(2, -1, 32).mean(axis=1)
        expect = kept_frac / (1 - self.p) * (self.shape[1] * self.shape[2])
        np.testing.assert_allclose(np.asarray(db), expect, rtol=1e-5)


def test_group_norm_entrypoint_film_identity():
    """group_norm_film with zero FiLM == plain group_norm + silu."""
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 16, 16, 32))
    scale = jnp.linspace(0.5, 1.5, 32)
    bias = jnp.linspace(-0.2, 0.2, 32)
    z = jnp.zeros((2, 32), jnp.float32)
    ref = group_norm(x, scale, bias, 8, act="silu")
    got = group_norm_film(x, scale, bias, z, z, 8, act="silu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


def test_film_gradients_flow_to_params():
    """dgamma/dbeta/dFiLM flow through the (B, C) composition around the op."""
    x = jax.random.normal(jax.random.PRNGKey(10), (2, 8, 8, 16))
    scale = jnp.linspace(0.5, 1.5, 16)
    bias = jnp.zeros(16)
    fs = 0.1 * jax.random.normal(jax.random.PRNGKey(11), (2, 16))
    fsh = 0.1 * jax.random.normal(jax.random.PRNGKey(12), (2, 16))

    def loss(scale, bias, fs, fsh):
        return jnp.sum(
            jnp.square(group_norm_film(x, scale, bias, fs, fsh, 4, act="silu")))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(scale, bias, fs, fsh)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.asarray(g) != 0)


def test_supports_gating():
    assert supports((2, 16, 16, 32), jnp.float32)       # p=4
    assert supports((2, 16, 16, 128), jnp.float32)      # p=1
    assert supports((2, 16, 16, 48), jnp.float32)       # p=8 -> 384 lanes
    assert not supports((2, 16, 16, 3), jnp.float32)    # no pack factor
    assert not supports((2, 5, 1), jnp.float32)         # rows not tileable


@interpret_oracle
@pytest.mark.parametrize("act", [None, "silu"])
def test_ext_sums_matches_monolith(act):
    """External-stats entry (conv-emitted GN statistics): given the SAME
    per-lane sums the stats sweep would compute, the ext entry reproduces the
    monolith exactly — forward and gradients — and gives the sums a zero
    cotangent (the conv kernel's bwd relies on that contract)."""
    from vdm4cdm_tpu.ops.pallas.fused_norm import (
        _run_sums,
        fused_norm_affine_packed,
        fused_norm_affine_packed_ext,
    )

    C, p, groups = 32, 4, 8
    xq = jax.random.normal(jax.random.PRNGKey(7), (2, 64, p * C), jnp.float32)
    a, b = _affine(jax.random.PRNGKey(8), 2, C)
    sums = _run_sums(xq, True)

    ref = fused_norm_affine_packed(xq, a, b, ZERO_SEED, C, groups, 1e-6, act,
                                   0.0, True)
    got = fused_norm_affine_packed_ext(xq, a, b, ZERO_SEED, sums, C, groups,
                                       1e-6, act, 0.0, None, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    ct = jax.random.normal(jax.random.PRNGKey(9), xq.shape, jnp.float32)

    def loss_ref(xq, a, b):
        y = fused_norm_affine_packed(xq, a, b, ZERO_SEED, C, groups, 1e-6,
                                     act, 0.0, True)
        return jnp.sum(y * ct)

    def loss_ext(xq, a, b, sums):
        y = fused_norm_affine_packed_ext(xq, a, b, ZERO_SEED, sums, C, groups,
                                         1e-6, act, 0.0, None, True)
        return jnp.sum(y * ct)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(xq, a, b)
    g_ext = jax.grad(loss_ext, argnums=(0, 1, 2, 3))(xq, a, b, sums)
    for got, ref in zip(g_ext[:3], g_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
    # NOTE: g_ext[0] (dx) must be the FULL GroupNorm gradient (it matched the
    # monolith above, whose stats are internal) — so the sums cotangent is
    # zero by construction, not merely by convention:
    np.testing.assert_array_equal(np.asarray(g_ext[3]), 0.0)


@interpret_oracle
@pytest.mark.parametrize("mode", ["circular", "zeros"])
def test_conv_emitted_stats_chain_matches_oracle(mode, monkeypatch):
    """conv_packed(emit_stats) -> packed_norm_affine_act(ext_sums): the whole
    conv-emitted-statistics chain (the ResBlock conv1 -> GN2 fast path)
    against the plain XLA composition, forward and gradients."""
    import vdm4cdm_tpu.ops.conv as convmod
    from vdm4cdm_tpu.ops.conv import conv_packed
    from vdm4cdm_tpu.ops.norm import packed_norm_affine_act
    from vdm4cdm_tpu.ops.packed import pack, unpack

    monkeypatch.setattr(convmod, "_CONV_IMPL", "pallas")
    monkeypatch.setattr(norm_mod, "_PALLAS_GN_ENV", "force")
    monkeypatch.setattr(norm_mod, "_PALLAS_GN", True)

    from jax.experimental.pallas import tpu as pltpu

    D, H, W, cin, cout, p, groups = 4, 8, 8, 32, 32, 4, 8
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((2, D, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.1,
                    jnp.float32)
    bias = jnp.asarray(rng.standard_normal(cout) * 0.3, jnp.float32)
    a, b = _affine(jax.random.PRNGKey(22), 2, cout)

    def chain_fast(x, w, bias, a, b):
        h, sums = conv_packed(pack(x, p), w, bias, padding_mode=mode,
                              emit_stats=True)
        assert sums is not None, "stats path not taken"
        y = packed_norm_affine_act(h, a, b, groups, act="silu",
                                   ext_sums=sums)
        return unpack(y)

    def chain_oracle(x, w, bias, a, b):
        # pure-XLA conv (conv_nd would follow the monkeypatched "pallas" impl)
        if mode == "circular":
            xp = jnp.pad(x, ((0, 0),) + ((1, 1),) * 3 + ((0, 0),),
                         mode="wrap")
            pads = [(0, 0)] * 3
        else:
            xp, pads = x, [(1, 1)] * 3
        h = jax.lax.conv_general_dilated(
            xp, w, (1, 1, 1), pads,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bias
        return norm_affine_act(h, a, b, groups, act="silu")

    with pltpu.force_tpu_interpret_mode():
        got = chain_fast(x, w, bias, a, b)
    want = chain_oracle(x, w, bias, a, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    ct = jnp.asarray(rng.standard_normal(want.shape), jnp.float32)

    def loss(chain):
        return lambda *args: jnp.sum(chain(*args) * ct)

    with pltpu.force_tpu_interpret_mode():
        g_fast = jax.grad(loss(chain_fast), argnums=(0, 1, 2, 3, 4))(
            x, w, bias, a, b)
    g_ora = jax.grad(loss(chain_oracle), argnums=(0, 1, 2, 3, 4))(
        x, w, bias, a, b)
    for got, ref in zip(g_fast, g_ora):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_near_constant_group_no_nan():
    """Two-pass variance cancellation regression (round-5 NaN hunt): a group
    whose values are a large constant plus a tiny perturbation has
    mean^2 >> var, and the kernel's sum-based var = E[y^2] - E[y]^2 lands
    negative at f32 — before the clamp, rsqrt(var + eps) NaN'd the whole
    tensor (reproduced on hardware: 1-in-8 sampler reps of the blessed model
    went full-NaN; runs/ training logs' 'divergences' match the signature).
    """
    # mean 997, seed 0: the f32 sum-based var of this input is -0.5625
    # (verified by the equivalent numpy reduction) — guaranteed negative,
    # not merely near-zero, so the pre-clamp kernel NaNs deterministically
    rng = np.random.default_rng(0)
    x = jnp.asarray(997.0 + 1e-4 * rng.standard_normal((2, 64, 16)),
                    jnp.float32)
    a = jnp.ones((2, 16), jnp.float32)
    b = jnp.zeros((2, 16), jnp.float32)
    y = fused_norm_affine(x, a, b, ZERO_SEED, 4, 1e-6, None, 0.0, True)
    assert np.isfinite(np.asarray(y)).all()
    # and the XLA sum-based packed path (ops/norm.py) holds the same contract
    from vdm4cdm_tpu.ops.packed import Packed

    xq = Packed(x[:, None, :, :], (1, 64, 1), 16, 1)
    yq = norm_mod.packed_group_norm_film(xq, jnp.ones(16), jnp.zeros(16),
                                         None, 4)
    assert np.isfinite(np.asarray(yq.data)).all()
