"""lane_matmul (streaming packed 1x1-conv matmul) vs the XLA oracle, in
interpret mode (no TPU). The kernel exists to avoid XLA's 805 MB carrier
transposes at decoder skip projections (docs/DESIGN.md §7); these tests pin
fwd + all three gradients and the conv_packed k=1 routing."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

# See test_pallas_conv3d.py: interpret-mode oracle tests stay on CPU.
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    os.environ.get("VDM4CDM_TEST_TPU") == "1",
    reason="interpret-mode oracle test (CPU)")]

import vdm4cdm_tpu.ops.conv as convmod
from vdm4cdm_tpu.ops.conv import conv_nd, conv_packed
from vdm4cdm_tpu.ops.packed import pack, unpack
from vdm4cdm_tpu.ops.pallas.lanemm import lane_matmul, supports

# (B, R, K, N) — lane-dense shapes: K, N multiples of 128
CASES = [
    (2, 64, 128, 256),
    (1, 48, 384, 128),   # decoder skip-proj shape class (pack 3 concat)
    (2, 32, 256, 384),
]


def _oracle(x, w, b):
    return (x @ w + b.astype(x.dtype)).astype(x.dtype)


class TestForward:
    @pytest.mark.parametrize("dims", CASES)
    def test_matches_oracle(self, dims):
        B, R, K, N = dims
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, R, K)) * 0.5, jnp.float32)
        w = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.float32)
        b = jnp.asarray(rng.standard_normal((N,)), jnp.float32)
        assert supports(x.shape, K, N, x.dtype)
        with pltpu.force_tpu_interpret_mode():
            got = lane_matmul(x, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(_oracle(x, w, b)),
                                   rtol=1e-5, atol=1e-5)

    def test_supports_rejects_ragged(self):
        assert not supports((2, 64, 100), 100, 128, jnp.float32)   # K % 128
        assert not supports((2, 64, 128), 128, 130, jnp.float32)   # N % 128
        assert not supports((2, 7, 128), 128, 128, jnp.float32)    # R not tileable
        assert not supports((64, 128), 128, 128, jnp.float32)      # ndim


class TestGrad:
    def test_dx_dw_db_match_oracle(self):
        B, R, K, N = 2, 32, 128, 256
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((B, R, K)) * 0.5, jnp.float32)
        w = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.float32)
        b = jnp.asarray(rng.standard_normal((N,)), jnp.float32)
        ct = jnp.asarray(rng.standard_normal((B, R, N)), jnp.float32)

        def loss_p(x, w, b):
            return jnp.sum(lane_matmul(x, w, b) * ct)

        def loss_o(x, w, b):
            return jnp.sum(_oracle(x, w, b) * ct)

        with pltpu.force_tpu_interpret_mode():
            gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, w, b)
        go = jax.grad(loss_o, argnums=(0, 1, 2))(x, w, b)
        for a, c in zip(gp, go):
            scale = max(1e-6, float(jnp.max(jnp.abs(c))))
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(c) / scale,
                                       rtol=2e-5, atol=2e-5)


class TestConvPackedRouting:
    """conv_packed k=1 takes the lane_matmul path when it is enabled (the
    kernel is opt-in, VDM4CDM_LANEMM=1 — see ops/conv.py) and matches the
    unpack -> conv_nd -> repack oracle."""

    def test_packed_1x1_matches_oracle(self, monkeypatch):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 128)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((1, 1, 1, 128, 128)) * 0.05,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal((128,)), jnp.float32)
        pk = pack(x, p=1)

        import vdm4cdm_tpu.ops.pallas.lanemm as lanemm_mod
        calls = []
        real = lanemm_mod.lane_matmul

        def spy(*a, **kw):
            calls.append(1)
            return real(*a, **kw)

        monkeypatch.setattr(lanemm_mod, "lane_matmul", spy)
        monkeypatch.setattr(convmod, "_CONV_IMPL", "pallas")
        monkeypatch.setattr(convmod, "_LANEMM", True)
        with pltpu.force_tpu_interpret_mode():
            got = unpack(conv_packed(pk, w, b))
        assert calls, "conv_packed did not route through lane_matmul"
        monkeypatch.setattr(convmod, "_CONV_IMPL", "xla")
        want = conv_nd(x, w, b, stride=1, padding_mode="zeros")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
