"""Pallas im2col conv3d vs the XLA oracle (ops.conv.conv_nd) — forward and
both gradients, circular and zeros padding, on the interpreter (no TPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

# Interpret-mode oracle tests are CPU tests: on the TPU backend the
# interpreted kernel lowers to a pathological XLA graph whose remote compile
# never finishes (and a wedged compile blocks the tunneled device for every
# other process). Real-hardware kernel coverage comes from the real-path
# tests (test_packed CUNet, fused-norm dropout) and experiments' probes.
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    os.environ.get("VDM4CDM_TEST_TPU") == "1",
    reason="interpret-mode oracle test (CPU); see module docstring")]

from vdm4cdm_tpu.ops.conv import conv_nd
from vdm4cdm_tpu.ops.pallas.conv3d import (
    conv3d_pallas,
    conv3d_pallas_zhalo,
    supports,
    supports_zhalo,
)


def _oracle(x, w, mode):
    return conv_nd(x.astype(jnp.float32), w.astype(jnp.float32),
                   padding_mode=mode)


CASES = [
    # (D, H, W, Cin, Cout)
    (6, 8, 8, 16, 16),   # pack 8
    (8, 4, 8, 32, 32),   # pack 4
    (3, 8, 16, 16, 24),  # pack 8, Wp=2
    (2, 8, 8, 16, 16),   # D=2: both dz neighbors are the same plane
    (4, 8, 8, 64, 64),   # pack 2
    (3, 8, 8, 96, 32),   # pack 4 (decoder concat width), 384-lane rows
    (3, 8, 8, 128, 64),  # pack 1
    (2, 4, 64, 16, 16),  # Wp=8: the 8-aligned concat edge-GEMM path
]


class TestForward:
    @pytest.mark.parametrize("mode", ["circular", "zeros"])
    @pytest.mark.parametrize("dims", CASES)
    def test_matches_oracle(self, mode, dims):
        D, H, W, cin, cout = dims
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, D, H, W, cin)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.1,
                        jnp.float32)
        assert supports(x.shape, w.shape, (1, 1, 1))
        with pltpu.force_tpu_interpret_mode():
            got = conv3d_pallas(x, w, mode)
        want = _oracle(x, w, mode)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


class TestGrad:
    @pytest.mark.parametrize("mode", ["circular", "zeros"])
    def test_dx_dw_match_oracle(self, mode):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 16)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 16)) * 0.1,
                        jnp.float32)
        ct = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 16)), jnp.float32)

        def loss_p(x, w):
            return jnp.sum(conv3d_pallas(x, w, mode) * ct)

        def loss_o(x, w):
            return jnp.sum(_oracle(x, w, mode) * ct)

        with pltpu.force_tpu_interpret_mode():
            gx_p, gw_p = jax.grad(loss_p, argnums=(0, 1))(x, w)
        gx_o, gw_o = jax.grad(loss_o, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_o),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_o),
                                   rtol=1e-4, atol=1e-4)


class TestZHalo:
    """Pre-haloed (sharded `sp` path) variant: halo-pad the full volume on
    the z dim, run the valid-in-z kernel, compare against the periodic/zeros
    SAME conv on the full volume — the exact contract of the halo-exchange
    composition in ops/conv.py."""

    @pytest.mark.parametrize("mode", ["circular", "zeros"])
    @pytest.mark.parametrize("dims", [(6, 8, 8, 16, 16), (4, 8, 8, 32, 32)])
    def test_matches_full_volume_conv(self, mode, dims):
        D, H, W, cin, cout = dims
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((2, D, H, W, cin)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.1,
                        jnp.float32)
        zpad = "wrap" if mode == "circular" else "constant"
        xh = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)), mode=zpad)
        assert supports_zhalo(xh.shape, w.shape, itemsize=4)
        with pltpu.force_tpu_interpret_mode():
            got = conv3d_pallas_zhalo(xh, w, mode)
        want = _oracle(x, w, mode)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("mode", ["circular", "zeros"])
    def test_grads_match_oracle(self, mode):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 16)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 16)) * 0.1,
                        jnp.float32)
        ct = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 16)), jnp.float32)
        zpad = "wrap" if mode == "circular" else "constant"

        def loss_p(x, w):
            xh = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)),
                         mode=zpad)
            return jnp.sum(conv3d_pallas_zhalo(xh, w, mode) * ct)

        def loss_o(x, w):
            return jnp.sum(_oracle(x, w, mode) * ct)

        with pltpu.force_tpu_interpret_mode():
            gx_p, gw_p = jax.grad(loss_p, argnums=(0, 1))(x, w)
        gx_o, gw_o = jax.grad(loss_o, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_o),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_o),
                                   rtol=1e-4, atol=1e-4)


class TestSupports:
    def test_rejects_out_of_scope(self):
        assert not supports((2, 8, 8, 8, 3), (3, 3, 3, 3, 32), (1, 1, 1))   # cin<8
        assert not supports((2, 8, 8, 8, 32), (3, 3, 3, 32, 32), (2, 2, 2))  # stride
        assert not supports((2, 8, 8, 8, 32), (1, 1, 1, 32, 32), (1, 1, 1))  # k=1
        assert not supports((2, 8, 8, 4, 32), (3, 3, 3, 32, 32), (1, 1, 1))  # W<8
        assert supports((2, 8, 8, 8, 16), (3, 3, 3, 16, 16), (1, 1, 1))
        assert supports((2, 2, 8, 8, 32), (3, 3, 3, 32, 32), (1, 1, 1))  # D=2 ok
        # cout=12 packs forward but its BACKWARD (dx: 12 -> 16) has no
        # 128-lane pack factor — forward stays supported; dx takes the one-
        # XLA-conv fallback inside _bwd (_transposed_ok gate)
        assert supports((2, 8, 8, 8, 16), (3, 3, 3, 16, 12), (1, 1, 1))
        assert supports_zhalo((2, 10, 8, 8, 16), (3, 3, 3, 16, 12))

    @pytest.mark.parametrize("mode", ["circular", "zeros"])
    def test_grad_with_xla_dx_fallback(self, mode):
        # 16 -> 12: dx's transposed geometry (12-channel input) has no pack
        # factor, so _bwd routes dx through _conv_xla_fallback. Both grads
        # must still match the oracle.
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 16)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 12)) * 0.1,
                        jnp.float32)

        def loss_pallas(x, w):
            return jnp.sum(jnp.sin(conv3d_pallas(x, w, mode)))

        def loss_oracle(x, w):
            return jnp.sum(jnp.sin(_oracle(x, w, mode)))

        with pltpu.force_tpu_interpret_mode():
            gx, gw = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
        ex, ew = jax.grad(loss_oracle, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(ex),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(ew),
                                   rtol=1e-4, atol=1e-4)


class TestBiasStats:
    """Bias-folded, stats-emitting packed entries (conv3d_pallas_packed_bs /
    conv3d_pallas_zhalo_packed_bs) — the entries the packed ResBlock fast
    path actually runs (ops/conv.conv_packed): out == oracle conv + bias;
    sums == per-lane (sum y, sum y^2) of the f32 output; dx/dw/db all match
    the oracle chain (db comes out of the dw kernel's grid accumulation)."""

    DIMS = (4, 8, 8, 32, 32)  # pack 4
    P = 4

    def _data(self, seed=11):
        D, H, W, cin, cout = self.DIMS
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((2, D, H, W, cin)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.1,
                        jnp.float32)
        bias = jnp.asarray(rng.standard_normal(cout) * 0.5, jnp.float32)
        return x, w, bias

    @pytest.mark.parametrize("mode", ["circular", "zeros"])
    def test_forward_and_sums(self, mode):
        from vdm4cdm_tpu.ops.pallas.conv3d import conv3d_pallas_packed_bs

        D, H, W, cin, cout = self.DIMS
        x, w, bias = self._data()
        xq = x.reshape(2, D, H * W // self.P, self.P * cin)
        with pltpu.force_tpu_interpret_mode():
            out, sums = conv3d_pallas_packed_bs(xq, w, bias, mode, (D, H, W))
        want = _oracle(x, w, mode) + bias
        np.testing.assert_allclose(
            np.asarray(out.reshape(want.shape)), np.asarray(want),
            rtol=1e-4, atol=1e-4)
        wq = np.asarray(want).reshape(2, D, H * W // self.P, self.P * cout)
        np.testing.assert_allclose(np.asarray(sums[:, 0]),
                                   wq.sum(axis=(1, 2)), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(sums[:, 1]),
                                   (wq * wq).sum(axis=(1, 2)),
                                   rtol=1e-3, atol=1e-3)

    @pytest.mark.parametrize("mode", ["circular", "zeros"])
    def test_grads_incl_bias(self, mode):
        from vdm4cdm_tpu.ops.pallas.conv3d import conv3d_pallas_packed_bs

        D, H, W, cin, cout = self.DIMS
        x, w, bias = self._data(12)
        xq = x.reshape(2, D, H * W // self.P, self.P * cin)

        def loss_p(xq, w, bias):
            out, _sums = conv3d_pallas_packed_bs(xq, w, bias, mode, (D, H, W))
            return jnp.sum(jnp.sin(out))

        def loss_o(x, w, bias):
            return jnp.sum(jnp.sin(_oracle(x, w, mode) + bias))

        with pltpu.force_tpu_interpret_mode():
            gx_p, gw_p, gb_p = jax.grad(loss_p, argnums=(0, 1, 2))(xq, w, bias)
        gx_o, gw_o, gb_o = jax.grad(loss_o, argnums=(0, 1, 2))(x, w, bias)
        np.testing.assert_allclose(np.asarray(gx_p.reshape(x.shape)),
                                   np.asarray(gx_o), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_o),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_o),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("mode", ["circular", "zeros"])
    def test_zhalo_forward_sums_and_grads(self, mode):
        from vdm4cdm_tpu.ops.pallas.conv3d import (
            conv3d_pallas_zhalo_packed_bs,
        )

        D, H, W, cin, cout = self.DIMS
        x, w, bias = self._data(13)
        zpad = "wrap" if mode == "circular" else "constant"

        def haloed(x):
            xh = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)),
                         mode=zpad)
            return xh.reshape(2, D + 2, H * W // self.P, self.P * cin)

        with pltpu.force_tpu_interpret_mode():
            out, sums = conv3d_pallas_zhalo_packed_bs(
                haloed(x), w, bias, mode, (D, H, W))
        want = _oracle(x, w, mode) + bias
        np.testing.assert_allclose(
            np.asarray(out.reshape(want.shape)), np.asarray(want),
            rtol=1e-4, atol=1e-4)
        wq = np.asarray(want).reshape(2, D, H * W // self.P, self.P * cout)
        np.testing.assert_allclose(np.asarray(sums[:, 0]),
                                   wq.sum(axis=(1, 2)), rtol=1e-3, atol=1e-3)

        def loss_p(x, w, bias):
            out, _ = conv3d_pallas_zhalo_packed_bs(
                haloed(x), w, bias, mode, (D, H, W))
            return jnp.sum(jnp.sin(out))

        def loss_o(x, w, bias):
            return jnp.sum(jnp.sin(_oracle(x, w, mode) + bias))

        with pltpu.force_tpu_interpret_mode():
            gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, w, bias)
        go = jax.grad(loss_o, argnums=(0, 1, 2))(x, w, bias)
        for got, ref in zip(gp, go):
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("mode", ["circular", "zeros"])
    def test_bias_only_no_stats(self, mode):
        """with_stats=False: in-kernel bias stays, no sums output (bare out),
        identical values and grads — the entry a ResBlock's second conv runs
        (its consumer is not a GroupNorm; advisor round-3 finding)."""
        from vdm4cdm_tpu.ops.pallas.conv3d import conv3d_pallas_packed_bs

        D, H, W, cin, cout = self.DIMS
        x, w, bias = self._data(14)
        xq = x.reshape(2, D, H * W // self.P, self.P * cin)
        with pltpu.force_tpu_interpret_mode():
            out = conv3d_pallas_packed_bs(xq, w, bias, mode, (D, H, W),
                                          with_stats=False)
        assert isinstance(out, jnp.ndarray)  # bare array, no sums
        want = _oracle(x, w, mode) + bias
        np.testing.assert_allclose(
            np.asarray(out.reshape(want.shape)), np.asarray(want),
            rtol=1e-4, atol=1e-4)

        def loss_p(xq, w, bias):
            out = conv3d_pallas_packed_bs(xq, w, bias, mode, (D, H, W),
                                          with_stats=False)
            return jnp.sum(jnp.sin(out))

        def loss_o(x, w, bias):
            return jnp.sum(jnp.sin(_oracle(x, w, mode) + bias))

        with pltpu.force_tpu_interpret_mode():
            gp = jax.grad(loss_p, argnums=(0, 1, 2))(xq, w, bias)
        go = jax.grad(loss_o, argnums=(0, 1, 2))(x, w, bias)
        np.testing.assert_allclose(np.asarray(gp[0].reshape(x.shape)),
                                   np.asarray(go[0]), rtol=1e-4, atol=1e-4)
        for got, ref in zip(gp[1:], go[1:]):
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)

    def test_sums_bf16_tolerance(self):
        """bf16 carriers: the emitted sums accumulate from the PRE-CAST f32
        output, while a monolithic GN would sweep the bf16-rounded values —
        document and bound that gap (conv3d.py precision note): relative
        difference O(2^-8) of the sum scale, far inside GN's eps headroom."""
        from vdm4cdm_tpu.ops.pallas.conv3d import conv3d_pallas_packed_bs

        D, H, W, cin, cout = self.DIMS
        x, w, bias = self._data(15)
        xq = x.reshape(2, D, H * W // self.P, self.P * cin).astype(jnp.bfloat16)
        with pltpu.force_tpu_interpret_mode():
            out, sums = conv3d_pallas_packed_bs(xq, w, bias, "circular",
                                                (D, H, W))
        assert out.dtype == jnp.bfloat16
        # stats recomputed from the bf16-cast output the carrier actually holds
        f = out.astype(jnp.float32)
        s1_bf16 = jnp.sum(f, axis=(1, 2))
        s2_bf16 = jnp.sum(f * f, axis=(1, 2))
        n = D * H * W // self.P
        scale1 = float(jnp.mean(jnp.abs(sums[:, 0]))) + n ** 0.5
        scale2 = float(jnp.mean(sums[:, 1]))
        assert float(jnp.max(jnp.abs(sums[:, 0] - s1_bf16))) < 2e-2 * scale1
        assert float(jnp.max(jnp.abs(sums[:, 1] - s2_bf16))) < 2e-2 * scale2
