"""Concat-free decoder path (ops.packed.PackedPair) vs materialized oracles.

The decoder's skip joins ride a LAZY concat: GroupNorm computes joint group
statistics over the two carriers (fused_norm_affine_packed2 — the CP
split-kernel pattern with channel-sum concat in place of psum) and the convs
split their weights (conv(concat(h,s), W) = conv(h, W_h) + conv(s, W_s)), so
the joined tensor — whose materialization cost ~805 MB lane-pad/copy chains
per full-resolution site in the HLO audit (docs/DESIGN.md §7) — is never
written. These tests pin the pair path to the materialized-concat oracles:
kernel-level (fwd + full VJP, joint groups straddling the carrier boundary),
conv-level (both paddings, k3 and the 1x1 skip projection), and CUNet
end-to-end (fwd + grads, interpret mode on CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import vdm4cdm_tpu.ops.conv as convmod
import vdm4cdm_tpu.ops.norm as normmod
from vdm4cdm_tpu.models import CUNet
from vdm4cdm_tpu.ops.conv import conv_nd, conv_packed
from vdm4cdm_tpu.ops.packed import Packed, PackedPair, pack, pair_packable, unpack
from vdm4cdm_tpu.ops.pallas.fused_norm import fused_norm_affine_packed2

# heavy tier: interpreter-mode kernels / process spawns / e2e drives dominate
# 1-CPU wall time; `make test-fast` excludes them (round-4 VERDICT weak #4)
pytestmark = pytest.mark.slow


def _rand(key, shape, scale=1.0, shift=0.0):
    return scale * jax.random.normal(
        jax.random.PRNGKey(key), shape, jnp.float32) + shift


def _gn_oracle(x, a, b, groups, eps, act):
    B, C = x.shape[0], x.shape[-1]
    xs = x.reshape(B, -1, groups, C // groups)
    mean = xs.mean(axis=(1, 3), keepdims=True)
    var = ((xs - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xhat = ((xs - mean) / jnp.sqrt(var + eps)).reshape(B, -1, C)
    y = xhat * a[:, None, :] + b[:, None, :]
    if act == "silu":
        y = jax.nn.silu(y)
    return y.reshape(x.shape)


@pytest.fixture
def force_pallas(monkeypatch):
    monkeypatch.setattr(convmod, "_CONV_IMPL", "pallas")
    monkeypatch.setattr(normmod, "_PALLAS_GN_ENV", "force")
    monkeypatch.setattr(normmod, "_PALLAS_GN", True)


class TestFusedNormPacked2:
    """Joint-stat GN over two carriers == GN over the materialized concat.
    Ca=64, Cb=32, groups=8: joint group size 12 straddles the carrier
    boundary at channel 64 — the fold matrices must mix the halves."""

    B, D, H, W = 2, 8, 8, 8
    Ca, Cb, P, G = 64, 32, 4, 8

    def _data(self):
        xa = _rand(0, (self.B, self.D, self.H, self.W, self.Ca), 1.3, 0.2)
        xb = _rand(1, (self.B, self.D, self.H, self.W, self.Cb), 0.7, -0.4)
        C = self.Ca + self.Cb
        a = 1.0 + 0.3 * _rand(2, (self.B, C))
        b = 0.2 * _rand(3, (self.B, C))
        return xa, xb, a, b

    @pytest.mark.parametrize("act", [None, "silu"])
    def test_forward_matches_concat_oracle(self, act):
        xa, xb, a, b = self._data()
        seed = jnp.zeros((1,), jnp.int32)
        fa, fb = pack(xa, self.P).flat_rows(), pack(xb, self.P).flat_rows()
        ya, yb = fused_norm_affine_packed2(
            fa, fb, a, b, seed, self.Ca, self.Cb, self.G, 1e-6, act, 0.0,
            None, True)
        ref = _gn_oracle(jnp.concatenate([xa, xb], -1), a, b, self.G, 1e-6,
                         act)
        got_a = unpack(Packed(ya.reshape(pack(xa, self.P).data.shape),
                              (self.D, self.H, self.W), self.Ca, self.P))
        got_b = unpack(Packed(yb.reshape(pack(xb, self.P).data.shape),
                              (self.D, self.H, self.W), self.Cb, self.P))
        got = jnp.concatenate([got_a, got_b], -1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("act", [None, "silu"])
    def test_vjp_matches_concat_oracle(self, act):
        xa, xb, a, b = self._data()
        ct = _rand(4, (self.B, self.D, self.H, self.W, self.Ca + self.Cb))
        seed = jnp.zeros((1,), jnp.int32)
        pa, pb = pack(xa, self.P), pack(xb, self.P)
        cta = pack(ct[..., :self.Ca], self.P).flat_rows()
        ctb = pack(ct[..., self.Ca:], self.P).flat_rows()

        def loss(fa, fb, a, b):
            ya, yb = fused_norm_affine_packed2(
                fa, fb, a, b, seed, self.Ca, self.Cb, self.G, 1e-6, act,
                0.0, None, True)
            return jnp.sum(ya * cta) + jnp.sum(yb * ctb)

        def loss_ref(xa, xb, a, b):
            y = _gn_oracle(jnp.concatenate([xa, xb], -1), a, b, self.G,
                           1e-6, act)
            return jnp.sum(y * ct)

        g = jax.grad(loss, argnums=(0, 1, 2, 3))(
            pa.flat_rows(), pb.flat_rows(), a, b)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xa, xb, a, b)
        dxa = unpack(Packed(g[0].reshape(pa.data.shape), pa.spatial,
                            self.Ca, self.P))
        dxb = unpack(Packed(g[1].reshape(pb.data.shape), pb.spatial,
                            self.Cb, self.P))
        np.testing.assert_allclose(np.asarray(dxa), np.asarray(gr[0]),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(dxb), np.asarray(gr[1]),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(g[2]), np.asarray(gr[2]),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(g[3]), np.asarray(gr[3]),
                                   rtol=2e-4, atol=2e-5)


class TestShardedPair:
    """The pair fused norm under `sp` sharding: per-carrier local sums are
    psum'd over the mesh axis before the joint-group fold — sharded pair ==
    unsharded concat oracle."""

    @pytest.mark.parametrize("act", [None, "silu"])
    def test_sharded_pair_norm_matches_global_oracle(self, act, force_pallas):
        from jax.sharding import PartitionSpec as P

        from vdm4cdm_tpu.ops.norm import packed_norm_affine_act
        from vdm4cdm_tpu.parallel import ShardCtx
        from vdm4cdm_tpu.utils import make_mesh

        mesh = make_mesh(n_data=1, n_sp=4)
        ctx = ShardCtx(axis="sp", spatial_dim=0)
        Ca, Cb, G = 64, 32, 8
        xa = _rand(20, (2, 16, 8, 8, Ca)) * 1.4 + 0.2
        xb = _rand(21, (2, 16, 8, 8, Cb)) * 0.6 - 0.3
        a = 1.0 + 0.2 * _rand(22, (2, Ca + Cb))
        b = 0.1 * _rand(23, (2, Ca + Cb))
        ref = _gn_oracle(jnp.concatenate([xa, xb], -1), a, b, G, 1e-6, act)

        def f(xas, xbs, a, b):
            pair = PackedPair(pack(xas, 4), pack(xbs, 4))
            out = packed_norm_affine_act(pair, a, b, G, act=act, ctx=ctx)
            assert isinstance(out, PackedPair)
            return unpack(out.a), unpack(out.b)

        with pltpu.force_tpu_interpret_mode():
            ya, yb = jax.shard_map(
                f, mesh=mesh,
                in_specs=(P(None, "sp"), P(None, "sp"), P(), P()),
                out_specs=(P(None, "sp"), P(None, "sp")), check_vma=False,
            )(xa, xb, a, b)
        got = jnp.concatenate([ya, yb], -1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


class TestConvPackedPair:
    """Split-weight conv on the pair == conv on the materialized concat."""

    @pytest.mark.parametrize("pm", ["circular", "zeros"])
    @pytest.mark.parametrize("k", [1, 3])
    def test_matches_concat_oracle(self, pm, k, monkeypatch):
        monkeypatch.setattr(convmod, "_CONV_IMPL", "xla")
        xa = _rand(5, (1, 8, 8, 8, 64), 0.8)
        xb = _rand(6, (1, 8, 8, 8, 32), 1.1)
        w = _rand(7, (k, k, k, 96, 32), 0.15)
        bias = _rand(8, (32,))
        pair = PackedPair(pack(xa, 4), pack(xb, 4))

        def loss_pair(xa_p, xb_p, w, bias):
            y = conv_packed(PackedPair(xa_p, xb_p), w, bias,
                            padding_mode=pm)
            return jnp.sum(jnp.square(unpack(y))), unpack(y)

        def loss_ref(xa, xb, w, bias):
            y = conv_nd(jnp.concatenate([xa, xb], -1), w, bias, stride=1,
                        padding_mode=pm)
            return jnp.sum(jnp.square(y)), y

        (l, y), g = jax.value_and_grad(
            loss_pair, argnums=(0, 1, 2, 3), has_aux=True)(
                pair.a, pair.b, w, bias)
        (lr, yr), gr = jax.value_and_grad(
            loss_ref, argnums=(0, 1, 2, 3), has_aux=True)(xa, xb, w, bias)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                                   rtol=1e-4, atol=1e-5)
        # grads accumulate over the volume; split-vs-joint reassociation
        # leaves ~1e-4 absolute jitter on O(10)-scale elements
        np.testing.assert_allclose(np.asarray(unpack(g[0])),
                                   np.asarray(gr[0]), rtol=1e-4, atol=3e-4)
        np.testing.assert_allclose(np.asarray(unpack(g[1])),
                                   np.asarray(gr[1]), rtol=1e-4, atol=3e-4)
        np.testing.assert_allclose(np.asarray(g[2]), np.asarray(gr[2]),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(g[3]), np.asarray(gr[3]),
                                   rtol=1e-3, atol=1e-3)


class TestCUNetPair:
    """End to end: CUNet with lazy pair concats (Pallas interpret mode forced)
    == the same model on the plain XLA path."""

    def _net(self):
        return CUNet(shape=(1, 8, 8, 8), chs=(32, 32, 64, 64), norm_groups=8,
                     s_conditioning_channels=1, v_conditioning_dims=(6,),
                     dropout_prob=0.0, conv_padding_mode="circular")

    def _inputs(self):
        z = _rand(9, (1, 8, 8, 8, 1))
        sc = _rand(10, (1, 8, 8, 8, 1))
        vv = [jnp.ones((1, 6))]
        t = jnp.asarray([0.4])
        return z, t, sc, vv

    def test_pair_gating(self):
        # the flagship decoder join: 64 + 32 -> 32 at p=4
        assert pair_packable((16, 16, 16), 64, 32, 32, 4, jnp.float32)
        # a half whose lanes don't tile to 128 at this p
        assert not pair_packable((16, 16, 16), 48, 48, 32, 2, jnp.float32)

    def test_cunet_pair_matches_xla(self, monkeypatch):
        net = self._net()
        z, t, sc, vv = self._inputs()
        monkeypatch.setenv("VDM4CDM_PACKED", "0")
        params = net.init({"params": jax.random.PRNGKey(11)}, z, t,
                          s_conditioning=sc, v_conditionings=vv)["params"]
        params = jax.tree_util.tree_map(lambda a: a + 0.01, params)

        def loss(p):
            out = net.apply({"params": p}, z, t, s_conditioning=sc,
                            v_conditionings=vv)
            return jnp.sum(jnp.square(out)), out

        (lr, ref), gr = jax.value_and_grad(loss, has_aux=True)(params)

        monkeypatch.setattr(convmod, "_CONV_IMPL", "pallas")
        monkeypatch.setattr(normmod, "_PALLAS_GN_ENV", "force")
        monkeypatch.setattr(normmod, "_PALLAS_GN", True)
        monkeypatch.setenv("VDM4CDM_PACKED", "1")
        monkeypatch.setenv("VDM4CDM_PAIR", "1")
        # guard: the pair fast path must actually engage (otherwise this
        # test silently compares the oracle with itself)
        import vdm4cdm_tpu.ops.pallas.fused_norm as fnmod
        calls = []
        orig = fnmod.fused_norm_affine_packed2

        def counted(*a, **kw):
            calls.append(1)
            return orig(*a, **kw)

        monkeypatch.setattr(fnmod, "fused_norm_affine_packed2", counted)
        with pltpu.force_tpu_interpret_mode():
            (l, out), g = jax.value_and_grad(loss, has_aux=True)(params)
        assert calls, "PackedPair fused-norm path did not engage"

        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-4, atol=5e-5)
        flat_r = dict(jax.tree_util.tree_leaves_with_path(
            jax.tree_util.tree_map(np.asarray, gr)))
        for path, leaf in jax.tree_util.tree_leaves_with_path(
                jax.tree_util.tree_map(np.asarray, g)):
            np.testing.assert_allclose(leaf, flat_r[path], rtol=5e-3,
                                       atol=5e-4, err_msg=str(path))
