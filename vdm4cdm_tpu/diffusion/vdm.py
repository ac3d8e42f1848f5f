"""Variational Diffusion Model — ELBO loss, ancestral sampler, step decomposition.

TPU-native re-design of the reference's ``mltools.models.vdm_model.LightVDM``
(API pinned by reference call sites, SURVEY.md §2b):

  * batch dict {"x", "conditioning", "conditioning_values"} for training
    (reference trainVDM3D_c_c_from_field_name_thick_lowbatch.py:75-76);
  * ``draw_samples(batch_size, n_sampling_steps=250, s_conditioning,
    v_conditionings, ...)`` (reference generate_3D.py:61, test.ipynb cell 13);
  * ``sample_zt_given_zs(zs, t, s)`` — forward diffusion q(z_t | z_s), t > s;
  * ``sample_zs_given_zt(..., return_ddnm=True) -> (w_z, w_x0t, x0t, scale)``
    — the ancestral-step decomposition DDNM requires (reference
    src/utils.py:294-299).

Everything is pure functions over a params pytree ``{"unet": ..., "gamma": ...}``
so losses jit, samplers ``lax.scan`` with donated buffers, and the whole thing
drops inside ``shard_map`` for spatially sharded fields unchanged.

VDM math (Kingma et al. 2021), variance preserving:
    z_t = alpha(t) x + sigma(t) eps,  alpha^2 = sigmoid(-gamma), sigma^2 = sigmoid(gamma)
    L_diffusion = 1/2 E_{t,eps}[ gamma'(t) || eps - eps_hat ||^2 ]   (per-element mean)
    L_latent    = KL(q(z_1|x) || N(0,1)) per element
    L_recon     = -E_{q(z_0|x)} log N(x | z_0/alpha_0, sigma_0^2/alpha_0^2)
Ancestral step t -> s (s < t), with c = -expm1(gamma_s - gamma_t):
    x0t  = (z_t - sigma_t eps_hat) / alpha_t
    z_s  = (alpha_s/alpha_t)(1 - c) z_t + (alpha_s c) x0t + sigma_s sqrt(c) eps
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.cunet import CUNet
from .schedule import NoiseSchedule, alpha_sigma


class VDMLosses(NamedTuple):
    loss: jnp.ndarray
    diffusion: jnp.ndarray
    latent: jnp.ndarray
    recon: jnp.ndarray
    gamma_0: jnp.ndarray
    gamma_1: jnp.ndarray


def _bshape(x: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Broadcast per-batch scalars v (B,) over x's trailing dims."""
    return v.reshape(v.shape + (1,) * (x.ndim - 1)).astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class VDM:
    """Pure-function VDM over a CUNet score model.

    score_model.shape == (C, *spatial) is the sample shape (channels-first by
    convention, matching reference src/utils.py:287's use of
    ``vdm.model.score_model.shape``); compute is channels-last internally.
    """

    score_model: CUNet
    schedule: NoiseSchedule

    # ---------------------------------------------------------------- helpers
    @property
    def sample_shape_nlast(self) -> Tuple[int, ...]:
        c, *spatial = self.score_model.shape
        return tuple(spatial) + (c,)

    def init_params(self, rng: jax.Array, batch_size: int = 1) -> Dict[str, Any]:
        """Initialize outside any mesh: params are ctx-independent (kernel
        shapes don't depend on sharding), so init always runs on an unsharded
        clone — collectives in the sharded model can't trace outside shard_map."""
        from ..parallel.halo import NO_SHARD

        net = self.score_model.clone(ctx=NO_SHARD)
        c, *spatial = net.shape
        z = jnp.zeros((batch_size, *spatial, c), jnp.float32)
        t = jnp.zeros((batch_size,), jnp.float32)
        s = (
            jnp.zeros((batch_size, *spatial, net.s_conditioning_channels))
            if net.s_conditioning_channels
            else None
        )
        v = [jnp.zeros((batch_size, d)) for d in net.v_conditioning_dims]
        unet_params = net.init(
            {"params": rng}, z, t, s_conditioning=s, v_conditionings=v, train=False
        )["params"]
        return {"unet": unet_params, "gamma": self.schedule.init_params()}

    def gamma(self, params, t):
        return self.schedule.gamma(params["gamma"], t)

    def eps_hat(
        self,
        params,
        z: jnp.ndarray,
        t: jnp.ndarray,
        s_conditioning: Optional[jnp.ndarray],
        v_conditionings: Sequence[jnp.ndarray],
        train: bool = False,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        return self.score_model.apply(
            {"params": params["unet"]},
            z,
            t,
            s_conditioning=s_conditioning,
            v_conditionings=v_conditionings,
            train=train,
            rngs=rngs,
        )

    # ------------------------------------------------------------------ loss
    def loss(
        self,
        params,
        batch: Dict[str, Any],
        rng: jax.Array,
        train: bool = True,
    ) -> VDMLosses:
        """batch: {"x": (B,*sp,C), "conditioning": (B,*sp,Cs)|None,
        "conditioning_values": [(B,d), ...]} — channels-last.

        Times use low-discrepancy sampling (a single uniform offset plus an
        arithmetic ladder mod 1) to cut gradient variance of the t-integral.

        Under spatial sharding (score_model.ctx.axis set) this runs per-shard
        inside shard_map: the time key stays shared across spatial shards (all
        shards of one sample must see one t), while noise/dropout keys fold in
        the shard index (noise must be iid across the volume).
        """
        x = batch["x"]
        s_cond = batch.get("conditioning")
        v_conds = batch.get("conditioning_values") or []
        b = x.shape[0]
        rng_t, rng_eps, rng_drop = jax.random.split(rng, 3)
        ctx = self.score_model.ctx
        if ctx.axis is not None:
            idx = ctx.axis_index()
            rng_eps = jax.random.fold_in(rng_eps, idx)
            rng_drop = jax.random.fold_in(rng_drop, idx)

        u0 = jax.random.uniform(rng_t, ())
        t = jnp.mod(u0 + jnp.arange(b) / b, 1.0)

        g_t = self.gamma(params, t)
        alpha_t, sigma_t = alpha_sigma(g_t)
        eps = jax.random.normal(rng_eps, x.shape, x.dtype)
        z_t = _bshape(x, alpha_t) * x + _bshape(x, sigma_t) * eps

        eps_hat = self.eps_hat(params, z_t, t, s_cond, v_conds, train=train,
                               dropout_rng=rng_drop)

        mse = jnp.mean(jnp.square(eps - eps_hat), axis=tuple(range(1, x.ndim)))
        g_prime = self.schedule.gamma_prime(params["gamma"], t)
        loss_diff = 0.5 * jnp.mean(g_prime * mse)

        # latent (prior) loss at t=1, per element
        g_1 = self.gamma(params, jnp.float32(1.0))
        alpha_1_sq = jax.nn.sigmoid(-g_1)
        sigma_1_sq = jax.nn.sigmoid(g_1)
        mean_sq = alpha_1_sq * jnp.mean(jnp.square(x))
        loss_latent = 0.5 * (mean_sq + sigma_1_sq - jnp.log(sigma_1_sq) - 1.0)

        # reconstruction loss at t=0 (continuous Gaussian decoder), per
        # element, in closed form: with z_0 = a0 x + s0 eps0 and decoder
        # N(z_0/a0, s0^2/a0^2), E[-log p] = 1/2 (E[eps0^2] + log 2 pi var0)
        # = 1/2 (1 + log 2 pi var0) — the x/eps0 dependence cancels exactly,
        # so no noise volume is materialized and the estimator has zero
        # variance (the gamma-gradient path through var0 is unchanged).
        g_0 = self.gamma(params, jnp.float32(0.0))
        var0 = jax.nn.sigmoid(g_0) / jax.nn.sigmoid(-g_0)  # sigma_0^2/alpha_0^2
        loss_recon = 0.5 * (1.0 + jnp.log(2.0 * jnp.pi * var0))

        total = loss_diff + loss_latent + loss_recon
        return VDMLosses(total, loss_diff, loss_latent, loss_recon, g_0, g_1)

    # --------------------------------------------------------------- sampling
    def sample_zt_given_zs(self, params, zs, t, s, rng) -> jnp.ndarray:
        """Forward diffusion q(z_t | z_s) for t > s (DDNM time travel,
        reference src/utils.py:294)."""
        g_t = self.gamma(params, t)
        g_s = self.gamma(params, s)
        alpha_t, sigma_t = alpha_sigma(g_t)
        alpha_s, _ = alpha_sigma(g_s)
        c = -jnp.expm1(g_s - g_t)
        eps = jax.random.normal(rng, zs.shape, zs.dtype)
        return (alpha_t / alpha_s) * zs + jnp.sqrt(jax.nn.sigmoid(g_t) * c) * eps

    def ddnm_coeffs(
        self,
        params,
        zt: jnp.ndarray,
        t: jnp.ndarray,
        s: jnp.ndarray,
        s_conditioning: Optional[jnp.ndarray] = None,
        v_conditionings: Sequence[jnp.ndarray] = (),
    ):
        """The reference's ``sample_zs_given_zt(..., return_ddnm=True)``:
        returns (w_z, w_x0t, x0t, scale) with z_s = w_z*z_t + w_x0t*x0t +
        scale*eps (reference src/utils.py:296-299)."""
        b = zt.shape[0]
        g_t = self.gamma(params, t)
        g_s = self.gamma(params, s)
        alpha_t, sigma_t = alpha_sigma(g_t)
        alpha_s, sigma_s = alpha_sigma(g_s)
        c = -jnp.expm1(g_s - g_t)
        t_b = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (b,))
        eps_hat = self.eps_hat(params, zt, t_b, s_conditioning, v_conditionings)
        x0t = (zt - sigma_t * eps_hat) / alpha_t
        w_z = (alpha_s / alpha_t) * (1.0 - c)
        w_x0t = alpha_s * c
        scale = sigma_s * jnp.sqrt(c)
        return w_z, w_x0t, x0t, scale

    def sample_zs_given_zt(
        self,
        params,
        zt,
        t,
        s,
        rng,
        s_conditioning=None,
        v_conditionings=(),
    ) -> jnp.ndarray:
        w_z, w_x0t, x0t, scale = self.ddnm_coeffs(
            params, zt, t, s, s_conditioning, v_conditionings
        )
        eps = jax.random.normal(rng, zt.shape, zt.dtype)
        return w_z * zt + w_x0t * x0t + scale * eps

    def draw_samples(
        self,
        params,
        rng: jax.Array,
        batch_size: int = 1,
        n_sampling_steps: int = 250,
        s_conditioning: Optional[jnp.ndarray] = None,
        v_conditionings: Sequence[jnp.ndarray] = (),
        sample_shape: Optional[Tuple[int, ...]] = None,
    ) -> jnp.ndarray:
        """Ancestral sampling from the prior: returns normalized samples,
        channels-last (B, *spatial, C). 250 steps by default (reference
        src/utils.py:277, test.ipynb cell 13). lax.scan over steps.

        Works inside shard_map for spatially sharded sampling: pass the LOCAL
        ``sample_shape`` (per-shard block); noise keys fold in the shard index
        so the global field is iid while the time ladder stays shared."""
        ctx = self.score_model.ctx
        if ctx.axis is not None:
            rng = jax.random.fold_in(rng, ctx.axis_index())
        shape = (batch_size,) + (sample_shape or self.sample_shape_nlast)
        rng_z, rng_steps = jax.random.split(rng)
        z = jax.random.normal(rng_z, shape, jnp.float32)
        steps = jnp.linspace(1.0, 0.0, n_sampling_steps + 1)

        def body(carry, i):
            z, key = carry
            key, sub = jax.random.split(key)
            z = self.sample_zs_given_zt(
                params, z, steps[i], steps[i + 1], sub,
                s_conditioning=s_conditioning, v_conditionings=v_conditionings,
            )
            return (z, key), None

        (z, _), _ = jax.lax.scan(body, (z, rng_steps), jnp.arange(n_sampling_steps))
        # decode mean of p(x | z_0)
        g_0 = self.gamma(params, jnp.float32(0.0))
        alpha_0, _ = alpha_sigma(g_0)
        return z / alpha_0
