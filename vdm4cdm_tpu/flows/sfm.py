"""SFM — (stochastic) flow matching on the shared CUNet backbone.

Behavioral equivalent of the reference's ``mltools.models.sfm_model.LightSFM``
(reference trainSFM3D_c_c_from_field_name_thick_lowbatch.py:124-127): a
*velocity* network is trained to transport the conditioning field x0 to the
target field x1, on batch dicts {"x0", "x1", "conditioning_values"}
(reference :71-72). Where the reference leaves SFM sampling unimplemented
(reference generate_3D.py:16-17 raises NotImplementedError), this framework
ships Euler and Heun ODE integrators.

Stochastic interpolant:  x_t = (1-t) x0 + t x1 + sigma sqrt(t(1-t)) eps
Velocity target:         v*(x_t) = x1 - x0 + sigma d/dt[sqrt(t(1-t))] eps
With sigma=0 this reduces to the deterministic linear interpolant
(rectified-flow) objective  || v_theta(x_t, t) - (x1 - x0) ||^2.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.cunet import CUNet


class SFMLosses(NamedTuple):
    loss: jnp.ndarray


def _bshape(x: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return v.reshape(v.shape + (1,) * (x.ndim - 1)).astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class SFM:
    velocity_model: CUNet
    sigma: float = 0.0  # stochastic-interpolant noise scale; 0 = deterministic
    t_eps: float = 1e-3  # keep t away from {0,1} where sqrt(t(1-t))' blows up

    @property
    def sample_shape_nlast(self) -> Tuple[int, ...]:
        c, *spatial = self.velocity_model.shape
        return tuple(spatial) + (c,)

    def init_params(self, rng: jax.Array, batch_size: int = 1) -> Dict[str, Any]:
        """Init on an unsharded clone — see VDM.init_params."""
        from ..parallel.halo import NO_SHARD

        net = self.velocity_model.clone(ctx=NO_SHARD)
        c, *spatial = net.shape
        x = jnp.zeros((batch_size, *spatial, c), jnp.float32)
        t = jnp.zeros((batch_size,), jnp.float32)
        s = (
            jnp.zeros((batch_size, *spatial, net.s_conditioning_channels))
            if net.s_conditioning_channels
            else None
        )
        v = [jnp.zeros((batch_size, d)) for d in net.v_conditioning_dims]
        unet_params = net.init(
            {"params": rng}, x, t, s_conditioning=s, v_conditionings=v, train=False
        )["params"]
        return {"unet": unet_params}

    def velocity(
        self,
        params,
        x: jnp.ndarray,
        t: jnp.ndarray,
        v_conditionings: Sequence[jnp.ndarray] = (),
        s_conditioning: Optional[jnp.ndarray] = None,
        train: bool = False,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        return self.velocity_model.apply(
            {"params": params["unet"]},
            x,
            t,
            s_conditioning=s_conditioning,
            v_conditionings=v_conditionings,
            train=train,
            rngs=rngs,
        )

    def loss(self, params, batch: Dict[str, Any], rng: jax.Array, train: bool = True) -> SFMLosses:
        """batch: {"x0": (B,*sp,C), "x1": (B,*sp,C), "conditioning_values": [...]}."""
        x0, x1 = batch["x0"], batch["x1"]
        v_conds = batch.get("conditioning_values") or []
        b = x0.shape[0]
        rng_t, rng_eps, rng_drop = jax.random.split(rng, 3)
        ctx = self.velocity_model.ctx
        if ctx.axis is not None:
            idx = ctx.axis_index()
            rng_eps = jax.random.fold_in(rng_eps, idx)
            rng_drop = jax.random.fold_in(rng_drop, idx)

        u0 = jax.random.uniform(rng_t, ())
        t = jnp.mod(u0 + jnp.arange(b) / b, 1.0)
        t = jnp.clip(t, self.t_eps, 1.0 - self.t_eps)
        tb = _bshape(x0, t)

        xt = (1.0 - tb) * x0 + tb * x1
        target = x1 - x0
        if self.sigma > 0.0:
            eps = jax.random.normal(rng_eps, x0.shape, x0.dtype)
            g = jnp.sqrt(tb * (1.0 - tb))
            gdot = (1.0 - 2.0 * tb) / (2.0 * g)
            xt = xt + self.sigma * g * eps
            target = target + self.sigma * gdot * eps

        v_hat = self.velocity(params, xt, t, v_conditionings=v_conds,
                              s_conditioning=self._s_cond(x0), train=train,
                              dropout_rng=rng_drop)
        loss = jnp.mean(jnp.square(v_hat - target))
        return SFMLosses(loss)

    def _s_cond(self, x0: jnp.ndarray) -> Optional[jnp.ndarray]:
        """x0 doubles as the velocity net's SPATIAL conditioning channel when
        the net was built with one: the reference's SFM scripts construct
        CUNet with s_conditioning_channels=1 and LightSFM feeds the
        conditioning field alongside the transported state for the whole
        trajectory (reference trainSFM_c_uc_from_field_name.py:57,104-110,
        trainSFM3D_c_c_from_field_name_thick_lowbatch.py:112-127). Nets
        built without s channels (s_conditioning_channels=0) get None."""
        return x0 if self.velocity_model.s_conditioning_channels else None

    def draw_samples(
        self,
        params,
        x0: jnp.ndarray,
        n_sampling_steps: int = 250,
        v_conditionings: Sequence[jnp.ndarray] = (),
        method: str = "heun",
        rng: Optional[jax.Array] = None,
        churn: float = 1.0,
    ) -> jnp.ndarray:
        """Transport x0 (the conditioning field) to a sample of the target
        field. lax.scan over steps; jittable.

        method:
          "euler" | "heun" — the probability-flow ODE dx/dt = v_theta(x, t).
            Deterministic given the start point. When ``rng`` is provided and
            sigma > 0, the start point is noise-injected consistently with
            the sigma>0 interpolant (below), so distinct rngs give distinct
            posterior samples.
          "sde" — Euler-Maruyama on the marginal-preserving SDE family
            dx = [v + (a/2) s] dt + sqrt(a) dW (requires sigma > 0 and rng).
            The score of the x0-CONDITIONED interpolant marginal is available
            from the velocity alone because x0 is known at sampling time:
            with x_t = (1-t) x0 + t x1 + sigma g eps, g = sqrt(t(1-t)),
            taking E[.|x_t] of the interpolant and of the velocity target
            gives two linear equations in (E[x1|x_t], E[eps|x_t]); since
            gdot - g/t = -1/(2g) they solve to
                s(x, t) = (2/sigma^2) (v_theta(x, t) - (x - x0)/t).
            Churn a(t) = churn * sigma^2 * t(1-t) keeps every term bounded
            ((a/2) s = churn * t(1-t) * (v - (x-x0)/t) — sigma cancels).

        Start point: the interpolant marginal at t0 = t_eps is
        (1-t0) x0 + t0 x1 + sigma g(t0) eps; the O(t0) x1 term is dropped
        (unknown), giving x_start = (1-t0) x0 + sigma g(t0) eps. Integrating
        the learned transport from t0 pushes that marginal to the t=1 target,
        so rep diversity is exact up to the O(t_eps) start bias.

        The reference leaves SFM sampling entirely unimplemented
        (generate_3D.py:16-17); stochastic reps make its 128-rep posterior
        mean/std campaigns (calc_SS.py:150-158) meaningful for SFM here.
        """
        if method == "sde" and (self.sigma <= 0.0 or rng is None):
            raise ValueError("sde sampling requires sigma > 0 and an rng")
        t0 = self.t_eps if (rng is not None and self.sigma > 0.0) else 0.0
        if t0 > 0.0:
            # Stochastic start: the ideal velocity expands the sigma*sqrt(t)
            # start noise at rate ~1/(2t) near t0 (stiff). Quadratic time
            # warp puts near-geometric steps there (step log-ratio bounded),
            # where uniform steps of any practical count under-resolve —
            # validated against the closed-form Gaussian toy in
            # tests/test_sfm.py::TestStochasticSampling.
            u = jnp.linspace(0.0, 1.0, n_sampling_steps + 1)
            ts = t0 + (1.0 - t0) * u**2
        else:
            ts = jnp.linspace(0.0, 1.0, n_sampling_steps + 1)
        dts = ts[1:] - ts[:-1]

        if t0 > 0.0:
            rng, rng_ic = jax.random.split(rng)
            g0 = float(np.sqrt(t0 * (1.0 - t0)))
            x_start = (1.0 - t0) * x0 + self.sigma * g0 * jax.random.normal(
                rng_ic, x0.shape, x0.dtype)
        else:
            x_start = x0

        s_cond = self._s_cond(x0)

        def euler_body(x, i):
            v = self.velocity(params, x, jnp.full((x.shape[0],), ts[i]),
                              v_conditionings, s_conditioning=s_cond)
            return x + dts[i] * v, None

        def heun_body(x, i):
            t0_ = jnp.full((x.shape[0],), ts[i])
            t1_ = jnp.full((x.shape[0],), ts[i + 1])
            v0 = self.velocity(params, x, t0_, v_conditionings,
                               s_conditioning=s_cond)
            x_pred = x + dts[i] * v0
            v1 = self.velocity(params, x_pred, t1_, v_conditionings,
                               s_conditioning=s_cond)
            return x + 0.5 * dts[i] * (v0 + v1), None

        def sde_body(x, i):
            t = ts[i]
            v = self.velocity(params, x, jnp.full((x.shape[0],), t),
                              v_conditionings, s_conditioning=s_cond)
            a = churn * self.sigma**2 * t * (1.0 - t)
            drift = v + churn * t * (1.0 - t) * (v - (x - x0) / t)
            noise = jax.random.normal(jax.random.fold_in(rng, i), x.shape,
                                      x.dtype)
            return x + dts[i] * drift + jnp.sqrt(a * dts[i]) * noise, None

        body = {"euler": euler_body, "heun": heun_body, "sde": sde_body}[method]
        x, _ = jax.lax.scan(body, x_start, jnp.arange(n_sampling_steps))
        return x
