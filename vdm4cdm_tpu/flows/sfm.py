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

        v_hat = self.velocity(params, xt, t, v_conditionings=v_conds, train=train,
                              dropout_rng=rng_drop)
        loss = jnp.mean(jnp.square(v_hat - target))
        return SFMLosses(loss)

    def draw_samples(
        self,
        params,
        x0: jnp.ndarray,
        n_sampling_steps: int = 250,
        v_conditionings: Sequence[jnp.ndarray] = (),
        method: str = "heun",
    ) -> jnp.ndarray:
        """Integrate dx/dt = v_theta(x, t) from t=0 (x0 = conditioning field)
        to t=1 (target field). Deterministic; lax.scan over steps."""
        dt = 1.0 / n_sampling_steps
        ts = jnp.linspace(0.0, 1.0, n_sampling_steps + 1)

        def euler_body(x, i):
            v = self.velocity(params, x, jnp.full((x.shape[0],), ts[i]), v_conditionings)
            return x + dt * v, None

        def heun_body(x, i):
            t0 = jnp.full((x.shape[0],), ts[i])
            t1 = jnp.full((x.shape[0],), ts[i + 1])
            v0 = self.velocity(params, x, t0, v_conditionings)
            x_pred = x + dt * v0
            v1 = self.velocity(params, x_pred, t1, v_conditionings)
            return x + 0.5 * dt * (v0 + v1), None

        body = heun_body if method == "heun" else euler_body
        x, _ = jax.lax.scan(body, x0, jnp.arange(n_sampling_steps))
        return x
