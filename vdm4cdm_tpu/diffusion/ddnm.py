"""DDNM — zero-shot linear inverse problems on a trained VDM.

Behavioral equivalent of the reference's ``get_ddnm_result`` (reference
src/utils.py:277-304): at each of the ``n_sampling_steps`` reverse steps,
optionally time-travel back ``l`` steps by re-noising with q(z_t | z_s), then
walk forward replacing the data-space estimate x0t by its null-space projection

    x0t_r = AT(y) + x0t - AT(A(x0t))

so samples are consistent with the measurement y = A(x) while the model fills
the null space of A.

Fully jittable: the outer loop is ``lax.scan``; the inner (time-travel) loop is
a dynamic-bound ``fori_loop`` with L_i = min(l[i], i) as in the reference.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .vdm import VDM


def ddnm_sample(
    vdm: VDM,
    params,
    rng: jax.Array,
    y: jnp.ndarray,
    A: Callable[[jnp.ndarray], jnp.ndarray],
    AT: Callable[[jnp.ndarray], jnp.ndarray],
    n_sampling_steps: int = 250,
    l: Union[int, Sequence[int], np.ndarray] = 10,
    s_conditioning: Optional[jnp.ndarray] = None,
    v_conditionings: Sequence[jnp.ndarray] = (),
    return_all: bool = False,
) -> jnp.ndarray:
    """Returns the final null-space-corrected x0 estimate (B, *spatial, C).

    With ``return_all=True``, returns the full per-step trajectory of x0
    estimates, stacked along a leading step axis (n_sampling_steps, B,
    *spatial, C) — the reference's ``get_ddnm_result(return_all=True)``
    (reference src/utils.py:281,300-303), used by its notebooks to inspect
    convergence of the inverse-problem solve."""
    if isinstance(l, int):
        l = np.full(n_sampling_steps, l)
    l = np.asarray(l)
    assert l.ndim == 1 and len(l) == n_sampling_steps, "l must have one entry per step"
    assert np.all(l >= 0) and np.issubdtype(l.dtype, np.integer)

    batch = y.shape[0]
    steps = jnp.linspace(1.0, 0.0, n_sampling_steps + 1)
    ls = jnp.asarray(np.minimum(l, np.arange(n_sampling_steps)), jnp.int32)
    ATy = AT(y)

    rng, rz = jax.random.split(rng)
    z = jax.random.normal(rz, (batch,) + vdm.sample_shape_nlast, jnp.float32)

    def outer(carry, i):
        z, key = carry
        L = ls[i]
        key, k_renoise = jax.random.split(key)
        # time travel: re-noise from t=steps[i] back up to t=steps[i-L]
        z = vdm.sample_zt_given_zs(params, z, t=steps[i - L], s=steps[i], rng=k_renoise)

        def inner(m, inner_carry):
            z, key, _ = inner_carry
            j = L - m  # j runs L, L-1, ..., 0 as in the reference loop
            key, k_eps = jax.random.split(key)
            w_z, w_x0t, x0t, scale = vdm.ddnm_coeffs(
                params, z, t=steps[i - j], s=steps[i + 1 - j],
                s_conditioning=s_conditioning, v_conditionings=v_conditionings,
            )
            x0t_r = ATy + x0t - AT(A(x0t))
            eps = jax.random.normal(k_eps, z.shape, z.dtype)
            z = w_z * z + w_x0t * x0t_r + scale * eps
            return (z, key, x0t_r)

        z, key, x0t_r = jax.lax.fori_loop(0, L + 1, inner, (z, key, jnp.zeros_like(z)))
        return (z, key), x0t_r

    (_, _), x0t_rs = jax.lax.scan(outer, (z, rng), jnp.arange(n_sampling_steps))
    return x0t_rs if return_all else x0t_rs[-1]
