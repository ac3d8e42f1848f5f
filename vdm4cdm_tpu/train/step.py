"""Jitted train/eval steps — single-device and mesh-sharded.

The sharded step runs the whole loss+grad+update inside ``jax.shard_map`` over
the (data, sp) mesh: params replicated, batch sharded (batch dim over ``data``,
first spatial dim over ``sp``). Per-shard local-mean losses are pmean'd across
the mesh (equal shard sizes ⇒ mean of local means == global mean), gradients
pmean'd, then the optimizer update is computed redundantly-but-identically on
every shard — the standard replicated-optimizer SPMD pattern (update FLOPs are
negligible next to the UNet).

The model (VDM or SFM) passed here must be built with the matching ShardCtx in
its CUNet (models/cunet.py handles halo exchange / GroupNorm psums per-op).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..parallel.shard import batch_pspec
from ..utils.mesh import AXES
from .state import TrainState


def _loss_and_metrics(model, params, batch, rng):
    losses = model.loss(params, batch, rng, train=True)
    return losses.loss, losses._asdict()


def _batch_specs(batch_template: dict, ndim_spatial: int):
    """PartitionSpecs matching a batch dict: fields sharded (data, sp), value
    vectors sharded on data only."""
    bspec = batch_pspec(ndim_spatial)

    def spec_for(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 2 + ndim_spatial:
            return bspec
        return P(AXES.data)

    return jax.tree.map(spec_for, batch_template)


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    batch_template: Optional[dict] = None,
    ema_decay: float = 0.0,
) -> Callable[[TrainState, dict, jax.Array], tuple[TrainState, dict]]:
    """Returns step(state, batch, rng) -> (state, metrics). Jitted; donates state."""

    def _update(state: TrainState, grads):
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema_decay > 0.0 and ema is not None:
            ema = jax.tree.map(
                lambda e, p: e * ema_decay + (1.0 - ema_decay) * p, ema, params
            )
        return params, opt_state, ema

    if mesh is None:

        @partial(jax.jit, donate_argnums=(0,))
        def step(state: TrainState, batch, rng):
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: _loss_and_metrics(model, p, batch, rng), has_aux=True
            )(state.params)
            metrics["grad_norm"] = optax.global_norm(grads)
            params, opt_state, ema = _update(state, grads)
            return TrainState(state.step + 1, params, opt_state, ema), metrics

        return step

    assert batch_template is not None, "sharded step needs a batch template"
    ndim_spatial = model_ndim_spatial(model)
    specs = _batch_specs(batch_template, ndim_spatial)
    axes = tuple(mesh.axis_names)

    def shard_step(state: TrainState, batch, rng):
        # distinct data-parallel noise streams; sp folding happens in the loss
        rng = jax.random.fold_in(rng, jax.lax.axis_index(AXES.data))

        (loss, metrics), grads = jax.value_and_grad(
            lambda p: _loss_and_metrics(model, p, batch, rng), has_aux=True
        )(state.params)
        grads = jax.lax.pmean(grads, axes)
        metrics = jax.lax.pmean(metrics, axes)
        metrics["grad_norm"] = optax.global_norm(grads)
        params, opt_state, ema = _update(state, grads)
        return TrainState(state.step + 1, params, opt_state, ema), metrics

    sharded = jax.shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(), specs, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def model_ndim_spatial(model) -> int:
    net = getattr(model, "score_model", None) or getattr(model, "velocity_model")
    return len(net.shape) - 1


def make_eval_step(model, mesh: Optional[Mesh] = None, batch_template=None):
    """Validation loss (no dropout, no update)."""

    def eval_fn(params, batch, rng):
        losses = model.loss(params, batch, rng, train=False)
        return losses._asdict()

    if mesh is None:
        return jax.jit(eval_fn)

    specs = _batch_specs(batch_template, model_ndim_spatial(model))
    axes = tuple(mesh.axis_names)

    def shard_eval(params, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(AXES.data))
        metrics = eval_fn(params, batch, rng)
        return jax.lax.pmean(metrics, axes)

    return jax.jit(
        jax.shard_map(
            shard_eval, mesh=mesh, in_specs=(P(), specs, P()), out_specs=P(),
            check_vma=False,
        )
    )
