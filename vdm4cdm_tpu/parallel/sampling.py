"""Spatially sharded sampling — generate native-resolution volumes across chips.

The reference can only sample volumes that fit one GPU (and downsamples data to
make them fit). Here the sampler itself runs under shard_map: the evolving
z-field is sharded over the ``sp`` mesh axis, every UNet evaluation inside the
scan halo-exchanges over ICI, and only the final field is gathered (or kept
sharded for sharded evaluation).

VDM: noise keys fold in the shard index (handled inside VDM.draw_samples), so
the global initial z and all ancestral noise are iid while the time ladder is
shared — statistically identical to unsharded sampling.
SFM: the ODE is deterministic, so sharded and unsharded sampling agree to
numerical precision — used as an end-to-end correctness test of the halo
machinery (tests/test_sharded_sampling.py).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..utils.mesh import AXES
from .shard import batch_pspec


def make_sharded_vdm_sampler(
    vdm_sharded,
    mesh: Mesh,
    batch_size: int = 1,
    n_sampling_steps: int = 250,
    with_s_conditioning: bool = True,
):
    """Returns jitted sample(params, rng, s_conditioning, v_conditionings) with
    the conditioning field + output sharded (data, sp). ``vdm_sharded`` must be
    built with the mesh's ShardCtx (see parallel.shard.make_shard_ctx).
    ``s_conditioning`` may be passed as None iff ``with_s_conditioning`` is
    False (unconditional models — shard_map specs are static)."""
    ctx = vdm_sharded.score_model.ctx
    nd = vdm_sharded.score_model.ndim_spatial
    n_sp = mesh.shape[AXES.sp]
    n_data = mesh.shape[AXES.data]
    assert batch_size % n_data == 0, "batch_size must divide the data axis"
    local_batch = batch_size // n_data
    gshape = vdm_sharded.sample_shape_nlast
    local_shape = tuple(
        s // n_sp if d == ctx.spatial_dim else s for d, s in enumerate(gshape[:-1])
    ) + (gshape[-1],)
    bspec = batch_pspec(nd)

    def body(params, rng, cond, vvals):
        if ctx.data_axis is not None:  # distinct noise per data shard
            rng = jax.random.fold_in(rng, jax.lax.axis_index(ctx.data_axis))
        return vdm_sharded.draw_samples(
            params, rng, batch_size=local_batch, n_sampling_steps=n_sampling_steps,
            s_conditioning=cond, v_conditionings=list(vvals),
            sample_shape=local_shape,
        )

    if with_s_conditioning:
        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), bspec, P(AXES.data)),
            out_specs=bspec,
            check_vma=False,
        )
        return jax.jit(fn)

    uncond = jax.shard_map(
        lambda params, rng, vvals: body(params, rng, None, vvals),
        mesh=mesh,
        in_specs=(P(), P(), P(AXES.data)),
        out_specs=bspec,
        check_vma=False,
    )
    jitted = jax.jit(uncond)
    return lambda params, rng, cond, vvals: jitted(params, rng, vvals)


def make_sharded_sfm_sampler(
    sfm_sharded,
    mesh: Mesh,
    n_sampling_steps: int = 250,
    method: str = "heun",
    stochastic: bool = False,
):
    """Returns a jitted sharded SFM sampler with x0 and the result sharded
    (data, sp).

    stochastic=False: sample(params, x0, v_conditionings) — deterministic ODE
    transport (sharded == unsharded to numerical precision; the halo-machinery
    end-to-end test).
    stochastic=True: sample(params, x0, rng, v_conditionings) — noise-injected
    start (+ SDE churn when method="sde"; flows/sfm.py draw_samples). The rng
    folds in both mesh indices: data shards are distinct posterior reps, and
    the sp shards of one volume draw iid noise voxels (the time ladder and
    drift math are shard-independent), mirroring the VDM sampler's RNG
    discipline."""
    nd = sfm_sharded.velocity_model.ndim_spatial
    ctx = sfm_sharded.velocity_model.ctx
    bspec = batch_pspec(nd)

    def per_shard(params, x0, vvals, rng=None):
        if rng is not None:
            if ctx.data_axis is not None:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(ctx.data_axis))
            if ctx.axis is not None:
                rng = jax.random.fold_in(rng, ctx.axis_index())
        return sfm_sharded.draw_samples(
            params, x0, n_sampling_steps=n_sampling_steps,
            v_conditionings=list(vvals), method=method, rng=rng,
        )

    if stochastic:
        fn = jax.shard_map(
            lambda params, x0, rng, vvals: per_shard(params, x0, vvals, rng),
            mesh=mesh,
            in_specs=(P(), bspec, P(), P(AXES.data)),
            out_specs=bspec,
            check_vma=False,
        )
        return jax.jit(fn)

    fn = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), bspec, P(AXES.data)),
        out_specs=bspec,
        check_vma=False,
    )
    return jax.jit(fn)
