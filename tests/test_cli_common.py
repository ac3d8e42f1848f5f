"""cli/_common helpers: unsharded_clone and the validation-figure hook."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdm4cdm_tpu.cli._common import make_validation_figure_fn, unsharded_clone
from vdm4cdm_tpu.config import build_datamodule, build_model
from vdm4cdm_tpu.parallel.halo import ShardCtx
from vdm4cdm_tpu.presets import preset


def test_unsharded_clone_strips_ctx():
    cfg = preset("smoke_vdm_2d")
    ctx = ShardCtx(axis="sp", spatial_dim=0, data_axis="data")
    model = build_model(cfg, ctx=ctx)
    assert model.score_model.ctx.axis == "sp"
    plain = unsharded_clone(model)
    assert plain.score_model.ctx.axis is None
    # SFM flavor
    cfg2 = preset("smoke_sfm_3d")
    sfm = build_model(cfg2, ctx=ctx)
    assert unsharded_clone(sfm).velocity_model.ctx.axis is None


@pytest.mark.slow
def test_figure_hook_renders():
    cfg = preset("smoke_vdm_2d")
    cfg.data.cropsize = 16
    cfg.model.chs = (8, 8, 8, 8)
    cfg.model.norm_groups = 4
    cfg.run.n_figure_sampling_steps = 2
    model = build_model(cfg)
    dm = build_datamodule(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = next(dm.val_dataloader())
    dev_batch = jax.tree.map(
        lambda a: None if a is None else jnp.asarray(np.asarray(a)),
        batch, is_leaf=lambda a: a is None,
    )
    draw = make_validation_figure_fn(cfg, model, dm)
    fig = draw(params, dev_batch, jax.random.PRNGKey(1))
    assert fig is not None and len(fig.axes) == 6
    import matplotlib.pyplot as plt

    plt.close(fig)
