"""Worker for the 2-process multi-host validation-figure test.

Run as: python tests/_mh_fig_worker.py PORT PROCESS_ID — initializes
jax.distributed with 2 processes x 4 virtual CPU devices, builds the
mesh-aware validation-figure hook (cli/_common.make_validation_figure_fn)
over a (data=8) mesh, draws ONE figure from a globally sharded batch, and
prints a JSON line saying whether this rank got a rendered figure. The
contract under test: the sharded sampler + host-gather run on EVERY rank
(they are collectives), rank 0 alone renders, other ranks get None —
multi-host training keeps its validation figures (reference renders figures
every val interval unconditionally, trainVDM3D_c_c...:43).
"""

import json
import sys


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    import matplotlib

    matplotlib.use("Agg")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and jax.device_count() == 8

    from vdm4cdm_tpu.cli._common import make_validation_figure_fn
    from vdm4cdm_tpu.config import build_datamodule, build_model
    from vdm4cdm_tpu.parallel.shard import make_shard_ctx
    from vdm4cdm_tpu.presets import preset
    from vdm4cdm_tpu.train.loop import _DeviceFeeder
    from vdm4cdm_tpu.utils.mesh import make_mesh

    cfg = preset("smoke_vdm_2d")
    cfg.data.cropsize = 16
    cfg.data.batch_size = 8  # per-host block; global batch 16 over 2 hosts
    cfg.model.chs = (8, 8, 8, 8)
    cfg.model.norm_groups = 4
    cfg.parallel.n_data = 8
    cfg.run.n_figure_sampling_steps = 4

    mesh = make_mesh(n_data=8, n_sp=1)
    model = build_model(cfg, ctx=make_shard_ctx(mesh))
    dm = build_datamodule(cfg, stage="fit")
    draw = make_validation_figure_fn(cfg, model, dm, mesh=mesh)

    params = model.init_params(jax.random.PRNGKey(0))
    batch = next(iter(dm.val_dataloader()))
    dev_batch = _DeviceFeeder(mesh, cfg.model.ndim).put(batch)
    fig = draw(params, dev_batch, jax.random.PRNGKey(7))
    print(json.dumps({"pid": pid, "has_fig": fig is not None}), flush=True)


if __name__ == "__main__":
    main()
