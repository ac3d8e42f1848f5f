"""Training CLI — one entry point replacing the reference's 17 train scripts.

Usage:
    vdm4cdm-train --preset trainVDM3D_c_c_256 [--set data.batch_size=4 ...]
    vdm4cdm-train --config my_experiment.yaml
    vdm4cdm-train --preset smoke_vdm_2d            # synthetic, no data needed

Reference CLI shape for comparison: ``python trainVDM3D_c_c_..._thick_lowbatch.py
<field_in> <field_out> <cropsize>`` (reference trainVDM3D_c_c...:23-25) — covered
by ``--set data.in_field=... data.out_field=... data.cropsize=...``.
"""

from __future__ import annotations

import argparse
import ast
import sys


def parse_overrides(pairs):
    out = {}
    for pair in pairs or []:
        key, _, val = pair.partition("=")
        try:
            out[key] = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            out[key] = val
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description="Train a VDM/SFM field emulator (TPU-native)")
    ap.add_argument("--preset", type=str, help="preset name (see vdm4cdm_tpu.presets)")
    ap.add_argument("--config", type=str, help="path to an ExperimentConfig YAML")
    ap.add_argument("--set", dest="overrides", nargs="*", metavar="SEC.KEY=VAL",
                    help="config overrides, e.g. data.cropsize=128 run.max_steps=1000")
    ap.add_argument("--platform", type=str, default=None,
                    help="force a jax platform (e.g. cpu for local smoke runs)")
    ap.add_argument("--coordinator", type=str, default=None,
                    help="multi-host: coordinator address HOST:PORT — passing "
                         "this (or --num-processes) initializes "
                         "jax.distributed; on TPU pods with auto-discovery "
                         "pass --num-processes=-1 alone")
    ap.add_argument("--num-processes", type=int, default=None,
                    help="multi-host: total process count (-1 = auto-detect)")
    ap.add_argument("--process-id", type=int, default=None,
                    help="multi-host: this process's rank")
    args = ap.parse_args(argv)

    from ._common import make_mesh_from_config, make_validation_figure_fn, setup_jax

    jax = setup_jax(platform=args.platform)
    if args.coordinator is not None or args.num_processes is not None:
        # must run before any device query; mesh axes then span all hosts'
        # devices and the datamodule serves per-host batch blocks
        kwargs = {}
        if args.coordinator:
            kwargs["coordinator_address"] = args.coordinator
        if args.num_processes and args.num_processes > 0:
            kwargs["num_processes"] = args.num_processes
        if args.process_id is not None:
            kwargs["process_id"] = args.process_id
        jax.distributed.initialize(**kwargs)
        print(f"[train] jax.distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices", flush=True)

    from ..config import ExperimentConfig, build_datamodule, build_model
    from ..parallel.shard import make_shard_ctx
    from ..presets import preset as get_preset
    from ..train import TrainConfig, Trainer
    from ..train.checkpoint import load_params
    from ..utils.array import count_params

    if args.config:
        cfg = ExperimentConfig.load(args.config)
    elif args.preset:
        cfg = get_preset(args.preset)
    else:
        ap.error("need --preset or --config")
    for k, v in parse_overrides(args.overrides).items():
        section, _, field = k.partition(".")
        setattr(getattr(cfg, section), field, v)

    mesh = make_mesh_from_config(cfg)
    ctx = make_shard_ctx(mesh) if mesh is not None else None
    model = build_model(cfg, ctx=ctx)
    dm = build_datamodule(cfg, stage="fit")

    tc = TrainConfig(
        max_steps=cfg.run.max_steps,
        val_check_interval=cfg.run.val_check_interval,
        n_val_batches=cfg.run.n_val_batches,
        ckpt_every_steps=cfg.run.ckpt_every_steps,
        log_every_steps=cfg.run.log_every_steps,
        learning_rate=cfg.run.learning_rate,
        grad_clip=cfg.run.grad_clip,
        weight_decay=cfg.run.weight_decay,
        warmup_steps=cfg.run.warmup_steps,
        seed=cfg.run.seed,
        out_dir=cfg.run.out_dir,
        experiment_name=cfg.run.experiment_name,
        resume=cfg.run.resume,
        n_figure_sampling_steps=cfg.run.n_figure_sampling_steps,
        ema_decay=cfg.run.ema_decay,
    )
    draw_figure = make_validation_figure_fn(cfg, model, dm, mesh=mesh)
    trainer = Trainer(model, tc, mesh=mesh, draw_figure=draw_figure)

    init_params = None
    if cfg.run.warm_start_ckpt:
        template = model.init_params(jax.random.PRNGKey(0))
        init_params = load_params(cfg.run.warm_start_ckpt, template)
        print(f"[train] warm-started params from {cfg.run.warm_start_ckpt}")

    print(f"[train] experiment={cfg.run.experiment_name} family={cfg.model.family} "
          f"ndim={cfg.model.ndim} crop={cfg.data.cropsize} chs={list(cfg.model.chs)} "
          f"mesh={None if mesh is None else dict(mesh.shape)}", flush=True)
    state = trainer.fit(dm, init_params=init_params)
    print(f"[train] done at step {int(state.step)}; params={count_params(state.params):,}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
