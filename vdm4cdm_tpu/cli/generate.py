"""Generation CLI — posterior-sampling campaigns from trained checkpoints.

Parity with reference generate_3D.py / generate_3D_1P.py:

    vdm4cdm-generate MODEL_NAME SAVE_PATH RUNTYPE --ckpt-dir RUN_CKPT_DIR

Runtypes (reference generate_3D.py:43-97, generate_3D_1P.py:43-70):
    CV_12_12 — 12 held-out CV boxes x 12 posterior samples -> gen_{i}.npy
    CV_1_128 — CV box index 2 x 128 samples               -> gen_0.npy
    1P_24 / 1P_128 — parameter-variation boxes {0,4,7,23,28} =
        (fid, Om-, Om+, ASN1-, ASN1+) x {24,128} samples   -> {name}_{rep}.npy

Outputs are normalized samples, channels-first (B, C, *spatial) .npy stacks —
byte-compatible with the reference's campaign outputs so calc_ss can consume
either. Unlike the reference (which raises NotImplementedError for SFM,
generate_3D.py:16-17), SFM sampling works here via the ODE integrator.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

ONE_P_INDICES = [0, 4, 7, 23, 28]
ONE_P_NAMES = ["fid", "Om_m2", "Om_p2", "ASN1_m3", "ASN1_p3"]


def main(argv=None):
    ap = argparse.ArgumentParser(description="Generate posterior samples")
    ap.add_argument("model_name", type=str, help="preset / registry model name")
    ap.add_argument("save_path", type=str)
    ap.add_argument("runtype", type=str,
                    choices=["CV_12_12", "CV_1_128", "1P_24", "1P_128"])
    ap.add_argument("--ckpt-dir", type=str, default=None,
                    help="orbax checkpoint dir (default: looked up in "
                         "--model-registry by model name)")
    ap.add_argument("--model-registry", type=str, default="configs/models.yaml",
                    help="trained-model registry (configs.yaml equivalent)")
    ap.add_argument("--ckpt-step", type=int, default=None)
    ap.add_argument("--n-sampling-steps", type=int, default=250)
    ap.add_argument("--reps-per-batch", type=int, default=1,
                    help="posterior samples drawn per sampler call (must "
                         "divide the campaign's reps). Batching reps amortizes "
                         "the 250 UNet scans; with parallel.n_data=N the "
                         "batch is additionally sharded N-way over the data "
                         "mesh axis — the TPU-native version of the "
                         "reference's 6-way bash job sharding")
    ap.add_argument("--sfm-method", type=str, default="heun",
                    choices=["heun", "euler", "sde"],
                    help="SFM sampler: ODE (heun/euler, noise-injected start "
                         "when the model was trained with sfm_sigma > 0) or "
                         "the score-corrected SDE (requires sfm_sigma > 0)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--set", dest="overrides", nargs="*", metavar="SEC.KEY=VAL",
                    help="config overrides — must match the training run's")
    args = ap.parse_args(argv)

    from ._common import setup_jax

    jax = setup_jax(platform=args.platform)
    import jax.numpy as jnp

    from ..config import build_datamodule, build_model
    from ..presets import preset as get_preset
    from ..train.checkpoint import load_params
    from ..utils.array import nlast_to_nchw, to_np
    from ..utils.rng import RngStream

    os.makedirs(args.save_path, exist_ok=True)
    registry_entry = {}
    if args.ckpt_dir is None and os.path.exists(args.model_registry):
        import yaml

        reg = yaml.safe_load(open(args.model_registry)) or {}
        registry_entry = reg.get(args.model_name) or {}
        args.ckpt_dir = registry_entry.get("ckpt_dir")
        if args.ckpt_step is None:
            args.ckpt_step = registry_entry.get("ckpt_step")
    if args.ckpt_dir is None:
        ap.error(f"--ckpt-dir not given and {args.model_name!r} has no ckpt_dir "
                 f"in {args.model_registry}")
    cfg = get_preset(registry_entry.get("preset", args.model_name))
    from .train import parse_overrides

    overrides = dict(registry_entry.get("overrides") or {})
    overrides.update(parse_overrides(args.overrides))
    for k, v in overrides.items():
        section, _, field = k.partition(".")
        setattr(getattr(cfg, section), field, v)
    set_name = args.runtype.split("_")[0]
    cfg.data.set_name = set_name
    cfg.data.batch_size = 1
    is_sfm = cfg.model.family == "sfm"

    from ._common import make_mesh_from_config
    from ..parallel import make_shard_ctx, make_sharded_sfm_sampler, make_sharded_vdm_sampler

    mesh = make_mesh_from_config(cfg)
    ctx = make_shard_ctx(mesh) if mesh is not None else None
    model = build_model(cfg, ctx=ctx)
    template = model.init_params(jax.random.PRNGKey(0))
    params = load_params(args.ckpt_dir, template, step=args.ckpt_step)
    dm = build_datamodule(cfg, stage="test")
    rngs = RngStream(args.seed)

    # SFM models trained with sfm_sigma > 0 sample stochastically (noise-
    # injected start / SDE, flows/sfm.py), so their campaigns rep-batch like
    # VDM's. A sigma=0 SFM remains a deterministic ODE from x0 — batching
    # reps would just repeat the same field, so rpb collapses to 1.
    sfm_stochastic = is_sfm and cfg.model.sfm_sigma > 0.0
    if is_sfm and args.sfm_method == "sde" and not sfm_stochastic:
        ap.error("--sfm-method sde requires a model trained with "
                 "model.sfm_sigma > 0")
    rpb = (1 if (is_sfm and not sfm_stochastic)
           else max(1, args.reps_per_batch))
    if mesh is not None:
        # sharded sampling: the volume shards over ``sp`` (native resolutions
        # the reference can't fit), and the rep batch shards over ``data`` —
        # replacing the reference's bash-level 6-way campaign sharding.
        n_data = cfg.parallel.n_data
        if rpb % max(n_data, 1) != 0:
            ap.error(f"--reps-per-batch ({rpb}) must be a multiple of "
                     f"parallel.n_data ({n_data})")
        # checkpoint restore places params on one device; replicate over the mesh
        from jax.sharding import NamedSharding, PartitionSpec as P

        params = jax.device_put(params, NamedSharding(mesh, P()))
        if is_sfm:
            sharded = make_sharded_sfm_sampler(
                model, mesh, args.n_sampling_steps, method=args.sfm_method,
                stochastic=sfm_stochastic)
            if sfm_stochastic:
                sample_fn = lambda p, x0, r, v: sharded(p, x0, r, v)
            else:
                sample_fn = lambda p, x0, v: sharded(p, x0, v)
        else:
            sharded = make_sharded_vdm_sampler(
                model, mesh, rpb, args.n_sampling_steps)
            sample_fn = lambda p, r, s, v: sharded(p, r, s, v)
    elif is_sfm and sfm_stochastic:
        sample_fn = jax.jit(
            lambda p, x0, r, v: model.draw_samples(
                p, x0, n_sampling_steps=args.n_sampling_steps,
                v_conditionings=v, method=args.sfm_method, rng=r,
            )
        )
    elif is_sfm:
        sample_fn = jax.jit(
            lambda p, x0, v: model.draw_samples(
                p, x0, n_sampling_steps=args.n_sampling_steps,
                v_conditionings=v, method=args.sfm_method,
            )
        )
    else:
        sample_fn = jax.jit(
            lambda p, r, s, v: model.draw_samples(
                p, r, batch_size=rpb, n_sampling_steps=args.n_sampling_steps,
                s_conditioning=s, v_conditionings=v,
            )
        )

    def _tile(a):
        """Broadcast a (1, ...) conditioning array to the rep batch."""
        a = jnp.asarray(a)
        return jnp.broadcast_to(a, (rpb,) + a.shape[1:]) if rpb > 1 else a

    def draw(batch, rng):
        v = [_tile(a) for a in (batch.get("conditioning_values") or [])]
        if cfg.data.conditioning_values == 0:
            v = []
        if is_sfm:
            x0 = _tile(jnp.asarray(batch["x0"]))
            if sfm_stochastic:
                return sample_fn(params, x0, rng, v)
            return sample_fn(params, x0, v)
        cond = batch.get("conditioning")
        cond = None if cond is None else _tile(cond)
        return sample_fn(params, rng, cond, v)

    def campaign(batch_filter, reps, name_fn):
        if reps % rpb:
            ap.error(f"--reps-per-batch ({rpb}) must divide the campaign's "
                     f"reps ({reps})")
        count = 0
        for i_batch, batch in enumerate(dm.test_dataloader()):
            if not batch_filter(i_batch):
                continue
            gens = []
            for r in range(0, reps, rpb):
                gen = draw(batch, rngs.next())
                gens.append(to_np(nlast_to_nchw(gen)))
                print(f"[generate] box {i_batch} rep {r + rpb}/{reps}", flush=True)
            out = np.concatenate(gens, axis=0)
            np.save(os.path.join(args.save_path, name_fn(count, i_batch)), out)
            count += 1

    if args.runtype == "CV_12_12":
        campaign(lambda i: i < 12, 12, lambda c, i: f"gen_{c}.npy")
    elif args.runtype == "CV_1_128":
        campaign(lambda i: i == 2, 128, lambda c, i: f"gen_{c}.npy")
    else:
        reps = 24 if args.runtype == "1P_24" else 128
        campaign(
            lambda i: i in ONE_P_INDICES,
            reps,
            lambda c, i: f"{ONE_P_NAMES[ONE_P_INDICES.index(i)]}_{reps}.npy",
        )
    print(f"[generate] campaign {args.runtype} written to {args.save_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
