"""Smoke test — the scripted equivalent of the reference's test.ipynb:
build a datamodule + model, inspect a batch, train a few steps, draw samples,
and plot the validation panel. Runs anywhere (synthetic GRF data, CPU ok):

    python examples/smoke_test.py [--steps 100] [--platform cpu]
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--out", type=str, default="/tmp/vdm4cdm_smoke")
    args = ap.parse_args()

    from vdm4cdm_tpu.cli._common import setup_jax

    jax = setup_jax(platform=args.platform)
    import jax.numpy as jnp

    from vdm4cdm_tpu.config import build_datamodule, build_model
    from vdm4cdm_tpu.evals import draw_figure, get_ccs
    from vdm4cdm_tpu.presets import preset
    from vdm4cdm_tpu.train import TrainConfig, Trainer
    from vdm4cdm_tpu.utils import count_params, to_np

    cfg = preset("smoke_vdm_2d")
    cfg.run.max_steps = args.steps
    cfg.run.out_dir = args.out

    model = build_model(cfg)
    dm = build_datamodule(cfg)

    batch = next(dm.val_dataloader())
    print("batch:", {k: (None if v is None else np.asarray(v[0] if isinstance(v, list) else v).shape)
                     for k, v in batch.items()})

    tc = TrainConfig(max_steps=cfg.run.max_steps, val_check_interval=0,
                     ckpt_every_steps=10**9, learning_rate=2e-3,
                     out_dir=args.out, experiment_name="smoke")
    trainer = Trainer(model, tc)
    state = trainer.fit(dm)
    print(f"trained {int(state.step)} steps; params={count_params(state.params):,}")

    cond = jnp.asarray(batch["conditioning"][:2])
    vvals = [jnp.asarray(batch["conditioning_values"][0][:2])]
    samples = jax.jit(lambda p, r: model.draw_samples(
        p, r, batch_size=2, n_sampling_steps=100,
        s_conditioning=cond, v_conditionings=vvals))(state.params, jax.random.PRNGKey(0))
    print("samples:", samples.shape, "std:", float(samples.std()))

    x = jnp.asarray(batch["x"][:2])
    ks, ccs = get_ccs(np.moveaxis(to_np(samples), -1, 1), np.moveaxis(to_np(x), -1, 1))
    print("cross-correlation r(k):", np.round(to_np(ccs.mean(0)), 2))

    fig = draw_figure(batch, samples, x_to_im=lambda f: f[0],
                      conditioning_to_im=lambda f: f[0])
    fig.savefig(f"{args.out}/smoke_panel.png", dpi=70)
    print(f"figure: {args.out}/smoke_panel.png")


if __name__ == "__main__":
    main()
