"""DDNM zero-shot inpainting demo — the scripted equivalent of the reference's
notebook usage of get_ddnm_result (reference src/utils.py:277-304): mask a
region of a field, then sample a completion consistent with the observed part
using a trained (or fresh, for a smoke run) VDM.

    python examples/ddnm_inpainting.py [--ckpt-dir runs/.../checkpoints] \
        [--platform cpu] [--steps 50] [--travel 3]
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", type=str, default=None)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--travel", type=int, default=3, help="DDNM time-travel depth l")
    ap.add_argument("--out", type=str, default="/tmp/ddnm_demo.png")
    args = ap.parse_args()

    from vdm4cdm_tpu.cli._common import setup_jax

    jax = setup_jax(platform=args.platform)
    import jax.numpy as jnp

    from vdm4cdm_tpu.config import build_datamodule, build_model
    from vdm4cdm_tpu.diffusion import ddnm_sample
    from vdm4cdm_tpu.presets import preset
    from vdm4cdm_tpu.train.checkpoint import load_params
    from vdm4cdm_tpu.utils import to_np

    cfg = preset("smoke_vdm_2d")
    cfg.data.conditioning_values = 0
    cfg.data.in_field = None
    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    if args.ckpt_dir:
        params = load_params(args.ckpt_dir, params)

    dm = build_datamodule(cfg, stage="fit")
    batch = next(dm.val_dataloader())
    x = jnp.asarray(batch["x"][:1])

    # inpainting operator: observe the left half
    size = x.shape[1]
    mask = jnp.zeros_like(x).at[:, :, : size // 2].set(1.0)
    A = lambda z: z * mask
    AT = lambda y: y * mask
    y = A(x)

    x_hat = ddnm_sample(model, params, jax.random.PRNGKey(1), y, A, AT,
                        n_sampling_steps=args.steps, l=args.travel)
    consistency = float(jnp.abs(A(x_hat) - y).max())
    print(f"measurement consistency |A(x̂)-y|∞ = {consistency:.2e}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, (im, title) in zip(axes, [(x, "ground truth"), (y, "observed (masked)"),
                                      (x_hat, "DDNM completion")]):
        ax.imshow(to_np(im)[0, :, :, 0])
        ax.set_title(title)
        ax.axis("off")
    fig.savefig(args.out, dpi=80, bbox_inches="tight")
    print(f"figure: {args.out}")


if __name__ == "__main__":
    main()
