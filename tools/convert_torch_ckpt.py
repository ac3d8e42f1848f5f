"""Convert a reference torch/Lightning checkpoint to an orbax checkpoint.

The reference's blessed models (reference configs.yaml:1-217) are Lightning
``.ckpt`` files holding a ``state_dict`` over mltools' torch CUNet+LightVDM
(loaded at reference src/utils.py:469). This tool maps those weights onto our
Flax tree and writes an orbax checkpoint that ``vdm4cdm-generate --ckpt-dir``
consumes directly:

    python tools/convert_torch_ckpt.py CKPT.ckpt OUT_DIR \
        --preset trainVDM3D128_c_c [--set model.chs=...] \
        [--strip-prefix model.score_model.] [--rename 'old_re=new'] \
        [--step 320000] [--allow-missing]

mltools is not distributed with the reference, so real checkpoints may name
modules differently than our tree — fix with ``--rename`` regex pairs (the
conversion itself is shape-driven and prints every missing/unused key).
Validated end-to-end against a randomly initialized torch twin in
tests/test_torch_parity.py (eps_hat + ELBO parity at 1e-4).
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt", help="torch .ckpt/.pt file (Lightning or plain state_dict)")
    ap.add_argument("out_dir", help="orbax checkpoint directory to create")
    ap.add_argument("--preset", required=True,
                    help="model preset matching the checkpoint's architecture")
    ap.add_argument("--set", dest="overrides", nargs="*", metavar="SEC.KEY=VAL")
    ap.add_argument("--strip-prefix", default=None,
                    help="key prefix to strip (default: auto-detect "
                         "'...score_model.')")
    ap.add_argument("--rename", nargs="*", default=[], metavar="REGEX=REPL",
                    help="regex renames applied to torch keys after stripping")
    ap.add_argument("--step", type=int, default=0, help="step label for the "
                    "orbax checkpoint (e.g. the reference's trained steps)")
    ap.add_argument("--allow-missing", action="store_true",
                    help="leave parameters missing from the state_dict at "
                         "their random init instead of failing")
    args = ap.parse_args(argv)

    import numpy as np
    import torch

    from vdm4cdm_tpu.cli._common import setup_jax

    jax = setup_jax(platform="cpu")
    import orbax.checkpoint as ocp

    from vdm4cdm_tpu.cli.train import parse_overrides
    from vdm4cdm_tpu.config import build_model
    from vdm4cdm_tpu.interop.torch_convert import (
        params_from_torch, strip_and_rename)
    from vdm4cdm_tpu.presets import preset as get_preset

    cfg = get_preset(args.preset)
    for k, v in parse_overrides(args.overrides).items():
        section, _, field = k.partition(".")
        setattr(getattr(cfg, section), field, v)
    model = build_model(cfg)

    raw = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    sd = {k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach")
          else np.asarray(v) for k, v in sd.items()}
    renames = [tuple(r.split("=", 1)) for r in args.rename]
    sd = strip_and_rename(sd, strip_prefix=args.strip_prefix,
                          regex_renames=renames)

    params, report = params_from_torch(
        sd, model, strict=not args.allow_missing)
    if args.allow_missing and report["missing"]:
        print(f"[convert] {len(report['missing'])} params left at init, e.g. "
              f"{report['missing'][:5]}")
        init = model.init_params(jax.random.PRNGKey(0))

        def fill(path, leaf):
            node = params
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node.setdefault(path[-1], np.asarray(leaf))

        from vdm4cdm_tpu.interop.torch_convert import _flatten

        for path, leaf in _flatten(init):
            fill(path, leaf)
    if report["unused"]:
        print(f"[convert] {len(report['unused'])} torch keys unused, e.g. "
              f"{report['unused'][:5]}")
    if not report["gamma_found"]:
        print("[convert] no gamma.{b,w} in state_dict -> schedule at init "
              "(use --rename to map the checkpoint's schedule params)")

    mgr = ocp.CheckpointManager(os.path.abspath(args.out_dir))
    mgr.save(args.step, args=ocp.args.StandardSave({"params": params}))
    mgr.wait_until_finished()
    mgr.close()
    print(f"[convert] wrote orbax checkpoint step {args.step} -> {args.out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
