#!/usr/bin/env python
"""Bless a trained run: extract a compact, committable checkpoint.

Copies only {params, ema_params} at one step from a training run's keep-all
orbax directory (runs/NAME/checkpoints, which also holds optimizer state and
is gitignored) into blessed/NAME/checkpoints — a small params-only orbax
checkpoint that IS tracked by git, so a fresh checkout can run the registry
chain (vdm4cdm-generate NAME -> calc_ss -> tests/test_acceptance.py) without
retraining. This plays the role of the reference's cluster checkpoints behind
its configs.yaml registry (reference configs.yaml:1-217).

Usage: python tools/bless.py VDM_GRF_c_c_32 [--step 8000]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--step", type=int, default=None, help="default: latest")
    ap.add_argument("--run-dir", default=None,
                    help="source checkpoints dir (default runs/NAME/checkpoints)")
    args = ap.parse_args(argv)

    import orbax.checkpoint as ocp

    src = os.path.abspath(args.run_dir or os.path.join(REPO, "runs", args.name, "checkpoints"))
    dst = os.path.join(REPO, "blessed", args.name, "checkpoints")

    mgr = ocp.CheckpointManager(src)
    step = args.step if args.step is not None else mgr.latest_step()
    steps = mgr.all_steps() or []
    if step is None or step not in steps:
        sys.exit(f"[bless] no checkpoint for step={step} in {src} (have {sorted(steps)})")
    full = mgr.restore(step, args=ocp.args.StandardRestore())
    mgr.close()

    import jax
    import numpy as np

    # host-portable artifact: numpy leaves carry no device/sharding metadata,
    # so the committed checkpoint restores on ANY host (a TPU-saved tree
    # records its device and orbax refuses to restore it on a CPU-only box)
    payload = {"params": jax.tree.map(np.asarray, full["params"])}
    if "ema_params" in full:
        payload["ema_params"] = jax.tree.map(np.asarray, full["ema_params"])

    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    out = ocp.CheckpointManager(dst)
    out.save(step, args=ocp.args.StandardSave(payload))
    out.wait_until_finished()
    out.close()

    size = sum(os.path.getsize(os.path.join(r, f))
               for r, _, fs in os.walk(dst) for f in fs)
    print(f"[bless] {args.name} step {step}: {src} -> {dst} ({size / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
