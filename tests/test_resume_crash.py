"""Fault injection: SIGKILL a training run mid-step, restart, and require the
post-resume parameter trajectory to EQUAL an uninterrupted run's (SURVEY.md §5
failure-detection row; round-2 VERDICT item 5).

This is the property auto-resume was designed around: checkpoints carry the
full TrainState (params + optimizer state + step), and both the data order
and every RNG draw derive deterministically from the step index, so a killed
run resumed from its last checkpoint must replay the identical trajectory.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

_MAX_STEPS = 28

_ARGS = [
    "--preset", "smoke_vdm_2d", "--platform", "cpu",
    "--set", f"run.max_steps={_MAX_STEPS}", "run.val_check_interval=0",
    "run.ckpt_every_steps=4", "run.log_every_steps=1",
    "data.cropsize=16", "model.chs=(8,8,8,8)", "model.norm_groups=4",
]


def _spawn(out_dir):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [env.get("PYTHONPATH"),
                    os.path.dirname(os.path.dirname(__file__))] if p)
    return subprocess.Popen(
        [sys.executable, "-m", "vdm4cdm_tpu.cli.train", *_ARGS,
         f"run.out_dir={out_dir}"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def _final_params(out_dir):
    from vdm4cdm_tpu.presets import preset
    from vdm4cdm_tpu.config import build_model
    from vdm4cdm_tpu.train.checkpoint import load_params

    cfg = preset("smoke_vdm_2d")
    cfg.data.cropsize = 16
    cfg.model.chs = [8, 8, 8, 8]
    cfg.model.norm_groups = 4
    import jax

    model = build_model(cfg)
    template = model.init_params(jax.random.PRNGKey(0))
    ckpt_dir = os.path.join(out_dir, "smoke_vdm_2d", "checkpoints")
    return load_params(ckpt_dir, template, step=_MAX_STEPS)


@pytest.mark.slow
def test_sigkill_resume_matches_uninterrupted(tmp_path):
    crash_dir = str(tmp_path / "crash")
    clean_dir = str(tmp_path / "clean")

    # 1. clean reference run to completion
    proc = _spawn(clean_dir)
    out, _ = proc.communicate(timeout=1200)
    assert proc.returncode == 0, out[-2000:]

    # 2. crash run: SIGKILL once the step-8 checkpoint exists and training
    #    has advanced PAST it (mid-flight between checkpoints)
    ckpt_root = os.path.join(crash_dir, "smoke_vdm_2d", "checkpoints")
    proc = _spawn(crash_dir)
    deadline = time.time() + 1200
    killed = False
    while time.time() < deadline:
        steps = {int(d) for d in os.listdir(ckpt_root)
                 if d.isdigit()} if os.path.isdir(ckpt_root) else set()
        if 8 in steps and _MAX_STEPS not in steps:
            time.sleep(0.5)  # let a post-checkpoint step get in flight
            os.kill(proc.pid, signal.SIGKILL)
            killed = True
            break
        if proc.poll() is not None:
            break
        time.sleep(0.2)
    proc.wait(timeout=60)
    assert killed, "run finished before the kill window (tune ckpt cadence)"

    # 3. restart the same command; auto-resume must pick up from step 8
    proc = _spawn(crash_dir)
    out, _ = proc.communicate(timeout=1200)
    assert proc.returncode == 0, out[-2000:]
    assert "resumed from step" in out  # picked up the pre-crash checkpoint

    # 4. identical final parameters, bit for bit (CPU execution of the same
    #    compiled steps on the same data/rng sequence is deterministic)
    p_clean = _final_params(clean_dir)
    p_crash = _final_params(crash_dir)
    flat_clean, _ = _flatten(p_clean)
    flat_crash, _ = _flatten(p_crash)
    assert len(flat_clean) == len(flat_crash)
    for a, b in zip(flat_clean, flat_crash):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _flatten(tree):
    import jax

    return jax.tree.flatten(tree)
