"""End-to-end CLI tests, in-process (tiny configs, synthetic data)."""

import json
import os

import numpy as np
import pytest

from vdm4cdm_tpu.cli import calc_ss, generate, train


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
