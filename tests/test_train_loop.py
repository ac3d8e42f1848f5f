"""End-to-end smoke train on synthetic GRF data (SURVEY.md §4): exercises
Trainer + datamodule + checkpointing + resume + validation on CPU."""

import os

import numpy as np
import pytest

from vdm4cdm_tpu.config import ExperimentConfig, build_datamodule, build_model
from vdm4cdm_tpu.data import GRFDataModule
from vdm4cdm_tpu.diffusion import VDM, make_schedule
from vdm4cdm_tpu.flows import SFM
from vdm4cdm_tpu.models import CUNet
from vdm4cdm_tpu.presets import PRESETS, preset
from vdm4cdm_tpu.train import TrainConfig, Trainer


@pytest.fixture()
def tiny_cfg(tmp_path):
    return TrainConfig(
        max_steps=30, val_check_interval=15, n_val_batches=2,
        ckpt_every_steps=10, log_every_steps=10, learning_rate=2e-3,
        out_dir=str(tmp_path), experiment_name="t", seed=0,
    )


@pytest.mark.slow
class TestTrainerVDM:
    def test_fit_and_resume(self, tiny_cfg):
        net = CUNet(shape=(1, 16, 16), chs=(8, 8, 8, 8), norm_groups=4,
                    s_conditioning_channels=1, v_conditioning_dims=(6,),
                    dropout_prob=0.0, conv_padding_mode="circular")
        vdm = VDM(net, make_schedule("learned_linear", -13.3, 13.3))
        dm = GRFDataModule(size=16, ndim=2, batch_size=4, mode="vdm", seed=1)

        trainer = Trainer(vdm, tiny_cfg)
        state = trainer.fit(dm)
        assert int(state.step) == 30

        # metrics CSV written
        csv_path = os.path.join(tiny_cfg.out_dir, "t", "metrics.csv")
        assert os.path.exists(csv_path)

        # resume continues from 30
        trainer2 = Trainer(vdm, tiny_cfg)
        state2 = trainer2.fit(dm, max_steps=40)
        assert int(state2.step) == 40

    def test_loss_decreases(self, tiny_cfg):
        net = CUNet(shape=(1, 16, 16), chs=(8, 8, 8, 8), norm_groups=4,
                    dropout_prob=0.0, conv_padding_mode="circular")
        vdm = VDM(net, make_schedule("learned_linear", -13.3, 13.3))
        dm = GRFDataModule(size=16, ndim=2, batch_size=8,
                           n_conditioning_values=0, mode="vdm", seed=1)
        import dataclasses

        cfg = dataclasses.replace(tiny_cfg, max_steps=60, val_check_interval=0,
                                  ckpt_every_steps=1000, experiment_name="t2")
        trainer = Trainer(vdm, cfg)
        trainer.fit(dm)
        import csv

        with open(os.path.join(cfg.out_dir, "t2", "metrics.csv")) as f:
            rows = list(csv.DictReader(f))
        diffs = [float(r["diffusion"]) for r in rows if r.get("diffusion")]
        assert diffs[-1] < diffs[0], diffs


@pytest.mark.slow
class TestWarmStart:
    def test_params_load_across_runs(self, tiny_cfg):
        """Warm-starting a new run from another run's checkpoint (the
        reference's cross-resolution warm start, trainVDM3D_c_c...:134-135)."""
        import jax

        from vdm4cdm_tpu.train.checkpoint import load_params

        net = CUNet(shape=(1, 16, 16), chs=(8, 8, 8, 8), norm_groups=4,
                    dropout_prob=0.0)
        vdm = VDM(net, make_schedule("learned_linear", -13.3, 13.3))
        dm = GRFDataModule(size=16, ndim=2, batch_size=4,
                           n_conditioning_values=0, mode="vdm", seed=1)
        import dataclasses

        cfg = dataclasses.replace(tiny_cfg, max_steps=12, val_check_interval=0,
                                  ckpt_every_steps=12, experiment_name="src")
        state = Trainer(vdm, cfg).fit(dm)

        template = vdm.init_params(jax.random.PRNGKey(0))
        warm = load_params(
            os.path.join(cfg.out_dir, "src", "checkpoints"), template
        )
        trained_leaf = np.asarray(
            jax.tree_util.tree_leaves(state.params["unet"])[0])
        warm_leaf = np.asarray(jax.tree_util.tree_leaves(warm["unet"])[0])
        np.testing.assert_array_equal(trained_leaf, warm_leaf)

        # resume-free new experiment continues from the warm params
        cfg2 = dataclasses.replace(cfg, experiment_name="dst", max_steps=2)
        state2 = Trainer(vdm, cfg2).fit(dm, init_params=warm, max_steps=2)
        assert int(state2.step) == 2


@pytest.mark.slow
class TestEMA:
    def test_ema_tracks_and_checkpoints(self, tiny_cfg):
        import dataclasses

        import jax

        from vdm4cdm_tpu.train.checkpoint import load_params

        net = CUNet(shape=(1, 16, 16), chs=(8, 8, 8, 8), norm_groups=4,
                    dropout_prob=0.0)
        vdm = VDM(net, make_schedule("learned_linear", -13.3, 13.3))
        dm = GRFDataModule(size=16, ndim=2, batch_size=4,
                           n_conditioning_values=0, mode="vdm", seed=1)
        cfg = dataclasses.replace(tiny_cfg, max_steps=10, val_check_interval=0,
                                  ckpt_every_steps=10, experiment_name="ema",
                                  ema_decay=0.9)
        state = Trainer(vdm, cfg).fit(dm)
        assert state.ema_params is not None
        p = np.asarray(jax.tree_util.tree_leaves(state.params["unet"])[0])
        e = np.asarray(jax.tree_util.tree_leaves(state.ema_params["unet"])[0])
        assert np.abs(p - e).max() > 0  # EMA lags the raw params

        # generation-path load prefers the EMA weights
        template = vdm.init_params(jax.random.PRNGKey(0))
        loaded = load_params(os.path.join(cfg.out_dir, "ema", "checkpoints"),
                             template, prefer_ema=True)
        le = np.asarray(jax.tree_util.tree_leaves(loaded["unet"])[0])
        np.testing.assert_array_equal(le, e)


@pytest.mark.slow
class TestTrainerSFM:
    def test_fit(self, tiny_cfg):
        net = CUNet(shape=(1, 16, 16), chs=(8, 8, 8, 8), norm_groups=4,
                    dropout_prob=0.0, v_conditioning_dims=(6,))
        sfm = SFM(net)
        dm = GRFDataModule(size=16, ndim=2, batch_size=4, mode="sfm", seed=1)
        import dataclasses

        cfg = dataclasses.replace(tiny_cfg, experiment_name="sfm")
        state = Trainer(sfm, cfg).fit(dm)
        assert int(state.step) == 30


class TestConfigAndPresets:
    def test_all_presets_build(self):
        for name in PRESETS:
            cfg = preset(name)
            model = build_model(cfg)
            assert model is not None

    def test_registry_aliases(self):
        cfg = preset("VDM_Mstar_Mcdm_c_c_128")
        assert cfg.data.cropsize == 128
        assert list(cfg.model.chs) == [32, 64, 128, 256]
        cfg = preset("VDM_Go7_Mcdm_c_c_128")
        assert cfg.data.in_field == "Go7"

    def test_models_yaml_covers_all_blessed_models(self):
        """configs/models.yaml mirrors the reference registry one-to-one
        (reference configs.yaml:1-217: 12 named trained models) and every
        entry resolves to a buildable preset with the reference's widths."""
        import yaml

        reg = yaml.safe_load(
            open(os.path.join(os.path.dirname(__file__), "..",
                              "configs", "models.yaml")))
        blessed = {
            "VDM_Go7_Mcdm_c_c_128", "VDM_Go8_Mcdm_c_c_128",
            "VDM_Go9_Mcdm_c_c_128", "VDM_Mstar_Mcdm_c_c_128",
            "VDM_Mstar_Mcdm_c_c_160", "VDM_Mstar_Mcdm_c_c_192",
            "VDM_Mstar_Mcdm_c_c_224", "VDM_Mstar_Mcdm_c_c_256",
            "VDM_Mstar_Mcdm_c_c_256_comp", "VDM_Mstar_Mcdm_c_uc_256",
            "SFM_Mstar_Mcdm_c_c_128", "SFM_Mstar_Mcdm_c_c_256",
        }
        assert blessed <= set(reg), sorted(blessed - set(reg))
        for name in blessed:
            entry = reg[name]
            cfg = preset(entry["preset"])
            assert entry["ckpt_step"] > 0
            size = int(name.rsplit("_", 1)[-1].removesuffix("comp").rstrip("_")
                       or name.rsplit("_", 2)[-2])
            assert cfg.data.cropsize == size, (name, cfg.data.cropsize)
            # thin widths at native/224 resolution, mid widths below
            # (reference trainVDM3D_c_c...:60 vs configs.yaml:115-137)
            want = [16, 32, 64, 128] if size >= 224 else [32, 64, 128, 256]
            assert list(cfg.model.chs) == want, (name, cfg.model.chs)
            assert cfg.model.family == name.split("_")[0].lower()

    def test_yaml_roundtrip(self, tmp_path):
        cfg = preset("trainVDM3D128_c_c")
        p = str(tmp_path / "c.yaml")
        cfg.save(p)
        cfg2 = ExperimentConfig.load(p)
        assert cfg2.to_dict() == cfg.to_dict()

    @pytest.mark.slow
    def test_grf_smoke_preset_trains(self, tmp_path):
        cfg = preset("smoke_vdm_2d")
        cfg.run.max_steps = 10
        cfg.run.val_check_interval = 0
        cfg.run.ckpt_every_steps = 100
        cfg.run.out_dir = str(tmp_path)
        cfg.data.cropsize = 16
        cfg.model.chs = (8, 8, 8, 8)
        cfg.model.norm_groups = 4
        model = build_model(cfg)
        dm = build_datamodule(cfg)
        tc = TrainConfig(max_steps=10, val_check_interval=0, ckpt_every_steps=100,
                         out_dir=str(tmp_path), experiment_name="p", seed=0)
        state = Trainer(model, tc).fit(dm)
        assert int(state.step) == 10


class TestLRSchedule:
    def test_warmup_lr_values(self):
        """The logged LR must be the schedule's real value, not the config
        constant (the reference ran a LearningRateMonitor)."""
        from vdm4cdm_tpu.train.state import make_lr_schedule

        sched = make_lr_schedule(3e-4, warmup_steps=100)
        assert float(sched(0)) == 0.0
        assert abs(float(sched(50)) - 1.5e-4) < 1e-9
        assert abs(float(sched(100)) - 3e-4) < 1e-9
        assert abs(float(sched(10_000)) - 3e-4) < 1e-9
        flat = make_lr_schedule(3e-4, warmup_steps=0)
        assert abs(float(flat(7)) - 3e-4) < 1e-12


class TestCometLogger:
    """Remote-tracking logger (reference train_uc_uc_from_field_name.py:30-35
    equivalent): full call-surface test against a fake comet_ml module —
    the real package (and network egress) doesn't exist here, so the gate
    must report unavailable and the logger must drive the documented API."""

    class _FakeExperiment:
        def __init__(self, **kw):
            self.kw = kw
            self.metrics, self.figures, self.name, self.ended = [], [], None, False

        def set_name(self, name):
            self.name = name

        def log_metrics(self, scalars, step=None):
            self.metrics.append((step, dict(scalars)))

        def log_figure(self, figure_name=None, figure=None, step=None):
            self.figures.append((step, figure_name))

        def end(self):
            self.ended = True

    def test_unavailable_without_package(self):
        from vdm4cdm_tpu.train.loggers import CometLogger

        assert CometLogger.available() is False

    def test_logs_scalars_and_figures(self):
        import types

        from vdm4cdm_tpu.train.loggers import CometLogger

        fake = types.SimpleNamespace(Experiment=self._FakeExperiment)
        lg = CometLogger("proj", "exp-1", workspace="w", comet_module=fake)
        exp = lg._exp
        assert exp.name == "exp-1"
        assert exp.kw == {"project_name": "proj", "workspace": "w"}
        lg.log_scalars(10, {"loss": 1.5, "lr": 3e-4})
        assert exp.metrics == [(10, {"loss": 1.5, "lr": 3e-4})]
        lg.log_figure(10, "validation", fig="FIG")
        assert exp.figures == [(10, "validation_00000010")]
        lg.close()
        assert exp.ended
