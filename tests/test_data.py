"""Data-layer tests: transform invertibility, periodic crops, augmentation
group closure, CAMELS datamodule semantics on a synthetic registry."""

import json
import os

import numpy as np
import pytest

from vdm4cdm_tpu.data import (
    CAMELSDataModule,
    DataRegistry,
    FieldNormalizer,
    crop_anchors,
    flip_and_permute,
    gaussian_random_field,
    periodic_crop,
)
from vdm4cdm_tpu.data.camels import get_dataset, vdm_cc_return_func


class TestNormalizer:
    def test_roundtrip_exact(self):
        """norm(unnorm(x)) == x — the reference relies on this identity
        (CAMELS_3D_dataset.py:146-156)."""
        fn = FieldNormalizer(alphas=[1.0, 1e-9], means=[10.2, -3.0], stds=[0.8, 2.0])
        x = np.abs(np.random.default_rng(0).standard_normal((4, 4)) * 1e11)
        for ch in range(2):
            y = fn.normalize(x, ch)
            np.testing.assert_allclose(fn.unnormalize(y, ch), x, rtol=1e-5)


class TestCrop:
    def test_anchor_grid(self):
        a = crop_anchors(256, 128, ndim=3)
        assert a.shape == (8, 3)
        a = crop_anchors(256, 256, ndim=3)
        assert a.shape == (1, 3)

    def test_periodic_wraparound(self):
        field = np.arange(8, dtype=np.float32).reshape(1, 8)
        out = periodic_crop(field, anchor=[6], crop=4)
        np.testing.assert_array_equal(out[0], [6, 7, 0, 1])

    def test_augshift_within_bounds(self):
        rng = np.random.default_rng(0)
        field = np.random.default_rng(1).standard_normal((1, 16, 16)).astype(np.float32)
        for _ in range(10):
            out = periodic_crop(field, anchor=[0, 0], crop=8, rng=rng, aug_shift=True)
            assert out.shape == (1, 8, 8)

    def test_crops_tile_the_box(self):
        """Without augshift, the crop set is a partition of the box."""
        field = np.arange(16, dtype=np.float32).reshape(1, 4, 4)
        anchors = crop_anchors(4, 2, ndim=2)
        seen = []
        for a in anchors:
            seen.append(periodic_crop(field, a, 2).ravel())
        seen = np.sort(np.concatenate(seen))
        np.testing.assert_array_equal(seen, np.arange(16))


class TestFlipPermute:
    def test_volume_preserved_and_shared_draw(self):
        rng = np.random.default_rng(0)
        f1 = np.random.default_rng(1).standard_normal((1, 4, 4, 4)).astype(np.float32)
        f2 = f1.copy()
        o1, o2 = flip_and_permute([f1, f2], rng)
        np.testing.assert_array_equal(o1, o2)  # same random draw across fields
        np.testing.assert_allclose(np.sort(o1.ravel()), np.sort(f1.ravel()))


class TestShippedRegistries:
    """The shipped constant tables must carry the reference's real values
    (reference src/dataset/{normalizations,alphas}{,_3d}.json) so real-CAMELS
    runs are normalization-compatible out of the box."""

    REG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs", "registries")

    def test_3d_constants(self):
        reg = DataRegistry(self.REG_DIR, suffix="_3d", data_root="")
        m, s = reg.normalization("Mcdm")
        assert abs(m - 10.019186475678042) < 1e-12
        assert abs(s - 0.5520203178284999) < 1e-12
        assert reg.normalization("Go7") == (0.0, 1.0)
        # the Go galaxy-count grids use alpha=2 (log10(x+2)), not 1
        assert reg.alpha("Go7") == 2 and reg.alpha("Go8") == 2 and reg.alpha("Go9") == 2
        assert reg.alpha("Mcdm") == 1

    def test_2d_constants(self):
        reg = DataRegistry(self.REG_DIR, suffix="", data_root="")
        m, s = reg.normalization("Mcdm")
        assert abs(m - 10.971016779411217) < 1e-12
        assert reg.alpha("B") == 1e-15
        assert reg.alpha("Z") == 1e-9
        assert reg.alpha("Mcdm") == 0


@pytest.fixture(scope="module")
def synth_registry(tmp_path_factory):
    """Synthetic CAMELS-like registry: 6 sims of 16^3 for two fields + params."""
    root = tmp_path_factory.mktemp("camels")
    rng = np.random.default_rng(0)
    nsims, size = 6, 16
    reg = root / "registries"
    os.makedirs(reg)
    paths = {}
    for field in ["Mstar", "Mcdm"]:
        arr = np.abs(rng.standard_normal((nsims, size, size, size)) + 2).astype(np.float32) * 1e10
        p = root / f"{field}.npy"
        np.save(p, arr)
        paths[field] = str(p)
    (reg / "data_source_3d.json").write_text(json.dumps(
        {"CMD": {"Astrid": {"LH": {"z_0.0": paths}, "CV": {"z_0.0": paths}}}}
    ))
    (reg / "normalizations_3d.json").write_text(json.dumps(
        {"Mstar_m": 10.0, "Mstar_s": 0.5, "Mcdm_m": 10.0, "Mcdm_s": 0.5}
    ))
    (reg / "alphas_3d.json").write_text(json.dumps({"Mstar": 1.0, "Mcdm": 1.0}))
    os.makedirs(root / "params_new")
    np.savetxt(root / "params_new" / "params_LH_Astrid.txt",
               rng.uniform(size=(nsims, 6)))
    np.savetxt(root / "params_new" / "params_CV_Astrid.txt",
               rng.uniform(size=(nsims, 6)))
    return str(reg), str(root)


class TestCAMELSDataModule:
    def test_fit_batches(self, synth_registry):
        reg_dir, root = synth_registry
        dm = get_dataset(reg_dir, channel_names=["Mstar", "Mcdm"],
                         return_func=vdm_cc_return_func, stage="fit",
                         batch_size=2, cropsize=8, ndim=3, data_root=root)
        assert dm.do_crop and dm.ncrops == 8
        batch = next(dm.train_dataloader())
        assert batch["x"].shape == (2, 8, 8, 8, 1)  # channels-last
        assert batch["conditioning"].shape == (2, 8, 8, 8, 1)
        assert batch["conditioning_values"][0].shape == (2, 6)
        assert np.isfinite(batch["x"]).all()

    def test_cv_holdout(self, synth_registry):
        reg_dir, root = synth_registry
        dm = get_dataset(reg_dir, channel_names=["Mcdm"], set_name="CV",
                         stage="test", cropsize=16, ndim=3, data_root=root)
        # the synthetic registry has 6 sims; CV holdout drops whichever of
        # {2, 8, 17} exist in range (here: sim 2)
        assert dm.nsims == 6 - len([h for h in (2, 8, 17) if h < 6])

    def test_no_crop_at_fullsize(self, synth_registry):
        reg_dir, root = synth_registry
        dm = get_dataset(reg_dir, channel_names=["Mcdm"], stage="test",
                         cropsize=16, ndim=3, data_root=root)
        assert not dm.do_crop

    def test_deterministic_resume(self, synth_registry):
        reg_dir, root = synth_registry
        dm = get_dataset(reg_dir, channel_names=["Mstar", "Mcdm"],
                         return_func=vdm_cc_return_func, stage="fit",
                         batch_size=2, cropsize=8, ndim=3, data_root=root)
        run1 = [b["x"] for b in dm.train_batches(6)]
        run2 = [b["x"] for b in dm.train_batches(6, start_step=3)]
        for a, b in zip(run1[3:], run2):
            np.testing.assert_array_equal(a, b)

    def test_multihost_sharding(self, synth_registry):
        """Per-host batch shards must tile the single-host global batch."""
        reg_dir, root = synth_registry
        dm = get_dataset(reg_dir, channel_names=["Mstar", "Mcdm"],
                         return_func=vdm_cc_return_func, stage="fit",
                         batch_size=4, cropsize=8, ndim=3, data_root=root)
        dm.use_native = False  # python path: augmentation rng is per-sample... use test stage instead
        full = next(dm.train_batches(1))
        shards = []
        for p in range(2):
            dmp = get_dataset(reg_dir, channel_names=["Mstar", "Mcdm"],
                              return_func=vdm_cc_return_func, stage="fit",
                              batch_size=4, cropsize=8, ndim=3, data_root=root)
            dmp.use_native = False
            dmp.process_index, dmp.process_count = p, 2
            shards.append(next(dmp.train_batches(1)))
        assert shards[0]["x"].shape[0] == 2
        # same sample set overall (augmentation rng streams differ per host, so
        # compare the conditioning_values, which are augmentation-independent)
        pv_full = np.sort(full["conditioning_values"][0].ravel())
        pv_shards = np.sort(np.concatenate(
            [s["conditioning_values"][0] for s in shards]).ravel())
        np.testing.assert_allclose(pv_shards, pv_full)

    def test_unnorm_roundtrip_through_module(self, synth_registry):
        reg_dir, root = synth_registry
        dm = get_dataset(reg_dir, channel_names=["Mcdm"], stage="test",
                         cropsize=16, ndim=3, data_root=root)
        batch = next(dm.test_dataloader())
        x = batch["x"]
        raw = dm.unnorm_func(np.asarray(x), 0)
        renorm = dm.norm_func(raw, 0)
        np.testing.assert_allclose(renorm, x, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def synth_registry_2d(tmp_path_factory):
    """2D registry: maps come x15 slices per sim (reference
    CAMELS_2D_dataset.py:119)."""
    root = tmp_path_factory.mktemp("camels2d")
    rng = np.random.default_rng(0)
    nsims, slices, size = 4, 15, 16
    reg = root / "registries"
    os.makedirs(reg)
    arr = np.abs(rng.standard_normal((nsims * slices, size, size)) + 2).astype(np.float32)
    p = root / "Mcdm.npy"
    np.save(p, arr)
    (reg / "data_source.json").write_text(json.dumps(
        {"CMD": {"Astrid": {"LH": {"z_0.0": {"Mcdm": str(p)}},
                            "CV": {"z_0.0": {"Mcdm": str(p)}}}}}))
    (reg / "normalizations.json").write_text(json.dumps({"Mcdm_m": 0.2, "Mcdm_s": 0.5}))
    (reg / "alphas.json").write_text(json.dumps({"Mcdm": 1.0}))
    os.makedirs(root / "params_new")
    np.savetxt(root / "params_new" / "params_LH_Astrid.txt", rng.uniform(size=(nsims, 6)))
    np.savetxt(root / "params_new" / "params_CV_Astrid.txt", rng.uniform(size=(nsims, 6)))
    return str(reg), str(root)


class TestCAMELS2D:
    def test_params_repeated_and_split(self, synth_registry_2d):
        reg_dir, root = synth_registry_2d
        dm = get_dataset(reg_dir, channel_names=["Mcdm"], stage="fit",
                         batch_size=4, cropsize=16, ndim=2, data_root=root)
        assert dm.nsims == 60  # 4 sims x 15 slices
        assert len(dm.params) == 60
        # 90/10 split for 2D (reference CAMELS_2D_dataset.py:130-132)
        assert len(dm.train_indices) == int(60 * 0.9)
        batch = next(dm.train_dataloader())
        assert batch["x"].shape == (4, 16, 16, 1)

    def test_cv_holdout_blocks(self, synth_registry_2d):
        reg_dir, root = synth_registry_2d
        dm = get_dataset(reg_dir, channel_names=["Mcdm"], set_name="CV",
                         stage="test", cropsize=16, ndim=2, data_root=root)
        # holdout sim 2 removes its whole x15 slice block
        assert dm.nsims == 60 - 15


class TestGRF:
    def test_power_law_spectrum(self):
        """The GRF's measured P(k) must follow the requested power law."""
        import jax.numpy as jnp

        from vdm4cdm_tpu.evals import power

        rng = np.random.default_rng(0)
        f = np.stack([gaussian_random_field(rng, 64, 2, slope=-2.0) for _ in range(8)])
        ks, pk, _ = power(jnp.asarray(f))
        ks, pk = np.asarray(ks), np.asarray(pk)
        sl = (ks > 2) & (ks < 20)
        slope = np.polyfit(np.log(ks[sl]), np.log(pk[sl]), 1)[0]
        assert abs(slope - (-2.0)) < 0.3, f"measured slope {slope}"
