"""Dataset-production CLI tests (reference scripts/*.ipynb equivalents)."""

import json
import os

import numpy as np

from vdm4cdm_tpu.cli import prepare_data


class TestDownsample:
    def test_shape_and_mean_preservation(self, tmp_path):
        rng = np.random.default_rng(0)
        data = rng.uniform(1, 2, (2, 16, 16, 16)).astype(np.float32)
        src = str(tmp_path / "in.npy")
        dst = str(tmp_path / "out.npy")
        np.save(src, data)
        prepare_data.main(["downsample", src, dst, "--size", "8"])
        out = np.load(dst)
        assert out.shape == (2, 8, 8, 8)
        # trilinear resize preserves the mean of a smooth field closely
        np.testing.assert_allclose(out.mean(), data.mean(), rtol=0.02)

    def test_conserve_mass(self, tmp_path):
        rng = np.random.default_rng(1)
        data = rng.uniform(0, 1, (1, 16, 16, 16)).astype(np.float32)
        src, dst = str(tmp_path / "i.npy"), str(tmp_path / "o.npy")
        np.save(src, data)
        prepare_data.main(["downsample", src, dst, "--size", "8", "--conserve-mass"])
        out = np.load(dst)
        np.testing.assert_allclose(out.sum(), data.sum(), rtol=1e-4)


class TestProject:
    def test_slab_projection(self, tmp_path):
        data = np.ones((1, 8, 8, 8), np.float32)
        src, dst = str(tmp_path / "i.npy"), str(tmp_path / "o.npy")
        np.save(src, data)
        prepare_data.main(["project", src, dst, "--depth", "4", "--taper", "0"])
        out = np.load(dst)
        assert out.shape == (2, 8, 8)  # 2 slabs per sim
        np.testing.assert_allclose(out, 4.0)  # sum of 4 ones per column

    def test_taper_weights(self, tmp_path):
        data = np.ones((1, 8, 8, 8), np.float32)
        src, dst = str(tmp_path / "i.npy"), str(tmp_path / "o.npy")
        np.save(src, data)
        prepare_data.main(["project", src, dst, "--depth", "8", "--taper", "2"])
        out = np.load(dst)
        # taper ramps 1/2,1 at each end: total = 8 - 2*(1 - (0.5+1)/2)*2 = 8-1 = 7
        np.testing.assert_allclose(out, 7.0)


class TestNormalize:
    def test_log_moments(self, tmp_path):
        rng = np.random.default_rng(2)
        data = (10.0 ** rng.normal(3.0, 0.5, (4, 8, 8))).astype(np.float32)
        src = str(tmp_path / "f.npy")
        np.save(src, data)
        out = str(tmp_path / "norms.json")
        alphas = str(tmp_path / "alphas.json")
        json.dump({"F": 0.0}, open(alphas, "w"))
        prepare_data.main(["normalize", f"F={src}", "--output", out,
                          "--alphas", alphas])
        norms = json.load(open(out))
        assert abs(norms["F_m"] - 3.0) < 0.05
        assert abs(norms["F_s"] - 0.5) < 0.05

    def test_merge(self, tmp_path):
        src = str(tmp_path / "f.npy")
        np.save(src, np.ones((1, 4, 4), np.float32))
        out = str(tmp_path / "n.json")
        json.dump({"G_m": 1.0, "G_s": 2.0}, open(out, "w"))
        prepare_data.main(["normalize", f"F={src}", "--output", out, "--merge"])
        norms = json.load(open(out))
        assert "G_m" in norms and "F_m" in norms
