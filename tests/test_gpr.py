"""GPR / covariance toolkit tests (reference src/utils.py:306-399 parity)."""

import numpy as np
import pytest

from vdm4cdm_tpu.evals import gpr


class TestRadialCov:
    def test_white_noise_cov_is_delta(self):
        rng = np.random.default_rng(0)
        im = rng.standard_normal((64, 64))
        f = gpr.get_radial_cov_func_image(im, r_cov_est=10, n_cov_est=500, rng=rng)
        assert abs(f(0) - im.var()) < 1e-6
        assert abs(f(5)) < 0.1  # uncorrelated at distance

    def test_parametric_fit_smooth_target(self):
        target = lambda r: 2.0 * np.exp(-0.3 * np.asarray(r))
        fit = gpr.get_parametric_radial_cov_func(target, fit_range=(0, 20))
        rs = np.linspace(0, 20, 50)
        np.testing.assert_allclose(fit(rs), target(rs), atol=0.05)


class TestGPR:
    def test_posterior_interpolates_observations(self):
        """With a noise-free kernel, the GP posterior passes through the data."""
        def cov(a, b):
            a, b = np.atleast_1d(a), np.atleast_1d(b)
            return np.exp(-0.5 * (a[:, None] - b[None, :]) ** 2)

        x_k = np.array([0.0, 1.0, 3.0])
        y_k = np.sin(x_k)
        mean, var, draws = gpr.get_gpr_result(
            x_k, x_k, y_k, cov, n_samples=4, reg_diag=1e-10,
            rng=np.random.default_rng(0),
        )
        np.testing.assert_allclose(mean, y_k, atol=1e-5)
        assert np.all(var < 1e-5)
        assert draws.shape == (4, 3)

    def test_posterior_variance_grows_off_data(self):
        def cov(a, b):
            a, b = np.atleast_1d(a), np.atleast_1d(b)
            return np.exp(-0.5 * (a[:, None] - b[None, :]) ** 2)

        x_k = np.array([0.0, 1.0])
        _, var, _ = gpr.get_gpr_result(
            np.array([0.5, 5.0]), x_k, np.zeros(2), cov, reg_diag=1e-9,
            rng=np.random.default_rng(0),
        )
        assert var[1] > var[0]


class TestSmoothness:
    def test_mask_boundary(self):
        mask = np.zeros((32, 32))
        mask[8:24, 8:24] = 1
        smooth, boundary = gpr.get_smooth_mask_boundary(mask, sigma=2)
        assert smooth.max() <= 1.0 + 1e-6
        # boundary magnitude peaks at the mask edge, not in the interior
        assert boundary[8, 16] > boundary[16, 16]

    def test_smoothness_zscore_shape(self):
        rng = np.random.default_rng(0)
        field = rng.standard_normal((32, 32))
        weight = np.zeros((32, 32))
        weight[0, 0] = 1.0
        z = gpr.get_smoothness(field, weight)
        assert z.shape == (32, 32)
        assert abs(z.mean()) < 1e-10
