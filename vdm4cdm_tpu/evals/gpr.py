"""GPR / covariance toolkit for inpainting & boundary studies.

Capability parity with reference src/utils.py:306-399:
  * get_radial_cov_func_image — radial covariance estimated from an image by
    sampling pixel pairs with periodic-minimum distances (:306-342);
  * get_parametric_radial_cov_func — fit a*exp(-b r) + c/(d r + 1) + e (:344-359);
  * get_gpr_result — Cholesky GP posterior mean/var + draws (:361-375);
  * get_smooth_mask_boundary / get_smoothness — smooth mask edges and an
    FFT-cross-correlation smoothness z-score (:377-399).

Host-side analysis code (numpy/scipy) — not a TPU hot path.
"""

from __future__ import annotations

import warnings

import numpy as np
import scipy.interpolate as sintp
import scipy.ndimage as sim
import scipy.optimize as sopt
import scipy.stats as sstats


def get_radial_cov_func_image(im, r_cov_est: int = 50, n_cov_est: int = 4000,
                              return_stats: bool = False, rng=None):
    """Estimate the isotropic radial covariance function of a (square,
    periodic) image by sampling n_cov_est anchor pixels."""
    im = np.asarray(im)
    xl, yl = im.shape
    assert xl == yl, "Image must be square"
    rng = rng or np.random.default_rng()
    im_ms = im - im.mean()
    x, y = np.meshgrid(np.arange(xl), np.arange(yl), indexing="ij")
    locs = rng.choice(xl * yl, n_cov_est, replace=False)
    ind_is, ind_js = np.unravel_index(locs, im_ms.shape)
    rs, covvals = [], []
    for i in range(n_cov_est):
        dx = np.minimum(np.abs(x - x[ind_is[i], ind_js[i]]),
                        xl - np.abs(x - x[ind_is[i], ind_js[i]]))
        dy = np.minimum(np.abs(y - y[ind_is[i], ind_js[i]]),
                        yl - np.abs(y - y[ind_is[i], ind_js[i]]))
        r = np.sqrt(dx**2 + dy**2)
        sel = (r <= r_cov_est) & (r != 0)
        rs.append(r[sel])
        covvals.append(im_ms[sel] * im_ms[ind_is[i], ind_js[i]])
    rs = np.concatenate(rs)
    covvals = np.concatenate(covvals)

    rbins = np.linspace(0.5, r_cov_est + 0.5, r_cov_est + 1)
    centers = 0.5 * (rbins[1:] + rbins[:-1])
    counts = sstats.binned_statistic(rs, covvals, statistic="count", bins=rbins)[0]
    means = sstats.binned_statistic(rs, covvals, statistic="mean", bins=rbins)[0]
    stds = sstats.binned_statistic(rs, covvals, statistic="std", bins=rbins)[0]
    sems = stds / np.sqrt(np.maximum(counts, 1))
    var = im_ms.var()
    x_dat = [0, *centers]
    y_dat = [var, *means]
    f = sintp.interp1d(x_dat, y_dat, bounds_error=False,
                       fill_value=min(np.nanmin(y_dat), 0))
    if return_stats:
        return f, var, centers, means, stds, sems
    return f


def get_parametric_radial_cov_func(radial_cov_func, fit_range=(0, 50), n: int = 1000,
                                   tol: float = 0.05, maxfev: int = 5000):
    """Fit rc(r) = a e^{-b r} + c/(d r + 1) + e to the empirical covariance."""
    xs = np.linspace(*fit_range, n)
    ys = radial_cov_func(xs)

    def rc(r, a, b, c, d, e):
        return a * np.exp(-b * r) + c / (d * r + 1) + e

    p0 = [ys[0], -np.log(max(radial_cov_func(10) / ys[0], 1e-8)), 0.0, 0.0, 0.0]
    res = sopt.curve_fit(rc, xs, ys, p0=p0, maxfev=maxfev)
    test_y = rc(xs, *res[0])
    assert np.all(np.abs(test_y - ys) < tol), f"fit not under tolerance {tol}"
    return lambda r: rc(r, *res[0])


def get_gpr_result(x_uk, x_k, y_k, cov_func, n_samples: int = 24,
                   reg_diag: float = 0.0, reg_all: float = 0.0, rng=None):
    """Exact GP posterior at unknown locations x_uk given (x_k, y_k)."""
    rng = rng or np.random.default_rng()
    cov_k_k = cov_func(x_k, x_k) + reg_diag * np.eye(len(x_k)) + reg_all
    cov_uk_k = cov_func(x_uk, x_k)
    cov_uk_uk = cov_func(x_uk, x_uk)
    L = np.linalg.cholesky(cov_k_k)
    L_y = np.linalg.solve(L, y_k)
    LT_L_y = np.linalg.solve(L.T, L_y)
    v = np.linalg.solve(L, cov_uk_k.T)
    post_mean = cov_uk_k @ LT_L_y
    post_cov = cov_uk_uk - v.T @ v
    post_var = np.diag(post_cov)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        post_draws = rng.multivariate_normal(post_mean, post_cov, size=n_samples)
    return post_mean, post_var, post_draws


def get_smooth_mask_boundary(mask, sigma: float = 3.0):
    smooth_mask = sim.gaussian_filter(np.asarray(mask, np.float32), sigma=sigma)
    gx = sim.sobel(smooth_mask, axis=0)
    gy = sim.sobel(smooth_mask, axis=1)
    boundary = np.linalg.norm(np.stack([gx, gy], axis=-1), axis=-1)
    return smooth_mask, boundary


def get_smoothness(field, weight, return_maps: bool = False, gradient: bool = True):
    """z-scored FFT cross-correlation of (the gradient magnitude of) a field
    with a weight map — a smoothness/seam detector."""
    field = np.asarray(field)
    if gradient:
        gx = sim.sobel(field, axis=0)
        gy = sim.sobel(field, axis=1)
        in_field = np.linalg.norm(np.stack([gx, gy], axis=-1), axis=-1)
    else:
        in_field = field.copy()
    cc = np.fft.ifftn(np.fft.fftn(in_field) * np.fft.fftn(weight))
    maximag = np.max(np.abs(cc.imag))
    assert maximag < 1e-6 * max(1.0, np.abs(cc.real).max()), f"cc.imag not ~0: {maximag}"
    cc = cc.real
    z = (cc - cc.mean()) / cc.std(ddof=1)
    if return_maps:
        return z, in_field, cc
    return z
