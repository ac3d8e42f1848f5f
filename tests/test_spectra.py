"""Physics-metric property tests (SURVEY.md §4: 'Pk of white noise flat')."""

import jax.numpy as jnp
import numpy as np

from vdm4cdm_tpu.evals import get_ccs, pk, power
from vdm4cdm_tpu.evals.pdfs import log_pdf


class TestPower:
    def test_white_noise_flat(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((8, 1, 64, 64)).astype(np.float32)
        k, P, N = power(jnp.asarray(x))
        P = np.asarray(P)
        # white noise: P(k) = const = Npix * var. Low-k bins hold only a
        # handful of modes, so give them a looser sample-variance budget.
        expected = 64 * 64 * 1.0
        assert np.all(np.abs(P / expected - 1) < 0.5), P / expected
        assert np.all(np.abs(P[6:] / expected - 1) < 0.2), P / expected

    def test_single_mode_peak(self):
        """A pure sine at wavenumber 5 must put all power in bin k=5."""
        n = 32
        xs = np.arange(n)
        field = np.sin(2 * np.pi * 5 * xs[:, None] / n) * np.ones((n, n))
        k, P, N = power(jnp.asarray(field[None, None].astype(np.float32)))
        P = np.asarray(P)
        assert P.argmax() == np.asarray(k).round().astype(int).tolist().index(5)
        assert P.max() > 100 * np.delete(P, P.argmax()).max()

    def test_kmax_cut_and_no_k0(self):
        x = np.random.default_rng(0).standard_normal((1, 1, 16, 16)).astype(np.float32)
        k, P, N = power(jnp.asarray(x))
        assert len(np.asarray(k)) == 8  # min(16,16)//2
        assert np.asarray(k)[0] > 0.5  # k=0 dropped

    def test_3d(self):
        x = np.random.default_rng(0).standard_normal((2, 1, 16, 16, 16)).astype(np.float32)
        k, P, N = power(jnp.asarray(x))
        assert len(np.asarray(k)) == 8
        assert np.isfinite(np.asarray(P)).all()

    def test_parseval_total_power(self):
        """sum over all modes of P (with Hermitian weights) == Npix * sum x^2
        — checks the weighting/binning bookkeeping end to end."""
        x = np.random.default_rng(3).standard_normal((1, 1, 16, 16)).astype(np.float32)
        k, P, N = power(jnp.asarray(x))
        total = float((np.asarray(P) * np.asarray(N)).sum())
        # only modes with k <= kmax are counted, so compare against the full
        # rfft sum restricted the same way
        fx = np.fft.rfftn(x[0, 0])
        kx = np.fft.fftfreq(16) * 16
        ky = np.arange(9)
        K = np.sqrt(kx[:, None] ** 2 + ky[None, :] ** 2)
        w = np.full(fx.shape, 2.0)
        w[:, 0] = 1
        w[:, -1] = 1
        mask = np.ceil(K) <= 8
        mask[np.ceil(K) < 1] = False
        expected = float((np.abs(fx[mask]) ** 2 * w[mask]).sum())
        np.testing.assert_allclose(total, expected, rtol=1e-3)


class TestCCS:
    def test_self_correlation_is_one(self):
        x = np.random.default_rng(0).standard_normal((3, 1, 32, 32)).astype(np.float32)
        ks, ccs = get_ccs(jnp.asarray(x), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ccs), 1.0, rtol=1e-4)

    def test_independent_fields_near_zero(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((2, 1, 64, 64)).astype(np.float32)
        b = rng.standard_normal((2, 1, 64, 64)).astype(np.float32)
        ks, ccs = get_ccs(jnp.asarray(a), jnp.asarray(b))
        assert np.abs(np.asarray(ccs)).mean() < 0.2

    def test_full_matrix_shape(self):
        a = np.random.default_rng(0).standard_normal((2, 1, 16, 16)).astype(np.float32)
        b = np.random.default_rng(1).standard_normal((3, 1, 16, 16)).astype(np.float32)
        ks, ccs = get_ccs(jnp.asarray(a), jnp.asarray(b), full=True)
        assert np.asarray(ccs).shape == (2, 3, 8)


class TestLogPdf:
    def test_counts_sum(self):
        bins = np.linspace(-1, 4, 50)
        f = np.abs(np.random.default_rng(0).standard_normal((2, 16, 16))).astype(np.float32)
        h = np.asarray(log_pdf(jnp.asarray(f), bins))
        assert h.shape == (2, 49)
        assert h.sum(1).max() <= 16 * 16
