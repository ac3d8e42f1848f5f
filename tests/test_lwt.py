"""Wavelet scattering (LWT) tests: shapes, invariances, reduction."""

import jax.numpy as jnp
import numpy as np
import pytest

from vdm4cdm_tpu.evals import lwt

N, NR, NT = 64, 4, 4


@pytest.fixture(scope="module")
def bank():
    return lwt.make_wavelets(N=N, NR=NR, NT=NT, sqrt=True)


class TestWST:
    def n2(self):
        return (NR * (NR - 1) // 2) * NT * NT

    def test_shapes(self, bank):
        mms, vals = bank
        x = np.random.default_rng(0).standard_normal((3, N, N)).astype(np.float32)
        wst = np.asarray(lwt.WST_abs2(jnp.asarray(x), mms, vals, m=2))
        assert wst.shape == (3, 2 + NR * NT + self.n2())
        assert np.isfinite(wst).all() and (wst[:, 1:] >= 0).all()

    def test_translation_invariance(self, bank):
        """Scattering coefficients are (near-)invariant to periodic shifts."""
        mms, vals = bank
        x = np.random.default_rng(1).standard_normal((N, N)).astype(np.float32)
        a = np.asarray(lwt.WST_abs2(jnp.asarray(x)[None], mms, vals, m=2))
        b = np.asarray(lwt.WST_abs2(jnp.asarray(np.roll(x, (7, 13), (0, 1)))[None], mms, vals, m=2))
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)

    def test_energy_scales_quadratically(self, bank):
        """|x*psi|^2-based coefficients scale as amplitude^2."""
        mms, vals = bank
        x = np.random.default_rng(2).standard_normal((N, N)).astype(np.float32)
        a = np.asarray(lwt.WST_abs2(jnp.asarray(x)[None], mms, vals, m=1))[0, 2:]
        b = np.asarray(lwt.WST_abs2(jnp.asarray(3 * x)[None], mms, vals, m=1))[0, 2:]
        np.testing.assert_allclose(b, 9 * a, rtol=1e-3)

    def test_orientation_selectivity(self, bank):
        """A horizontal-stripe pattern must excite one orientation channel far
        more than the orthogonal one at the matching scale."""
        mms, vals = bank
        xs = np.arange(N)
        stripes = np.sin(2 * np.pi * 12 * xs / N)[:, None] * np.ones((N, N))
        wst = np.asarray(lwt.WST_abs2(jnp.asarray(stripes)[None].astype(np.float32), mms, vals, m=1))
        s1 = wst[0, 2 : 2 + NR * NT].reshape(NR, NT)
        j = s1.sum(1).argmax()
        assert s1[j].max() > 5 * s1[j].min()


class TestRWST:
    def test_reduction_shape_and_rotation_average(self, bank):
        mms, vals = bank
        x = np.random.default_rng(0).standard_normal((2, N, N)).astype(np.float32)
        wst = np.asarray(lwt.WST_abs2(jnp.asarray(x), mms, vals, m=2))
        rwst = lwt.get_rwst(wst, NR=NR, NT=NT)
        assert rwst.shape == (2, 2 + NR + (NR * (NR - 1) // 2) * NT)
        # order-0 passthrough
        np.testing.assert_allclose(rwst[:, :2], wst[:, :2])
        # S1 reduction is the mean over orientations
        np.testing.assert_allclose(
            rwst[:, 2 : 2 + NR],
            wst[:, 2 : 2 + NR * NT].reshape(2, NR, NT).mean(-1),
            rtol=1e-6,
        )


class TestDirectSpaceCrossCheck:
    """Pin the FFT-based scattering numerics against a fully independent
    direct-space path: the same Fourier-defined filters, but the convolution
    evaluated as a brute-force O(N^4) circular sum in float64 numpy. Catches
    any FFT-convention, normalization, or pipeline error in WST_abs2."""

    def test_s1_s2_match_bruteforce(self):
        N, NR, NT = 16, 2, 2
        mms, vals = lwt.make_wavelets(N=N, NR=NR, NT=NT, sqrt=False)
        rng = np.random.default_rng(3)
        x = rng.standard_normal((N, N))

        # spatial-domain filters (complex), via numpy's FFT in float64
        spatial = [np.fft.ifft2(np.asarray(v, np.complex128)) for v in vals]

        def circ_conv(sig, ker):
            out = np.zeros((N, N), np.complex128)
            for a in range(N):
                for b in range(N):
                    acc = 0.0 + 0.0j
                    for c in range(N):
                        for d in range(N):
                            acc += sig[c, d] * ker[(a - c) % N, (b - d) % N]
                    out[a, b] = acc
            return out

        # scale down the brute force: only check filters 0 and NT (two scales)
        i1, i2 = 0, NT  # j1=0, j2=1 -> a valid order-2 pair
        u1_bf = np.abs(circ_conv(x, spatial[i1]))
        s1_bf = (u1_bf**2).mean()
        u2_bf = np.abs(circ_conv(u1_bf, spatial[i2]))
        s2_bf = (u2_bf**2).mean()

        wst = np.asarray(lwt.WST_abs2(x, mms, vals, m=2))
        s1_fft = wst[2 + i1]
        # order-2 columns: (i1, i2) pairs with j2 > j1 in row-major i1, i2
        pair_cols = [(a, b) for a in range(NR * NT) for b in range(NR * NT)
                     if b // NT > a // NT]
        s2_fft = wst[2 + NR * NT + pair_cols.index((i1, i2))]

        np.testing.assert_allclose(s1_fft, s1_bf, rtol=1e-4)
        np.testing.assert_allclose(s2_fft, s2_bf, rtol=1e-4)
