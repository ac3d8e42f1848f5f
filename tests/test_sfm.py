"""SFM flow-matching tests: loss semantics and ODE transport."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdm4cdm_tpu.flows import SFM
from vdm4cdm_tpu.models import CUNet


@pytest.fixture(scope="module")
def tiny_sfm():
    unet = CUNet(shape=(1, 8, 8), chs=(8, 8, 8, 8), norm_groups=4, dropout_prob=0.0,
                 v_conditioning_dims=(6,))
    sfm = SFM(unet)
    params = sfm.init_params(jax.random.PRNGKey(0), batch_size=2)
    return sfm, params


class TestLoss:
    def test_zero_model_loss_equals_mean_sq_velocity(self, tiny_sfm):
        """Fresh zero-init net predicts v=0, so loss == E||x1-x0||^2."""
        sfm, params = tiny_sfm
        x0 = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 1))
        x1 = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 1))
        batch = {"x0": x0, "x1": x1, "conditioning_values": [jnp.ones((4, 6))]}
        losses = sfm.loss(params, batch, jax.random.PRNGKey(3), train=False)
        expected = float(jnp.mean((x1 - x0) ** 2))
        np.testing.assert_allclose(float(losses.loss), expected, rtol=1e-5)

    def test_stochastic_interpolant_finite(self):
        unet = CUNet(shape=(1, 8, 8), chs=(8, 8, 8, 8), norm_groups=4, dropout_prob=0.0)
        sfm = SFM(unet, sigma=0.1)
        params = sfm.init_params(jax.random.PRNGKey(0))
        x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
        x1 = x0 + 1.0
        losses = sfm.loss(params, {"x0": x0, "x1": x1}, jax.random.PRNGKey(3))
        assert np.isfinite(float(losses.loss))


class TestSampling:
    def test_zero_velocity_is_identity(self, tiny_sfm):
        sfm, params = tiny_sfm
        x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 1))
        out = sfm.draw_samples(params, x0, n_sampling_steps=4,
                               v_conditionings=[jnp.ones((1, 6))])
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-6)

    def test_constant_velocity_transport(self):
        """An analytic velocity field v=c must transport x0 -> x0 + c exactly
        (Heun is exact for constant fields). Uses a stub 'model' by monkey-
        patching the velocity method through a trivial SFM subclass."""
        unet = CUNet(shape=(1, 8, 8), chs=(8, 8, 8, 8), norm_groups=4, dropout_prob=0.0)

        class ConstSFM(SFM):
            def velocity(self, params, x, t, v_conditionings=(), s_conditioning=None,
                         train=False, dropout_rng=None):
                return jnp.full_like(x, 2.5)

        sfm = ConstSFM(unet)
        params = sfm.init_params(jax.random.PRNGKey(0))
        x0 = jnp.zeros((1, 8, 8, 1))
        out = sfm.draw_samples(params, x0, n_sampling_steps=8)
        np.testing.assert_allclose(np.asarray(out), 2.5, rtol=1e-5)


def _toy_sfm(sigma, c0, mu, s):
    """SFM with the ANALYTIC ideal velocity of a Gaussian toy: x0 = c0
    (known constant), x1 ~ N(mu, s^2) iid per coordinate, interpolant
    x_t = (1-t) c0 + t x1 + sigma sqrt(t(1-t)) eps. Conditioning on x_t is
    jointly Gaussian, so b(x, t) = E[x1 - x0 + sigma gdot eps | x_t] is a
    closed-form affine map — the exact target the SFM loss would converge to."""
    unet = CUNet(shape=(1, 8, 8), chs=(8, 8, 8, 8), norm_groups=4,
                 dropout_prob=0.0)

    class ToySFM(SFM):
        def velocity(self, params, x, t, v_conditionings=(),
                     s_conditioning=None, train=False, dropout_rng=None):
            tb = t.reshape(t.shape + (1,) * (x.ndim - 1))
            g2 = tb * (1.0 - tb)
            m_t = (1.0 - tb) * c0 + tb * mu
            var_t = tb**2 * s**2 + sigma**2 * g2
            gain = (tb * s**2 + sigma**2 * (1.0 - 2.0 * tb) / 2.0) / var_t
            return (mu - c0) + gain * (x - m_t)

    return ToySFM(unet, sigma=sigma)


class TestStochasticSampling:
    """The posterior-sampling capability the reference lacks (its SFM
    generation raises NotImplementedError, generate_3D.py:16-17): with the
    ideal velocity of a known Gaussian toy, the stochastic samplers must
    reproduce the true target distribution N(mu, s^2)."""

    c0, mu, s, sigma = 0.3, 1.2, 0.5, 0.8
    n = 16384

    def _samples(self, method, churn=1.0, key=7):
        sfm = _toy_sfm(self.sigma, self.c0, self.mu, self.s)
        x0 = jnp.full((self.n, 1), self.c0)
        out = sfm.draw_samples(
            {}, x0, n_sampling_steps=400, method=method,
            rng=jax.random.PRNGKey(key), churn=churn)
        return np.asarray(out).ravel()

    @pytest.mark.parametrize("method", ["heun", "sde"])
    def test_matches_target_distribution(self, method):
        xs = self._samples(method)
        assert abs(xs.mean() - self.mu) < 0.03
        np.testing.assert_allclose(xs.std(), self.s, rtol=0.05)

    def test_sde_reps_differ_but_agree_in_law(self):
        a = self._samples("sde", key=1)
        b = self._samples("sde", key=2)
        assert np.abs(a - b).max() > 0.1          # distinct realizations
        assert abs(a.mean() - b.mean()) < 0.03    # same law
        np.testing.assert_allclose(a.std(), b.std(), rtol=0.05)

    def test_same_rng_is_deterministic(self):
        a = self._samples("sde", key=3)
        b = self._samples("sde", key=3)
        np.testing.assert_array_equal(a, b)

    def test_sde_requires_sigma_and_rng(self, tiny_sfm):
        sfm, params = tiny_sfm  # sigma = 0
        x0 = jnp.zeros((1, 8, 8, 1))
        with pytest.raises(ValueError):
            sfm.draw_samples(params, x0, n_sampling_steps=2, method="sde",
                             rng=jax.random.PRNGKey(0))

    def test_real_model_reps_differ(self):
        """Through the actual CUNet: distinct rngs give distinct posterior
        reps (the property calc_ss's 128-rep posterior std relies on)."""
        unet = CUNet(shape=(1, 8, 8), chs=(8, 8, 8, 8), norm_groups=4,
                     dropout_prob=0.0, v_conditioning_dims=(6,))
        sfm = SFM(unet, sigma=0.2)
        params = sfm.init_params(jax.random.PRNGKey(0), batch_size=2)
        x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
        v = [jnp.ones((2, 6))]
        kw = dict(n_sampling_steps=6, v_conditionings=v, method="sde")
        a = sfm.draw_samples(params, x0, rng=jax.random.PRNGKey(10), **kw)
        b = sfm.draw_samples(params, x0, rng=jax.random.PRNGKey(11), **kw)
        assert np.all(np.isfinite(np.asarray(a)))
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4


@pytest.mark.slow
class TestSpatialConditioning:
    """The reference's SFM scripts build CUNet with s_conditioning_channels=1
    and feed x0 as a SPATIAL conditioning channel throughout the trajectory
    (reference trainSFM_c_uc_from_field_name.py:57,104-110) — the CAMELS SFM
    presets here do the same (config.build_model: in_field => s channels).
    Regression: loss and sampling must wire x0 into that channel (a net that
    demands s conditioning used to crash at the first training step)."""

    @pytest.fixture(scope="class")
    def cond_sfm(self):
        unet = CUNet(shape=(1, 8, 8), chs=(8, 8, 8, 8), norm_groups=4,
                     dropout_prob=0.0, s_conditioning_channels=1)
        sfm = SFM(unet)
        params = sfm.init_params(jax.random.PRNGKey(0), batch_size=2)
        return sfm, params

    def test_loss_runs_and_is_finite(self, cond_sfm):
        sfm, params = cond_sfm
        x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
        x1 = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 1))
        losses = sfm.loss(params, {"x0": x0, "x1": x1}, jax.random.PRNGKey(3))
        assert np.isfinite(float(losses.loss))

    def test_conditioning_reaches_the_net(self, cond_sfm):
        """Same transported state, different x0 => different velocity (after
        one grad step away from the zero-init output head)."""
        sfm, params = cond_sfm
        x0a = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
        x0b = x0a + 1.0
        x1 = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 1))

        def lval(p):
            return sfm.loss(p, {"x0": x0a, "x1": x1},
                            jax.random.PRNGKey(3)).loss

        g = jax.grad(lval)(params)
        stepped = jax.tree.map(lambda p, gi: p - 1e-2 * gi, params, g)
        xt = jnp.zeros((2, 8, 8, 1))
        t = jnp.full((2,), 0.5)
        va = sfm.velocity(stepped, xt, t, s_conditioning=x0a)
        vb = sfm.velocity(stepped, xt, t, s_conditioning=x0b)
        assert np.abs(np.asarray(va) - np.asarray(vb)).max() > 1e-6

    def test_sampling_uses_x0_conditioning(self, cond_sfm):
        sfm, params = cond_sfm
        x0 = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 1))
        out = sfm.draw_samples(params, x0, n_sampling_steps=3)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_cli_train_with_s_conditioned_sfm_preset(self, tmp_path):
        """End-to-end regression at the exact failure site: the 2D SFM
        mid-attn preset (trainSFM_c_uc: in_field="Mstar" => the velocity
        CUNet is built with s_conditioning_channels=1) must train through
        the CLI. Before the fix this crashed at step 0 with 'model expects
        s_conditioning'. GRF data, tiny shapes."""
        from vdm4cdm_tpu.cli.train import main

        rc = main([
            "--preset", "trainSFM_c_uc",
            "--set",
            "data.kind=grf", "data.cropsize=16", "data.batch_size=2",
            "model.chs=[8,8,8,8]", "model.norm_groups=4",
            "run.max_steps=2", "run.val_check_interval=1000",
            "run.ckpt_every_steps=1000", "run.log_every_steps=1",
            f"run.out_dir={tmp_path}", "run.experiment_name=sfm_scond",
        ])
        assert rc == 0
