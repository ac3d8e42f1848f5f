"""Donation/alias audit (SURVEY.md §5 sanitizers row; round-2 VERDICT item 7).

make_train_step donates the TrainState; at 3D flagship scale the params +
optimizer state are ~hundreds of MB, so a silently dropped donation (e.g. an
argument consumed twice, or a dtype/layout change breaking the alias) would
cost real HBM headroom. These tests pin the compiled artifact's
input_output_alias coverage and its temp-memory footprint, so any regression
that breaks buffer reuse fails CI rather than OOMing a production run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdm4cdm_tpu.diffusion import VDM, make_schedule
from vdm4cdm_tpu.models import CUNet
from vdm4cdm_tpu.train import TrainState, make_optimizer, make_train_step

# whole-file slow: builds flagship-sized jaxprs (round-4 VERDICT weak #4)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def lowered_step():
    net = CUNet(shape=(1, 8, 8), chs=(8, 8, 8, 8), norm_groups=4,
                dropout_prob=0.1, s_conditioning_channels=1,
                v_conditioning_dims=(6,))
    vdm = VDM(net, make_schedule("learned_linear", -13.3, 13.3))
    params = vdm.init_params(jax.random.PRNGKey(0))
    opt = make_optimizer()
    state = TrainState(0, params, opt.init(params))
    step = make_train_step(vdm, opt)
    batch = {
        "x": jnp.zeros((2, 8, 8, 1)),
        "conditioning": jnp.zeros((2, 8, 8, 1)),
        "conditioning_values": [jnp.zeros((2, 6))],
    }
    compiled = step.lower(state, batch, jax.random.PRNGKey(1)).compile()
    return state, compiled


class TestTrainStepDonation:
    def test_every_state_buffer_is_aliased(self, lowered_step):
        """Each params + opt-state input buffer must alias an output buffer
        (the in-place update): the compiled HLO's input_output_alias entries
        must cover at least the full TrainState leaf count."""
        state, compiled = lowered_step
        txt = compiled.as_text()
        n_alias = txt.count("may-alias") + txt.count("must-alias")
        n_state_leaves = len(jax.tree.leaves((state.params, state.opt_state)))
        assert n_alias >= n_state_leaves, (
            f"only {n_alias} aliased buffers for {n_state_leaves} TrainState "
            "leaves — state donation is (partially) broken")

    def test_alias_bytes_cover_state(self, lowered_step):
        """The aliased byte volume must cover ~the whole donated state."""
        state, compiled = lowered_step
        ma = compiled.memory_analysis()
        if ma is None or ma.alias_size_in_bytes == 0:
            pytest.skip("memory_analysis not supported on this backend")
        state_bytes = sum(
            np.prod(l.shape) * l.dtype.itemsize
            for l in jax.tree.leaves((state.params, state.opt_state)))
        assert ma.alias_size_in_bytes >= 0.95 * state_bytes

    def test_temp_memory_stays_bounded(self, lowered_step):
        """Regression pin on the step's temp footprint: temps must stay of
        the order of the activation working set, not accumulate extra copies
        of the state (which is what a broken donation turns into)."""
        state, compiled = lowered_step
        ma = compiled.memory_analysis()
        if ma is None or ma.temp_size_in_bytes == 0:
            pytest.skip("memory_analysis not supported on this backend")
        state_bytes = sum(
            np.prod(l.shape) * l.dtype.itemsize
            for l in jax.tree.leaves((state.params, state.opt_state)))
        # measured ~0.5 MB temps vs ~0.64 MB state for this config; 3x the
        # state is far above any healthy value but below one extra full copy
        # of params+opt+grads+updates piling up un-aliased
        assert ma.temp_size_in_bytes < 3 * state_bytes


class TestSamplerDonation:
    def test_scan_carry_does_not_grow_with_steps(self):
        """The 250-step ancestral sampler must run in O(1) memory in the
        step count: compare compiled temp sizes at 4 vs 32 steps."""
        net = CUNet(shape=(1, 8, 8), chs=(8, 8, 8, 8), norm_groups=4,
                    dropout_prob=0.0)
        vdm = VDM(net, make_schedule("learned_linear", -13.3, 13.3))
        params = vdm.init_params(jax.random.PRNGKey(0))

        def temps(n):
            fn = jax.jit(lambda p, r: vdm.draw_samples(
                p, r, batch_size=1, n_sampling_steps=n))
            ma = fn.lower(params, jax.random.PRNGKey(1)).compile().memory_analysis()
            return None if ma is None else ma.temp_size_in_bytes

        t4, t32 = temps(4), temps(32)
        if not t4 or not t32:
            pytest.skip("memory_analysis not supported on this backend")
        assert t32 <= 1.25 * t4, (t4, t32)
