"""Round 2 of full-step tuning: bigger im2col tiles + no-remat variants."""

import json
import os
import time

import numpy as np


def log(o):
    print(json.dumps(o), flush=True)


def main():
    import jax

    cache = os.path.expanduser("~/.cache/vdm4cdm_tpu/xla")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import optax

    from vdm4cdm_tpu.diffusion import VDM, make_schedule
    from vdm4cdm_tpu.models import CUNet
    from vdm4cdm_tpu.train import TrainState, make_train_step
    from vdm4cdm_tpu.train.state import make_optimizer

    size, batch, n_steps = 128, 2, 10
    rng = np.random.default_rng(0)
    batch_data = {
        "x": jnp.asarray(rng.standard_normal((batch, size, size, size, 1), np.float32)),
        "conditioning": jnp.asarray(
            rng.standard_normal((batch, size, size, size, 1), np.float32)),
        "conditioning_values": [jnp.zeros((batch, 6), jnp.float32)],
    }
    key = jax.random.PRNGKey(1)

    def make_vdm(remat):
        net = CUNet(
            remat=remat, shape=(1, size, size, size), chs=(32, 64, 128, 256),
            s_conditioning_channels=1, v_conditioning_dims=(6,), norm_groups=8,
            mid_attn=False, dropout_prob=0.1, conv_padding_mode="circular",
            compute_dtype=jnp.bfloat16,
        )
        return VDM(net, make_schedule("learned_linear", -13.3, 13.3))

    def run(name, remat=True, mu_dtype=None, dropout=True):
        vdm = make_vdm(remat)
        if not dropout:
            vdm = VDM(vdm.score_model.clone(dropout_prob=0.0), vdm.schedule)
        params = jax.jit(lambda r: vdm.init_params(r, batch_size=1))(
            jax.random.PRNGKey(0))
        if mu_dtype is None:
            opt = make_optimizer()
        else:
            opt = optax.chain(optax.clip_by_global_norm(0.5),
                              optax.adamw(3e-4, mu_dtype=mu_dtype))
        state = TrainState(0, params, opt.init(params))
        step_fn = make_train_step(vdm, opt)
        try:
            t_c = time.perf_counter()
            for i in range(2):
                state, metrics = step_fn(state, batch_data, jax.random.fold_in(key, i))
            float(metrics["loss"])
            compile_s = time.perf_counter() - t_c
        except Exception as e:  # noqa: BLE001
            log({"variant": name, "error": repr(e)[:200]})
            return
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, metrics = step_fn(state, batch_data, jax.random.fold_in(key, 100 + i))
        float(metrics["loss"])
        dt = (time.perf_counter() - t0) / n_steps
        log({"variant": name, "step_s": round(dt, 4),
             "mvox_s": round(batch * size**3 / dt / 1e6, 3),
             "compile_s": round(compile_s, 1)})

    run("pallas14MB_remat")
    run("pallas14MB_noremat_bf16mu", remat=False, mu_dtype=jnp.bfloat16)
    run("pallas14MB_remat_nodrop", dropout=False)


if __name__ == "__main__":
    main()
