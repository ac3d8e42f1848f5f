"""Full flagship train step: Pallas conv backend vs XLA, on the TPU.

Also cross-checks the two backends' losses on identical inputs (bf16-level
agreement expected)."""

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

    import vdm4cdm_tpu.ops.conv as conv_mod
    from vdm4cdm_tpu.diffusion import VDM, make_schedule
    from vdm4cdm_tpu.models import CUNet
    from vdm4cdm_tpu.train import TrainState, make_optimizer, make_train_step

    size = int(os.environ.get("BENCH_SIZE", 128))
    batch = int(os.environ.get("BENCH_BATCH", 2))
    n_steps = int(os.environ.get("BENCH_STEPS", 10))

    net = CUNet(
        remat=True, shape=(1, size, size, size), chs=(32, 64, 128, 256),
        s_conditioning_channels=1, v_conditioning_dims=(6,), norm_groups=8,
        mid_attn=False, dropout_prob=0.1, conv_padding_mode="circular",
        compute_dtype=jnp.bfloat16,
    )
    vdm = VDM(net, make_schedule("learned_linear", -13.3, 13.3))
    params = jax.jit(lambda r: vdm.init_params(r, batch_size=1))(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch_data = {
        "x": jnp.asarray(rng.standard_normal((batch, size, size, size, 1), np.float32)),
        "conditioning": jnp.asarray(
            rng.standard_normal((batch, size, size, size, 1), np.float32)),
        "conditioning_values": [jnp.zeros((batch, 6), jnp.float32)],
    }
    key = jax.random.PRNGKey(1)

    results = {}
    for impl in ("auto", "xla"):
        conv_mod._CONV_IMPL = impl
        optimizer = make_optimizer()
        # fresh copy: the step donates its state, which would delete the
        # shared params buffers between impls
        p_i = jax.tree.map(jnp.array, params)
        state = TrainState(0, p_i, optimizer.init(p_i))
        step_fn = make_train_step(vdm, optimizer)
        t_c = time.perf_counter()
        for i in range(2):
            state, metrics = step_fn(state, batch_data, jax.random.fold_in(key, i))
        loss0 = float(metrics["loss"])
        compile_s = time.perf_counter() - t_c
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, metrics = step_fn(state, batch_data, jax.random.fold_in(key, 100 + i))
        float(metrics["loss"])
        dt = (time.perf_counter() - t0) / n_steps
        results[impl] = loss0
        log({"impl": impl, "step_s": round(dt, 4),
             "mvox_s": round(batch * size**3 / dt / 1e6, 3),
             "loss_step2": loss0, "compile_s": round(compile_s, 1)})
    log({"loss_rel_diff": abs(results["auto"] - results["xla"])
         / max(abs(results["xla"]), 1e-9)})


if __name__ == "__main__":
    main()
