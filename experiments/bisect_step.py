"""Bisect the 128^3 b2 flagship train-step time into its cost buckets.

Round-1 state (docs/DESIGN.md §5): full step 2.02 s, forward-only 855 ms, yet
the forward's conv content at measured standalone rates is only ~90 ms — the
overhead lives somewhere in the op mix. Each variant below toggles exactly one
suspect (dropout RNG, circular facefix corrections, GroupNorm stats, remat) and
times the full jitted program with the dispatch-N + scalar-fetch protocol
(block_until_ready is unreliable on this tunneled platform).

Run on the TPU:  python experiments/bisect_step.py | tee /tmp/bisect.log
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "XLA_FLAGS",
    "--xla_dump_to=/tmp/xla_dump --xla_dump_hlo_as_text "
    "--xla_dump_hlo_pass_re=.*-last",
)

import numpy as np


def log(obj):
    print(json.dumps(obj), flush=True)


def main():
    import jax

    cache = os.path.expanduser("~/.cache/vdm4cdm_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import optax

    import vdm4cdm_tpu.models.cunet as cunet_mod
    import vdm4cdm_tpu.ops.conv as conv_mod
    from vdm4cdm_tpu.diffusion import VDM, make_schedule
    from vdm4cdm_tpu.models import CUNet
    from vdm4cdm_tpu.train import TrainState, make_train_step
    from vdm4cdm_tpu.train.state import make_optimizer

    size = int(os.environ.get("BISECT_SIZE", 128))
    batch = int(os.environ.get("BISECT_BATCH", 2))
    n_steps = int(os.environ.get("BISECT_STEPS", 10))

    rng = np.random.default_rng(0)
    batch_data = {
        "x": jnp.asarray(rng.standard_normal((batch, size, size, size, 1), np.float32)),
        "conditioning": jnp.asarray(
            rng.standard_normal((batch, size, size, size, 1), np.float32)
        ),
        "conditioning_values": [jnp.zeros((batch, 6), jnp.float32)],
    }

    real_gn = cunet_mod.group_norm

    def fake_gn(x, scale, bias, groups, eps=1e-6, act=None, ctx=None):
        # affine + activation only: removes the moment computation/normalization
        out = x * scale.astype(x.dtype) + bias.astype(x.dtype)
        return jax.nn.silu(out) if act == "silu" else out

    def build(dropout=0.1, padding="circular", circ_impl="facefix", remat=True,
              gn=True):
        conv_mod._CIRCULAR_IMPL = circ_impl
        cunet_mod.group_norm = real_gn if gn else fake_gn
        net = CUNet(
            remat=remat,
            shape=(1, size, size, size),
            chs=(32, 64, 128, 256),
            s_conditioning_channels=1,
            v_conditioning_dims=(6,),
            norm_groups=8,
            mid_attn=False,
            dropout_prob=dropout,
            conv_padding_mode=padding,
            compute_dtype=jnp.bfloat16,
        )
        return VDM(net, make_schedule("learned_linear", -13.3, 13.3))

    def time_train(name, vdm, mu_dtype=None):
        t_build = time.perf_counter()
        params = jax.jit(lambda r: vdm.init_params(r, batch_size=1))(
            jax.random.PRNGKey(0))
        if mu_dtype is None:
            optimizer = make_optimizer()
        else:
            optimizer = optax.chain(
                optax.clip_by_global_norm(0.5),
                optax.adamw(3e-4, mu_dtype=mu_dtype),
            )
        state = TrainState(0, params, optimizer.init(params))
        step_fn = make_train_step(vdm, optimizer)
        key = jax.random.PRNGKey(1)
        try:
            for i in range(2):
                state, metrics = step_fn(state, batch_data, jax.random.fold_in(key, i))
            float(metrics["loss"])
        except Exception as e:  # noqa: BLE001
            log({"variant": name, "error": repr(e)[:300]})
            return
        compile_s = time.perf_counter() - t_build
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, metrics = step_fn(
                state, batch_data, jax.random.fold_in(key, 100 + i))
        float(metrics["loss"])
        dt = (time.perf_counter() - t0) / n_steps
        log({"variant": name, "step_s": round(dt, 4),
             "mvox_s": round(batch * size**3 / dt / 1e6, 3),
             "compile_s": round(compile_s, 1)})

    def time_fwd(name, vdm):
        params = jax.jit(lambda r: vdm.init_params(r, batch_size=1))(
            jax.random.PRNGKey(0))
        fwd = jax.jit(lambda p, b, r: vdm.loss(p, b, r, train=True).loss)
        key = jax.random.PRNGKey(1)
        out = fwd(params, batch_data, key)
        float(out)
        t0 = time.perf_counter()
        for i in range(n_steps):
            out = fwd(params, batch_data, jax.random.fold_in(key, i))
        float(out)
        dt = (time.perf_counter() - t0) / n_steps
        # XLA's own flop estimate for the program
        try:
            cost = fwd.lower(params, batch_data, key).compile().cost_analysis()
            flops = cost.get("flops", float("nan"))
        except Exception:  # noqa: BLE001
            flops = float("nan")
        log({"variant": name, "fwd_s": round(dt, 4),
             "tflops_est": round(flops / 1e12, 2) if flops == flops else None,
             "tflops_per_s": round(flops / dt / 1e12, 1) if flops == flops else None})

    # ---- forward-only first (cheapest compiles, most informative ratios) ----
    time_fwd("fwd_base", build())
    time_fwd("fwd_nodrop", build(dropout=0.0))
    time_fwd("fwd_zeros", build(padding="zeros"))
    time_fwd("fwd_nogn", build(gn=False))
    time_fwd("fwd_nodrop_zeros_nogn", build(dropout=0.0, padding="zeros", gn=False))

    # ---- full train steps ----
    time_train("base", build())
    time_train("nodrop", build(dropout=0.0))
    time_train("zeros", build(padding="zeros"))
    time_train("circpad", build(circ_impl="pad"))
    time_train("nogn", build(gn=False))
    time_train("noremat_bf16mu", build(remat=False), mu_dtype=jnp.bfloat16)
    time_train("nodrop_zeros_nogn", build(dropout=0.0, padding="zeros", gn=False))

    # ---- dump optimized HLO of the baseline step for offline layout analysis
    try:
        vdm = build()
        params = jax.jit(lambda r: vdm.init_params(r, batch_size=1))(
            jax.random.PRNGKey(0))
        optimizer = make_optimizer()
        state = TrainState(0, params, optimizer.init(params))
        step_fn = make_train_step(vdm, optimizer)
        txt = step_fn.lower(state, batch_data, jax.random.PRNGKey(2)).compile().as_text()
        with open("/tmp/base_step_hlo.txt", "w") as f:
            f.write(txt)
        log({"hlo_dump": "/tmp/base_step_hlo.txt", "bytes": len(txt)})
    except Exception as e:  # noqa: BLE001
        log({"hlo_dump_error": repr(e)[:300]})


if __name__ == "__main__":
    main()
