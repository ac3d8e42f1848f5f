"""Roofline for the flagship train step on the CURRENT platform state.

Measures (1) achieved HBM bandwidth (XLA elementwise + Pallas pipeline),
(2) achieved MXU rate (large bf16 GEMM), (3) the flagship 128^3 b2 train-step
time, and (4) XLA's own cost analysis (flops + bytes accessed) of that exact
compiled step — then reports the bandwidth/compute floors and where the
measured step sits. This is the evidence base for BASELINE.md's "platform
ceiling" verdict on the >=5x contract: on the tunneled slice the measured
bandwidth drifts 45% across hours and sits far below the v5e datasheet, so
the roofline must be re-derived from same-session measurements, not specs.

Run (TPU): python experiments/roofline.py   [one TPU process at a time]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(o):
    print(json.dumps(o), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    cache = os.path.expanduser("~/.cache/vdm4cdm_tpu/xla")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    N_IT = 30

    def timed(run, *args):
        out = run(*args)
        float(jnp.sum(out.ravel()[0]))
        t0 = time.perf_counter()
        out = run(*args)
        float(jnp.sum(out.ravel()[0]))
        return (time.perf_counter() - t0) / N_IT

    # ---- 1. HBM bandwidth: scaled copy, 256 MB tensor -----------------------
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        elems = 256 * 1024 * 1024 // jnp.dtype(dtype).itemsize
        x = jnp.ones((elems // 1024, 1024), dtype)
        run = jax.jit(lambda x: lax.fori_loop(0, N_IT, lambda i, c: c * 1.0001, x))
        dt = timed(run, x)
        bw = 2 * x.size * x.dtype.itemsize / dt / 1e9
        log({"measure": f"hbm_copy_bw_{name}", "GB_s": round(bw, 1)})

    # ---- 2. MXU rate: bf16 4096^2 GEMM chain --------------------------------
    m = jnp.ones((4096, 4096), jnp.bfloat16)
    run = jax.jit(lambda x: lax.fori_loop(
        0, N_IT, lambda i, c: (c @ m) * 0.001, x))
    dt = timed(run, m)
    tf = 2 * 4096**3 / dt / 1e12
    log({"measure": "mxu_bf16_tflops", "TFLOP_s": round(tf, 1)})

    # ---- 3. flagship step time + XLA cost analysis --------------------------
    from vdm4cdm_tpu.diffusion import VDM, make_schedule
    from vdm4cdm_tpu.models import CUNet
    from vdm4cdm_tpu.train import TrainState, make_optimizer, make_train_step

    size, batch = 128, 2
    net = CUNet(
        remat_blocks=("down_0_0",),  # bench.py's default config
        shape=(1, size, size, size), chs=(32, 64, 128, 256),
        s_conditioning_channels=1, v_conditioning_dims=(6,), norm_groups=8,
        dropout_prob=0.1, conv_padding_mode="circular",
        compute_dtype=jnp.bfloat16,
    )
    vdm = VDM(net, make_schedule("learned_linear", -13.3, 13.3))
    params = jax.jit(lambda r: vdm.init_params(r, batch_size=1))(
        jax.random.PRNGKey(0))
    optimizer = make_optimizer(moment_dtype=jnp.bfloat16)
    state = TrainState(0, params, optimizer.init(params))
    step_fn = make_train_step(vdm, optimizer)
    rng = np.random.default_rng(0)
    batch_data = {
        "x": jnp.asarray(rng.standard_normal(
            (batch, size, size, size, 1), np.float32)),
        "conditioning": jnp.asarray(rng.standard_normal(
            (batch, size, size, size, 1), np.float32)),
        "conditioning_values": [jnp.zeros((batch, 6), jnp.float32)],
    }
    key = jax.random.PRNGKey(1)

    try:
        comp = step_fn.lower(state, batch_data, key).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        bytes_acc = float(ca.get("bytes accessed", 0.0))
        log({"measure": "xla_cost_analysis", "step_tflop": round(flops / 1e12, 2),
             "step_GB": round(bytes_acc / 1e9, 2)})
    except Exception as e:  # noqa: BLE001
        flops = bytes_acc = 0.0
        log({"measure": "xla_cost_analysis", "error": repr(e)[:200]})

    for i in range(3):
        state, metrics = step_fn(state, batch_data, jax.random.fold_in(key, i))
    float(metrics["loss"])
    t0 = time.perf_counter()
    n = 10
    for i in range(n):
        state, metrics = step_fn(state, batch_data,
                                 jax.random.fold_in(key, 100 + i))
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n
    vox_s = batch * size**3 / dt
    log({"measure": "flagship_step", "s": round(dt, 3),
         "Mvox_s": round(vox_s / 1e6, 2)})

    # ---- 4. roofline verdict -----------------------------------------------
    if flops and bytes_acc:
        # floors from the same-session measured rates
        bw = None
        # re-measure a quick bf16 copy to pin the comparable BW
        elems = 128 * 1024 * 1024 // 2
        x = jnp.ones((elems // 1024, 1024), jnp.bfloat16)
        run = jax.jit(lambda x: lax.fori_loop(0, N_IT, lambda i, c: c * 1.0001, x))
        dtc = timed(run, x)
        bw = 2 * x.size * 2 / dtc / 1e9
        t_bw = bytes_acc / (bw * 1e9)
        t_fl = flops / (tf * 1e12)
        floor = max(t_bw, t_fl)
        log({
            "measure": "roofline",
            "bw_floor_s": round(t_bw, 3),
            "flop_floor_s": round(t_fl, 3),
            "bound": "bandwidth" if t_bw > t_fl else "compute",
            "step_vs_floor": round(dt / floor, 2),
            "ceiling_Mvox_s": round(batch * size**3 / floor / 1e6, 2),
            "same_session_bw_GB_s": round(bw, 1),
        })


if __name__ == "__main__":
    main()
