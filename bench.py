"""Benchmark: flagship 3D conditional VDM training throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: training throughput in voxels/second/chip for the reference's flagship
3D conditional task (trainVDM3D128_c_c: 128^3 crop, batch 2, chs
[32,64,128,256], learned_linear gamma, Adam 3e-4, grad clip 0.5 — reference
configs.yaml:1-18 and BASELINE.md targets row "train voxels/sec/chip").

Baseline: the reference publishes no numbers. The denominator 5.0e6 voxels/s
is a DERIVED estimate of the reference's single-GPU (A100 TF32) throughput for
this exact model/batch — measured step FLOPs (27.6 TF = 3 x the 9.21 TF
forward reported by XLA cost_analysis) at ~30% of A100 TF32 peak (cuDNN's
typical efficiency on thin-channel 3D convs); the 15-40% efficiency range
brackets the denominator at 3.6-9.5 Mvox/s. Full arithmetic + the torch-twin
command to replace the estimate with a measurement: BASELINE.md "The bench
denominator". BASELINE.md sets the target at >=5x reference throughput.

Measurement protocol: K timing windows of BENCH_STEPS steps each (median
reported, min-max spread recorded as "drift_spread") — the tunneled platform's
throughput drifts up to ~45% across hours (docs/DESIGN.md §6), so a single
window cannot be trusted.

Env knobs:
  BENCH_SIZE (default 128), BENCH_BATCH (2), BENCH_STEPS (8 per window),
  BENCH_WINDOWS (5), BENCH_DTYPE
  (bfloat16|float32, default bfloat16 activations / f32 params+ELBOU),
  BENCH_REMAT (default "blocks": no full remat, rematerialize only 4 of the
  5 full-resolution L0 ResBlocks + bf16 Adam first moment — fits the 16 GB
  chip with the packed-carrier memory savings and skips most of the remat
  re-forward; falls back to full remat ("1") automatically if the blocks
  config OOMs), BENCH_MODE (train|sample — sample reports ONLY the
  seconds-per-sampled-field line; the default train mode ALSO appends the
  250-step sample_sec_per_field_{size} measurement to its JSON record so one
  invocation covers both BASELINE.md target metrics; BENCH_SAMPLE=0 skips it).
"""

import json
import os
import time

import numpy as np

# Reference A100 estimate, derivation in BASELINE.md "The bench denominator"
BASELINE_VOX_S = 5.0e6


def main():
    import jax

    cache = os.path.expanduser("~/.cache/vdm4cdm_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from vdm4cdm_tpu.diffusion import VDM, make_schedule
    from vdm4cdm_tpu.models import CUNet
    from vdm4cdm_tpu.train import TrainState, make_optimizer, make_train_step

    size = int(os.environ.get("BENCH_SIZE", 128))
    batch = int(os.environ.get("BENCH_BATCH", 2))
    n_steps = int(os.environ.get("BENCH_STEPS", 8))
    n_windows = int(os.environ.get("BENCH_WINDOWS", 5))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bfloat16") == "bfloat16" else jnp.float32
    # Default: rematerialize ONE full-resolution encoder block — with the
    # decoder on the packed fast path (round 3) that is all the headroom the
    # 16 GB chip needs (full no-remat misses HBM by ~114 MB; the 4-block
    # "blocks" set measured 1.8% slower). OOM falls back to "blocks", then "1".
    remat_mode = os.environ.get("BENCH_REMAT", "down_0_0")

    def build_net(mode):
        # mode: "1" full remat | "blocks" the default 4-block set | "0" none |
        # comma-separated block names (e.g. "down_0_0,up_0_2") for ablations.
        if mode == "blocks":
            blocks = ("down_0_0", "down_0_1", "up_0_1", "up_0_2")
        elif mode in ("0", "1"):
            blocks = ()
        else:
            blocks = tuple(b for b in mode.split(",") if b)
        return CUNet(
            remat=mode == "1",
            remat_blocks=blocks,
            shape=(1, size, size, size),
            chs=(32, 64, 128, 256),
            s_conditioning_channels=1,
            v_conditioning_dims=(6,),
            norm_groups=8,
            mid_attn=False,
            dropout_prob=0.1,
            conv_padding_mode="circular",
            compute_dtype=dtype,
        )

    net = build_net(remat_mode)
    vdm = VDM(net, make_schedule("learned_linear", -13.3, 13.3))

    def init_params():
        return jax.jit(lambda r: vdm.init_params(r, batch_size=1))(
            jax.random.PRNGKey(0))

    params = init_params()

    def measure_sample(params):
        """Seconds per sampled field, 250 ancestral steps at full resolution —
        the reference's generation unit cost (BASELINE.md targets row "sample
        sec/field at 128^3"; reference loop src/utils.py:277 / test.ipynb).
        Reference estimate: 250 UNet fwd at ~0.27 s => ~67 s/field on A100
        (same uncertainty caveat as the train baseline)."""
        n_sampling_steps = int(os.environ.get("BENCH_SAMPLE_STEPS", 250))
        rng = np.random.default_rng(0)
        cond = jnp.asarray(rng.standard_normal((1, size, size, size, 1), np.float32))
        vvals = [jnp.zeros((1, 6), jnp.float32)]
        fn = jax.jit(lambda p, r: vdm.draw_samples(
            p, r, batch_size=1, n_sampling_steps=n_sampling_steps,
            s_conditioning=cond, v_conditionings=vvals))
        out = fn(params, jax.random.PRNGKey(1))
        float(out.ravel()[0])  # warm + sync
        t0 = time.perf_counter()
        out = fn(params, jax.random.PRNGKey(2))
        float(out.ravel()[0])
        dt = time.perf_counter() - t0
        return dt, n_sampling_steps

    if os.environ.get("BENCH_MODE", "train") == "sample":
        dt, n_sampling_steps = measure_sample(params)
        print(json.dumps({
            "metric": f"sample_sec_per_field_vdm3d_c_c_{size}_{n_sampling_steps}steps",
            "value": round(dt, 3),
            "unit": "s/field",
            "vs_baseline": round(67.0 / dt, 3),
        }))
        return

    rng = np.random.default_rng(0)
    batch_data = {
        "x": jnp.asarray(rng.standard_normal((batch, size, size, size, 1), np.float32)),
        "conditioning": jnp.asarray(
            rng.standard_normal((batch, size, size, size, 1), np.float32)
        ),
        "conditioning_values": [jnp.zeros((batch, 6), jnp.float32)],
    }
    key = jax.random.PRNGKey(1)

    def warmup(vdm, mode, params):
        optimizer = make_optimizer(
            moment_dtype=None if mode == "1" else jnp.bfloat16)
        state = TrainState(0, params, optimizer.init(params))
        step_fn = make_train_step(vdm, optimizer)
        for i in range(3):
            state, metrics = step_fn(state, batch_data, jax.random.fold_in(key, i))
        float(metrics["loss"])
        return state, step_fn

    def is_oom(e: Exception) -> bool:
        msg = str(e)
        return any(tag in msg for tag in (
            "RESOURCE_EXHAUSTED", "Out of memory", "OOM", "exceeds the memory"))

    # warmup (compile + 2 steps). Timing protocol: a scalar host fetch is the
    # only reliable sync on this platform's tunnel (block_until_ready can
    # return early for donated-buffer chains) — fetch the final loss.
    # Fallback chain on OOM (and ONLY on OOM — any other error, e.g. a
    # compile bug or shape error, must fail the bench): requested config ->
    # 4-block set -> full remat. Each stage trades recompute for memory.
    fallbacks = [m for m in ("blocks", "1") if m != remat_mode]
    while True:
        try:
            state, step_fn = warmup(vdm, remat_mode, params)
            break
        except Exception as e:
            if not fallbacks or not is_oom(e):
                raise
            import sys
            nxt = fallbacks.pop(0)
            print(f"[bench] remat={remat_mode} OOMed ({type(e).__name__}); "
                  f"falling back to remat={nxt}", file=sys.stderr)
            remat_mode = nxt
            vdm = VDM(build_net(nxt), make_schedule("learned_linear", -13.3, 13.3))
            # params may have been donated by the failed warmup's first step
            params = init_params()

    # Median-of-K windows: the tunneled TPU slice's effective throughput
    # drifts by up to ~45% over hours (docs/DESIGN.md §6), so one window is
    # weather, not workload. Report the median with the min-max spread.
    window_vox_s = []
    voxels_per_step = batch * size**3
    step_idx = 100
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = step_fn(
                state, batch_data, jax.random.fold_in(key, step_idx))
            step_idx += 1
        float(metrics["loss"])
        dt = time.perf_counter() - t0
        window_vox_s.append(voxels_per_step * n_steps / dt)

    value = float(np.median(window_vox_s))
    spread = (max(window_vox_s) - min(window_vox_s)) / value
    baseline = BASELINE_VOX_S
    record = {
        "metric": f"train_voxels_per_sec_per_chip_vdm3d_c_c_{size}",
        "value": round(value, 1),
        "unit": "voxels/s",
        "vs_baseline": round(value / baseline, 3),
        "windows_vox_s": [round(v, 1) for v in window_vox_s],
        "drift_spread": round(spread, 3),
        "remat": remat_mode,
        # single-chip environment: sp/dp scaling exists as code + virtual-mesh
        # correctness (tests/test_sharded_*, MULTICHIP_r*.json) — ICI
        # halo-overlap throughput remains unmeasured until multi-chip hardware
        "multichip_perf": "pending (no multi-chip hardware in this environment)",
    }
    # The generation unit cost rides along in the same JSON line so every
    # round artifact records BOTH target metrics (BASELINE.md targets row;
    # VERDICT r4 weak #3). BENCH_SAMPLE=0 opts out.
    if os.environ.get("BENCH_SAMPLE", "1") != "0":
        try:
            dt, n_sampling_steps = measure_sample(state.params)
            record[f"sample_sec_per_field_{size}"] = round(dt, 3)
            record["sample_steps"] = n_sampling_steps
            record["sample_vs_baseline"] = round(67.0 / dt, 3)
        except Exception as e:  # sampling must not sink the train metric
            record["sample_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(record))


if __name__ == "__main__":
    main()
