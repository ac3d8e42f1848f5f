"""Is XLA already at the roofline for the 2D family's convs? (VERDICT r4
item 5: extend the packed/Pallas fast path to 2D, OR record a justified
measurement that XLA needs no help at the reference 2D shapes.)

Times the XLA 3x3 conv at the reference 2D train shapes
(train_uc_uc_from_field_name.py:60,104-120: 256^2 maps, chs 48/96/192/384,
batch 12) forward and fwd+bwd, and reports achieved TFLOP/s against the
measured MXU rate (~88 TF/s on this slice, BASELINE.md) and the lane-fill
ceiling Cout/128 that ANY kernel with unpacked output lanes is capped by.

Run on the TPU: python experiments/bench_conv2d.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/vdm4cdm_tpu/xla")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vdm4cdm_tpu.ops.conv import conv_nd

    B = int(os.environ.get("B", 12))
    size = int(os.environ.get("SIZE", 256))
    dtype = jnp.bfloat16

    results = []
    for cin, cout in [(48, 48), (96, 96), (192, 192), (384, 384), (1, 48),
                      (96, 48), (48, 96)]:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, size, size, cin)), dtype)
        w = jnp.asarray(0.1 * rng.standard_normal((3, 3, cin, cout)),
                        jnp.float32)

        # in-loop data dependence through the carry (the platform's ~30 ms
        # small-op dispatch floor swamps per-call timing; same pattern as
        # experiments/microbench_ops.py), scalar-fetched once to sync
        N_IT = 20

        def dep(c, out):
            return c + (1e-20 * jnp.mean(out.astype(jnp.float32))).astype(c.dtype)

        def loss(x, w):
            return jnp.sum(conv_nd(x, w, padding_mode="circular")
                           .astype(jnp.float32) ** 2)

        fwd = jax.jit(lambda x, w: jax.lax.fori_loop(
            0, N_IT,
            lambda i, c: dep(c, conv_nd(c, w, padding_mode="circular")), x))
        gfn = jax.grad(loss)
        bwd = jax.jit(lambda x, w: jax.lax.fori_loop(
            0, N_IT, lambda i, c: dep(c, gfn(c, w)), x))

        def timeit(fn, *args):
            out = fn(*args)
            float(out.ravel()[0])
            t0 = time.perf_counter()
            out = fn(*args)
            float(out.ravel()[0])
            return (time.perf_counter() - t0) / N_IT

        t_f = timeit(fwd, x, w)
        t_b = timeit(bwd, x, w)
        flops_f = 2 * B * size * size * 9 * cin * cout
        rec = {
            "cin": cin, "cout": cout,
            "fwd_ms": round(t_f * 1e3, 3),
            "fwd_bwd_ms": round(t_b * 1e3, 3),
            "fwd_tflops": round(flops_f / t_f / 1e12, 2),
            # grad wrt x only: fwd conv + dx conv = 2x fwd flops per iter
            "bwd_tflops": round(2 * flops_f / t_b / 1e12, 2),
            "lane_fill_ceiling": min(1.0, cout / 128) if cout < 128 else 1.0,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    return results


if __name__ == "__main__":
    main()
