"""Bottom-up op microbenchmarks at the flagship 128^3 b2 shapes.

Each op is timed inside a lax.fori_loop with a data dependency through the
carry (no dispatch overhead, defeats the platform's ~30 ms small-op floor),
scalar-fetched once. Gives a per-op cost model to compare against the measured
748 ms forward / 2.0 s step — whatever doesn't add up is the optimization
target.
"""

import json
import os
import time

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

    from vdm4cdm_tpu.ops.conv import conv_nd
    from vdm4cdm_tpu.ops.norm import group_norm

    N_IT = 20

    def timed(name, make_body, x0, flops=None, bytes_moved=None):
        """make_body(x, i) -> x (same shape/dtype). Times N_IT iterations."""
        def run(x):
            return lax.fori_loop(0, N_IT, lambda i, c: make_body(c, i), x)

        fn = jax.jit(run)
        try:
            out = fn(x0)
            float(jnp.sum(out[(0,) * out.ndim]))  # sync
            t0 = time.perf_counter()
            out = fn(x0)
            float(jnp.sum(out[(0,) * out.ndim]))
            dt = (time.perf_counter() - t0) / N_IT
        except Exception as e:  # noqa: BLE001
            log({"op": name, "error": repr(e)[:200]})
            return
        rec = {"op": name, "ms": round(dt * 1e3, 3)}
        if flops:
            rec["tflops_s"] = round(flops / dt / 1e12, 1)
        if bytes_moved:
            rec["gb_s"] = round(bytes_moved / dt / 1e9, 1)
        log(rec)

    B, S = 2, 128
    key = jax.random.PRNGKey(0)

    def conv_bench(cin, cout, size, batch=B, pad="zeros", k=3):
        x = jax.random.normal(key, (batch, size, size, size, cin), jnp.bfloat16)
        w = jax.random.normal(key, (k, k, k, cin, cout), jnp.float32) * 0.01
        # cout==cin so the loop carry keeps one shape; rotate channels to
        # create the dependency
        fl = 2 * batch * size**3 * cin * cout * k**3

        def body(c, i):
            return conv_nd(c, w, None, padding_mode=pad)

        timed(f"conv{k} {cin}->{cout} {size}^3 b{batch} {pad}", body, x, flops=fl)

    # --- conv efficiency vs channel width (same flops per element ratio) ---
    conv_bench(32, 32, 128)              # L0 stride-1 zeros
    conv_bench(32, 32, 128, pad="circular")
    conv_bench(64, 64, 64)               # L1
    conv_bench(128, 128, 32)             # L2
    conv_bench(256, 256, 16)             # L3
    conv_bench(64, 64, 128)              # L0-width at 2x channels (lane test)
    conv_bench(128, 128, 128)            # full-lane channels at 128^3
    conv_bench(32, 32, 128, batch=8)     # batch effect on space-to-batch

    # --- GroupNorm + SiLU at L0 ---
    x0 = jax.random.normal(key, (B, S, S, S, 32), jnp.bfloat16)
    scale = jnp.ones((32,), jnp.float32)
    bias = jnp.zeros((32,), jnp.float32)
    nbytes = x0.size * 2 * 2  # read + write (logical)

    timed("groupnorm8+silu 128^3x32", lambda c, i: group_norm(c, scale, bias, 8, act="silu"),
          x0, bytes_moved=nbytes)
    timed("silu only 128^3x32", lambda c, i: jax.nn.silu(c), x0, bytes_moved=nbytes)
    timed("add only 128^3x32", lambda c, i: c + 1.0, x0, bytes_moved=nbytes)

    # --- dropout mask generate+apply at L0 (threefry) ---
    def drop_body(c, i):
        kk = jax.random.fold_in(key, i)
        keep = jax.random.bernoulli(kk, 0.9, c.shape)
        return jnp.where(keep, c / 0.9, 0.0).astype(c.dtype)

    timed("dropout 128^3x32", drop_body, x0, bytes_moved=nbytes)

    # --- normal draw at input shape (loss eps) ---
    def eps_body(c, i):
        kk = jax.random.fold_in(key, i)
        return (c + jax.random.normal(kk, c.shape, jnp.float32)).astype(c.dtype)

    x1 = jax.random.normal(key, (B, S, S, S, 1), jnp.float32)
    timed("normal-draw 128^3x1 f32", eps_body, x1)

    # --- concat + conv (decoder pattern) ---
    def concat_conv(c, i):
        h = jnp.concatenate([c, c], axis=-1)
        w = jnp.ones((3, 3, 3, 64, 32), jnp.bfloat16) * 0.01
        return conv_nd(h, w, None, padding_mode="zeros")

    timed("concat64+conv->32 128^3", concat_conv, x0,
          flops=2 * B * S**3 * 64 * 32 * 27)

    # --- ResBlock-equivalent composite at L0 (zeros padding, no dropout) ---
    wa = jax.random.normal(key, (3, 3, 3, 32, 32), jnp.float32) * 0.01
    wb = jax.random.normal(key, (3, 3, 3, 32, 32), jnp.float32) * 0.01
    film_s = jnp.ones((B, 1, 1, 1, 32), jnp.bfloat16)
    film_b = jnp.zeros((B, 1, 1, 1, 32), jnp.bfloat16)

    def resblock(c, i):
        h = group_norm(c, scale, bias, 8, act="silu")
        h = conv_nd(h, wa, None, padding_mode="zeros")
        h = group_norm(h, scale, bias, 8)
        h = h * (1.0 + film_s) + film_b
        h = jax.nn.silu(h)
        h = conv_nd(h, wb, None, padding_mode="zeros")
        return c + h

    timed("resblock-fwd L0 zeros nodrop", resblock, x0,
          flops=2 * 2 * B * S**3 * 32 * 32 * 27)

    def resblock_circ(c, i):
        h = group_norm(c, scale, bias, 8, act="silu")
        h = conv_nd(h, wa, None, padding_mode="circular")
        h = group_norm(h, scale, bias, 8)
        h = h * (1.0 + film_s) + film_b
        h = jax.nn.silu(h)
        h = conv_nd(h, wb, None, padding_mode="circular")
        return c + h

    timed("resblock-fwd L0 circular nodrop", resblock_circ, x0,
          flops=2 * 2 * B * S**3 * 32 * 32 * 27)

    # --- ResBlock fwd+bwd (the remat + backward unit) ---
    def resblock_loss(xx):
        return jnp.sum(resblock(xx, 0).astype(jnp.float32))

    g = jax.grad(resblock_loss)

    def resblock_bwd(c, i):
        return g(c).astype(c.dtype)

    timed("resblock-fwdbwd L0 zeros", resblock_bwd, x0,
          flops=3 * 2 * 2 * B * S**3 * 32 * 32 * 27)

    # --- conv backward split at L0 ---
    def conv_dw(c, i):
        gw = jax.grad(lambda w: jnp.sum(conv_nd(c, w, None).astype(jnp.float32)))(wa)
        return c + jnp.mean(gw).astype(c.dtype)

    timed("conv-dw-only L0 32->32", conv_dw, x0,
          flops=2 * B * S**3 * 32 * 32 * 27)

    def conv_dx(c, i):
        gx = jax.grad(lambda xx: jnp.sum(conv_nd(xx, wa, None).astype(jnp.float32)))(c)
        return gx.astype(c.dtype)

    timed("conv-dx-only L0 32->32", conv_dx, x0,
          flops=2 * B * S**3 * 32 * 32 * 27)


if __name__ == "__main__":
    main()
