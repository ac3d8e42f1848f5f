"""Pallas im2col conv3d vs XLA conv at flagship shapes, on the real TPU."""

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
    from vdm4cdm_tpu.ops.pallas.conv3d import conv3d_pallas, supports

    N_IT = 20
    key = jax.random.PRNGKey(0)

    def timed(name, fn, x0, flops):
        try:
            run = jax.jit(lambda x: lax.fori_loop(0, N_IT, lambda i, c: fn(c), x))
            out = run(x0)
            float(jnp.sum(out[(0,) * out.ndim]))
            t0 = time.perf_counter()
            out = run(x0)
            float(jnp.sum(out[(0,) * out.ndim]))
            dt = (time.perf_counter() - t0) / N_IT
            log({"op": name, "ms": round(dt * 1e3, 3),
                 "tflops_s": round(flops / dt / 1e12, 1)})
        except Exception as e:  # noqa: BLE001
            log({"op": name, "error": repr(e)[:250]})

    def case(cin, cout, size, mode, batch=2):
        x = jax.random.normal(key, (batch, size, size, size, cin), jnp.bfloat16)
        w = (jax.random.normal(key, (3, 3, 3, cin, cout), jnp.float32) * 0.05)
        fl = 2 * batch * size**3 * cin * cout * 27
        assert supports(x.shape, w.shape, (1, 1, 1)), (cin, cout, size)

        def keep_shape(fn):
            # keep the fori carry shape when cout != cin
            if cout == cin:
                return fn
            rep = cin // cout
            return lambda c: jnp.tile(fn(c), (1,) * 4 + (rep,))

        timed(f"pallas {cin}->{cout} {size}^3 {mode}",
              keep_shape(lambda c: conv3d_pallas(c, w, mode).astype(c.dtype)),
              x, fl)
        timed(f"xla    {cin}->{cout} {size}^3 {mode}",
              keep_shape(lambda c: conv_nd(c, w.astype(c.dtype), padding_mode=mode)),
              x, fl)

    # correctness spot-check on hardware first (small, fast compile)
    xs = jax.random.normal(key, (1, 8, 8, 16, 16), jnp.float32)
    ws = jax.random.normal(key, (3, 3, 3, 16, 16), jnp.float32) * 0.1
    for mode in ("circular", "zeros"):
        got = np.asarray(jax.jit(lambda a: conv3d_pallas(a, ws, mode))(xs))
        want = np.asarray(jax.jit(
            lambda a: conv_nd(a, ws, padding_mode=mode))(xs))
        err = float(np.abs(got - want).max())
        log({"hw_check": mode, "max_abs_err": err})
        if err > 1e-3:
            log({"abort": "hardware mismatch"})
            return

    case(32, 32, 128, "circular")
    case(32, 32, 128, "zeros")
    case(64, 64, 128, "circular")   # upsample-conv shape
    case(64, 32, 128, "circular")   # decoder concat shape
    case(64, 64, 64, "circular")    # L1
    case(128, 128, 32, "circular")  # L2

    # fwd+bwd at the L0 shape
    x = jax.random.normal(key, (2, 128, 128, 128, 32), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 3, 32, 32), jnp.float32) * 0.05
    fl3 = 3 * 2 * 2 * 128**3 * 32 * 32 * 27

    def bwd_pallas(c):
        g = jax.grad(lambda xx: jnp.sum(
            conv3d_pallas(xx, w, "circular").astype(jnp.float32)))(c)
        return g.astype(c.dtype)

    def bwd_xla(c):
        g = jax.grad(lambda xx: jnp.sum(
            conv_nd(xx, w.astype(c.dtype), padding_mode="circular")
            .astype(jnp.float32)))(c)
        return g.astype(c.dtype)

    timed("pallas fwd+dx 32ch 128^3 circ", bwd_pallas, x, fl3 * 2 // 3)
    timed("xla    fwd+dx 32ch 128^3 circ", bwd_xla, x, fl3 * 2 // 3)

    def dw_pallas(c):
        gw = jax.grad(lambda ww: jnp.sum(
            conv3d_pallas(c, ww, "circular").astype(jnp.float32)))(w)
        return c + jnp.mean(gw).astype(c.dtype)

    timed("pallas fwd+dw 32ch 128^3 circ", dw_pallas, x, fl3 * 2 // 3)


if __name__ == "__main__":
    main()
