"""Worker for the 2-process multi-host CPU test (tests/test_multihost.py).

Run as: python tests/_mh_worker.py PORT PROCESS_ID — initializes
jax.distributed with 2 processes x 4 virtual CPU devices, runs ONE
data-parallel sharded train step on its block of a shared global batch, and
prints a JSON line with the loss and a params checksum. The parent compares
the two ranks' outputs to each other and to a single-process oracle.
"""

import json
import sys


def build(mesh):
    import numpy as np
    import jax

    from vdm4cdm_tpu.diffusion import VDM, make_schedule
    from vdm4cdm_tpu.models import CUNet
    from vdm4cdm_tpu.parallel.halo import ShardCtx
    from vdm4cdm_tpu.train import TrainState, make_optimizer, make_train_step
    from vdm4cdm_tpu.utils.mesh import AXES

    ctx = ShardCtx(axis=None, spatial_dim=0, data_axis=AXES.data)
    net = CUNet(shape=(1, 16, 16), chs=(8, 8, 8, 8), norm_groups=4,
                s_conditioning_channels=1, v_conditioning_dims=(6,),
                dropout_prob=0.0, conv_padding_mode="circular", ctx=ctx)
    vdm = VDM(net, make_schedule("learned_linear", -13.3, 13.3))
    params = vdm.init_params(jax.random.PRNGKey(0))
    opt = make_optimizer(learning_rate=1e-3)
    state = TrainState(0, params, opt.init(params))

    rng = np.random.default_rng(0)
    gbatch = {
        "x": rng.standard_normal((8, 16, 16, 1)).astype(np.float32),
        "conditioning": rng.standard_normal((8, 16, 16, 1)).astype(np.float32),
        "conditioning_values": [rng.standard_normal((8, 6)).astype(np.float32)],
    }
    template = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), gbatch)
    step = make_train_step(vdm, opt, mesh=mesh, batch_template=template)
    return state, step, gbatch


def run_step(mesh, state, step, local_batch):
    import jax
    import jax.numpy as jnp

    from vdm4cdm_tpu.train.loop import _DeviceFeeder

    dev = _DeviceFeeder(mesh, 2).put(local_batch)
    state2, metrics = step(state, dev, jax.random.PRNGKey(11))
    loss = float(metrics["loss"])
    checksum = float(jax.jit(lambda p: sum(
        jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in jax.tree.leaves(p)
    ))(state2.params))
    return loss, checksum


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and jax.device_count() == 8

    from vdm4cdm_tpu.utils.mesh import make_mesh

    mesh = make_mesh(n_data=8, n_sp=1)
    state, step, gbatch = build(mesh)
    lo, hi = pid * 4, (pid + 1) * 4
    local = {
        "x": gbatch["x"][lo:hi],
        "conditioning": gbatch["conditioning"][lo:hi],
        "conditioning_values": [gbatch["conditioning_values"][0][lo:hi]],
    }
    loss, checksum = run_step(mesh, state, step, local)
    print(json.dumps({"pid": pid, "loss": loss, "checksum": checksum}),
          flush=True)


if __name__ == "__main__":
    main()
