"""Step-based training loop.

Replaces the reference's Lightning Trainer stack (SURVEY.md §2b last row:
max_steps=1e6, val every 1k/5k steps, grad clip 0.5, LR monitor, checkpoint
every 10k keep-all — reference train_uc_uc_from_field_name.py:36-47) with a
plain JAX loop: jitted/shard_mapped train step, async device feed, periodic
validation + figure logging, orbax checkpoints, auto-resume.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.shard import batch_pspec
from ..utils.rng import RngStream
from .checkpoint import CheckpointManager
from .loggers import ConsoleLogger, CSVLogger, Logger, MultiLogger
from .state import TrainState, make_lr_schedule, make_optimizer
from .step import make_eval_step, make_train_step, model_ndim_spatial


@dataclasses.dataclass
class TrainConfig:
    max_steps: int = 1_000_000
    val_check_interval: int = 5000
    n_val_batches: int = 8
    ckpt_every_steps: int = 10_000
    log_every_steps: int = 50
    learning_rate: float = 3.0e-4
    grad_clip: float = 0.5
    weight_decay: float = 0.0
    warmup_steps: int = 0
    seed: int = 42
    out_dir: str = "./runs/run"
    experiment_name: str = "run"
    resume: bool = True
    figure_interval: Optional[int] = None  # default: val_check_interval
    n_figure_sampling_steps: Optional[int] = None  # None = auto (config.py)
    ema_decay: float = 0.0  # >0 enables an EMA shadow of params (e.g. 0.9999)


class _DeviceFeeder:
    """Moves host batches to device; ``prefetch`` wraps a host iterator with a
    background thread that stays one device_put ahead of compute, so H2D
    transfer overlaps the previous step (JAX dispatch is already async; the
    host->device copy is the serial part worth pipelining)."""

    def __init__(self, mesh: Optional[Mesh], ndim_spatial: int):
        self.mesh = mesh
        self.ndim_spatial = ndim_spatial

    def prefetch(self, host_iter, depth: int = 2):
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=depth)

        def producer():
            try:
                for batch in host_iter:
                    q.put(self.put(batch))
                q.put(None)
            except BaseException as e:
                q.put(e)

        threading.Thread(target=producer, daemon=True).start()
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    def put(self, batch: dict) -> dict:
        if self.mesh is None:
            return jax.tree.map(
                lambda a: jax.device_put(np.asarray(a)) if a is not None else None,
                batch, is_leaf=lambda a: a is None,
            )
        bspec = batch_pspec(self.ndim_spatial)
        multihost = jax.process_count() > 1

        def place(a):
            if a is None:
                return None
            arr = np.asarray(a)
            spec = bspec if arr.ndim >= 2 + self.ndim_spatial else P("data")
            sharding = NamedSharding(self.mesh, spec)
            if multihost:
                # arr holds only this host's block of the global batch (the
                # datamodule strides by process); assemble the global array
                return jax.make_array_from_process_local_data(sharding, arr)
            return jax.device_put(arr, sharding)

        return jax.tree.map(place, batch, is_leaf=lambda a: a is None)


class Trainer:
    def __init__(
        self,
        model,
        config: TrainConfig,
        mesh: Optional[Mesh] = None,
        loggers: Optional[Logger] = None,
        draw_figure: Optional[Callable] = None,
    ):
        self.model = model
        self.config = config
        self.mesh = mesh
        self.optimizer = make_optimizer(
            config.learning_rate, config.grad_clip, config.weight_decay,
            config.warmup_steps,
        )
        self._lr_schedule = make_lr_schedule(
            config.learning_rate, config.warmup_steps)
        if loggers is not None:
            self.loggers = loggers
        elif jax.process_index() == 0:
            lgs = [
                CSVLogger(config.out_dir, config.experiment_name),
                ConsoleLogger(every=config.log_every_steps),
            ]
            # remote tracking (the reference's Comet stack) rides along when
            # comet_ml + an API key are configured; local-first otherwise
            from .loggers import CometLogger

            if CometLogger.available():
                lgs.append(CometLogger(
                    project_name=os.environ.get("COMET_PROJECT", "vdm4cdm-tpu"),
                    experiment_name=config.experiment_name))
            self.loggers = MultiLogger(*lgs)
        else:  # non-zero ranks stay silent (metrics are pmean'd-identical)
            self.loggers = MultiLogger()
        self.draw_figure = draw_figure
        self.ckpt = CheckpointManager(
            os.path.join(config.out_dir, config.experiment_name, "checkpoints"),
            every_steps=config.ckpt_every_steps,
        )
        self._feeder = _DeviceFeeder(mesh, model_ndim_spatial(model))

    def init_state(self, rng: jax.Array, init_params=None) -> TrainState:
        params = init_params if init_params is not None else self.model.init_params(rng)
        opt_state = self.optimizer.init(params)
        # EMA must be a distinct buffer copy — aliasing params would make the
        # donated train step donate the same buffer twice.
        ema = (jax.tree.map(lambda p: jnp.array(p), params)
               if self.config.ema_decay > 0 else None)
        return TrainState(0, params, opt_state, ema)

    def fit(
        self,
        datamodule,
        init_params=None,
        max_steps: Optional[int] = None,
    ) -> TrainState:
        cfg = self.config
        max_steps = max_steps or cfg.max_steps
        rngs = RngStream(cfg.seed)
        state = self.init_state(rngs.next(), init_params)

        if cfg.resume:
            restored = self.ckpt.restore(state)
            if restored is not None:
                state = restored
                print(f"[trainer] resumed from step {int(state.step)}", flush=True)

        batch_template = None
        train_step = None
        eval_step = None
        base_rng = jax.random.PRNGKey(cfg.seed + 1)
        start_step = int(state.step)
        host_step = start_step  # host mirror of state.step: no per-step device sync
        t_start = time.time()

        host_iter = datamodule.train_batches(max_steps, start_step=start_step)
        for dev_batch in self._feeder.prefetch(host_iter):
            if train_step is None:
                batch_template = jax.tree.map(
                    lambda a: a if a is None else jax.ShapeDtypeStruct(a.shape, a.dtype),
                    dev_batch, is_leaf=lambda a: a is None,
                )
                train_step = make_train_step(
                    self.model, self.optimizer, mesh=self.mesh,
                    batch_template=batch_template if self.mesh else None,
                    ema_decay=self.config.ema_decay,
                )
                eval_step = make_eval_step(
                    self.model, mesh=self.mesh,
                    batch_template=batch_template if self.mesh else None,
                )
            step_rng = jax.random.fold_in(base_rng, host_step)
            state, metrics = train_step(state, dev_batch, step_rng)
            host_step += 1
            step = host_step

            # Only materialize metrics on log steps — pulling them every step
            # would force a device sync per step and serialize the pipeline.
            if step % cfg.log_every_steps == 0 or step == max_steps:
                scalars = {k: float(v) for k, v in metrics.items()}
                scalars["lr"] = float(self._lr_schedule(step))
                self.loggers.log_scalars(step, scalars)

            if cfg.val_check_interval and step % cfg.val_check_interval == 0:
                self._validate(state, datamodule, eval_step, step, rngs)

            self.ckpt.maybe_save(state, step=step)

        self.ckpt.maybe_save(state, force=True)
        self.ckpt.wait()
        dt = time.time() - t_start
        n = int(state.step) - start_step
        if n > 0:
            print(f"[trainer] {n} steps in {dt:.1f}s ({n / dt:.3f} it/s)", flush=True)
        return state

    def _validate(self, state, datamodule, eval_step, step, rngs):
        agg: dict[str, list] = {}
        vb = None
        for i, batch in enumerate(datamodule.val_dataloader()):
            if i >= self.config.n_val_batches:
                break
            dev_batch = self._feeder.put(batch)
            if vb is None:
                vb = dev_batch
            metrics = eval_step(state.params, dev_batch, rngs.next())
            for k, v in metrics.items():
                agg.setdefault(f"val_{k}", []).append(float(v))
        if agg:
            self.loggers.log_scalars(step, {k: float(np.mean(v)) for k, v in agg.items()})
        if self.draw_figure is not None and vb is not None:
            # sample with EMA weights when tracked — generation prefers
            # EMA (checkpoint.load_params prefer_ema), so the in-training
            # quality signal must look at the same weights. On multi-host
            # runs EVERY rank calls draw (its sampler + host-gather are
            # collectives); the hook renders on rank 0 and returns None
            # elsewhere (cli/_common._render) — the DCN run keeps its
            # figures instead of dropping them.
            fig_params = (state.ema_params if state.ema_params is not None
                          else state.params)
            fig = self.draw_figure(fig_params, vb, rngs.next())
            if fig is not None:
                self.loggers.log_figure(step, "validation", fig)
