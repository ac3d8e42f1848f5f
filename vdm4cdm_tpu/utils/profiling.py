"""Tracing & profiling utilities.

The reference has no tracing/profiling at all (SURVEY.md §5: only tqdm bars).
Here: xplane trace capture around training windows, a rolling step timer, and
NaN/Inf debugging helpers.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import deque
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (xplane + trace-viewer JSON) for the
    enclosed window. View with tensorboard or xprof."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock stats over recent steps (host-side; cheap)."""

    def __init__(self, window: int = 100):
        self.times = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.times.append(dt)
        self._last = now
        return dt

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else float("nan")

    @property
    def p50(self) -> float:
        return float(np.median(self.times)) if self.times else float("nan")

    def rate(self, units_per_step: float = 1.0) -> float:
        m = self.mean
        return units_per_step / m if m and np.isfinite(m) and m > 0 else float("nan")


def assert_finite(tree, name: str = "tree"):
    """Host-side NaN/Inf check over a pytree (debug tool, forces a sync)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
    assert not bad, f"non-finite values in {name}: {bad}"


def enable_nan_debugging():
    """Turn on jax_debug_nans: jitted code re-runs op-by-op on NaN and raises
    at the producing primitive."""
    jax.config.update("jax_debug_nans", True)
