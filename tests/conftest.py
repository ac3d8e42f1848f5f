"""Test configuration: run everything on 8 virtual CPU devices.

This is the standard fake-backend trick for testing pjit/shard_map/halo
exchange without a TPU pod (SURVEY.md §4): XLA exposes 8 host devices, so the
(data, sp) mesh and its collectives are exercised for real.

Note: the environment's axon TPU plugin overrides the JAX_PLATFORMS env var,
so the platform must be forced via jax.config after import.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# VDM4CDM_TEST_TPU=1 runs the suite on the real TPU instead (used for the
# TPU-hardware-only tests, e.g. the fused-norm in-kernel PRNG dropout).
if os.environ.get("VDM4CDM_TEST_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
else:
    # On TPU, XLA lowers f32 matmuls/convs to bf16 passes by default while
    # the Pallas kernels accumulate true f32 — oracle comparisons at f32
    # tolerances need full-precision XLA matmuls to be meaningful.
    jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: CPU compiles of the UNet graphs dominate
# test wall time; cache them across pytest runs.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("VDM4CDM_TEST_CACHE", "/tmp/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# In TPU mode there is ONE real chip, so tests that build multi-device meshes
# cannot run — convert make_mesh's "need N devices" ValueError into a skip
# (wherever it surfaces: test body, function- or module-scoped fixture).
import pluggy  # noqa: E402
import pytest  # noqa: E402
from _pytest.outcomes import Skipped  # noqa: E402


def _skip_if_device_shortage(outcome):
    seen, e = set(), outcome.excinfo[1]
    while e is not None and id(e) not in seen:
        seen.add(id(e))
        if isinstance(e, ValueError) and "devices, have" in str(e):
            outcome.force_exception(
                Skipped(f"multi-device test on a single-device backend: {e}"))
            return
        e = e.__context__


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_setup(item):
    outcome = yield
    if outcome.excinfo is not None:
        _skip_if_device_shortage(outcome)


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    outcome = yield
    if outcome.excinfo is not None:
        _skip_if_device_shortage(outcome)


# The Pallas TPU-interpret simulator keeps a module-global SharedMemory whose
# cleanup runs via ASYNC io_callbacks at program end. When one test's cleanup
# straggles into the next test's interpret program, _initialize_shared_memory
# sees a non-None registry and REUSES it — with a stale barrier party count,
# which deadlocks `shared_memory.barrier.wait()` (observed: full-suite hangs
# at the first sharded interpret test on a 1-CPU box; the same test passes
# standalone). Drain effects and clear the registry after every test.
@pytest.fixture(autouse=True)
def _reset_pallas_interpret_state():
    yield
    try:
        jax.effects_barrier()
        from jax._src.pallas.mosaic.interpret import (
            interpret_pallas_call as _ipc,
        )
        _ipc._clear_shared_memory()
    except Exception:
        pass
