"""Test configuration: run everything on a simulated 8-device CPU mesh so that
sharding / collective paths are exercised without TPU hardware (SURVEY.md §4).

The axon sitecustomize registers the TPU backend at interpreter start and pins
``jax_platforms``; we override it back to CPU here (before any backend is
initialized) and force 8 virtual host devices.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))  # for `oracles` imports


# Eager DMA execution in interpret mode: the default "on_wait" mode executes
# DMA reads/writes inside semaphore waiters via a shared task queue, which we
# observed to deadlock nondeterministically under full-suite thread load
# (utime frozen, all threads sleeping); "eager" executes each copy at
# ``start()`` — the semantics the kernels are written against.
from jax.experimental.pallas import tpu as _pltpu  # noqa: E402

EAGER_INTERPRET = _pltpu.InterpretParams(dma_execution_mode="eager")

# Concurrent interpret-mode programs (a pallas kernel under shard_map on the
# 8-device mesh) deadlock in jax's io_callback device_put re-entrancy; hand
# the callbacks numpy instead (see utils/interpret_fix.py).
from volumerenderer_tpu.utils.interpret_fix import (  # noqa: E402
    install_io_callback_numpy_patch)

install_io_callback_numpy_patch()
