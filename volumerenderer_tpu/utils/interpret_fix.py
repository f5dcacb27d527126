"""Workaround for a JAX CPU interpret-mode deadlock (observed jax 0.8.x).

``jax._src.callback.io_callback_impl`` re-enters JAX from the runtime's
callback thread: it ``device_put``s the callback operands onto CPU device 0
and hands the callback jax Arrays, whose later materialization (``int(x)``,
``np.asarray``) must wait on device work.  When several devices of a
``--xla_force_host_platform_device_count`` mesh each execute a Pallas
interpret-mode program concurrently (e.g. a kernel under ``shard_map``),
those io_callbacks can starve each other — every thread ends up blocked in
``device_put``/``_value`` while the programs that must finish first are
themselves waiting on the callbacks.  Observed as the round-3
``tf_fit_step_kernel`` CPU-mesh hang (all threads sleeping, zero CPU),
reproduced at HEAD with 8 concurrent interpret programs regardless of how
the caller staged its dispatches.

The interpret machinery only converts its operands to numpy/int, so handing
it the numpy arrays the FFI layer already produced — skipping the
device_put round-trip entirely — removes the re-entrancy.  Scope this to
CPU test/dryrun processes (conftest, ``dryrun_multichip``); real-TPU
execution never uses interpret mode or this path.
"""
from __future__ import annotations

import numpy as np

__all__ = ["install_io_callback_numpy_patch"]


def install_io_callback_numpy_patch() -> None:
    import jax

    # Guard the private-API patch (ADVICE round 4): it drops the ordered/
    # sharding semantics of EVERY io_callback in the process, which is only
    # acceptable in the CPU interpret-mode test/dryrun processes it targets,
    # and it rebinds a private symbol that can move between jax releases.
    # Known-affected/verified range: jax 0.8.x - 0.9.x.  Outside it, or if
    # the symbol moved, fail LOUDLY so the deadlock workaround is re-verified
    # instead of silently not applying.
    ver = tuple(int(p) for p in jax.__version__.split(".")[:2])
    if not ((0, 8) <= ver <= (0, 9)):
        raise RuntimeError(
            f"interpret_fix: jax {jax.__version__} is outside the verified "
            f"0.8.x-0.9.x range for the io_callback deadlock workaround — "
            f"re-verify the deadlock (tests/test_kernel_sharded.py under the "
            f"CPU mesh) and update this guard")
    import jax._src.callback as jcb

    if not hasattr(jcb, "io_callback_impl"):
        raise RuntimeError(
            "interpret_fix: jax._src.callback.io_callback_impl moved — the "
            "deadlock workaround no longer applies; update interpret_fix.py")
    if getattr(jcb.io_callback_impl, "_vr_numpy_patch", False):
        return

    def io_callback_impl(*args, result_avals, callback, sharding, ordered):
        del result_avals, sharding, ordered
        args = jcb.tree_util.tree_map(np.asarray, args)
        return jcb.tree_util.tree_map(np.asarray, callback(*args))

    io_callback_impl._vr_numpy_patch = True
    # io_callback_lowering's _callback resolves this name from module globals
    # at call time, so already-lowered programs pick the patch up too
    jcb.io_callback_impl = io_callback_impl
