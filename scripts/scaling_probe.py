"""Standing scaling-efficiency artifact — writes ``out/SCALING.json``.

VERDICT round 4 weak #8 / next #10: the >=80%-at-N>=2 north star
(BASELINE.json) needs a measurement slot recorded EVERY round even while
only one real chip is reachable.  This script records:

* ``chip``: the single-chip kernel render throughput at 512² (the absolute
  baseline the day >=2 chips appear), and — when >=2 real devices exist —
  the ``scaling_probe_kernel`` per-device efficiency on the full mesh.
* ``cpu_mesh``: per-device efficiency of the rays-sharded jnp renderer on
  the 8-virtual-device CPU mesh (run in a subprocess with
  ``JAX_PLATFORMS=cpu``).  CPU-mesh wall times share one host's cores, so
  this is a machinery check (the sharded path runs and composes), not a
  chip-scaling number — the real signal is the invariance tests plus the
  per-device ratio being finite and stable.

Run: ``python scripts/scaling_probe.py`` (on the TPU host).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "..", "out", "SCALING.json")


def chip_section():
    import jax
    import jax.numpy as jnp

    from volumerenderer_tpu import Camera, generate_rays, as_normalized_volume
    from volumerenderer_tpu.io.synthetic import turbulence_volume
    from volumerenderer_tpu.ops.pallas.raycast_kernel import CompositingPlan

    backend = jax.default_backend()
    n_dev = len(jax.devices())
    vol = as_normalized_volume(turbulence_volume((256, 256, 256), seed=0))
    rays = generate_rays(Camera(width=512, height=512))
    plan = CompositingPlan(rays.entry_uv, rays.direction, rays.hit,
                           (256, 256, 256))
    sec = {"backend": backend, "n_devices": n_dev,
           "use_kernel": bool(plan.use_kernel)}
    if plan.use_kernel and backend in ("tpu", "axon"):
        words = plan.bind(vol)

        def frame():
            rgb, a = plan.render(vol, words=words)
            return jnp.sum(rgb) + jnp.sum(a)

        float(frame())
        frames = 8
        t0 = time.perf_counter()
        s = jnp.float32(0)
        for _ in range(frames):
            s = s + frame()
        float(s)  # force-transfer protocol (docs/PERF_NOTES.md)
        dt = (time.perf_counter() - t0) / frames
        sec["rays_per_s_512sq_1chip"] = 512 * 512 / dt
    if n_dev >= 2 and backend in ("tpu", "axon"):
        import numpy as np
        from jax.sharding import Mesh

        from volumerenderer_tpu.parallel.kernel_sharded import (
            plan_shardable, scaling_probe_kernel)

        if plan_shardable(plan, n_dev):
            mesh = Mesh(np.asarray(jax.devices()), axis_names=("rays",))
            sec["kernel_efficiency_vs_1chip"] = float(
                scaling_probe_kernel(mesh, plan, vol, plan.bind(vol)))
    return sec


def cpu_mesh_section():
    """Runs in THIS process only when invoked with --cpu-mesh (subprocess
    with 8 virtual CPU devices)."""
    import jax

    # the axon sitecustomize pins jax_platforms at interpreter start; force
    # it back to CPU before the backend initializes (same as tests/conftest)
    jax.config.update("jax_platforms", "cpu")

    from volumerenderer_tpu import Camera, generate_rays, as_normalized_volume
    from volumerenderer_tpu.io.synthetic import turbulence_volume
    from volumerenderer_tpu.parallel.sharding import (make_mesh,
                                                      scaling_efficiency_probe)

    vol = as_normalized_volume(turbulence_volume((32, 32, 32), seed=1))
    rays = generate_rays(Camera(width=64, height=64))
    out = {"backend": jax.default_backend(), "n_devices": len(jax.devices())}
    for n in (2, 4, 8):
        if len(jax.devices()) < n:
            continue
        mesh = make_mesh(n)
        out[f"efficiency_n{n}"] = float(scaling_efficiency_probe(
            mesh, vol, rays.entry_uv, rays.direction, rays.hit,
            max_samples=48, frames=2))
    print(json.dumps(out))


def main():
    if "--cpu-mesh" in sys.argv:
        cpu_mesh_section()
        return
    result = {"date": time.strftime("%Y-%m-%d"), "chip": chip_section()}
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    try:
        p = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--cpu-mesh"], env=env, capture_output=True,
                           text=True, timeout=1200)
        last = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")]
        result["cpu_mesh"] = json.loads(last[-1]) if last else {
            "error": p.stderr[-500:]}
    except Exception as e:  # the artifact must land even if the probe breaks
        result["cpu_mesh"] = {"error": repr(e)}
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
