"""Headline benchmark: rays/s/chip for a 1024^2 front-to-back compositing render
of a 256^3 volume (BASELINE.json "metric").  Prints ONE JSON line.

Timing protocol: the render runs on device and is forced by an on-device
reduction plus a 4-byte host transfer.  (On this dev tunnel, device->host
transfers run at ~30 MB/s and `block_until_ready` does not block, so
transferring the 12 MB image would measure the link, not the chip.)

``vs_baseline`` is reported against a nominal 1e8 rays/s target — the
reference publishes no numbers (SURVEY.md §6, BASELINE.json "published": {}).
"""
from __future__ import annotations

import json
import time

import jax.numpy as jnp

NOMINAL_BASELINE_RAYS_PER_S = 1.0e8


def main():
    from volumerenderer_tpu import Camera, generate_rays, as_normalized_volume
    from volumerenderer_tpu.io.synthetic import turbulence_volume
    from volumerenderer_tpu.models import plan_compositing

    W = H = 1024
    vol = as_normalized_volume(turbulence_volume((256, 256, 256), seed=0))
    cam = Camera(width=W, height=H)
    rays = generate_rays(cam)

    Z, Y, X = vol.shape
    plan = plan_compositing(rays.entry_uv, rays.direction, rays.hit, (X, Y, Z))

    def frame():
        rgb, alpha = plan.render(vol)
        return float(jnp.sum(rgb))  # on-device reduce + 4-byte transfer

    frame()  # warmup / compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        frame()
        times.append(time.perf_counter() - t0)
    dt = min(times)

    rays_per_s = W * H / dt
    print(json.dumps({
        "metric": "rays_per_s_per_chip_1024sq_256cube",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / NOMINAL_BASELINE_RAYS_PER_S,
    }))


if __name__ == "__main__":
    main()
