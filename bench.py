"""Headline benchmark: rays/s/chip for a 1024^2 front-to-back compositing render
of a 256^3 volume (BASELINE.json "metric").  Prints ONE JSON line.

``vs_baseline`` is reported against a nominal 1e8 rays/s target — the reference
publishes no numbers (SURVEY.md §6, BASELINE.json "published": {}).
"""
from __future__ import annotations

import json
import time

import jax
import numpy as np

NOMINAL_BASELINE_RAYS_PER_S = 1.0e8


def main():
    from volumerenderer_tpu import Camera, generate_rays, as_normalized_volume
    from volumerenderer_tpu.io.synthetic import turbulence_volume
    from volumerenderer_tpu.models import best_renderer

    W = H = 1024
    vol = as_normalized_volume(turbulence_volume((256, 256, 256), seed=0))
    cam = Camera(width=W, height=H)
    rays = generate_rays(cam)

    render = best_renderer()
    args = (vol, rays.entry_uv, rays.direction, rays.hit)

    # warmup / compile
    out = render(*args)
    np.asarray(out[0])

    # End every timed iteration with a device->host transfer: on some platforms
    # (axon relay) block_until_ready resolves before the computation finishes,
    # so only the transfer gives honest wall time.
    n_iters = 3
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        out = render(*args)
        np.asarray(out[0])
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
