"""Headline benchmark: steady-state rays/s/chip for 1024^2 front-to-back
compositing renders of a 256^3 volume (BASELINE.json "metric").

Protocol: a 16-frame orbit sequence (camera azimuth sweep, plan-once /
render-many) is enqueued back-to-back and forced ONCE by an on-device
reduction plus a 4-byte host transfer — the direct analogue of the
reference's 500-frame "LOOP" timing window (``main.cpp:373-411``,
``DebugTimer.cpp:20-27``), which also amortizes submission cost across an
interactive orbit.  (On this dev tunnel a blocking round trip costs ~32 ms
and ``block_until_ready`` does not block, so per-frame synchronization would
measure the tunnel, not the chip; single-frame latency incl. the dispatch
floor is recorded in docs/PERF_NOTES.md.)

``vs_baseline`` is reported against a nominal 1e8 rays/s target — the
reference publishes no numbers (SURVEY.md §6, BASELINE.json "published": {}).
"""
from __future__ import annotations

import json
import math
import time

import jax.numpy as jnp

NOMINAL_BASELINE_RAYS_PER_S = 1.0e8
N_FRAMES = 16


def orbit_camera(az_deg: float, width: int, height: int):
    from volumerenderer_tpu import Camera

    a = math.radians(az_deg)
    # orbit the reference's default eye (0, 0, -0.75) around +y, always
    # looking at the volume center (main.cpp:33-35 camera conventions)
    pos = (0.75 * math.sin(a), 0.0, -0.75 * math.cos(a))
    front = (-math.sin(a), 0.0, math.cos(a))
    return Camera(width=width, height=height, position=pos, front=front)


def main():
    from volumerenderer_tpu import generate_rays, as_normalized_volume
    from volumerenderer_tpu.io.synthetic import turbulence_volume
    from volumerenderer_tpu.models import plan_compositing

    W = H = 1024
    vol = as_normalized_volume(turbulence_volume((256, 256, 256), seed=0))
    Z, Y, X = vol.shape

    plans = []
    for i in range(N_FRAMES):
        rays = generate_rays(orbit_camera(2.0 * i, W, H))
        plan = plan_compositing(rays.entry_uv, rays.direction, rays.hit,
                                (X, Y, Z))
        plans.append(plan)

    def sequence():
        s = jnp.float32(0)
        for p in plans:
            rgb, alpha = p.render(vol)
            s = s + jnp.sum(rgb)
        return float(s)  # one on-device reduce + 4-byte transfer per sweep

    sequence()  # warmup / compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        sequence()
        times.append(time.perf_counter() - t0)
    dt = min(times)

    rays_per_s = N_FRAMES * W * H / dt
    print(json.dumps({
        "metric": "rays_per_s_per_chip_1024sq_256cube",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / NOMINAL_BASELINE_RAYS_PER_S,
    }))


if __name__ == "__main__":
    main()
