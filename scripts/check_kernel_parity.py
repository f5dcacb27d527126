"""On-hardware parity + perf check for the Pallas march kernel (run on TPU)."""
import time
import numpy as np
import jax.numpy as jnp

from volumerenderer_tpu import Camera, generate_rays, as_normalized_volume
from volumerenderer_tpu.ops.raycast import render_compositing
from volumerenderer_tpu.ops.pallas.raycast_kernel import render_compositing_pallas
from volumerenderer_tpu.io.synthetic import turbulence_volume


def main():
    rays = generate_rays(Camera(width=1024, height=1024))
    vol = as_normalized_volume(turbulence_volume((256, 256, 256), seed=0))
    rgb_k, a_k = render_compositing_pallas(vol, rays.entry_uv, rays.direction,
                                           rays.hit)
    rgb_r, a_r = render_compositing(vol, rays.entry_uv, rays.direction, rays.hit)
    d = float(jnp.abs(rgb_k - rgb_r).max())
    print("max|diff| vs jnp:", d)
    assert d < 1e-5, d

    def frame():
        rgb, _ = render_compositing_pallas(vol, rays.entry_uv, rays.direction,
                                           rays.hit, check_spans=False)
        return float(jnp.sum(rgb))

    frame()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        frame()
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print("frame %.4f s -> %.1f Mrays/s" % (dt, 1024 * 1024 / dt / 1e6))


if __name__ == "__main__":
    main()
