"""Render demo images for every pipeline mode into ``out/`` (PNG via PIL).

Produces: dense compositing, isosurface, compressed (full + coarse level
cuts), error-field visualization — the reference's visual-inspection surface
(SURVEY.md §4) as files.
"""
from __future__ import annotations

import os

import numpy as np
from PIL import Image

from volumerenderer_tpu import Camera, generate_rays, as_normalized_volume
from volumerenderer_tpu.codecs import kdtree as K
from volumerenderer_tpu.io.synthetic import turbulence_volume
from volumerenderer_tpu.models.compressed import CompressedRenderer
from volumerenderer_tpu.ops.isosurface import render_isosurface
from volumerenderer_tpu.ops.raycast import render_compositing


def save(path, rgb):
    img = (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8)
    Image.fromarray(img).save(path)
    print("wrote", path)


def main(out_dir="out", size=512, dims=(128, 128, 128)):
    os.makedirs(out_dir, exist_ok=True)
    vol_u8 = turbulence_volume(dims, seed=7)
    vol = as_normalized_volume(vol_u8)
    rays = generate_rays(Camera(width=size, height=size))

    rgb, _ = render_compositing(vol, rays.entry_uv, rays.direction, rays.hit)
    save(f"{out_dir}/compositing.png", rgb)

    rgb, _ = render_isosurface(vol, rays.entry_uv, rays.direction, rays.hit,
                               iso_value=90 / 255.0)
    save(f"{out_dir}/isosurface.png", rgb)

    tree = K.build(vol_u8, tolerance=2, max_epochs=2)
    r = CompressedRenderer(tree)
    rgb, _ = r.render(rays)
    save(f"{out_dir}/compressed_full.png", rgb)
    rgb, _ = r.render(rays, cut_depth=tree.orig_depth - 6)
    save(f"{out_dir}/compressed_coarse.png", rgb)

    err = K.query_error(K.level_cut(tree), vol_u8)
    rgb, _ = render_compositing(as_normalized_volume(err), rays.entry_uv,
                                rays.direction, rays.hit)
    save(f"{out_dir}/error_field.png", rgb)


if __name__ == "__main__":
    main()
