"""Pallas ray-march kernel tests.

The kernel itself only compiles for TPU (Mosaic); on the CPU test mesh we
exercise the host-side machinery (tiling round trip, span prepass, fallback
dispatch).  Full numerical parity vs the jnp renderer is verified on hardware
(see docs/PERF_NOTES.md: max|diff| 6e-7 at 1024^2 / 256^3) and re-checked by
scripts/check_kernel_parity.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from volumerenderer_tpu import Camera, generate_rays, as_normalized_volume
from volumerenderer_tpu.ops.pallas import raycast_kernel as RK
from volumerenderer_tpu.io.synthetic import sphere_volume


def test_tile_pack_untile_roundtrip():
    H, W = 32, 64
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((H, W)).astype(np.float32))
    tiles = img.reshape(H // RK.TILE_H, RK.TILE_H, W // RK.TILE_W, RK.TILE_W)
    lanes = tiles.transpose(0, 2, 1, 3).reshape(-1, 128)
    back = RK._untile(lanes, H, W)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(img))


def test_pack_rays_layout():
    cam = Camera(width=32, height=16)
    rays = generate_rays(cam)
    packed = RK._pack_rays(rays.entry_uv, rays.direction, rays.hit, (64, 64, 64))
    assert packed.shape == ((16 // 8) * (32 // 16), 8, 128)
    # row 6 is the hit mask in {0,1}
    hits = np.asarray(packed[:, 6, :])
    assert set(np.unique(hits)).issubset({0.0, 1.0})


def test_spans_prepass_scaling():
    """Footprint spans shrink as pixel density grows (fixed volume), and the
    adaptive window height tracks them."""
    vol_dims = (128, 128, 128)
    rays_lo = generate_rays(Camera(width=128, height=128))
    rays_hi = generate_rays(Camera(width=512, height=512))
    sy_lo, sz_lo = RK.max_spans(rays_lo.entry_uv, rays_lo.direction,
                                rays_lo.hit, vol_dims, max_samples=64)
    sy_hi, sz_hi = RK.max_spans(rays_hi.entry_uv, rays_hi.direction,
                                rays_hi.hit, vol_dims, max_samples=64)
    assert sz_hi <= sz_lo and sy_hi <= sy_lo
    assert RK.spans_ok(rays_hi.entry_uv, rays_hi.direction, rays_hi.hit,
                       vol_dims, max_samples=64)
    # window chooser: smallest compiled height that covers the footprint
    assert RK.choose_win_z(3) == 4
    assert RK.choose_win_z(4) == 4
    assert RK.choose_win_z(5) == 5
    assert RK.choose_win_z(RK.WIN_Z_MAX) == RK.WIN_Z_MAX
    assert RK.choose_win_z(RK.WIN_Z_MAX + 1) is None


def test_fallback_dispatch_unsupported_shapes():
    """Volumes the kernel can't handle route to the jnp renderer (same API)."""
    vol = as_normalized_volume(sphere_volume((32, 32, 32)))  # X=32 not 128k
    rays = generate_rays(Camera(width=32, height=16))
    rgb, alpha = RK.render_compositing_pallas(vol, rays.entry_uv,
                                              rays.direction, rays.hit)
    from volumerenderer_tpu.ops.raycast import render_compositing
    rgb_ref, alpha_ref = render_compositing(vol, rays.entry_uv, rays.direction,
                                            rays.hit)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), atol=1e-6)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU/Mosaic")
def test_kernel_parity_on_tpu():
    vol = as_normalized_volume(sphere_volume((128, 128, 128)))
    rays = generate_rays(Camera(width=512, height=512))
    rgb_k, a_k = RK.render_compositing_pallas(vol, rays.entry_uv,
                                              rays.direction, rays.hit,
                                              check_spans=False)
    from volumerenderer_tpu.ops.raycast import render_compositing
    rgb_r, a_r = render_compositing(vol, rays.entry_uv, rays.direction, rays.hit)
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(a_r), atol=1e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU/Mosaic")
def test_isosurface_kernel_parity_on_tpu():
    from volumerenderer_tpu.ops.pallas.isosurface_kernel import render_isosurface_pallas
    from volumerenderer_tpu.ops.isosurface import render_isosurface

    vol = as_normalized_volume(sphere_volume((128, 128, 128)))
    rays = generate_rays(Camera(width=512, height=512))
    rgb_k, found_k = render_isosurface_pallas(vol, rays.entry_uv, rays.direction,
                                              rays.hit, check_spans=False)
    rgb_r, found_r = render_isosurface(vol, rays.entry_uv, rays.direction, rays.hit)
    np.testing.assert_array_equal(np.asarray(found_k), np.asarray(found_r))
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_r), atol=2e-3)


def test_isosurface_kernel_fallback():
    from volumerenderer_tpu.ops.pallas.isosurface_kernel import render_isosurface_pallas
    from volumerenderer_tpu.ops.isosurface import render_isosurface

    vol = as_normalized_volume(sphere_volume((32, 32, 32)))
    rays = generate_rays(Camera(width=32, height=16))
    rgb, found = render_isosurface_pallas(vol, rays.entry_uv, rays.direction,
                                          rays.hit)
    rgb_r, found_r = render_isosurface(vol, rays.entry_uv, rays.direction, rays.hit)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_r), atol=1e-6)
