"""Context-parallel (z-sharded) rendering tests on the 8-device CPU mesh."""
import jax
import numpy as np

from volumerenderer_tpu import Camera, generate_rays, as_normalized_volume
from volumerenderer_tpu.ops.raycast import render_compositing
from volumerenderer_tpu.parallel.context import make_z_mesh, render_zsharded
from volumerenderer_tpu.io.synthetic import turbulence_volume


def _setup():
    # scale down so no ray saturates: the sharded march has no early-out
    vol = as_normalized_volume(turbulence_volume((16, 16, 16), seed=6)) * 0.25
    rays = generate_rays(Camera(width=24, height=16))
    return vol, rays


def test_zsharded_matches_single_device():
    vol, rays = _setup()
    rgb_ref, a_ref = render_compositing(vol, rays.entry_uv, rays.direction,
                                        rays.hit, max_samples=64)
    mesh = make_z_mesh(8)
    rgb_s, a_s = render_zsharded(mesh, vol, rays.entry_uv, rays.direction,
                                 rays.hit, max_samples=64)
    np.testing.assert_allclose(np.asarray(rgb_s), np.asarray(rgb_ref),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_ref), atol=2e-6)


def test_shard_count_invariance():
    vol, rays = _setup()
    out = {}
    for n in (1, 2, 4, 8):
        mesh = make_z_mesh(n)
        rgb, a = render_zsharded(mesh, vol, rays.entry_uv, rays.direction,
                                 rays.hit, max_samples=48)
        out[n] = (np.asarray(rgb), np.asarray(a))
    for n in (2, 4, 8):
        np.testing.assert_allclose(out[n][0], out[1][0], atol=2e-6)
        np.testing.assert_allclose(out[n][1], out[1][1], atol=2e-6)


def test_descending_rays():
    """Camera looking along -z exercises the reversed fold order."""
    vol, _ = _setup()
    cam = Camera(position=(0.0, 0.0, 0.75), front=(0.0, 0.0, -1.0),
                 width=16, height=16)
    rays = generate_rays(cam)
    assert float(np.asarray(rays.direction)[..., 2].max()) < 0
    rgb_ref, a_ref = render_compositing(vol, rays.entry_uv, rays.direction,
                                        rays.hit, max_samples=48)
    mesh = make_z_mesh(8)
    rgb_s, a_s = render_zsharded(mesh, vol, rays.entry_uv, rays.direction,
                                 rays.hit, max_samples=48)
    np.testing.assert_allclose(np.asarray(rgb_s), np.asarray(rgb_ref), atol=2e-6)


def test_early_out_envelope():
    """Pins the documented approximation bound (module docstring: "the
    omitted contributions carry transmittance < 0.01"): the sharded march
    omits exactly the post-early-out contributions, whose color sum is
    bounded by tau0/ALPHA_SCALE with tau0 < 0.01 at the a > 0.99 trigger
    (induction: sum tau_k s_k^2 <= tau0 * sup_s s^2/(ALPHA_SCALE*s)) and
    whose alpha sum is bounded by tau0 itself.  Asserted across shard
    counts and both ray z directions on a DENSE volume where the early-out
    actually fires."""
    from volumerenderer_tpu.ops.raycast import ALPHA_SCALE, EARLY_OUT_ALPHA

    tau0 = 1.0 - EARLY_OUT_ALPHA
    color_bound = tau0 / ALPHA_SCALE + 1e-5
    alpha_bound = tau0 + 1e-5

    vol = as_normalized_volume(turbulence_volume((16, 16, 16), seed=6))
    cams = [Camera(width=24, height=16),                       # dz > 0
            Camera(position=(0.0, 0.0, 0.75), front=(0.0, 0.0, -1.0),
                   width=16, height=16)]                       # dz < 0
    for cam in cams:
        rays = generate_rays(cam)
        rgb_eo, a_eo = render_compositing(vol, rays.entry_uv, rays.direction,
                                          rays.hit, max_samples=64,
                                          early_exit=True)
        # sanity: the early-out fires on this workload
        assert float(np.asarray(a_eo).max()) > EARLY_OUT_ALPHA
        for n in (2, 4, 8):
            mesh = make_z_mesh(n)
            rgb_s, a_s = render_zsharded(mesh, vol, rays.entry_uv,
                                         rays.direction, rays.hit,
                                         max_samples=64)
            d_rgb = float(np.abs(np.asarray(rgb_s) - np.asarray(rgb_eo)).max())
            d_a = float(np.abs(np.asarray(a_s) - np.asarray(a_eo)).max())
            assert d_rgb <= color_bound, (n, d_rgb, color_bound)
            assert d_a <= alpha_bound, (n, d_a, alpha_bound)
