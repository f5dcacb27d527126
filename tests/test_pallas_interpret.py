"""Interpret-mode Pallas kernel tests: the full kernel math (word-table
march, gap runs, pair substeps, chunk-select lane gathers, DMA pipeline)
runs under pytest on CPU via ``pltpu.force_tpu_interpret_mode(EAGER_INTERPRET)`` — no TPU
needed, so the 1,100 lines of kernel code are CI-covered, not just checked
by hardware sessions (VERDICT round 1, "What's weak" #2).

Small shapes keep the interpreter tractable: a (Z=8, Y=16, X=128) volume,
32x64 images (16 tiles = 2 grid programs), short marches.
"""
import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from volumerenderer_tpu import Camera, generate_rays, as_normalized_volume
from volumerenderer_tpu.ops.pallas import raycast_kernel as RK
from volumerenderer_tpu.ops.raycast import render_compositing

from conftest import EAGER_INTERPRET

VOL_SHAPE = (8, 16, 128)  # (Z, Y, X)


def _volume():
    rng = np.random.default_rng(7)
    v = rng.random(VOL_SHAPE).astype(np.float32)
    # quantize to the kernel's 8-bit sample grid so jnp/kernel agree exactly
    return as_normalized_volume(np.round(v * 255.0).astype(np.uint8))


def _rays():
    return generate_rays(Camera(width=64, height=32))


def _assert_parity(plan, vol, rays, max_samples, **render_kw):
    rgb_k, a_k = plan.render(vol, **render_kw)
    rgb_r, a_r = render_compositing(vol, rays.entry_uv, rays.direction,
                                    rays.hit, max_samples=max_samples)
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(a_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_r), atol=1e-5)


def test_interpret_compositing_pairs_parity():
    vol = _volume()
    rays = _rays()
    Z, Y, X = vol.shape
    with pltpu.force_tpu_interpret_mode(EAGER_INTERPRET):
        plan = RK.CompositingPlan(rays.entry_uv, rays.direction, rays.hit,
                                  (X, Y, Z), max_samples=24)
        assert plan.use_kernel, "planner rejected a supported configuration"
        assert plan.pairs, "even max_samples should select the pairs kernel"
        _assert_parity(plan, vol, rays, 24)


def test_interpret_compositing_dense_parity(monkeypatch):
    """The per-step (k=1, non-pairs) kernel path (forced via GROUP_KS)."""
    vol = _volume()
    rays = _rays()
    Z, Y, X = vol.shape
    monkeypatch.setattr(RK, "GROUP_KS", ())
    with pltpu.force_tpu_interpret_mode(EAGER_INTERPRET):
        plan = RK.CompositingPlan(rays.entry_uv, rays.direction, rays.hit,
                                  (X, Y, Z), max_samples=23)
        assert plan.use_kernel and not plan.pairs
        _assert_parity(plan, vol, rays, 23)


def test_interpret_partial_last_group_parity(monkeypatch):
    """max_samples not divisible by k: the padded last group's trailing
    substeps are masked, so outputs equal the dense march exactly."""
    vol = _volume()
    rays = _rays()
    Z, Y, X = vol.shape
    monkeypatch.setattr(RK, "GROUP_KS", (4,))
    with pltpu.force_tpu_interpret_mode(EAGER_INTERPRET):
        plan = RK.CompositingPlan(rays.entry_uv, rays.direction, rays.hit,
                                  (X, Y, Z), max_samples=23)
        assert plan.use_kernel and plan.group == 4
        _assert_parity(plan, vol, rays, 23)


@pytest.mark.parametrize("k", [3, 4, 8])
def test_interpret_group_k_parity(k, monkeypatch):
    """k-step window groups (k samples per DMA window) are bit-consistent
    with the jnp march — positions advance one step at a time inside the
    group, so samples/composites match the dense recurrence."""
    rng = np.random.default_rng(11)
    shape = (16, 16, 128)  # taller z so k=8 union windows fit
    vol = as_normalized_volume(
        np.round(rng.random(shape) * 255.0).astype(np.uint8))
    rays = _rays()
    Z, Y, X = vol.shape
    monkeypatch.setattr(RK, "GROUP_KS", (k,))
    with pltpu.force_tpu_interpret_mode(EAGER_INTERPRET):
        plan = RK.CompositingPlan(rays.entry_uv, rays.direction, rays.hit,
                                  (X, Y, Z), max_samples=16)
        assert plan.use_kernel
        assert plan.group == k, f"cost model rejected k={k}: {plan.group}"
        _assert_parity(plan, vol, rays, 16)


def test_interpret_adaptive_win_y8_parity():
    """When every footprint fits 8 aligned rows the planner halves the
    window height (win_y=8 — half the bytes per window DMA); outputs equal
    the jnp renderers for both kernels.  A Y=8 volume guarantees selection
    (an aligned span can never exceed Y)."""
    from volumerenderer_tpu.io.synthetic import sphere_volume
    from volumerenderer_tpu.ops.pallas.isosurface_kernel import IsosurfacePlan
    from volumerenderer_tpu.ops.isosurface import render_isosurface

    rng = np.random.default_rng(7)
    Z, Y, X = 8, 8, 128
    vol = as_normalized_volume(
        np.round(rng.random((Z, Y, X)) * 255.0).astype(np.uint8))
    rays = _rays()
    with pltpu.force_tpu_interpret_mode(EAGER_INTERPRET):
        plan = RK.CompositingPlan(rays.entry_uv, rays.direction, rays.hit,
                                  (X, Y, Z), max_samples=16)
        assert plan.use_kernel and plan.win_y == 8
        _assert_parity(plan, vol, rays, 16)
    svol = as_normalized_volume(sphere_volume((Z, Y, X), radius=0.3, soft=0.2))
    with pltpu.force_tpu_interpret_mode(EAGER_INTERPRET):
        ip = IsosurfacePlan(rays.entry_uv, rays.direction, rays.hit,
                            (X, Y, Z), max_samples=16)
        assert ip.use_kernel and ip.win_y == 8
        rgb_k, found_k = ip.render(svol, 0.5)
    rgb_r, found_r = render_isosurface(svol, rays.entry_uv, rays.direction,
                                       rays.hit, iso_value=0.5, max_samples=16)
    np.testing.assert_array_equal(np.asarray(found_k), np.asarray(found_r))
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_r),
                               atol=2e-3)


def test_interpret_occupancy_skipping_exact():
    """Empty-space skipping (bound word table) leaves outputs unchanged on a
    mostly-empty volume, and marks a nontrivial number of steps skipped."""
    Z, Y, X = VOL_SHAPE
    v = np.zeros(VOL_SHAPE, np.float32)
    v[3:6, 6:12, 40:80] = np.linspace(0.2, 1.0, 40, dtype=np.float32)
    vol = as_normalized_volume(np.round(v * 255.0).astype(np.uint8))
    rays = _rays()
    with pltpu.force_tpu_interpret_mode(EAGER_INTERPRET):
        plan = RK.CompositingPlan(rays.entry_uv, rays.direction, rays.hit,
                                  (X, Y, Z), max_samples=24)
        assert plan.use_kernel
        words = plan.bind(vol)
        skipped = int(jnp.sum((words & 1) == 0))
        assert skipped > 0
        _assert_parity(plan, vol, rays, 24, words=words)


def test_interpret_pooled_compressed_march_parity():
    """Compressed-domain march: windows DMA from the sparse slab pool
    (pair16 words + slab map) instead of a dense pair volume; outputs equal
    the jnp renderer, and empty z-slabs are actually non-resident."""
    Z, Y, X = 32, 16, 256
    v = np.zeros((Z, Y, X), np.float32)
    v[9:14, 4:12, 30:200] = np.linspace(0.2, 1.0, 170, dtype=np.float32)
    vol = as_normalized_volume(np.round(v * 255.0).astype(np.uint8))
    rays = _rays()
    with pltpu.force_tpu_interpret_mode(EAGER_INTERPRET):
        plan = RK.CompositingPlan(rays.entry_uv, rays.direction, rays.hit,
                                  (X, Y, Z), max_samples=24, pooled=True)
        assert plan.use_kernel and plan.group > 1
        pool, smap = RK.build_slab_pool(vol)
        # occupied z rows [9, 14) touch z-blocks 1 (and block 0 via slab
        # overlap): far fewer resident slots than slabs
        assert pool.shape[0] < Z // 8 + 1
        assert int(np.asarray(smap).max()) == pool.shape[0] - 1
        words = plan.bind(vol)
        rgb_k, a_k = plan.render_pooled(pool, smap, words=words)
    rgb_r, a_r = render_compositing(vol, rays.entry_uv, rays.direction,
                                    rays.hit, max_samples=24)
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(a_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_r),
                               atol=1e-5)


def test_interpret_pooled_dense_volume_parity():
    """Pooled march on a fully dense random volume (every slab resident):
    the i32half unpack path is exact."""
    rng = np.random.default_rng(5)
    Z, Y, X = 16, 16, 256
    vol = as_normalized_volume(
        np.round(rng.random((Z, Y, X)) * 255.0).astype(np.uint8))
    rays = _rays()
    with pltpu.force_tpu_interpret_mode(EAGER_INTERPRET):
        plan = RK.CompositingPlan(rays.entry_uv, rays.direction, rays.hit,
                                  (X, Y, Z), max_samples=16, pooled=True)
        assert plan.use_kernel
        pool, smap = RK.build_slab_pool(vol)
        rgb_k, a_k = plan.render_pooled(pool, smap)
    rgb_r, a_r = render_compositing(vol, rays.entry_uv, rays.direction,
                                    rays.hit, max_samples=16)
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(a_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_r),
                               atol=1e-5)


def test_interpret_isosurface_parity():
    # a smooth sphere: crossing detection on pure noise flips on 1-ulp
    # sample differences (tent weights vs compare-select weights), which is
    # why the hardware parity test also uses a smooth field
    from volumerenderer_tpu.io.synthetic import sphere_volume
    from volumerenderer_tpu.ops.pallas.isosurface_kernel import IsosurfacePlan
    from volumerenderer_tpu.ops.isosurface import render_isosurface

    vol = as_normalized_volume(sphere_volume(VOL_SHAPE, radius=0.3, soft=0.2))
    rays = _rays()
    Z, Y, X = vol.shape
    iso = 0.5
    with pltpu.force_tpu_interpret_mode(EAGER_INTERPRET):
        plan = IsosurfacePlan(rays.entry_uv, rays.direction, rays.hit,
                              (X, Y, Z), max_samples=24)
        assert plan.use_kernel
        words = plan.bind(vol, iso)
        rgb_k, found_k = plan.render(vol, iso, words=words)
    rgb_r, found_r = render_isosurface(vol, rays.entry_uv, rays.direction,
                                       rays.hit, iso_value=iso,
                                       max_samples=24)
    np.testing.assert_array_equal(np.asarray(found_k), np.asarray(found_r))
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_r),
                               atol=2e-3)


def test_interpret_pooled_isosurface_parity():
    """Compressed-domain isosurface: march from the sparse slab pool, shade
    from the sparse neighborhood pool — hits and colors equal the dense jnp
    path with no dense volume-sized array on device."""
    from volumerenderer_tpu.io.synthetic import sphere_volume
    from volumerenderer_tpu.ops.pallas.isosurface_kernel import IsosurfacePlan
    from volumerenderer_tpu.ops.isosurface import render_isosurface
    from volumerenderer_tpu.ops.sampling import build_shade_pool

    Z, Y, X = 16, 16, 256
    vol = as_normalized_volume(
        sphere_volume((Z, Y, X), radius=0.3, soft=0.2))
    rays = _rays()
    iso = 0.5
    with pltpu.force_tpu_interpret_mode(EAGER_INTERPRET):
        plan = IsosurfacePlan(rays.entry_uv, rays.direction, rays.hit,
                              (X, Y, Z), max_samples=24, pooled=True)
        assert plan.use_kernel
        # grouped pooled plans (round 5) march the narrow pool; per-step
        # fallback plans march the pair16 pool
        pool, smap = (RK.build_slab_pool_narrow(vol) if plan.group > 1
                      else RK.build_slab_pool(vol))
        shade_pool = build_shade_pool(vol)
        words = plan.bind(vol, iso)
        rgb_k, found_k = plan.render_pooled(pool, smap, iso, words=words,
                                            shade_pool=shade_pool)
    rgb_r, found_r = render_isosurface(vol, rays.entry_uv, rays.direction,
                                       rays.hit, iso_value=iso,
                                       max_samples=24)
    np.testing.assert_array_equal(np.asarray(found_k), np.asarray(found_r))
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_r),
                               atol=2e-3)


def test_interpret_compressed_renderer_pooled_end_to_end():
    """CompressedRenderer.make_plan(pooled=True): packed tree -> slab pool ->
    pooled kernels, both modes, equal to the dense-path plans."""
    from volumerenderer_tpu.codecs.kdtree import build as build_tree
    from volumerenderer_tpu.models.compressed import CompressedRenderer

    Z, Y, X = 16, 16, 256
    zz, yy, xx = np.meshgrid(np.arange(Z), np.arange(Y), np.arange(X),
                             indexing="ij")
    r = np.sqrt(((xx - X / 2) / (X / 2)) ** 2 + ((yy - Y / 2) / (Y / 2)) ** 2
                + ((zz - Z / 2) / (Z / 2)) ** 2)
    data = np.clip(255.0 * (1.0 - r), 0, 255).astype(np.uint8)
    tree = build_tree(data, tolerance=1, max_epochs=2)
    ren = CompressedRenderer(tree)
    rays = _rays()
    with pltpu.force_tpu_interpret_mode(EAGER_INTERPRET):
        for mode in ("compositing", "isosurface"):
            out_p = ren.make_plan(rays, mode=mode, max_samples=24,
                                  pooled=True)()
            out_d = ren.make_plan(rays, mode=mode, max_samples=24)()
            np.testing.assert_allclose(np.asarray(out_p[0]),
                                       np.asarray(out_d[0]), atol=1e-5)
            np.testing.assert_allclose(np.asarray(out_p[1]),
                                       np.asarray(out_d[1]), atol=1e-5)


@pytest.mark.parametrize("lane_groups", [1, None])
def test_interpret_tf_kernel_forward_and_grads(lane_groups):
    """Single-pass TF kernel (ops/pallas/tf_kernel.py): outputs equal the
    jnp render_tf, and the closed-form parameter gradients equal
    jax.grad through the jnp march — at non-reference TF params and with
    general cotangents on both outputs.  Covers lane_groups=1 and the
    auto (multi-lane-group) plan the headline config uses."""
    import jax
    from volumerenderer_tpu.diff.transfer import TFParams, render_tf
    from volumerenderer_tpu.ops.pallas.tf_kernel import make_render_tf_kernel

    vol = _volume()
    rays = _rays()
    Z, Y, X = vol.shape
    params = TFParams(alpha_scale=jnp.float32(0.45),
                      color_gain=jnp.float32(0.9),
                      color_bias=jnp.float32(0.05),
                      flip_sign=jnp.array([-0.8, 0.6, 0.3], jnp.float32),
                      flip_bias=jnp.array([0.9, 0.2, 0.4], jnp.float32))
    rng = np.random.default_rng(2)
    w_rgb = jnp.asarray(rng.standard_normal(rays.entry_uv.shape[:-1] + (3,)),
                        jnp.float32)
    w_a = jnp.asarray(rng.standard_normal(rays.entry_uv.shape[:-1]),
                      jnp.float32)

    def loss_ref(p):
        rgb, a = render_tf(p, vol, rays.entry_uv, rays.direction, rays.hit,
                           max_samples=24)
        return jnp.sum(rgb * w_rgb) + jnp.sum(a * w_a)

    g_ref = jax.grad(loss_ref)(params)
    rgb_ref, a_ref = render_tf(params, vol, rays.entry_uv, rays.direction,
                               rays.hit, max_samples=24)

    with pltpu.force_tpu_interpret_mode(EAGER_INTERPRET):
        plan = RK.CompositingPlan(rays.entry_uv, rays.direction, rays.hit,
                                  (X, Y, Z), max_samples=24,
                                  lane_groups=lane_groups)
        assert plan.use_kernel and plan.group > 1
        if lane_groups is None:
            assert plan.lanes > 1  # the auto plan must exercise lane groups
        f = make_render_tf_kernel(plan)

        def loss_k(p):
            rgb, a = f(p, vol)
            return jnp.sum(rgb * w_rgb) + jnp.sum(a * w_a)

        rgb_k, a_k = f(params, vol)
        g_k = jax.grad(loss_k)(params)

    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(a_ref), atol=1e-5)
    for name in TFParams._fields:
        gr = np.asarray(getattr(g_ref, name))
        gk = np.asarray(getattr(g_k, name))
        np.testing.assert_allclose(
            gk, gr, rtol=2e-4, atol=2e-4 * max(1.0, np.abs(gr).max()),
            err_msg=name)


def test_interpret_kernel_shade_matches_xla_shade():
    """The in-kernel shading pass (round 4: one window DMA per hit-bearing
    step group, 10 trilinear evals in VMEM) matches the full-image XLA
    gather shading on the same march output: identical hit masks, colors to
    sampler tolerance."""
    from volumerenderer_tpu.io.synthetic import sphere_volume
    from volumerenderer_tpu.ops.pallas.isosurface_kernel import IsosurfacePlan

    vol = as_normalized_volume(sphere_volume(VOL_SHAPE, radius=0.3, soft=0.2))
    rays = _rays()
    Z, Y, X = vol.shape
    iso = 0.5
    with pltpu.force_tpu_interpret_mode(EAGER_INTERPRET):
        plan = IsosurfacePlan(rays.entry_uv, rays.direction, rays.hit,
                              (X, Y, Z), max_samples=24)
        assert plan.use_kernel and plan.group > 1
        words = plan.bind(vol, iso)
        rgb_k, found_k = plan.render(vol, iso, words=words, shade="kernel")
        rgb_x, found_x = plan.render(vol, iso, words=words, shade="xla")
    np.testing.assert_array_equal(np.asarray(found_k), np.asarray(found_x))
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_x),
                               atol=2e-3)


@pytest.mark.parametrize("lane_groups", [1, None])
def test_interpret_voxel_grad_kernel_matches_o1(lane_groups):
    """Kernel-speed voxel gradients (ops/pallas/voxel_grad_kernel.py): the
    tile-tube backward's g_vol equals diff/vjp.py's O(1) reverse-recurrence
    voxel gradient (itself FD-checked) on an 8-bit-quantized volume, with
    general cotangents on both outputs; param grads match too."""
    import jax
    from volumerenderer_tpu.diff.transfer import TFParams
    from volumerenderer_tpu.diff.vjp import render_tf_o1
    from volumerenderer_tpu.ops.pallas.voxel_grad_kernel import (
        make_render_tf_voxel)

    vol = _volume()
    rays = _rays()
    Z, Y, X = vol.shape
    params = TFParams(alpha_scale=jnp.float32(0.45),
                      color_gain=jnp.float32(0.9),
                      color_bias=jnp.float32(0.05),
                      flip_sign=jnp.array([-0.8, 0.6, 0.3], jnp.float32),
                      flip_bias=jnp.array([0.9, 0.2, 0.4], jnp.float32))
    rng = np.random.default_rng(5)
    w_rgb = jnp.asarray(rng.standard_normal(rays.entry_uv.shape[:-1] + (3,)),
                        jnp.float32)
    w_a = jnp.asarray(rng.standard_normal(rays.entry_uv.shape[:-1]),
                      jnp.float32)

    def loss_ref(p, v):
        rgb, a = render_tf_o1(p, v, rays.entry_uv, rays.direction, rays.hit,
                              24, True)
        return jnp.sum(rgb * w_rgb) + jnp.sum(a * w_a)

    gp_ref, gv_ref = jax.grad(loss_ref, argnums=(0, 1))(params, vol)

    with pltpu.force_tpu_interpret_mode(EAGER_INTERPRET):
        plan = RK.CompositingPlan(rays.entry_uv, rays.direction, rays.hit,
                                  (X, Y, Z), max_samples=24,
                                  lane_groups=lane_groups)
        assert plan.use_kernel and plan.group > 1
        f = make_render_tf_voxel(plan)

        def loss_k(p, v):
            rgb, a = f(p, v)
            return jnp.sum(rgb * w_rgb) + jnp.sum(a * w_a)

        gp_k, gv_k = jax.grad(loss_k, argnums=(0, 1))(params, vol)

    gv_ref = np.asarray(gv_ref)
    gv_k = np.asarray(gv_k)
    scale = max(1.0, np.abs(gv_ref).max())
    np.testing.assert_allclose(gv_k, gv_ref, atol=2e-4 * scale,
                               err_msg="voxel gradient")
    for name in TFParams._fields:
        gr = np.asarray(getattr(gp_ref, name))
        gk = np.asarray(getattr(gp_k, name))
        np.testing.assert_allclose(
            gk, gr, rtol=2e-4, atol=2e-4 * max(1.0, np.abs(gr).max()),
            err_msg=name)


def test_interpret_g8_lane_groups_parity():
    """The G=8 lane-group configuration (supported up to LANE_GROUPS_MAX;
    8x128-px tiles, one window DMA per 1024 rays) matches the jnp renderer
    exactly on an 8-bit grid.  G=8 is not the default (it lost the round-4
    16-frame A/B) but remains a supported plan."""
    rng = np.random.default_rng(13)
    vol = as_normalized_volume(
        np.round(rng.random((16, 16, 128)) * 255).astype(np.uint8))
    Z, Y, X = vol.shape
    rays = generate_rays(Camera(width=512, height=16))
    with pltpu.force_tpu_interpret_mode(EAGER_INTERPRET):
        plan = RK.CompositingPlan(rays.entry_uv, rays.direction, rays.hit,
                                  (X, Y, Z), max_samples=24, lane_groups=8)
        assert plan.use_kernel and plan.lanes == 8, plan.lanes
        rgb_k, a_k = plan.render(vol)
    rgb_r, a_r = render_compositing(vol, rays.entry_uv, rays.direction,
                                    rays.hit, max_samples=24)
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_r),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(a_r), atol=1e-5)


def test_interpret_iso_narrow_x_parity():
    """Narrow-x iso march (round 4: 128-lane window panels via xwords —
    half the window bytes): hit masks and shading equal the jnp reference
    on a camera whose group footprints trigger the narrow windows."""
    from volumerenderer_tpu.io.synthetic import sphere_volume
    from volumerenderer_tpu.ops.pallas.isosurface_kernel import IsosurfacePlan
    from volumerenderer_tpu.ops.isosurface import render_isosurface

    vol = as_normalized_volume(
        sphere_volume((32, 32, 128), radius=0.3, soft=0.2))
    Z, Y, X = vol.shape
    rays = generate_rays(Camera(width=256, height=64))
    iso = 0.5
    with pltpu.force_tpu_interpret_mode(EAGER_INTERPRET):
        plan = IsosurfacePlan(rays.entry_uv, rays.direction, rays.hit,
                              (X, Y, Z), max_samples=24)
        assert plan.use_kernel and plan.group > 1
        assert plan.xwords is not None, "camera must trigger narrow-x"
        rgb_k, found_k = plan.render(vol, iso, words=plan.bind(vol, iso))
    rgb_r, found_r = render_isosurface(vol, rays.entry_uv, rays.direction,
                                       rays.hit, iso_value=iso,
                                       max_samples=24)
    np.testing.assert_array_equal(np.asarray(found_k), np.asarray(found_r))
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_r),
                               atol=2e-3)


def test_interpret_pooled_narrow_parity():
    """Narrow slab pool (round 5): the compressed-domain march through the
    f32 dual-copy panel layout equals the jnp renderer AND the pair16 pool
    exactly — pooled rendering at the dense narrow kernel's arithmetic."""
    rng = np.random.default_rng(7)
    Z, Y, X = 32, 16, 256
    v = np.zeros((Z, Y, X), np.float32)
    v[9:14, 4:12, 30:200] = rng.random((5, 8, 170)).astype(np.float32)
    vol = as_normalized_volume(np.round(v * 255.0).astype(np.uint8))
    # close-up camera: few voxels per tile, so x spans fit the narrow
    # panels (xwords != None) at interpret-tractable ray counts
    rays = generate_rays(Camera(width=128, height=32,
                                position=(0.0, 0.0, -0.6)))
    with pltpu.force_tpu_interpret_mode(EAGER_INTERPRET):
        plan = RK.CompositingPlan(rays.entry_uv, rays.direction, rays.hit,
                                  (X, Y, Z), max_samples=24, pooled=True)
        assert plan.use_kernel and plan.group > 1
        assert plan.xwords is not None
        pool_n, smap_n = RK.build_slab_pool_narrow(vol)
        assert pool_n.shape[1] // RK.SLAB_H < Z // 8 + 1  # sparse residency
        words = plan.bind(vol)
        rgb_n, a_n = plan.render_pooled(pool_n, smap_n, words=words)
        pool_o, smap_o = RK.build_slab_pool(vol)
        rgb_o, a_o = plan.render_pooled(pool_o, smap_o, words=words)
    rgb_r, a_r = render_compositing(vol, rays.entry_uv, rays.direction,
                                    rays.hit, max_samples=24)
    np.testing.assert_allclose(np.asarray(a_n), np.asarray(a_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb_n), np.asarray(rgb_r),
                               atol=1e-5)
    # the two pool kernels compile separately, so fma/fusion choices may
    # differ by 1 ulp on ~1% of pixels — same-within-ulp, not bit-equal
    np.testing.assert_allclose(np.asarray(a_n), np.asarray(a_o), atol=2e-7)


def test_interpret_phased_march_parity():
    """The phase-replanned iso march (round 5: word tables rebuilt between
    phases with dead lane groups' bound bits masked) produces the same hit
    set and hit steps as the single-launch march, including across
    boundaries that fall inside sampled runs and inside skipped gaps."""
    import jax.numpy as jnp
    from volumerenderer_tpu.ops.pallas import isosurface_kernel as IK
    from volumerenderer_tpu.io.synthetic import sphere_volume

    rng = np.random.default_rng(3)
    Z, Y, X = 16, 16, 128
    base = np.asarray(sphere_volume((Z, Y, X), radius=0.35, soft=0.3))
    noise = rng.random((Z, Y, X)).astype(np.float32) * 0.3
    vol = as_normalized_volume(
        np.round(np.clip(base + noise, 0, 1) * 255.0).astype(np.uint8))
    rays = _rays()
    iso = 0.5
    with pltpu.force_tpu_interpret_mode(EAGER_INTERPRET):
        plan = IK.IsosurfacePlan(rays.entry_uv, rays.direction, rays.hit,
                                 (X, Y, Z), max_samples=24)
        assert plan.use_kernel and plan.group > 1
        words = plan.bind(vol, iso)
        assert plan.gwords is not None
        iso255 = jnp.full((1, 1), iso * 255.0, jnp.float32)
        f_ref, t_ref, _ = IK._launch_group(
            plan.rays_packed, words, vol, iso255, plan.dims,
            plan.max_samples + 1, win_z=plan.win_z, win_y=plan.win_y,
            group=plan.group, lanes=plan.lanes, xwords=plan.xwords,
            state0=plan.state0)
        for bounds in ((3,), (2, 5), (1, 2, 3)):
            f_p, t_p = IK.march_phased(
                plan.rays_packed, words, plan.gwords, plan.state0,
                plan.texit, vol, iso255, plan.dims, plan.max_samples + 1,
                plan.win_z, plan.win_y, plan.group, plan.lanes,
                xwords=plan.xwords, boundaries=bounds)
            np.testing.assert_array_equal(np.asarray(f_p), np.asarray(f_ref))
            np.testing.assert_array_equal(np.asarray(t_p), np.asarray(t_ref))
