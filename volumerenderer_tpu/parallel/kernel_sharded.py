"""Sharded launches of the Pallas tile-tube kernels — the fast renderer
composed with ``shard_map`` (VERDICT round 2 "Next" #3: the sharded paths
previously marched the ~20-50x-slower jnp gather renderer).

Decomposition: a ``CompositingPlan`` is entirely per-tile state — packed ray
rows ``rays_packed`` (tiles, 8, 128), the SMEM control-word table ``words``
(tiles, groups) and the optional narrow-x table ``xwords`` — plus static
launch config (win_z, win_y, group, dims).  Tiles are independent grid
programs, and tile order is image-row-block-major (``_pack_rays``), so
sharding the LEADING TILE AXIS over the mesh's ``rays`` axis shards image
row blocks contiguously: each device launches the identical kernel on its
own tile slice — the TPU-native form of the reference's per-pixel fragment
SPMD (``raycaster.frag:18-86``), scaled across chips instead of fragment
units (``main.cpp:78-79,599-619`` defines the decomposition to match).

Gradients: the sharded TF fit step runs the single-pass forward+backward
TF kernel (``ops.pallas.tf_kernel``) per shard and all-reduces the
closed-form parameter gradients with ``psum`` — forward AND backward at
kernel speed on every chip (BASELINE north star).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..diff.transfer import TFParams
from ..ops.raycast import apply_reference_transfer
from ..ops.pallas.raycast_kernel import (TILE_H, CompositingPlan, _launch,
                                         _untile)
from ..ops.pallas.tf_kernel import _launch_tf

__all__ = ["render_planned_sharded", "tf_fit_step_kernel",
           "scaling_probe_kernel", "plan_shardable"]


def plan_shardable(plan: CompositingPlan, n: int) -> bool:
    """A plan shards over ``n`` devices when its tiles split into ``n`` equal
    contiguous runs of whole image-row blocks (so each shard's untile is a
    contiguous row slab)."""
    H, _ = plan.shape
    return plan.use_kernel and (H // TILE_H) % n == 0


def render_planned_sharded(mesh: Mesh, plan: CompositingPlan, volume,
                           words=None, axis: str = "rays"):
    """Render a planned view with tiles (image row blocks) sharded over
    ``mesh`` axis ``axis``; each device runs the Pallas march on its slice.

    Returns (rgb, alpha) as full (H, W) images — bit-identical to
    ``plan.render(volume)`` (same kernel, same per-tile windows; tiles never
    interact)."""
    n = mesh.shape[axis]
    assert plan_shardable(plan, n), (plan.shape, n)
    H, W = plan.shape
    if words is None:
        words = plan.words_dense
    narrow = plan.xwords is not None

    specs_in = (P(axis), P(axis), P(axis), P()) if narrow \
        else (P(axis), P(axis), P())

    @partial(shard_map, mesh=mesh, in_specs=specs_in,
             out_specs=(P(axis), P(axis)), check_vma=False)
    def _render(*args):
        if narrow:
            rays_l, words_l, xwords_l, vol = args
        else:
            rays_l, words_l, vol = args
            xwords_l = None
        return _launch(rays_l, words_l, vol, plan.dims, plan.max_samples,
                       win_z=plan.win_z, group=plan.group, xwords=xwords_l,
                       win_y=plan.win_y, lanes=plan.lanes)

    operands = (plan.rays_packed, words, plan.xwords, volume) if narrow \
        else (plan.rays_packed, words, volume)
    color, alpha = _render(*operands)
    color = _untile(color, H, W, plan.lanes)
    alpha = _untile(alpha, H, W, plan.lanes)
    return apply_reference_transfer(color, alpha), alpha


def tf_fit_step_kernel(mesh: Mesh, plan: CompositingPlan, params: TFParams,
                       volume, target_rgb, words=None, lr: float = 1e-2,
                       axis: str = "rays"):
    """One SGD step of the TF fit (BASELINE config 4) with image rows sharded
    over ``axis``: each device runs ONE pass of the forward+backward TF
    kernel on its tiles, computes its local closed-form parameter gradients
    (``ops.pallas.tf_kernel`` module docstring), and the scalars all-reduce
    with ``psum`` — grad step ~1 kernel frame per chip.

    ``target_rgb``: (H, W, 3).  Returns (new_params, loss) replicated."""
    n = mesh.shape[axis]
    assert plan_shardable(plan, n), (plan.shape, n)
    assert plan.group > 1, "TF kernel needs a grouped plan"
    assert plan.lanes == 1, "TF kernel runs single-lane-group plans"
    H, W = plan.shape
    if words is None:
        words = plan.words_dense
    npix = float(H * W * 3)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(axis), P(axis), P(), P(axis)),
             out_specs=(P(), P()), check_vma=False)
    def _step(params, rays_l, words_l, vol, target_l):
        tf_scalars = jnp.stack([params.alpha_scale, params.color_gain,
                                params.color_bias]).reshape(1, 3)
        out = _launch_tf(rays_l, words_l, vol, tf_scalars, plan.dims,
                         plan.max_samples, win_z=plan.win_z,
                         group=plan.group, win_y=plan.win_y)
        Hl = target_l.shape[0]
        rows = [_untile(out[:, i, :], Hl, W) for i in range(7)]
        color_T, alpha_T, R, P_tot, QP, SG, SB = rows
        rgb = params.flip_sign * color_T[..., None] + params.flip_bias
        resid = rgb - target_l
        local_loss = jnp.sum(resid * resid)
        # dL/d rgb for loss = sum(resid^2)/npix (global mean over pixels)
        g_rgb = 2.0 * resid / npix
        gc = jnp.sum(g_rgb * params.flip_sign, axis=-1)
        gk = jnp.sum(-gc * (P_tot * R - QP))  # gaT = dL/d alpha_T = 0
        gG = jnp.sum(gc * SG)
        gB = jnp.sum(gc * SB)
        g_flip_sign = jnp.sum(g_rgb * color_T[..., None], axis=(0, 1))
        g_flip_bias = jnp.sum(g_rgb, axis=(0, 1))
        grads = TFParams(alpha_scale=gk, color_gain=gG, color_bias=gB,
                         flip_sign=g_flip_sign, flip_bias=g_flip_bias)
        loss = jax.lax.psum(local_loss, axis) / npix
        grads = jax.tree.map(lambda g: jax.lax.psum(g, axis), grads)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    return _step(params, plan.rays_packed, words, volume, target_rgb)


def scaling_probe_kernel(mesh: Mesh, plan: CompositingPlan, volume,
                         words=None, frames: int = 4, axis: str = "rays"):
    """Per-device throughput ratio (full mesh vs one device) for the KERNEL
    render path — the scaling-efficiency harness the north star asks for
    ("image tiles and rays sharded via shard_map ... kernels at
    speed-of-light per chip"), measuring the fast renderer rather than the
    jnp march (VERDICT round 2 missing #1).  Timing uses the force-transfer
    protocol from ``bench.py`` (docs/PERF_NOTES.md)."""
    import time

    def bench(m):
        def frame():
            rgb, a = render_planned_sharded(m, plan, volume, words, axis=axis)
            return jnp.sum(rgb) + jnp.sum(a)

        float(frame())  # warmup/compile
        t0 = time.perf_counter()
        s = jnp.float32(0)
        for _ in range(frames):
            s = s + frame()
        assert np.isfinite(float(s))
        return (time.perf_counter() - t0) / frames

    t_mesh = bench(mesh)
    one = Mesh(np.asarray(list(mesh.devices.flat)[:1]), axis_names=(axis,))
    t_one = bench(one)
    n = mesh.devices.size
    return (t_one / n) / t_mesh
