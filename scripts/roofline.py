"""Per-frame roofline accounting for the tile-tube march kernel (run on TPU).

VERDICT round 1 asked for "an explicit MFU + HBM-bytes/s accounting per
frame so the remaining gap is provably fundamental, not unexamined".  This
script measures steady-state frame time at the headline config (1024^2
compositing of a dense 256^3 turbulence volume, the BASELINE.json metric)
and decomposes it against first-principles cost terms computed from the
plan itself:

  * DMA bytes/frame: every window the kernel actually fetches (the word
    table gives sampled groups; tile-level early exit is simulated from the
    jnp march's per-ray alpha saturation depth, which the kernel reproduces
    bit-exactly) x the window byte size.
  * Sampling (VPU) ops/frame: the tent-weight build + row reduction is
    ~OPS_PER_ROW_EL ops per (window row x 128 lanes) per substep.
  * Fixed per-window cost: the residual after the byte and op terms are
    priced at their hardware rooflines; reported per window so the modeled
    F_WINDOW_NS in the planner's cost model can be re-calibrated.

Hardware ceilings default to TPU v5e: HBM_GBPS=819, VPU f32 ~3.9 Tops/s
(8 sublanes x 128 lanes x 4 ALUs x 940 MHz).  Override via env for other
chips.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

HBM_GBPS = float(os.environ.get("HBM_GBPS", 819.0))
VPU_TOPS = float(os.environ.get("VPU_TOPS", 3.9))
OPS_PER_ROW_EL = 10.0  # tent build (iota, |.|, max, mul) + FMA reduce + unpack


def orbit_camera(az_deg, width, height):
    from volumerenderer_tpu import Camera

    a = math.radians(az_deg)
    pos = (0.75 * math.sin(a), 0.0, -0.75 * math.cos(a))
    front = (-math.sin(a), 0.0, math.cos(a))
    return Camera(width=width, height=height, position=pos, front=front)


def exit_depth_per_tile(vol, rays, max_samples, G=1):
    """Per-tile march length (steps until every ray's alpha saturates or
    leaves the volume) from the jnp recurrence — the kernel's while loop
    runs exactly this many sampled steps per tile.  ``G`` = plan.lanes
    (tiles are TILE_H x G*TILE_W pixels)."""
    from volumerenderer_tpu.ops.raycast import EARLY_OUT_ALPHA, ALPHA_SCALE
    from volumerenderer_tpu.ops.sampling import sample_trilinear
    from volumerenderer_tpu.ops.pallas.raycast_kernel import TILE_H, TILE_W

    H, W, _ = rays.entry_uv.shape
    pos = rays.entry_uv
    step = rays.direction / jnp.asarray(vol.shape[::-1], jnp.float32)
    alpha = jnp.zeros((H, W), jnp.float32)
    alive = rays.hit
    depth = jnp.zeros((H, W), jnp.int32)
    for t in range(max_samples):
        pos = pos + step
        inside = jnp.all((pos > 0.0) & (pos < 1.0), axis=-1)
        alive = alive & inside & (alpha < EARLY_OUT_ALPHA)
        depth = jnp.where(alive, t + 1, depth)
        if t % 32 == 31 and not bool(jnp.any(alive)):
            break
        s = sample_trilinear(vol, pos)
        alpha = jnp.where(alive, alpha + (s - s * alpha) * ALPHA_SCALE, alpha)
    d = np.asarray(depth).reshape(H // TILE_H, TILE_H, W // (G * TILE_W),
                                  G * TILE_W)
    return d.max(axis=(1, 3)).reshape(-1)  # per-tile exit step


def account(plan, tile_depth):
    """(windows, DMA bytes, sampling ops) actually executed per frame."""
    k = plan.group
    X, Y, Z = plan.dims
    words = np.asarray(plan.words_dense)
    sampled = (words & 1).astype(bool)  # (tiles, groups)
    n_tiles, n_groups = sampled.shape
    glen = np.minimum((tile_depth + k - 1) // k, n_groups)
    mask = np.arange(n_groups)[None, :] < glen[:, None]
    windows = int((sampled & mask).sum())
    width = X if plan.xwords is None else 128 * 2  # narrow: two 128-lane copies
    if plan.pooled:
        wbytes = plan.win_z * plan.win_y * (X // 2) * 4  # i32half pairs
    else:
        wbytes = plan.win_z * plan.win_y * width * 4     # f32 pairs
    dma_bytes = windows * wbytes
    substeps = int(np.minimum(tile_depth, n_groups * k).sum())
    # sampling runs once per substep PER lane group (window shared)
    samp_ops = (substeps * plan.win_z * plan.win_y * 128 * OPS_PER_ROW_EL
                * getattr(plan, "lanes", 1))
    return windows, dma_bytes, samp_ops, substeps


def main():
    from volumerenderer_tpu import generate_rays, as_normalized_volume
    from volumerenderer_tpu.io.synthetic import turbulence_volume
    from volumerenderer_tpu.models import plan_compositing

    W = H = 1024
    n_frames = int(os.environ.get("N_FRAMES", 8))
    pooled = bool(int(os.environ.get("POOLED", 0)))
    vol = as_normalized_volume(turbulence_volume((256, 256, 256), seed=0))
    Z, Y, X = vol.shape

    plans, rays_list = [], []
    for i in range(n_frames):
        rays = generate_rays(orbit_camera(2.0 * i, W, H))
        if pooled:
            from volumerenderer_tpu.ops.pallas.raycast_kernel import (
                CompositingPlan)
            plan = CompositingPlan(rays.entry_uv, rays.direction, rays.hit,
                                   (X, Y, Z), pooled=True)
        else:
            plan = plan_compositing(rays.entry_uv, rays.direction, rays.hit,
                                    (X, Y, Z))
        assert plan.use_kernel
        plans.append(plan)
        rays_list.append(rays)

    import jax
    from volumerenderer_tpu.ops.pallas.raycast_kernel import (
        _launch, _launch_pooled, _untile)
    from volumerenderer_tpu.ops.raycast import apply_reference_transfer

    # ONE jit program for the whole orbit, plan arrays as ARGUMENTS
    # (bench.py protocol: per-frame dispatch costs ~2.9 ms tunnel RPC each,
    # and captured constants blow the remote-compile size limit)
    if pooled:
        from volumerenderer_tpu.ops.pallas.raycast_kernel import build_slab_pool
        pool, smap = build_slab_pool(vol)
        packs = [(p.rays_packed, p.words_dense) for p in plans]

        @jax.jit
        def sequence(vol_or_pool, smap, packs):
            s = jnp.float32(0)
            for (rp, wd), p in zip(packs, plans):
                c, a = _launch_pooled(rp, wd, vol_or_pool, smap, p.dims,
                                      p.max_samples, win_z=p.win_z,
                                      group=p.group, win_y=p.win_y,
                                      lanes=p.lanes)
                rgb = apply_reference_transfer(_untile(c, H, W, p.lanes),
                                               _untile(a, H, W, p.lanes))
                s = s + jnp.sum(rgb)
            return s

        args = (pool, smap, packs)
    else:
        packs = [(p.rays_packed, p.words_dense, p.xwords) for p in plans]

        @jax.jit
        def sequence(vol, smap, packs):
            s = jnp.float32(0)
            for (rp, wd, xw), p in zip(packs, plans):
                c, a = _launch(rp, wd, vol, p.dims, p.max_samples,
                               win_z=p.win_z, group=p.group, xwords=xw,
                               win_y=p.win_y, lanes=p.lanes)
                rgb = apply_reference_transfer(_untile(c, H, W, p.lanes),
                                               _untile(a, H, W, p.lanes))
                s = s + jnp.sum(rgb)
            return s

        args = (vol, None, packs)

    float(sequence(*args))  # compile + warm
    reps = 3
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(reps):
        acc += float(sequence(*args))
    dt = (time.perf_counter() - t0) / (reps * n_frames)
    rays_per_s = W * H / dt

    # first-principles accounting per frame (mean over the orbit)
    tot = dict(windows=0, bytes=0, ops=0, substeps=0)
    for p, r in zip(plans, rays_list):
        td = exit_depth_per_tile(vol, r, p.max_samples,
                                 G=getattr(p, "lanes", 1))
        w, b, o, s = account(p, td)
        tot["windows"] += w
        tot["bytes"] += b
        tot["ops"] += o
        tot["substeps"] += s
    for key in tot:
        tot[key] /= n_frames

    t_dma = tot["bytes"] / (HBM_GBPS * 1e9)
    t_vpu = tot["ops"] / (VPU_TOPS * 1e12)
    resid = dt - t_dma - t_vpu
    out = {
        "frame_ms": dt * 1e3,
        "mrays_per_s": rays_per_s / 1e6,
        "pooled": pooled,
        "group_k": plans[0].group,
        "win_z": plans[0].win_z,
        "win_y": plans[0].win_y,
        "windows_per_frame": tot["windows"],
        "substeps_per_frame": tot["substeps"],
        "dma_gb_per_frame": tot["bytes"] / 1e9,
        "hbm_roofline_ms": t_dma * 1e3,
        "hbm_utilization": t_dma / dt,
        "vpu_ops_per_frame_g": tot["ops"] / 1e9,
        "vpu_roofline_ms": t_vpu * 1e3,
        "vpu_utilization": t_vpu / dt,
        "residual_ms": resid * 1e3,
        "residual_ns_per_window": resid / max(tot["windows"], 1) * 1e9,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
