"""Isosurface decomposition probe (round 5): march vs shade cost at the
bench config, plus the exact-semantics work floor.

The bench iso metric is march+shade over a 16-frame orbit.  This probe times
the two kernel passes separately (same one-jit force-transfer protocol as
bench.py) on a subset of frames and computes, from camera math alone, the
per-ray alive-step counts — the minimum samples ANY exact march must take
(found rays stop at t_hit + lookahead; never-cross rays march to cube exit)
— so the gap between the kernel and its own floor is measurable.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import orbit_camera

W = H = 1024
FRAMES = (0, 3, 7)  # shallow + oblique frames of the 16-frame orbit


def main():
    from volumerenderer_tpu import generate_rays, as_normalized_volume
    from volumerenderer_tpu.io.synthetic import turbulence_volume
    from volumerenderer_tpu.ops.pallas import isosurface_kernel as IK

    vol = as_normalized_volume(turbulence_volume((256, 256, 256), seed=0))
    iso = float(jnp.median(vol))
    iso255 = jnp.full((1, 1), iso * 255.0, jnp.float32)

    g_force = os.environ.get("VR_ISO_G")
    k_force = os.environ.get("VR_ISO_K")
    if k_force:
        import volumerenderer_tpu.ops.pallas.raycast_kernel as RKm
        IK.GROUP_KS = RKm.GROUP_KS = (int(k_force),)
    plans, rays_list = [], []
    for i in FRAMES:
        rays = generate_rays(orbit_camera(2.0 * i, W, H))
        rays_list.append(rays)
        plans.append(IK.IsosurfacePlan(
            rays.entry_uv, rays.direction, rays.hit, (256, 256, 256),
            lane_groups=int(g_force) if g_force else None))
    words = [p.bind(vol, iso) for p in plans]
    phases = os.environ.get("VR_ISO_PHASES")  # e.g. "48,104"; "" = single
    boundaries = tuple(int(x) for x in phases.split(",") if x) \
        if phases is not None else ()
    packs = [(p.rays_packed, w, p.xwords, p.gwords, p.state0, p.texit)
             for p, w in zip(plans, words)]


    out = {"iso_value": iso, "frames": list(FRAMES),
           "plan": [{"k": p.group, "win_z": p.win_z, "win_y": p.win_y,
                     "G": p.lanes, "narrow": p.xwords is not None,
                     "shade_k": p.shade_k, "shade_win_z": p.shade_win_z,
                     "shade_win_y": p.shade_win_y} for p in plans]}

    @jax.jit
    def march_sweep(vol, packs):
        acc = jnp.float32(0)
        hits = []
        for (rp, wd, xw, gw, st, tx), p in zip(packs, plans):
            found_t, t_hit_t = IK.march_phased(
                rp, wd, gw, st, tx, vol, iso255, p.dims, p.max_samples + 1,
                p.win_z, p.win_y, p.group, p.lanes, xwords=xw,
                boundaries=boundaries)
            acc = acc + jnp.sum(found_t) + jnp.sum(t_hit_t)
            hits.append((found_t, t_hit_t))
        return acc, hits

    def timeit(fn, *a, reps=3):
        r = fn(*a)
        float(jax.tree.leaves(r)[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn(*a)
            float(jax.tree.leaves(r)[0])
            ts.append(time.perf_counter() - t0)
        return min(ts) / len(FRAMES), r

    t_march, (_, hits) = timeit(march_sweep, vol, packs)
    out["march_ms_per_frame"] = t_march * 1e3

    hit_rows_all = []
    for (found_t, t_hit_t), p in zip(hits, plans):
        G = p.lanes
        hr = max(8, 2 * G)
        rows = [found_t, t_hit_t]
        if hr > 2 * G:
            rows.append(jnp.zeros((found_t.shape[0], hr - 2 * G, 128),
                                  jnp.float32))
        hit_rows_all.append((jnp.concatenate(rows, axis=1), found_t, t_hit_t))

    @jax.jit
    def shade_sweep(vol, packs, hit_rows_all):
        acc = jnp.float32(0)
        for (rp, wd, xw, gw, st, tx), p, (hit_rows, found_t, t_hit_t) in zip(
                packs, plans, hit_rows_all):
            n_pos = p.max_samples + 1
            pad_z, shift_y, win_zs, win_ys = IK._shade_pads(
                p.dims, p.shade_win_z, p.shade_win_y)
            swords = IK.build_shade_words(found_t, t_hit_t, p.mins, p.maxs,
                                          p.dims, n_pos, p.shade_k, win_zs,
                                          win_ys, pad_z, shift_y)
            sxw = IK.build_shade_xwords(p.mins, p.maxs, p.dims, n_pos,
                                        p.shade_k, IK.shade_pad_x(p.dims)) \
                if p.shade_narrow else None
            r_t, g_t, b_t = IK._launch_shade(
                rp, swords, hit_rows, vol, iso255, p.dims, n_pos, win_zs,
                win_ys, p.shade_k, lanes=p.lanes, xwords=sxw)
            acc = acc + jnp.sum(r_t) + jnp.sum(g_t) + jnp.sum(b_t)
        return acc

    t_shade, _ = timeit(shade_sweep, vol, packs, hit_rows_all)
    out["shade_ms_per_frame"] = t_shade * 1e3

    # ---- exact-semantics work floor (camera math only) ----
    floors = []
    for rays, p, (_, found_t, t_hit_t) in zip(rays_list, plans, hit_rows_all):
        step = rays.direction * jnp.array([1 / 256, 1 / 256, 1 / 256],
                                          jnp.float32)

        @jax.jit
        def exit_steps(entry, stp, hit):
            def body(pos, _):
                pos = pos + stp
                inside = jnp.all((pos > 0) & (pos < 1), axis=-1) & hit
                return pos, inside

            _, ins = jax.lax.scan(body, entry, None, length=301)
            return jnp.sum(ins.astype(jnp.int32), axis=0)

        t_exit = np.asarray(exit_steps(rays.entry_uv, step, rays.hit))
        found = np.asarray(IK._untile(found_t, H, W, p.lanes)) > 0.5
        t_hit = np.asarray(IK._untile(t_hit_t, H, W, p.lanes))
        stop = np.where(found, np.minimum(t_hit + 2, t_exit), t_exit)
        floors.append(dict(
            hit_frac=float(found.mean()),
            nevercross_frac=float((~found & (t_exit > 0)).mean()),
            mean_alive_steps=float(stop.mean()),
            total_alive_samples=float(stop.sum())))
    out["floor"] = floors
    # per-sample rates
    tot = sum(f["total_alive_samples"] for f in floors) / len(floors)
    out["march_ns_per_alive_sample"] = t_march * 1e9 / tot
    out["iso_rays_per_s_now"] = W * H / (t_march + t_shade)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
