"""Pallas TPU isosurface march — fast path for ``ops/isosurface.py``.

Same tile-tube machinery as the compositing kernel (see
``raycast_kernel.py`` and docs/PERF_NOTES.md): 128-ray tiles, double-buffered
window DMAs whose origins come from the host-precomputed SMEM table, and the
shared pair-volume tent sampler.  The kernel marches until the zero-crossing
test fires (``(s - iso) < 0 && (s2 - iso) >= 0``, ``isosurface.frag:126``)
and outputs the per-ray hit step; ``s2`` of step t is ``s`` of step t+1, so
one sample per step is computed and cached.

Shading (4-step bisection, DELTA=0.01 central-difference normal, Phong —
``isosurface.frag:23-75``) runs as a host/jnp pass over the hit pixels only:
its sample offsets (±2.56 voxels at 256³) exceed the marching window, and the
per-image cost (≤11 samples × hit pixels) is far below the march.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..isosurface import MAX_SAMPLES, bisection_refine, gradient_normal, phong
from .raycast_kernel import (TILE_H, TILE_W, WIN_Y, _footprint_scan,
                             _origin_table, _pack_rays, _untile, choose_win_z,
                             pack_pairs, tent_sample)

T_PER = 8


def _iso_kernel(rays_ref, org_ref, vol_ref, iso_ref, out_ref, slab, state,
                sem, *, dims, max_samples, win_z):
    for tile in range(T_PER):
        _iso_one_tile(rays_ref, org_ref, vol_ref, out_ref, slab, state, sem,
                      tile, dims=dims, max_samples=max_samples, win_z=win_z,
                      iso255=iso_ref[0, 0])


def _iso_one_tile(rays_ref, org_ref, vol_ref, out_ref, slab, state, sem,
                  tile, *, dims, max_samples, win_z, iso255):
    X, Y, Z = dims
    WIN_Z = win_z

    def table_origin(t):
        v = org_ref[tile, t]          # packed oz*2^16 + oy (both < 2^16)
        oz = v >> 16
        oy = pl.multiple_of(v & 0xFFFF, 8)
        return oz, oy

    def dma(slot, oz, oy):
        return pltpu.make_async_copy(
            vol_ref.at[pl.ds(oz, WIN_Z), pl.ds(oy, WIN_Y), :],
            slab.at[slot], sem.at[slot])

    # state rows: 0-2 pos(t), 3 s(t), 4 found, 5 alive, 6 t_hit
    e = [rays_ref[tile, i:i + 1, :] for i in range(3)]
    d = [rays_ref[tile, 3 + i:4 + i, :] for i in range(3)]
    hit0 = rays_ref[tile, 6:7, :] > 0.5

    # prologue: s(pos_0) synchronously; prefetch window for pos_1
    p0 = [e[i] + d[i] for i in range(3)]
    in0 = ((p0[0] > 0.0) & (p0[0] < 1.0) & (p0[1] > 0.0) & (p0[1] < 1.0)
           & (p0[2] > 0.0) & (p0[2] < 1.0))
    oz0, oy0 = table_origin(0)
    cp = dma(0, oz0, oy0)
    cp.start()
    cp.wait()
    s0 = tent_sample(slab[0], p0[0], p0[1], p0[2], oz0, oy0, dims, WIN_Z)
    oz1, oy1 = table_origin(1)
    dma(1, oz1, oy1).start()

    state[0:1, :] = p0[0]
    state[1:2, :] = p0[1]
    state[2:3, :] = p0[2]
    state[3:4, :] = s0
    state[4:5, :] = jnp.zeros((1, 128), jnp.float32)
    state[5:6, :] = jnp.where(hit0, 1.0, 0.0)
    state[6:7, :] = jnp.full((1, 128), -1.0, jnp.float32)

    def body(carry):
        k, _ = carry
        slot = jax.lax.rem(k + 1, 2)
        nslot = jax.lax.rem(k, 2)
        px = state[0:1, :]
        py = state[1:2, :]
        pz = state[2:3, :]
        s_k = state[3:4, :]
        found = state[4:5, :] > 0.5
        alive = state[5:6, :] > 0.5
        t_hit = state[6:7, :]

        inside_k = ((px > 0.0) & (px < 1.0) & (py > 0.0) & (py < 1.0)
                    & (pz > 0.0) & (pz < 1.0))
        alive = alive & inside_k

        pn = [px + d[0], py + d[1], pz + d[2]]
        ozn, oyn = table_origin(k + 2)
        dma(nslot, ozn, oyn).start()

        oz_c, oy_c = table_origin(k + 1)
        dma(slot, oz_c, oy_c).wait()
        s_n = tent_sample(slab[slot], pn[0], pn[1], pn[2], oz_c, oy_c,
                          dims, WIN_Z)

        crossing = alive & (s_k < iso255) & (s_n >= iso255) & ~found
        t_hit = jnp.where(crossing, jnp.broadcast_to(
            k.astype(jnp.float32), t_hit.shape), t_hit)
        found = found | crossing
        alive = alive & ~found

        state[0:1, :] = pn[0]
        state[1:2, :] = pn[1]
        state[2:3, :] = pn[2]
        state[3:4, :] = s_n
        state[4:5, :] = jnp.where(found, 1.0, 0.0)
        state[5:6, :] = jnp.where(alive, 1.0, 0.0)
        state[6:7, :] = t_hit
        return k + 1, jnp.any(alive)

    def cond(carry):
        k, any_alive = carry
        return (k < max_samples) & any_alive

    k_end, _ = jax.lax.while_loop(cond, body, (jnp.int32(0),
                                               jnp.any(hit0 & in0)))
    # drain the last prefetched DMA (issued by iteration k_end-1 into slot
    # rem(k_end-1, 2) == rem(k_end+1, 2); if the loop never ran this is the
    # prologue's slot-1 prefetch)
    oz_e, oy_e = table_origin(k_end + 1)
    dma(jax.lax.rem(k_end + 1, 2), oz_e, oy_e).wait()
    out_ref[tile, 0:1, :] = state[4:5, :]   # found
    out_ref[tile, 1:2, :] = state[6:7, :]   # t_hit


@functools.partial(jax.jit, static_argnames=("dims", "max_samples", "win_z"))
def _launch(rays_packed, origins, volume, iso255, dims, max_samples, win_z=4):
    n_tiles = rays_packed.shape[0]
    # the iso march samples positions 0..max_samples and prefetches one past,
    # so the table carries max_samples + 2 entries
    assert origins.shape == (n_tiles, max_samples + 2), origins.shape
    vol_pairs = pack_pairs(volume)
    kernel = functools.partial(_iso_kernel, dims=dims,
                               max_samples=max_samples, win_z=win_z)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles // T_PER,),
        in_specs=[
            pl.BlockSpec((T_PER, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_PER, max_samples + 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((T_PER, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, win_z, WIN_Y, dims[0]), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(rays_packed, origins, vol_pairs, iso255)
    return out[:, 0, :], out[:, 1, :]


def render_isosurface_pallas(volume, entry_uv, direction, hit,
                             iso_value=40.0 / 255.0,
                             max_samples: int = MAX_SAMPLES,
                             check_spans: bool = True):
    """Drop-in fast replacement for ``render_isosurface`` (clamp wrap only).
    March on TPU; bisection + normal + Phong shading on the hit set via jnp."""
    from ..isosurface import render_isosurface

    del check_spans  # the footprint prepass also builds the DMA window table
    Z, Y, X = volume.shape
    H, W, _ = entry_uv.shape
    dims = (X, Y, Z)
    win_z = 4
    origins = None
    unsupported = (X % 128 != 0 or Y % WIN_Y != 0 or Z < 4
                   or H % TILE_H != 0 or W % TILE_W != 0)
    if not unsupported:
        spans, mins = _footprint_scan(entry_uv, direction, hit, dims,
                                      max_samples + 1)
        span_y, span_z = int(spans[0]), int(spans[1])
        wz = choose_win_z(span_z)
        if wz is None or span_y > WIN_Y or Z < wz:
            unsupported = True
        else:
            win_z = wz
            origins = _origin_table(mins, dims, win_z)
    if unsupported:
        return render_isosurface(volume, entry_uv, direction, hit,
                                 iso_value=iso_value, max_samples=max_samples)

    rays = _pack_rays(entry_uv, direction, hit, dims)
    iso255 = jnp.full((1, 1), iso_value * 255.0, jnp.float32)
    found_t, t_hit_t = _launch(rays, origins, volume, iso255, dims,
                               max_samples, win_z=win_z)
    found = _untile(found_t, H, W) > 0.5
    t_hit = _untile(t_hit_t, H, W)

    # shading pass (isosurface.frag:129-156) on the full image, masked by hit
    step = direction * jnp.array([1.0 / X, 1.0 / Y, 1.0 / Z], jnp.float32)
    pos_near = entry_uv + (t_hit[..., None] + 1.0) * step
    pos_far = pos_near + step
    iso = jnp.float32(iso_value)
    tc = bisection_refine(volume, pos_near, pos_far, iso)
    N = gradient_normal(volume, tc)
    V = -direction
    color = jnp.clip(phong(V, N, V), 0.0, 1.0)
    white = jnp.ones(entry_uv.shape[:-1] + (3,), jnp.float32)
    rgb = jnp.where(found[..., None], color, white)
    return rgb, found
