"""Pallas TPU isosurface march — fast path for ``ops/isosurface.py``.

Same tile-tube machinery as the compositing kernel (see
``raycast_kernel.py`` and docs/PERF_NOTES.md): 128-ray tiles, per-step
double-buffered window DMAs, sublane-iota trilinear weights + lane gathers.
The kernel marches until the zero-crossing test fires
(``(s - iso) < 0 && (s2 - iso) >= 0``, ``isosurface.frag:126``) and outputs
the per-ray hit step; ``s2`` of step t is ``s`` of step t+1, so one sample per
step is computed and cached.

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
from .raycast_kernel import (BIG, TILE_H, TILE_W, WIN_Y, _pack_rays,
                             _untile, max_spans)

WIN_Z = 4  # fixed window height (this kernel is not yet span-adaptive)


def _spans_fit(entry_uv, direction, hit, dims, max_samples):
    span_y, span_z = max_spans(entry_uv, direction, hit, dims, max_samples)
    return span_z <= WIN_Z and span_y <= WIN_Y

T_PER = 8


def _iso_kernel(rays_ref, vol_ref, iso_ref, out_ref, slab, state, sem, *, dims,
                max_samples):
    for tile in range(T_PER):
        _iso_one_tile(rays_ref, vol_ref, out_ref, slab, state, sem, tile,
                      dims=dims, max_samples=max_samples,
                      iso255=iso_ref[0, 0])


def _iso_one_tile(rays_ref, vol_ref, out_ref, slab, state, sem, tile, *,
                  dims, max_samples, iso255):
    X, Y, Z = dims
    n_chunks = X // 128
    R = WIN_Z * WIN_Y
    fdims = (jnp.float32(X), jnp.float32(Y), jnp.float32(Z))

    # state rows: 0-2 pos(t), 3 s(t), 4 found, 5 alive, 6 t_hit
    def neighbors(px, py, pz):
        tx = px * fdims[0] - 0.5
        ty = py * fdims[1] - 0.5
        tz = pz * fdims[2] - 0.5
        x0f, y0f, z0f = jnp.floor(tx), jnp.floor(ty), jnp.floor(tz)
        return dict(
            x0=jnp.clip(x0f.astype(jnp.int32), 0, X - 1),
            x1=jnp.clip(x0f.astype(jnp.int32) + 1, 0, X - 1),
            y0=jnp.clip(y0f.astype(jnp.int32), 0, Y - 1),
            y1=jnp.clip(y0f.astype(jnp.int32) + 1, 0, Y - 1),
            z0=jnp.clip(z0f.astype(jnp.int32), 0, Z - 1),
            z1=jnp.clip(z0f.astype(jnp.int32) + 1, 0, Z - 1),
            fx=tx - x0f, fy=ty - y0f, fz=tz - z0f,
        )

    def origins(idx, mask):
        oz = jnp.clip(jnp.min(jnp.where(mask, idx["z0"], BIG)), 0, Z - WIN_Z)
        oy = jnp.min(jnp.where(mask, idx["y0"], BIG))
        oy = pl.multiple_of(jnp.clip((oy // 8) * 8, 0, Y - WIN_Y), 8)
        return oz, oy

    def dma(slot, oz, oy):
        return pltpu.make_async_copy(
            vol_ref.at[pl.ds(oz, WIN_Z), pl.ds(oy, WIN_Y), :],
            slab.at[slot], sem.at[slot])

    def sample(idx, slot, oz, oy):
        zl0 = jnp.broadcast_to(idx["z0"] - oz, (R, 128))
        zl1 = jnp.broadcast_to(idx["z1"] - oz, (R, 128))
        yl0 = jnp.broadcast_to(idx["y0"] - oy, (R, 128))
        yl1 = jnp.broadcast_to(idx["y1"] - oy, (R, 128))
        iota = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        iz = iota // WIN_Y
        iy = iota % WIN_Y
        fz_b = jnp.broadcast_to(idx["fz"], (R, 128))
        fy_b = jnp.broadcast_to(idx["fy"], (R, 128))
        w = ((jnp.where(iz == zl0, 1.0, 0.0) * (1.0 - fz_b)
              + jnp.where(iz == zl1, 1.0, 0.0) * fz_b)
             * (jnp.where(iy == yl0, 1.0, 0.0) * (1.0 - fy_b)
                + jnp.where(iy == yl1, 1.0, 0.0) * fy_b))
        rows = slab[slot].reshape(R, X).astype(jnp.float32)

        def gather(xi):
            xi_b = jnp.broadcast_to(xi, (R, 128))
            out = jnp.take_along_axis(rows[:, 0:128],
                                      jnp.clip(xi_b, 0, 127), axis=1)
            for c in range(1, n_chunks):
                cc = jnp.take_along_axis(rows[:, c * 128:(c + 1) * 128],
                                         jnp.clip(xi_b - c * 128, 0, 127), axis=1)
                out = jnp.where(xi_b >= c * 128, cc, out)
            return out

        fx_b = jnp.broadcast_to(idx["fx"], (R, 128))
        v = gather(idx["x0"]) * (1.0 - fx_b) + gather(idx["x1"]) * fx_b
        return jnp.sum(w * v, axis=0, keepdims=True)

    # prologue: s(pos_0) synchronously; prefetch window for pos_1
    e = [rays_ref[tile, i:i + 1, :] for i in range(3)]
    d = [rays_ref[tile, 3 + i:4 + i, :] for i in range(3)]
    hit0 = rays_ref[tile, 6:7, :] > 0.5
    p0 = [e[i] + d[i] for i in range(3)]
    in0 = ((p0[0] > 0.0) & (p0[0] < 1.0) & (p0[1] > 0.0) & (p0[1] < 1.0)
           & (p0[2] > 0.0) & (p0[2] < 1.0))
    idx0 = neighbors(*p0)
    oz0, oy0 = origins(idx0, hit0 & in0)
    cp = dma(0, oz0, oy0)
    cp.start()
    cp.wait()
    s0 = sample(idx0, 0, oz0, oy0)
    p1 = [p0[i] + d[i] for i in range(3)]
    idx1 = neighbors(*p1)
    oz1, oy1 = origins(idx1, hit0 & in0)
    dma(1, oz1, oy1).start()

    state[0:1, :] = p0[0]
    state[1:2, :] = p0[1]
    state[2:3, :] = p0[2]
    state[3:4, :] = s0
    state[4:5, :] = jnp.zeros((1, 128), jnp.float32)
    state[5:6, :] = jnp.where(hit0, 1.0, 0.0)
    state[6:7, :] = jnp.full((1, 128), -1.0, jnp.float32)

    def body(carry):
        k, _, oz_c, oy_c = carry
        oy_c = pl.multiple_of(oy_c, 8)
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
        pn2 = [pn[0] + d[0], pn[1] + d[1], pn[2] + d[2]]
        idx_n2 = neighbors(*pn2)
        ozn, oyn = origins(idx_n2, alive)
        dma(nslot, ozn, oyn).start()

        idx_n = neighbors(*pn)
        wait = dma(slot, oz_c, oy_c)
        wait.wait()
        s_n = sample(idx_n, slot, oz_c, oy_c)

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
        return k + 1, jnp.any(alive), ozn, oyn

    def cond(carry):
        k, any_alive, _, _ = carry
        return (k < max_samples) & any_alive

    k_end, _, oz_e, oy_e = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.any(hit0 & in0), oz1, oy1))
    # drain the last prefetched DMA (issued by iteration k_end-1 into slot
    # rem(k_end-1, 2) == rem(k_end+1, 2); if the loop never ran this is the
    # prologue's slot-1 prefetch)
    dma(jax.lax.rem(k_end + 1, 2), oz_e, pl.multiple_of(oy_e, 8)).wait()
    out_ref[tile, 0:1, :] = state[4:5, :]   # found
    out_ref[tile, 1:2, :] = state[6:7, :]   # t_hit


@functools.partial(jax.jit, static_argnames=("dims", "max_samples"))
def _launch(rays_packed, vol_scaled, iso255, dims, max_samples):
    n_tiles = rays_packed.shape[0]
    # bake the isovalue via closure-free capture: pass as an extra (1,1) input?
    # simplest: fold into the kernel as a traced scalar through SMEM
    kernel = functools.partial(_iso_kernel, dims=dims, max_samples=max_samples)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles // T_PER,),
        in_specs=[
            pl.BlockSpec((T_PER, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((T_PER, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, WIN_Z, WIN_Y, dims[0]), jnp.bfloat16),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(rays_packed, vol_scaled, iso255)
    return out[:, 0, :], out[:, 1, :]


def render_isosurface_pallas(volume, entry_uv, direction, hit,
                             iso_value=40.0 / 255.0,
                             max_samples: int = MAX_SAMPLES,
                             check_spans: bool = True):
    """Drop-in fast replacement for ``render_isosurface`` (clamp wrap only).
    March on TPU; bisection + normal + Phong shading on the hit set via jnp."""
    from ..isosurface import render_isosurface

    Z, Y, X = volume.shape
    H, W, _ = entry_uv.shape
    dims = (X, Y, Z)
    unsupported = (X % 128 != 0 or Y % WIN_Y != 0 or Z < WIN_Z
                   or H % TILE_H != 0 or W % TILE_W != 0)
    if not unsupported and check_spans:
        unsupported = not _spans_fit(entry_uv, direction, hit, dims, max_samples)
    if unsupported:
        return render_isosurface(volume, entry_uv, direction, hit,
                                 iso_value=iso_value, max_samples=max_samples)

    vol_bf16 = (volume * 255.0).astype(jnp.bfloat16)
    rays = _pack_rays(entry_uv, direction, hit, dims)
    iso255 = jnp.full((1, 1), iso_value * 255.0, jnp.float32)
    found_t, t_hit_t = _launch(rays, vol_bf16, iso255, dims, max_samples)
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
