"""Context-parallel (volume-sharded) ray marching.

The renderer analogue of ring attention (SURVEY.md §5 "long-context"): the
per-ray sample chain is split along the march axis by sharding the VOLUME in z
across the mesh.  The key identity: under the reference compositing recurrence
(``raycaster.frag:69-72``)

    prev_alpha = s*(1-a);  c += prev_alpha*s;  a += 0.6*prev_alpha

the transmittance ``tau = 1 - a`` evolves multiplicatively
(``tau' = tau*(1 - 0.6 s)``) and color additively (``c' = c + tau*s^2``), so a
ray SEGMENT acts on (c, tau) as the affine map ``c -> c + tau*C_seg``,
``tau -> tau*T_seg`` — segment maps COMPOSE associatively.  Each device marches
only the samples owned by its z-slab (with a one-plane halo exchanged via
``ppermute`` for trilinear continuity at interior boundaries; true volume edges
keep GL clamp semantics), producing (C_seg, T_seg) per ray, and the segments
combine in per-ray traversal order (ascending z-shards for dz > 0 rays,
descending for dz < 0).

Exactness: equals the single-device march *without* per-ray early termination
(the a > 0.99 break depends on global state a shard cannot see); the omitted
contributions carry transmittance < 0.01.  The sharded result is deterministic
and shard-count-invariant.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.raycast import ALPHA_SCALE, apply_reference_transfer

__all__ = ["render_zsharded", "make_z_mesh", "composite_segments"]


def make_z_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), axis_names=("z",))


def _sample_local(slab_ext, pos, lo, dims):
    """Trilinear sample from a z-slab with one halo plane appended; global
    clamp semantics in x/y (and at true z edges via global index clamping)."""
    X, Y, Z = dims
    S = slab_ext.shape[0] - 1  # owned planes
    tx = pos[..., 0] * X - 0.5
    ty = pos[..., 1] * Y - 0.5
    tz = pos[..., 2] * Z - 0.5
    x0f, y0f, z0f = jnp.floor(tx), jnp.floor(ty), jnp.floor(tz)
    fx, fy, fz = tx - x0f, ty - y0f, tz - z0f

    x0 = jnp.clip(x0f.astype(jnp.int32), 0, X - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, X - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, Y - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, Y - 1)
    z0g = jnp.clip(z0f.astype(jnp.int32), 0, Z - 1)
    z1g = jnp.clip(z0f.astype(jnp.int32) + 1, 0, Z - 1)

    owned = (z0g >= lo) & (z0g < lo + S)
    z0l = jnp.clip(z0g - lo, 0, S)
    z1l = jnp.clip(z1g - lo, 0, S)

    def V(zi, yi, xi):
        return slab_ext[zi, yi, xi]

    c00 = V(z0l, y0, x0) + (V(z0l, y0, x1) - V(z0l, y0, x0)) * fx
    c10 = V(z0l, y1, x0) + (V(z0l, y1, x1) - V(z0l, y1, x0)) * fx
    c01 = V(z1l, y0, x0) + (V(z1l, y0, x1) - V(z1l, y0, x0)) * fx
    c11 = V(z1l, y1, x0) + (V(z1l, y1, x1) - V(z1l, y1, x0)) * fx
    c0 = c00 + (c10 - c00) * fy
    c1 = c01 + (c11 - c01) * fy
    return c0 + (c1 - c0) * fz, owned


def _segment_march(slab_ext, entry_uv, direction, hit, lo, dims, max_samples):
    """March all steps, accumulating this shard's segment map (C_seg, T_seg)
    over the samples it owns."""
    X, Y, Z = dims
    step = direction * jnp.array([1.0 / X, 1.0 / Y, 1.0 / Z], jnp.float32)
    shape = entry_uv.shape[:-1]

    def body(t, state):
        C, T = state
        pos = entry_uv + (t + 1.0) * step
        inside = jnp.all((pos > 0.0) & (pos < 1.0), axis=-1)
        s, owned = _sample_local(slab_ext, pos, lo, dims)
        m = hit & inside & owned
        C = jnp.where(m, C + T * s * s, C)
        T = jnp.where(m, T * (1.0 - ALPHA_SCALE * s), T)
        return C, T

    init = (jnp.zeros(shape, jnp.float32), jnp.ones(shape, jnp.float32))
    C, T = jax.lax.fori_loop(
        0, max_samples, lambda t, st: body(jnp.float32(t), st), init)
    return C, T


def composite_segments(C_all, T_all, ascending):
    """Fold (N, ...) segment maps in per-ray traversal order.

    ``ascending``: (...) bool — True where the ray moves toward +z.
    Returns (color, alpha)."""
    N = C_all.shape[0]

    def body(i, state):
        c, tau = state
        fwd = i
        bwd = N - 1 - i
        Cd = jnp.where(ascending, C_all[fwd], C_all[bwd])
        Td = jnp.where(ascending, T_all[fwd], T_all[bwd])
        return c + tau * Cd, tau * Td

    c, tau = jax.lax.fori_loop(
        0, N, body, (jnp.zeros_like(C_all[0]), jnp.ones_like(T_all[0])))
    return c, 1.0 - tau


def render_zsharded(mesh: Mesh, volume, entry_uv, direction, hit,
                    max_samples: int = 300):
    """Render with the volume sharded along z over ``mesh`` axis ``'z'``.

    ``volume``: (Z, Y, X) float32 (global).  Returns (rgb, alpha) matching the
    unsharded renderer without early termination.
    """
    Z, Y, X = volume.shape
    n = mesh.shape["z"]
    assert Z % n == 0, (Z, n)
    dims = (X, Y, Z)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("z"), P(), P(), P()),
        out_specs=(P("z"), P("z")),
        check_vma=False,
    )
    def _march(slab, entry_uv, direction, hit):
        idx = jax.lax.axis_index("z")
        S = slab.shape[0]
        lo = idx * S
        # halo: receive the next shard's first plane (ring shift); the last
        # shard pads with its own last plane (global clamp at the z edge)
        if n == 1:
            halo = slab[S - 1:S]  # no neighbors — pure clamp padding
        else:
            perm = [(i, (i - 1) % n) for i in range(n)]
            halo = jax.lax.ppermute(slab[0:1], "z", perm)
            halo = jnp.where(idx == n - 1, slab[S - 1:S], halo)
        slab_ext = jnp.concatenate([slab, halo], axis=0)
        C, T = _segment_march(slab_ext, entry_uv, direction, hit, lo, dims,
                              max_samples)
        return C[None], T[None]

    C_all, T_all = _march(volume, entry_uv, direction, hit)
    ascending = direction[..., 2] >= 0
    color, alpha = composite_segments(C_all, T_all, ascending)
    return apply_reference_transfer(color, alpha), alpha
