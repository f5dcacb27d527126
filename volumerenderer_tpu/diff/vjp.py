"""O(1)-memory custom VJP for the differentiable compositing march.

The naive reverse-mode path through ``render_tf``'s 300-step scan stores every
per-step state (≈ 300 x rays x state floats — gigabytes at 1024^2).  This
module exploits two structural facts of the reference compositing recurrence
(``raycaster.frag:69-72``):

1. sample positions are analytic (``pos_t = entry + (t+1) * dirStep``), so the
   backward pass can *resample* the volume instead of storing samples;
2. the alpha recurrence ``a' = a + k*s*(1-a) = a(1-ks) + ks`` is invertible
   (``a = (a' - ks)/(1 - ks)``) and alpha is nondecreasing, so the whole state
   trajectory reconstructs backward from the final state alone; the latched
   early-out mask is recovered from the per-ray saturation step ``t_sat``
   (alpha is monotone) and the bounds mask is camera-analytic.

Residuals saved by the forward pass: final (color, alpha) and ``t_sat`` —
O(rays), independent of step count (SURVEY.md §7 "Gradient memory").

Gradients flow to the TF parameters (reductions) and to the voxel grid
(scatter-add through the trilinear weights; O(steps) scatters — cheap for TF
fitting with ``stop_gradient`` on the volume, available exactly for voxel
optimization on small volumes).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.sampling import sample_trilinear
from .transfer import TFParams

__all__ = ["render_tf_o1"]

EARLY_OUT = 0.99


def _forward(params: TFParams, volume, entry_uv, direction, hit, max_samples):
    Z, Y, X = volume.shape
    step = direction * jnp.array([1.0 / X, 1.0 / Y, 1.0 / Z], jnp.float32)
    shape = entry_uv.shape[:-1]

    def body(t, state):
        color, alpha, alive, t_sat = state
        pos = entry_uv + (t + 1.0) * step
        inside = jnp.all((pos > 0.0) & (pos < 1.0), axis=-1)
        alive = alive & inside
        s = sample_trilinear(volume, pos)
        sc = s * params.color_gain + params.color_bias
        pa = s - s * alpha
        color = jnp.where(alive, color + pa * sc, color)
        alpha = jnp.where(alive, alpha + pa * params.alpha_scale, alpha)
        saturated = alpha > EARLY_OUT
        # record the first step whose update pushed alpha over the threshold
        t_sat = jnp.where(alive & saturated & (t_sat < 0), t.astype(jnp.int32), t_sat)
        alive = alive & ~saturated
        return color, alpha, alive, t_sat

    init = (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32),
            hit, jnp.full(shape, -1, jnp.int32))
    color, alpha, _, t_sat = jax.lax.fori_loop(
        0, max_samples, lambda t, st: body(jnp.float32(t), st), init)
    return color, alpha, t_sat


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def render_tf_o1(params: TFParams, volume, entry_uv, direction, hit,
                 max_samples: int = 300, compute_volume_grad: bool = True):
    """Differentiable march with O(1) gradient memory.  Forward output equals
    ``diff.transfer.render_tf`` exactly (same op order).  Returns (rgb, alpha).
    """
    color, alpha, _ = _forward(params, volume, entry_uv, direction, hit,
                               max_samples)
    rgb = params.flip_sign * color[..., None] + params.flip_bias
    return rgb, alpha


def _fwd(params, volume, entry_uv, direction, hit, max_samples,
         compute_volume_grad):
    color, alpha, t_sat = _forward(params, volume, entry_uv, direction, hit,
                                   max_samples)
    rgb = params.flip_sign * color[..., None] + params.flip_bias
    res = (params, volume, entry_uv, direction, hit, color, alpha, t_sat)
    return (rgb, alpha), res


def _bwd(max_samples, compute_volume_grad, res, cots):
    params, volume, entry_uv, direction, hit, color_T, alpha_T, t_sat = res
    g_rgb, g_alpha_out = cots
    Z, Y, X = volume.shape
    step = direction * jnp.array([1.0 / X, 1.0 / Y, 1.0 / Z], jnp.float32)
    k = params.alpha_scale
    G = params.color_gain
    B = params.color_bias

    # final-transfer pullback: rgb = flip_sign * c + flip_bias
    gc0 = jnp.sum(g_rgb * params.flip_sign, axis=-1)
    g_flip_sign = jnp.sum(g_rgb * color_T[..., None],
                          axis=tuple(range(g_rgb.ndim - 1)))
    g_flip_bias = jnp.sum(g_rgb, axis=tuple(range(g_rgb.ndim - 1)))

    pos0 = entry_uv + 1.0 * step
    inside0 = jnp.all((pos0 > 0.0) & (pos0 < 1.0), axis=-1)

    def sample_and_weights(pos):
        return sample_trilinear(volume, pos)

    def body(i, state):
        t = jnp.float32(max_samples - 1) - i  # reverse order
        c_next, a_next, gc, ga, gk, gG, gB, g_vol = state
        pos = entry_uv + (t + 1.0) * step
        inside = jnp.all((pos > 0.0) & (pos < 1.0), axis=-1)
        ti = t.astype(jnp.int32)
        # alive at step t: latched bounds (convexity: inside(0) & inside(t)
        # implies inside at every step between), hit, and not yet saturated
        not_sat = (t_sat < 0) | (ti <= t_sat)
        alive = hit & inside0 & inside & not_sat

        s = sample_and_weights(pos)
        sc = s * G + B
        # invert the recurrences where this step was active
        denom = 1.0 - k * s
        a_t = jnp.where(alive, (a_next - k * s) / jnp.maximum(denom, 1e-12), a_next)
        pa = s - s * a_t
        c_t = jnp.where(alive, c_next - pa * sc, c_next)

        # gradients of this step's update
        g_s = jnp.where(alive, gc * ((1.0 - a_t) * sc + pa * G)
                        + ga * k * (1.0 - a_t), 0.0)
        gG = gG + jnp.sum(jnp.where(alive, gc * pa * s, 0.0))
        gB = gB + jnp.sum(jnp.where(alive, gc * pa, 0.0))
        gk = gk + jnp.sum(jnp.where(alive, ga * pa, 0.0))
        ga = jnp.where(alive, gc * (-s * sc) + ga * denom, ga)

        # route g_s through the trilinear weights into the voxel grid
        if compute_volume_grad:
            g_vol = g_vol + _trilinear_scatter(volume.shape, pos, g_s)

        return c_t, a_t, gc, ga, gk, gG, gB, g_vol

    init = (color_T, alpha_T, gc0, g_alpha_out,
            jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
            jnp.zeros(volume.shape, jnp.float32))
    _, _, _, _, gk, gG, gB, g_vol = jax.lax.fori_loop(0, max_samples, body, init)

    g_params = TFParams(alpha_scale=gk, color_gain=gG, color_bias=gB,
                        flip_sign=g_flip_sign, flip_bias=g_flip_bias)
    return (g_params, g_vol, jnp.zeros_like(entry_uv),
            jnp.zeros_like(direction), None)


def _trilinear_scatter(vol_shape, uvw, g):
    """Adjoint of clamp-mode trilinear sampling: scatter-add ``g`` into the 8
    neighbor voxels with the interpolation weights."""
    Z, Y, X = vol_shape
    dims = jnp.array([X, Y, Z], jnp.float32)
    t = uvw * dims - 0.5
    i0f = jnp.floor(t)
    frac = t - i0f
    i0 = i0f.astype(jnp.int32)

    def cl(i, n):
        return jnp.clip(i, 0, n - 1)

    x0, y0, z0 = cl(i0[..., 0], X), cl(i0[..., 1], Y), cl(i0[..., 2], Z)
    x1, y1, z1 = cl(i0[..., 0] + 1, X), cl(i0[..., 1] + 1, Y), cl(i0[..., 2] + 1, Z)
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]

    out = jnp.zeros(vol_shape, jnp.float32)
    for (zi, wz_) in ((z0, 1.0 - fz), (z1, fz)):
        for (yi, wy_) in ((y0, 1.0 - fy), (y1, fy)):
            for (xi, wx_) in ((x0, 1.0 - fx), (x1, fx)):
                out = out.at[zi, yi, xi].add(g * wz_ * wy_ * wx_)
    return out


render_tf_o1.defvjp(_fwd, _bwd)
