"""Differentiable ray march with a learnable transfer function.

The reference hardcodes its transfer function in the fragment shader — the
``* 0.6`` alpha factor and the final channel flips (``raycaster.frag:69-72,
82-85``).  Here those constants generalize into learnable parameters so the
renderer is differentiable end-to-end (BASELINE.json config 4: fit a transfer
function to a target image): gradients flow through trilinear sampling and the
front-to-back compositing recurrence back to the TF parameters *and* the voxel
values themselves.

``TFParams`` reproduces the reference exactly at its default values:
``alpha_scale = 0.6``, ``color_gain = 1``, ``color_bias = 0``, and the final
transfer ``out = flip_sign * c + flip_bias`` with ``flip_sign = (-1, -1, 0)``,
``flip_bias = (1, 1, 1)``.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.sampling import sample_trilinear

__all__ = ["TFParams", "render_tf", "tf_loss"]


class TFParams(NamedTuple):
    """Learnable transfer-function parameters (pytree)."""

    alpha_scale: jnp.ndarray   # scalar, reference value 0.6
    color_gain: jnp.ndarray    # scalar gain on the per-sample color
    color_bias: jnp.ndarray    # scalar bias on the per-sample color
    flip_sign: jnp.ndarray     # (3,) final-transfer slope per channel
    flip_bias: jnp.ndarray     # (3,) final-transfer intercept per channel

    @classmethod
    def reference(cls) -> "TFParams":
        return cls(
            alpha_scale=jnp.float32(0.6),
            color_gain=jnp.float32(1.0),
            color_bias=jnp.float32(0.0),
            flip_sign=jnp.array([-1.0, -1.0, 0.0], dtype=jnp.float32),
            flip_bias=jnp.array([1.0, 1.0, 1.0], dtype=jnp.float32),
        )


@partial(jax.jit, static_argnames=("max_samples", "wrap"))
def render_tf(
    params: TFParams,
    volume: jnp.ndarray,
    entry_uv: jnp.ndarray,
    direction: jnp.ndarray,
    hit: jnp.ndarray,
    max_samples: int = 300,
    wrap: str = "clamp",
):
    """Differentiable compositing march.  Returns rgb (..., 3).

    Identical control flow to :func:`volumerenderer_tpu.ops.raycast.composite_march`
    but with the TF parameters spliced in; at ``TFParams.reference()`` the output
    equals the reference pipeline bit-for-bit (same op order).
    """
    Z, Y, X = volume.shape
    step_size = jnp.array([1.0 / X, 1.0 / Y, 1.0 / Z], dtype=jnp.float32)
    dir_step = direction * step_size

    def body(state, _):
        pos, color, alpha, alive = state
        pos = pos + dir_step
        inside = jnp.all((pos > 0.0) & (pos < 1.0), axis=-1)
        alive = alive & inside
        s = sample_trilinear(volume, pos, wrap=wrap)
        sc = s * params.color_gain + params.color_bias
        prev_alpha = s - s * alpha
        color = jnp.where(alive, color + prev_alpha * sc, color)
        alpha = jnp.where(alive, alpha + prev_alpha * params.alpha_scale, alpha)
        alive = alive & (alpha <= 0.99)
        return (pos, color, alpha, alive), None

    shape = entry_uv.shape[:-1]
    init = (
        entry_uv,
        jnp.zeros(shape, dtype=jnp.float32),
        jnp.zeros(shape, dtype=jnp.float32),
        hit,
    )
    (_, color, alpha, _), _ = jax.lax.scan(body, init, None, length=max_samples)
    rgb = params.flip_sign * color[..., None] + params.flip_bias
    return rgb, alpha


def tf_loss(params, volume, entry_uv, direction, hit, target_rgb,
            max_samples: int = 300, wrap: str = "clamp"):
    """Mean-squared pixel loss against a target image."""
    rgb, _ = render_tf(params, volume, entry_uv, direction, hit, max_samples, wrap)
    return jnp.mean((rgb - target_rgb) ** 2)
