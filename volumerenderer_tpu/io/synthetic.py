"""Synthetic scalar volumes for tests and benchmarks (no dataset required).

The reference renders the Richtmyer-Meshkov Instability dataset; when the raw
bricks are unavailable we generate structured uint8 volumes with comparable
statistics — a soft sphere, an axis ramp, and a multi-scale turbulence-like
field — so the full compress/decode/render pipeline can run anywhere
(BASELINE.json config 1: "Synthetic 64^3 sphere volume").
"""
from __future__ import annotations

import numpy as np

__all__ = ["sphere_volume", "ramp_volume", "turbulence_volume"]


def _grid(shape):
    Z, Y, X = shape
    z = (np.arange(Z, dtype=np.float32) + 0.5) / Z
    y = (np.arange(Y, dtype=np.float32) + 0.5) / Y
    x = (np.arange(X, dtype=np.float32) + 0.5) / X
    return np.meshgrid(z, y, x, indexing="ij")


def sphere_volume(shape=(64, 64, 64), center=(0.5, 0.5, 0.5), radius=0.35, soft=0.1) -> np.ndarray:
    """Soft-edged sphere: 255 inside, smooth falloff over ``soft``, 0 outside."""
    zz, yy, xx = _grid(shape)
    cz, cy, cx = center
    d = np.sqrt((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2)
    v = np.clip((radius + soft - d) / soft, 0.0, 1.0)
    return (v * 255.0).astype(np.uint8)


def ramp_volume(shape=(64, 64, 64), axis=2) -> np.ndarray:
    """Linear ramp 0..255 along ``axis`` (z=0, y=1, x=2 of the (Z,Y,X) array)."""
    coords = _grid(shape)
    v = coords[axis]
    return (v * 255.0).astype(np.uint8)


def turbulence_volume(shape=(64, 64, 64), seed=0, octaves=4) -> np.ndarray:
    """Multi-octave value noise, loosely matching the RM dataset's mix of smooth
    regions and sharp mixing layers (used to exercise the codec)."""
    rng = np.random.default_rng(seed)
    Z, Y, X = shape
    acc = np.zeros(shape, dtype=np.float32)
    amp = 1.0
    total = 0.0
    for o in range(octaves):
        res = max(2, min(min(shape), 2 ** (o + 2)))
        coarse = rng.random((res, res, res)).astype(np.float32)
        # trilinear upsample to full resolution
        zi = np.linspace(0, res - 1, Z, dtype=np.float32)
        yi = np.linspace(0, res - 1, Y, dtype=np.float32)
        xi = np.linspace(0, res - 1, X, dtype=np.float32)

        def lerp_axis(a, idx, axis):
            i0 = np.floor(idx).astype(np.int64)
            i1 = np.minimum(i0 + 1, a.shape[axis] - 1)
            f = (idx - i0).astype(np.float32)
            a0 = np.take(a, i0, axis=axis)
            a1 = np.take(a, i1, axis=axis)
            shape_f = [1, 1, 1]
            shape_f[axis] = -1
            f = f.reshape(shape_f)
            return a0 + (a1 - a0) * f

        up = lerp_axis(coarse, zi, 0)
        up = lerp_axis(up, yi, 1)
        up = lerp_axis(up, xi, 2)
        acc += amp * up
        total += amp
        amp *= 0.5
    acc /= total
    acc = (acc - acc.min()) / max(acc.max() - acc.min(), 1e-9)
    return (acc * 255.0).astype(np.uint8)
