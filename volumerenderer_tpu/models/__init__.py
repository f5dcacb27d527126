"""Renderer "model" registry — the reference's shader-selection-by-editing
(``main.cpp:71-75``) becomes an explicit registry of render modes.

``best_renderer()`` returns the fastest available implementation of the
flagship compositing renderer for the current backend (Pallas kernel on TPU
when available, fused-jnp otherwise); ``reference_renderer()`` always returns
the jnp path with exact reference arithmetic.
"""
from __future__ import annotations

import jax

from ..ops.raycast import render_compositing


def reference_renderer():
    return render_compositing


def best_renderer():
    backend = jax.default_backend()
    if backend == "tpu":
        try:
            from ..ops.pallas.raycast_kernel import render_compositing_pallas
            return render_compositing_pallas
        except (ImportError, NotImplementedError):
            pass
    return render_compositing


def plan_compositing(entry_uv, direction, hit, dims, max_samples: int = 300):
    """Plan-once / render-many: on TPU uses the Pallas tile-tube kernel when
    the configuration supports it, else the jnp renderer (same API)."""
    from ..ops.pallas.raycast_kernel import CompositingPlan
    return CompositingPlan(entry_uv, direction, hit, dims, max_samples)


def best_isosurface_renderer():
    """Fastest isosurface renderer for the current backend (Pallas march +
    masked shading pass on TPU; jnp elsewhere).  Same signature as
    ``ops.isosurface.render_isosurface``."""
    if jax.default_backend() == "tpu":
        try:
            from ..ops.pallas.isosurface_kernel import render_isosurface_pallas
            return render_isosurface_pallas
        except (ImportError, NotImplementedError):
            pass
    from ..ops.isosurface import render_isosurface
    return render_isosurface
