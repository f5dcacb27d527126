"""Differentiable level-cut decode — the custom VJP through the compressed
tree (BASELINE north star: "the compressed-tree decode treated as a custom
VJP"; SURVEY.md §7 "Decode"/"Differentiability").

The decode is a per-depth clamped-Δ accumulation along each leaf's root path
(the parallel-prefix redesign of the reference's sequential stack machine,
``VolumeKdTree_recover.cpp:745-835``).  Its adjoint is therefore cheap and
structured:

* w.r.t. the per-depth Δ map (``dm``): at depth d every non-frozen node whose
  code is +Δ/−Δ and whose clamp is inactive contributes ±1 — the cotangent is
  a masked segment sum over the level;
* w.r.t. the per-leaf adjustment (``leaf_adjust``, the "leaf scalars" handle
  for voxel-level fine-tuning): identity inside the final clamp;
* through the binary-tree expansion (``repeat``): the transpose is a pairwise
  segment sum toward the parent level.

The custom VJP saves only the per-level input scalars (Σ_d 2^d ≈ 2·leaves
floats) and re-derives the code/clamp masks in the backward pass from the
packed 2-bit streams — no autodiff residual graph over the unrolled level
loop.

Forward equals :func:`~volumerenderer_tpu.codecs.device.level_cut_device`
exactly when ``dm`` holds the tree's integer distance map (all arithmetic on
integral f32 values is exact) and ``leaf_adjust`` is zero.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.bitarray import unpack2
from .device import DeviceKdTree, to_device
from .kdtree import _leaf_axes_perm

__all__ = ["DiffDecoder", "decode_leaf_scalars_diff"]


def _level_step_fwd(s, frozen, codes, dmd):
    """One depth of the clamped-Δ accumulation (f32).  Mirrors
    ``device._decode_leaf_scalars.step`` with a float Δ."""
    add = (codes == 1) & ~frozen
    sub = (codes == 2) & ~frozen
    s_new = jnp.where(add, jnp.minimum(255.0, s + dmd),
                      jnp.where(sub, jnp.maximum(0.0, s - dmd), s))
    frozen_new = frozen | (codes == 3)
    return s_new, frozen_new


def _level_step_bwd(s, frozen, codes, dmd, g):
    """Adjoint of one depth: (ds, d_dmd).  The clamp derivative uses the
    open-interval subgradient (0 exactly at the bound)."""
    add = (codes == 1) & ~frozen
    sub = (codes == 2) & ~frozen
    act_add = add & (s + dmd < 255.0)
    act_sub = sub & (s - dmd > 0.0)
    passthrough = jnp.where(add, act_add, jnp.where(sub, act_sub, True))
    ds = jnp.where(passthrough, g, 0.0)
    d_dmd = jnp.sum(jnp.where(act_add, g, 0.0) - jnp.where(act_sub, g, 0.0))
    return ds, d_dmd


def _unpacked_codes(packed_levels, packed_chains, spec_key, cut_depth):
    """(level codes list up to cut, chain code columns) as int32 arrays."""
    dims, orig_depth, max_depth, schedule, chain_len = spec_key
    levels = [unpack2(packed_levels[d])[: 1 << d].astype(jnp.int32)
              for d in range(min(orig_depth, cut_depth) + 1)]
    chains = None
    if cut_depth > orig_depth:
        chains = unpack2(packed_chains).astype(jnp.int32)
    return levels, chains


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def decode_leaf_scalars_diff(spec_key, cut_depth, dm, leaf_adjust,
                             packed_levels, packed_chains):
    """Differentiable decode to flat per-leaf scalars (f32, breadth-first
    leaf order, 0..255 units).  Differentiable w.r.t. ``dm`` (f32
    (max_depth+1,)) and ``leaf_adjust`` (f32 (num_leaves,), added inside a
    final [0, 255] clamp)."""
    out, _ = _decode_fwd_res(spec_key, cut_depth, dm, leaf_adjust,
                             packed_levels, packed_chains)
    return out


def _decode_fwd_res(spec_key, cut_depth, dm, leaf_adjust, packed_levels,
                    packed_chains):
    dims, orig_depth, max_depth, schedule, chain_len = spec_key
    levels, chains = _unpacked_codes(packed_levels, packed_chains, spec_key,
                                     cut_depth)
    saved = []  # per applied depth: scalars entering the level step

    s = jnp.full((1,), dm[0], dtype=jnp.float32)
    frozen = levels[0] == 3
    for d in range(1, orig_depth + 1):
        s = jnp.repeat(s, 2)
        frozen = jnp.repeat(frozen, 2)
        if d > cut_depth:
            continue
        saved.append(s)
        s, frozen = _level_step_fwd(s, frozen, levels[d], dm[d])

    if cut_depth > orig_depth:
        for i in range(min(chain_len, cut_depth - orig_depth)):
            d = orig_depth + 1 + i
            saved.append(s)
            s, frozen = _level_step_fwd(s, frozen, chains[:, i], dm[d])

    pre_clip = s + leaf_adjust
    out = jnp.clip(pre_clip, 0.0, 255.0)
    return out, (tuple(saved), pre_clip)


def _decode_fwd(spec_key, cut_depth, dm, leaf_adjust, packed_levels,
                packed_chains):
    out, res = _decode_fwd_res(spec_key, cut_depth, dm, leaf_adjust,
                               packed_levels, packed_chains)
    return out, (res, dm, packed_levels, packed_chains)


def _decode_bwd(spec_key, cut_depth, residuals, g):
    (saved, pre_clip), dm, packed_levels, packed_chains = residuals
    dims, orig_depth, max_depth, schedule, chain_len = spec_key
    levels, chains = _unpacked_codes(packed_levels, packed_chains, spec_key,
                                     cut_depth)

    # strict subgradient at the final clip: clamped leaves get zero gradient
    # (keeps exactly-zero background at zero, so tree-metadata occupancy
    # skipping stays valid under fine-tuning)
    inside = (pre_clip > 0.0) & (pre_clip < 255.0)
    g = jnp.where(inside, g, 0.0)
    d_leaf_adjust = g
    d_dm = [jnp.float32(0.0)] * dm.shape[0]

    si = len(saved) - 1
    # frozen masks are needed per level going backward; rebuild them forward
    # once (bools are cheap) — frozen entering depth d for each applied depth
    frozen_at = []
    frozen = levels[0] == 3
    for d in range(1, orig_depth + 1):
        frozen = jnp.repeat(frozen, 2)
        if d > cut_depth:
            continue
        frozen_at.append(frozen)
        frozen = frozen | (levels[d] == 3)
    if cut_depth > orig_depth:
        for i in range(min(chain_len, cut_depth - orig_depth)):
            frozen_at.append(frozen)
            frozen = frozen | (chains[:, i] == 3)

    if cut_depth > orig_depth:
        for i in reversed(range(min(chain_len, cut_depth - orig_depth))):
            d = orig_depth + 1 + i
            g, dd = _level_step_bwd(saved[si], frozen_at[si], chains[:, i],
                                    dm[d], g)
            d_dm[d] = d_dm[d] + dd
            si -= 1

    for d in reversed(range(1, orig_depth + 1)):
        if d <= cut_depth:
            g, dd = _level_step_bwd(saved[si], frozen_at[si], levels[d],
                                    dm[d], g)
            d_dm[d] = d_dm[d] + dd
            si -= 1
        # transpose of the repeat(2) expansion: sum child pairs to the parent
        # (depths above the cut expand without a level step — pure repeat)
        g = g.reshape(-1, 2).sum(axis=1)

    d_dm[0] = d_dm[0] + jnp.sum(g)  # root scalar init: s_0 = dm[0]
    zeros_levels = tuple(
        jnp.zeros(p.shape, dtype=jax.dtypes.float0) for p in packed_levels)
    zeros_chains = jnp.zeros(packed_chains.shape, dtype=jax.dtypes.float0)
    return (jnp.stack(d_dm), d_leaf_adjust, zeros_levels, zeros_chains)


decode_leaf_scalars_diff.defvjp(_decode_fwd, _decode_bwd)


class DiffDecoder:
    """Differentiable view of a compressed tree: ``decoder(dm, leaf_adjust)``
    returns the decoded (Z, Y, X) f32 volume in [0, 1], differentiable w.r.t.
    both.  ``decoder.dm0`` is the tree's own distance map as f32 (the point
    where the decode equals :func:`level_cut_device` exactly); ``leaf_adjust``
    defaults to zeros (the identity).

    Gradients from a rendered-image loss route through here to the Δ map and
    the per-leaf scalars — compressed-domain fine-tuning without ever
    materializing gradients for a dense parameter volume.
    """

    def __init__(self, tree_or_dtree, spec: dict | None = None,
                 cut_depth: int | None = None):
        if isinstance(tree_or_dtree, DeviceKdTree):
            assert spec is not None
            self.dtree, self.spec = tree_or_dtree, spec
        else:
            self.dtree, self.spec = to_device(tree_or_dtree)
        self.cut_depth = (self.spec["max_depth"] if cut_depth is None
                          else int(cut_depth))
        self.spec_key = (tuple(self.spec["dims"]), self.spec["orig_depth"],
                         self.spec["max_depth"],
                         tuple(self.spec["schedule"]), self.spec["chain_len"])
        self.num_leaves = 1 << self.spec["orig_depth"]

    @property
    def dm0(self) -> jnp.ndarray:
        return self.dtree.distance_map.astype(jnp.float32)

    def zero_leaf_adjust(self) -> jnp.ndarray:
        return jnp.zeros((self.num_leaves,), jnp.float32)

    def __call__(self, dm: jnp.ndarray,
                 leaf_adjust: jnp.ndarray | None = None) -> jnp.ndarray:
        if leaf_adjust is None:
            leaf_adjust = self.zero_leaf_adjust()
        scalars = decode_leaf_scalars_diff(
            self.spec_key, self.cut_depth, dm, leaf_adjust,
            self.dtree.packed_levels, self.dtree.packed_chains)
        X, Y, Z = self.spec_key[0]
        perm, (nz, ny, nx) = _leaf_axes_perm(X, Y, Z,
                                             list(self.spec_key[3]))
        inv = np.argsort(perm)
        vol = scalars.reshape((2,) * (nz + ny + nx)).transpose(inv)
        return vol.reshape(Z, Y, X) / 255.0
