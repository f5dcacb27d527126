"""Device-resident compressed tree + jit level-cut decode.

The TPU-native replacement for the reference's (stubbed) in-shader compressed
traversal (``isosurface_compressed.frag:18-44``, SSBO upload paths commented at
``main.cpp:203-237``): the 2-bit code stream lives on device in packed uint8
words, and a level cut decodes with vectorized shift/mask unpacking plus a
level-by-level clamped-Δ accumulation — O(2·leaves) fused elementwise work, no
sequential stack machine (SURVEY.md §7 "Decode").

The decoded dense volume feeds the ray-march kernels directly (the compressed-
render path: decode + render both on device, HBM-to-HBM).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.bitarray import pack2_np, unpack2
from .kdtree import KdTree, NO_NODE, _leaf_axes_perm

__all__ = ["DeviceKdTree", "to_device", "level_cut_device",
           "tree_occupancy_mip8"]


class DeviceKdTree(NamedTuple):
    """Compressed tree as device arrays (pytree).  Static structure (depths,
    dims, schedule) travels alongside as aux data in ``to_device``'s closure —
    the decode jit is specialized per tree shape."""

    packed_levels: tuple  # level d -> uint8[ceil(2^d/4)] packed codes
    packed_chains: jnp.ndarray  # uint8 (num_leaves, ceil(chain_len/4))
    distance_map: jnp.ndarray   # int32 (max_depth+1,)


def to_device(tree: KdTree) -> tuple[DeviceKdTree, dict]:
    """Upload a host tree; returns (device pytree, static spec for the decoder)."""
    packed_levels = tuple(
        jnp.asarray(pack2_np(codes)) for codes in tree.level_codes
    )
    chains = tree.chain_codes
    if chains is None:
        chains = np.full((tree.num_leaves, 8), NO_NODE, dtype=np.uint8)
    # NO_NODE (255) packs to code 3 — decode treats 3 as terminal, so padding
    # with 3 is safe and lets chains pack 4 codes/byte like everything else.
    chains_p = np.where(chains == NO_NODE, 3, chains).astype(np.uint8)
    pad = (-chains_p.shape[1]) % 4
    if pad:
        chains_p = np.pad(chains_p, ((0, 0), (0, pad)), constant_values=3)
    packed_chains = jnp.asarray(_pack_rows(chains_p))
    dtree = DeviceKdTree(
        packed_levels=packed_levels,
        packed_chains=packed_chains,
        distance_map=jnp.asarray(tree.distance_map.astype(np.int32)),
    )
    spec = dict(
        dims=tree.dims, orig_depth=tree.orig_depth, max_depth=tree.max_depth,
        schedule=tuple(tree.schedule), chain_len=chains_p.shape[1],
    )
    return dtree, spec


def _pack_rows(rows: np.ndarray) -> np.ndarray:
    """Vectorized row-wise 2-bit pack."""
    n, m = rows.shape
    quads = (rows & 3).reshape(n, m // 4, 4)
    return (quads[..., 0] | (quads[..., 1] << 2) | (quads[..., 2] << 4)
            | (quads[..., 3] << 6)).astype(np.uint8)


def _decode_leaf_scalars(dtree: DeviceKdTree, spec_key, cut_depth: int):
    """Level-synchronous decode to flat per-leaf scalars (int32, breadth-
    first leaf order, length 2^orig_depth) — shared by the volume decode and
    the tree-metadata occupancy grid."""
    dims, orig_depth, max_depth, schedule, chain_len = spec_key
    dm = dtree.distance_map

    def step(scalars, frozen, codes, d):
        s = jnp.where(codes == 1, jnp.minimum(255, scalars + dm[d]),
                      jnp.where(codes == 2, jnp.maximum(0, scalars - dm[d]), scalars))
        new_scalars = jnp.where(frozen, scalars, s)
        new_frozen = frozen | (codes == 3)
        return new_scalars, new_frozen

    root_codes = unpack2(dtree.packed_levels[0])[:1].astype(jnp.int32)
    scalars = jnp.full((1,), dm[0], dtype=jnp.int32)
    frozen = root_codes == 3

    for d in range(1, orig_depth + 1):
        scalars = jnp.repeat(scalars, 2)
        frozen = jnp.repeat(frozen, 2)
        if d > cut_depth:
            continue
        codes = unpack2(dtree.packed_levels[d])[: 1 << d].astype(jnp.int32)
        scalars, frozen = step(scalars, frozen, codes, d)

    if cut_depth > orig_depth:
        chain_codes = unpack2(dtree.packed_chains).astype(jnp.int32)
        for i in range(min(chain_len, cut_depth - orig_depth)):
            d = orig_depth + 1 + i
            scalars, frozen = step(scalars, frozen, chain_codes[:, i], d)
    return scalars


@partial(jax.jit, static_argnames=("spec_key", "cut_depth"))
def _level_cut_impl(dtree: DeviceKdTree, spec_key, cut_depth: int):
    dims, orig_depth, max_depth, schedule, chain_len = spec_key
    scalars = _decode_leaf_scalars(dtree, spec_key, cut_depth)

    # leaves -> volume: inverse of the breadth-first leaf permutation
    X, Y, Z = dims
    perm, (nz, ny, nx) = _leaf_axes_perm(X, Y, Z, list(schedule))
    inv = np.argsort(perm)
    vol = scalars.astype(jnp.uint8).reshape((2,) * (nz + ny + nx)).transpose(inv)
    return vol.reshape(Z, Y, X)


@partial(jax.jit, static_argnames=("spec_key", "cut_depth"))
def _tree_mip8_impl(dtree: DeviceKdTree, spec_key, cut_depth: int):
    dims, orig_depth, max_depth, schedule, chain_len = spec_key
    X, Y, Z = dims
    sched = list(schedule)
    scalars = _decode_leaf_scalars(dtree, spec_key, cut_depth)

    # max over each axis's LAST min(3, log2(dim)) splits = the per-8³-block
    # max (the decoded cut is piecewise constant on cut-depth node boxes, so
    # this is an EXACT block max of the decoded volume — build-time min/max
    # bounds the *original* data and would be unsound for the lossy decode).
    # Those splits are non-contiguous bit positions of the leaf index (an
    # axis may exhaust early in the schedule), so reduce on the (2,)*D view.
    need = {0: min(3, int(np.log2(X))), 1: min(3, int(np.log2(Y))),
            2: min(3, int(np.log2(Z)))}
    chosen: list[int] = []
    for a in (0, 1, 2):
        occ = [i for i, sd in enumerate(sched) if sd == a]
        chosen.extend(occ[len(occ) - need[a]:])
    D = len(sched)
    m = scalars.reshape((2,) * D).max(axis=tuple(sorted(chosen)))
    m = m.reshape(-1)  # breadth-first over the reduced schedule

    reduced = [sd for i, sd in enumerate(sched) if i not in set(chosen)]
    gX, gY, gZ = X >> need[0], Y >> need[1], Z >> need[2]  # 8-block grid
    perm, (nz, ny, nx) = _leaf_axes_perm(gX, gY, gZ, reduced)
    inv = np.argsort(perm)
    g = m.reshape((2,) * (nz + ny + nx)).transpose(inv).reshape(gZ, gY, gX)
    return g.astype(jnp.float32)


def tree_occupancy_mip8(dtree: DeviceKdTree, spec: dict,
                        cut_depth: int | None = None) -> jnp.ndarray:
    """Per-8³-block maxima of the decoded level cut, computed from the
    compressed tree's own scalars — no dense (Z, Y, X) pass.  Feeds
    ``CompositingPlan.bind(mip8=...)`` / ``IsosurfacePlan.bind(mip8=...)``
    for exact empty-space skipping driven by codec metadata (the role the
    reference's stubbed compressed shader reached for,
    ``isosurface_compressed.frag:18-44``; SURVEY.md §7 "free empty-space
    skipping")."""
    if cut_depth is None:
        cut_depth = spec["max_depth"]
    spec_key = (tuple(spec["dims"]), spec["orig_depth"], spec["max_depth"],
                tuple(spec["schedule"]), spec["chain_len"])
    return _tree_mip8_impl(dtree, spec_key, int(cut_depth))


def level_cut_device(dtree: DeviceKdTree, spec: dict,
                     cut_depth: int | None = None) -> jnp.ndarray:
    """Decode a level cut on device; returns a (Z, Y, X) uint8 jnp array."""
    if cut_depth is None:
        cut_depth = spec["max_depth"]
    spec_key = (tuple(spec["dims"]), spec["orig_depth"], spec["max_depth"],
                tuple(spec["schedule"]), spec["chain_len"])
    return _level_cut_impl(dtree, spec_key, int(cut_depth))
