"""Octree codec — rebuild of the reference's abandoned ``Octree`` prototype
(``Octree.cpp``/``Octree.h``; excluded from the build, no compression or
serialization was ever implemented — SURVEY.md §2).

Reference behavior replicated:

* non-cubic volumes first split BINARY along the larger axes (cycling through
  the non-minimum dims, ``Octree.cpp:34-53,98-104``) until the domain factors
  into "mini cubes", then split 8-WAY (``:106-111``) with child order
  x = bit 0, y = bit 1, z = bit 2 of the child index
  (``BoundingBox::getCorner``/``split8``, ``Octree.h:80-119``);
* every node stores the truncated AVERAGE of its box (not the midrange,
  ``Octree.cpp:79-91``) plus its parent's average.

Instead of the reference's recursive single-cell scans (O(N log N) full box
sweeps) the averages come from vectorized reshape-sum pyramids, one array per
level in grid layout.  A level-cut decode (filling each box with its node
average) completes what the prototype never finished.
"""
from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["Octree", "build", "level_cut"]


@dataclasses.dataclass
class Octree:
    dims: tuple[int, int, int]            # (X, Y, Z)
    start_depth: int                      # binary levels before 8-way splits
    depth: int                            # total levels below the root
    split_dims: list[int]                 # binary-phase axis cycle (0=x,1=y,2=z)
    # level d -> scalar grid, shape (nz, ny, nx) of per-box truncated averages
    level_scalars: list[np.ndarray]

    def node_count(self) -> int:
        return sum(s.size for s in self.level_scalars)


def build(volume: np.ndarray) -> Octree:
    volume = np.asarray(volume, dtype=np.uint8)
    Z, Y, X = volume.shape
    min_dim = min(X, Y, Z)
    if min_dim & (min_dim - 1):
        raise ValueError("octree requires power-of-two dimensions")
    split_dims = [a for a, n in ((0, X), (1, Y), (2, Z)) if n != min_dim]

    # binary levels to reach mini-cubes (Octree.cpp:48-53)
    start_depth = sum(int(np.log2(n // min_dim)) for n in (X, Y, Z))
    oct_depth = int(np.log2(min_dim))  # 8-way levels until 1-cell boxes
    depth = start_depth + oct_depth

    sums = volume.astype(np.int64)
    counts = 1
    grid = (Z, Y, X)  # boxes per axis (z, y, x) at leaf level

    levels: list[np.ndarray] = [None] * (depth + 1)
    levels[depth] = volume.copy()

    # reduce upward: 8-way levels first (all three axes halve), then binary
    for d in range(depth - 1, -1, -1):
        if d >= start_depth:
            nz, ny, nx = grid[0] // 2, grid[1] // 2, grid[2] // 2
            sums = sums.reshape(nz, 2, ny, 2, nx, 2).sum(axis=(1, 3, 5))
            counts *= 8
            grid = (nz, ny, nx)
        else:
            axis = split_dims[d % len(split_dims)] if split_dims else 0
            # axis 0=x -> array axis 2, 1=y -> 1, 2=z -> 0
            arr_axis = 2 - axis
            sh = list(grid)
            sh[arr_axis] //= 2
            new = np.empty(tuple(sh), dtype=np.int64)
            if arr_axis == 0:
                sums = sums.reshape(sh[0], 2, grid[1], grid[2]).sum(axis=1)
            elif arr_axis == 1:
                sums = sums.reshape(grid[0], sh[1], 2, grid[2]).sum(axis=2)
            else:
                sums = sums.reshape(grid[0], grid[1], sh[2], 2).sum(axis=3)
            counts *= 2
            grid = tuple(sh)
        levels[d] = (sums // counts).astype(np.uint8)

    # NOTE: the binary-phase reduction above must mirror the *top-down* split
    # order; since each split exactly halves one axis and the cycle is fixed,
    # reducing in reverse order reproduces the same boxes.
    return Octree(dims=(X, Y, Z), start_depth=start_depth, depth=depth,
                  split_dims=split_dims, level_scalars=levels)


def level_cut(tree: Octree, cut_depth: int) -> np.ndarray:
    """Fill every depth-``cut_depth`` box with its node average — the decode
    the reference prototype never implemented."""
    X, Y, Z = tree.dims
    cut_depth = min(cut_depth, tree.depth)
    s = tree.level_scalars[cut_depth]
    nz, ny, nx = s.shape
    out = np.broadcast_to(
        s[:, None, :, None, :, None],
        (nz, Z // nz, ny, Y // ny, nx, X // nx))
    return np.ascontiguousarray(out).reshape(Z, Y, X)
