"""Octree tests: vectorized pyramid vs a transliteration of the reference's
recursive box-average build (Octree.cpp:73-112)."""
import numpy as np

from volumerenderer_tpu.codecs import octree as O
from volumerenderer_tpu.io.synthetic import sphere_volume


def _reference_build(vol):
    """Recursive transliteration; returns {(depth, zmin, ymin, xmin): avg}."""
    Z, Y, X = vol.shape
    min_dim = min(X, Y, Z)
    split_dims = [a for a, n in ((0, X), (1, Y), (2, Z)) if n != min_dim]
    start_depth = sum(int(np.log2(n // min_dim)) for n in (X, Y, Z))
    out = {}

    def rec(depth, mn, mx):
        box = vol[mn[2]:mx[2], mn[1]:mx[1], mn[0]:mx[0]]
        avg = int(box.sum(dtype=np.int64) // box.size)
        out[(depth, mn[2], mn[1], mn[0])] = avg
        if box.size == 1:
            return
        if depth < start_depth:
            axis = split_dims[depth % len(split_dims)] if split_dims else 0
            mid = (mn[axis] + mx[axis]) // 2
            a, b = list(mn), list(mx)
            b[axis] = mid
            rec(depth + 1, tuple(a), tuple(b))
            a2, b2 = list(mn), list(mx)
            a2[axis] = mid
            rec(depth + 1, tuple(a2), tuple(b2))
        else:
            mid = [(mn[i] + mx[i]) // 2 for i in range(3)]
            for i in range(8):
                a = [mn[j] if not (i >> j) & 1 else mid[j] for j in range(3)]
                b = [mid[j] if not (i >> j) & 1 else mx[j] for j in range(3)]
                rec(depth + 1, tuple(a), tuple(b))

    rec(0, (0, 0, 0), (X, Y, Z))
    return out


def test_octree_matches_recursive_reference():
    rng = np.random.default_rng(4)
    vol = rng.integers(0, 256, (8, 4, 4)).astype(np.uint8)  # non-cubic
    tree = O.build(vol)
    ref = _reference_build(vol)
    # check every level's scalars against the recursive oracle
    Z, Y, X = vol.shape
    for d, scal in enumerate(tree.level_scalars):
        nz, ny, nx = scal.shape
        bz, by, bx = Z // nz, Y // ny, X // nx
        for iz in range(nz):
            for iy in range(ny):
                for ix in range(nx):
                    key = (d, iz * bz, iy * by, ix * bx)
                    assert key in ref, (d, key)
                    assert scal[iz, iy, ix] == ref[key], (d, key)


def test_octree_cubic():
    vol = sphere_volume((8, 8, 8))
    tree = O.build(vol)
    assert tree.start_depth == 0 and tree.depth == 3
    full = O.level_cut(tree, tree.depth)
    np.testing.assert_array_equal(full, vol)
    coarse = O.level_cut(tree, 1)
    assert len(np.unique(coarse)) <= 8
