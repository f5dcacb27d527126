"""MidRangeTree tests.  Structural anchor: the mid channel of MidRangeTree is
bit-identical to the single-channel kd-tree codec (the reference's range pass
only adds a second tree and a dead-code DF guard — see midrange.py docstring)."""
import numpy as np

from volumerenderer_tpu.codecs import kdtree as K
from volumerenderer_tpu.codecs import midrange as M
from volumerenderer_tpu.io.synthetic import sphere_volume, turbulence_volume


def test_mid_channel_equals_kdtree_codec():
    vol = turbulence_volume((16, 16, 16), seed=21)
    kt = K.build(vol, tolerance=2, max_epochs=2)
    mt = M.build(vol, tolerance=2, max_epochs=2)
    np.testing.assert_array_equal(mt.mid.distance_map, kt.distance_map)
    np.testing.assert_array_equal(K.to_preorder(mt.mid), K.to_preorder(kt))
    np.testing.assert_array_equal(M.level_cut(mt), K.level_cut(kt))
    assert mt.num_active_nodes == kt.num_active_nodes


def test_range_pyramid_values():
    vol = np.random.default_rng(5).integers(0, 256, (4, 4, 4)).astype(np.uint8)
    mt = M.build(vol, tolerance=6, max_epochs=2)
    # leaf truth range is zero by definition
    assert mt.leaf_truth_range.max() == 0


def test_dual_streams_same_structure():
    vol = sphere_volume((16, 16, 16))
    mt = M.build(vol, tolerance=2, max_epochs=2)
    pre_m, pre_r = M.to_preorder_pair(mt)
    assert len(pre_m) == len(pre_r) == mt.num_active_nodes
    # 3-codes (structure) must coincide
    np.testing.assert_array_equal(pre_m == 3, pre_r == 3)


def test_range_decode_runs():
    vol = sphere_volume((16, 16, 16))
    mt = M.build(vol, tolerance=2, max_epochs=2)
    rng_vol = M.level_cut_range(mt)
    assert rng_vol.shape == vol.shape
    # decoded half-range at full depth should be small (leaf truth is 0)
    assert rng_vol.astype(int).mean() < 16


def test_save_open_roundtrip(tmp_path):
    vol = sphere_volume((8, 8, 8))
    mt = M.build(vol, tolerance=2, max_epochs=2)
    p = str(tmp_path / "mrt.bin")
    M.save(mt, p)
    raw = M.open_tree(p)
    pre_m, pre_r = M.to_preorder_pair(mt)
    assert raw["num_active_nodes"] == mt.num_active_nodes
    np.testing.assert_array_equal(raw["preorder"], pre_m)
    np.testing.assert_array_equal(raw["range_preorder"], pre_r)
    np.testing.assert_array_equal(raw["distance_map"], mt.mid.distance_map)
    np.testing.assert_array_equal(raw["range_distance_map"], mt.range_distance_map)


def test_convert_to_byte_array_matches_reference_loop():
    vol = sphere_volume((8, 8, 8))
    mt = M.build(vol, tolerance=2, max_epochs=2)
    arr = M.convert_to_byte_array(mt)
    pre_m, pre_r = M.to_preorder_pair(mt)
    n = len(pre_m)
    # transliteration of MidRangeTree.cpp:1108-1127
    nbytes = -(-n // 2)
    v = 1
    while v < nbytes:
        v <<= 1
    ref = np.zeros(v, dtype=np.uint8)
    idx = out = 0
    while idx < n:
        first = int(pre_m[idx]); second = int(pre_r[idx])
        if idx + 1 < n:
            third = int(pre_m[idx + 1]); fourth = int(pre_r[idx + 1])
        else:
            third = fourth = 0
        ref[out] = (first << 6) | (second << 4) | (third << 2) | fourth
        out += 1
        idx += 2
    np.testing.assert_array_equal(arr, ref)
    # power-of-two sizing
    assert arr.shape[0] & (arr.shape[0] - 1) == 0


def test_midrange_device_decode_and_renderer():
    from volumerenderer_tpu.codecs.device import level_cut_device
    from volumerenderer_tpu.models.compressed import CompressedRenderer
    from volumerenderer_tpu import Camera, generate_rays

    vol = sphere_volume((16, 16, 16))
    mt = M.build(vol, tolerance=2, max_epochs=2)
    mid_dev, rng_dev, spec = M.to_device_pair(mt)
    np.testing.assert_array_equal(
        np.asarray(level_cut_device(mid_dev, spec)), M.level_cut(mt))
    np.testing.assert_array_equal(
        np.asarray(level_cut_device(rng_dev, spec)), M.level_cut_range(mt))

    r = CompressedRenderer(mt)
    rays = generate_rays(Camera(width=16, height=16))
    rgb, a = r.render(rays)
    assert np.isfinite(np.asarray(rgb)).all()
