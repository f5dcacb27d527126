"""Device-side (XLA) codec build vs the host build."""
import numpy as np

from volumerenderer_tpu.codecs import kdtree as K
from volumerenderer_tpu.codecs.device_build import build_device
from volumerenderer_tpu.io.synthetic import sphere_volume, turbulence_volume


def test_device_build_exact_seed_matches_host():
    for vol in (turbulence_volume((16, 16, 16), seed=30), sphere_volume((16, 16, 16))):
        host = K.build(vol, tolerance=2, max_epochs=2)
        dev = build_device(vol, tolerance=2, max_epochs=2, seed_mode="exact")
        np.testing.assert_array_equal(dev.distance_map, host.distance_map)
        np.testing.assert_array_equal(K.to_preorder(dev), K.to_preorder(host))
        np.testing.assert_array_equal(K.level_cut(dev), K.level_cut(host))
        assert dev.num_active_nodes == host.num_active_nodes


def test_device_build_parallel_seed_quality():
    vol = turbulence_volume((16, 16, 16), seed=31)
    host = K.build(vol, tolerance=2, max_epochs=2)
    dev = build_device(vol, tolerance=2, max_epochs=2, seed_mode="parallel")
    # the GD refinement absorbs the approximate seeding: reconstruction
    # quality must match the host build closely
    err_host = np.abs(K.level_cut(host).astype(int) - vol.astype(int)).mean()
    err_dev = np.abs(K.level_cut(dev).astype(int) - vol.astype(int)).mean()
    assert err_dev <= err_host * 1.25 + 0.5, (err_dev, err_host)
