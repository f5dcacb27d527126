"""Golden regression pins: fixed scenes must keep producing the same numbers
(CPU float32; values generated on the 8-device CPU mesh).  Catches any silent
semantic drift in the renderers or the codec across rounds."""
import numpy as np
import jax.numpy as jnp

from volumerenderer_tpu import Camera, generate_rays, as_normalized_volume
from volumerenderer_tpu.ops.raycast import render_compositing
from volumerenderer_tpu.ops.isosurface import render_isosurface
from volumerenderer_tpu.codecs import kdtree as K
from volumerenderer_tpu.io.synthetic import turbulence_volume


def _scene():
    vol_u8 = turbulence_volume((32, 32, 32), seed=99)
    rays = generate_rays(Camera(width=64, height=48))
    return vol_u8, rays


def test_golden_compositing():
    vol_u8, rays = _scene()
    vol = as_normalized_volume(vol_u8)
    rgb, a = render_compositing(vol, rays.entry_uv, rays.direction, rays.hit)
    assert abs(float(jnp.sum(rgb)) - 3667.208252) < 0.02
    assert abs(float(jnp.sum(a)) - 3046.968750) < 0.02


def test_golden_isosurface():
    vol_u8, rays = _scene()
    vol = as_normalized_volume(vol_u8)
    iso, found = render_isosurface(vol, rays.entry_uv, rays.direction, rays.hit)
    assert abs(float(jnp.sum(iso)) - 9185.606445) < 0.05
    assert int(np.asarray(found).sum()) == 18


def test_golden_codec():
    vol_u8, _ = _scene()
    tree = K.build(vol_u8, tolerance=2, max_epochs=2)
    assert tree.num_active_nodes == 169047
    assert list(tree.distance_map[:6]) == [127, 7, 11, 28, 13, 20]
    pre = K.to_preorder(tree)
    crc = int(np.sum(pre.astype(np.int64) * (np.arange(len(pre)) % 97)))
    assert crc == 8336337
    assert int(K.level_cut(tree).astype(np.int64).sum()) == 4153989
