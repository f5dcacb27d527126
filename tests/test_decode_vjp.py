"""Custom VJP through the compressed-tree decode (codecs/diff.py).

Pins (a) forward equality with the integer device decode at the tree's own
distance map, (b) finite-difference checks of the Δ-map and leaf-adjust
gradients, and (c) an end-to-end ``jax.grad`` of a rendered-pixel loss with
respect to the tree parameters (BASELINE north star: "the compressed-tree
decode treated as a custom VJP").
"""
import numpy as np
import jax
import jax.numpy as jnp

from volumerenderer_tpu.codecs import kdtree as K
from volumerenderer_tpu.codecs.device import level_cut_device, to_device
from volumerenderer_tpu.codecs.diff import DiffDecoder
from volumerenderer_tpu.io.synthetic import sphere_volume


def _tree(shape=(16, 16, 16), tolerance=2):
    vol = np.round(sphere_volume(shape, radius=0.35, soft=0.25) * 255
                   ).astype(np.uint8)
    return K.build(vol, tolerance=tolerance, max_epochs=2)


def test_forward_equals_device_decode():
    tree = _tree()
    dtree, spec = to_device(tree)
    dec = DiffDecoder(dtree, spec)
    ref = level_cut_device(dtree, spec).astype(jnp.float32) / 255.0
    out = dec(dec.dm0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_forward_equals_device_decode_shallow_cut():
    tree = _tree()
    dtree, spec = to_device(tree)
    cut = spec["orig_depth"] - 3
    dec = DiffDecoder(dtree, spec, cut_depth=cut)
    ref = level_cut_device(dtree, spec, cut).astype(jnp.float32) / 255.0
    np.testing.assert_array_equal(np.asarray(dec(dec.dm0)),
                                  np.asarray(ref))


def _fd_check(f, x, g, eps, idxs, rtol, atol):
    x = np.asarray(x, np.float64)
    for i in idxs:
        xp = x.copy(); xp[i] += eps
        xm = x.copy(); xm[i] -= eps
        fd = (f(jnp.asarray(xp, jnp.float32))
              - f(jnp.asarray(xm, jnp.float32))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[i], fd, rtol=rtol, atol=atol,
                                   err_msg=f"index {i}")


def test_dm_gradient_matches_fd():
    tree = _tree()
    dec = DiffDecoder(tree)
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal(
        tuple(reversed(dec.spec["dims"]))), jnp.float32)
    # offset dm off the integers so no clamp/tie sits on an FD kink
    dm = dec.dm0 + 0.37

    def loss(dm):
        return float(jnp.sum(dec(dm) * w))

    g = jax.grad(lambda d: jnp.sum(dec(d) * w))(dm)
    _fd_check(loss, dm, g, eps=1e-2,
              idxs=range(min(8, dm.shape[0])), rtol=2e-2, atol=1e-3)


def test_leaf_adjust_gradient_matches_fd():
    tree = _tree()
    dec = DiffDecoder(tree)
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.standard_normal(
        tuple(reversed(dec.spec["dims"]))), jnp.float32)
    dm = dec.dm0 + 0.37
    adj0 = rng.uniform(0.5, 1.5, dec.num_leaves).astype(np.float32)

    def loss(adj):
        return float(jnp.sum(dec(dm, adj) * w))

    g = jax.grad(lambda a: jnp.sum(dec(dm, a) * w))(jnp.asarray(adj0))
    _fd_check(loss, adj0, g, eps=1e-2,
              idxs=rng.integers(0, dec.num_leaves, 6), rtol=2e-2, atol=1e-3)


def test_grad_through_render():
    """jax.grad of a pixel loss w.r.t. (dm, leaf_adjust) through decode +
    differentiable march: finite, and dm grads match FD."""
    from volumerenderer_tpu import Camera, generate_rays
    from volumerenderer_tpu.diff.transfer import TFParams, render_tf

    tree = _tree()
    dec = DiffDecoder(tree)
    rays = generate_rays(Camera(width=32, height=32))
    params = TFParams.reference()
    target = jnp.zeros((32, 32, 3), jnp.float32)

    def loss(dm, adj):
        vol = dec(dm, adj)
        rgb, _ = render_tf(params, vol, rays.entry_uv, rays.direction,
                           rays.hit, max_samples=24)
        return jnp.mean((rgb - target) ** 2)

    dm = dec.dm0 + 0.37
    adj = dec.zero_leaf_adjust() + 0.5
    g_dm, g_adj = jax.grad(loss, argnums=(0, 1))(dm, adj)
    assert np.isfinite(np.asarray(g_dm)).all()
    assert np.isfinite(np.asarray(g_adj)).all()
    assert float(jnp.abs(g_dm).sum()) > 0

    def loss_np(dm):
        return float(loss(dm, adj))

    _fd_check(loss_np, dm, g_dm, eps=5e-2, idxs=[1, 2, 3], rtol=5e-2,
              atol=1e-5)
