"""Segment-march Pallas kernel: the tile-tube compositing march running on a
VOLUME SHARD (z-slab or (bz, by) brick), producing per-ray affine SEGMENT
maps instead of final pixels — the kernel-speed core for the volume-sharded
layouts (``parallel/context.py``, ``parallel/bricks.py``), which previously
marched with the ~20-50x-slower jnp gather renderer inside each shard
(VERDICT round 3 missing #3).

Decomposition matched: the reference's brick grid (``main.cpp:78-79,
599-619``) tiles the volume across memory; here bricks tile the device mesh's
HBM and each device marches every ray against its brick only.  Under the
reference compositing recurrence (``raycaster.frag:69-72``) a ray segment
acts on (color, transmittance) as the affine map ``c -> c + tau*C_seg``,
``tau -> tau*T_seg`` (see ``parallel/context.py``), so per-shard kernel
outputs compose associatively in per-ray traversal order.

What differs from the dense kernel (``raycast_kernel._march_one_tile_group``):

* **Ownership masking**: a sample composites only when its trilinear anchor
  cell (clamped floor index) lies in the shard's owned box — the exact
  criterion of the jnp sharded paths, so kernel and jnp shards agree
  bit-for-bit on which samples each shard owns.
* **Per-shard word table** (``build_word_table_seg``): group windows are
  clamped into the shard's halo-extended slab (1 z plane, 8 y planes — the
  y halo is 8 rows so clamped origins stay 8-aligned), and groups whose
  footprint cannot intersect the owned box are skipped via the standard
  nd-chain — each shard marches only ~its slice of the ray.
* **No early-out**: the a > 0.99 break needs global alpha a shard cannot
  see; the jnp sharded paths omit it too, and omitted contributions carry
  transmittance < 0.01.
* **t_first output**: the minimum owned step index per ray, driving the
  traversal-ordered composition (``parallel/bricks.py
  composite_segments_ordered``).

x stays resident (never sharded in-kernel): window rows are the DMA minor
dim and the sampler's 128-lane gather panels — splitting X=256 saves no
bytes after lane padding, so the TPU-native brick decomposition shards the
two outer axes and keeps rows whole.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..raycast import ALPHA_SCALE
from .raycast_kernel import (LANE_GROUPS_MAX, T_PER, WIN_Y, _first_group,
                             _pipelined_tiles,
                             _t_per, _unpack_word, group_unions, pack_pairs,
                             tent_sample)

__all__ = ["build_word_table_seg", "launch_seg", "launch_seg_tf",
           "compose_tf_segments", "Y_HALO", "BIG_T"]

Y_HALO = 8    # y halo rows: 8 keeps clamped window origins 8-aligned
BIG_T = 1.0e9  # "never owned a sample" sentinel for t_first


def _seg_dma(vol_ref, slab, sem, zr_ref, win_z, win_y):
    """Window-DMA factory with shard rebasing: word origins are GLOBAL
    (tent weights need them); the copy source subtracts the shard's base.
    The max(0, .) keeps shape-only WAIT descriptors (origin 0) in range."""

    def dma(slot, oz, oy, xw):
        del xw
        oz_l = jnp.maximum(oz - zr_ref[0, 0], 0)
        oy_l = jnp.maximum(oy - zr_ref[0, 2], 0)
        src = vol_ref.at[pl.ds(oz_l, win_z), pl.ds(oy_l, win_y), :]
        return pltpu.make_async_copy(src, slab.at[slot], sem.at[slot])

    return dma


def _seg_kernel(rays_ref, org_ref, zr_ref, vol_ref, out_ref, slab, state,
                sem, *, dims, max_samples, win_z, k, win_y=WIN_Y,
                t_per=T_PER, G=1):
    END = -(-max_samples // k)
    dma = _seg_dma(vol_ref, slab, sem, zr_ref, win_z, win_y)
    _pipelined_tiles(
        org_ref, None, dma, END, t_per,
        lambda tile, mask: _seg_one_tile(
            rays_ref, org_ref, zr_ref, vol_ref, out_ref, slab, state, sem,
            tile, mask, dims=dims, max_samples=max_samples, win_z=win_z,
            k=k, win_y=win_y, G=G))


def _seg_one_tile(rays_ref, org_ref, zr_ref, vol_ref, out_ref, slab, state,
                  sem, tile, mask, *, dims, max_samples, win_z, k,
                  win_y=WIN_Y, G=1):
    """FIELD-MAJOR batched state (see
    ``raycast_kernel._march_one_tile_group``): field f at rows
    [f*G, (f+1)*G) — 0 px, 1 py, 2 pz, 3 C_seg, 4 alpha_seg, 5 alive,
    6 t_first.  Out rows: C_seg at [0, G), alpha_seg at [G, 2G)
    (T_seg = 1 - alpha_seg), t_first at [2G, 3G)."""
    X, Y, Z = dims
    WIN_Z = win_z
    END = -(-max_samples // k)
    z0i = jnp.int32(0)
    fY, fZ = jnp.float32(Y), jnp.float32(Z)
    zlo_f = zr_ref[0, 0].astype(jnp.float32)
    zhi_f = zr_ref[0, 1].astype(jnp.float32)
    ylo_f = zr_ref[0, 2].astype(jnp.float32)
    yhi_f = zr_ref[0, 3].astype(jnp.float32)

    e = [jnp.concatenate([rays_ref[tile, 8 * g + i:8 * g + i + 1, :]
                          for g in range(G)], axis=0) for i in range(3)]
    d = [jnp.concatenate([rays_ref[tile, 8 * g + 3 + i:8 * g + 4 + i, :]
                          for g in range(G)], axis=0) for i in range(3)]
    hit0 = jnp.concatenate([rays_ref[tile, 8 * g + 6:8 * g + 7, :]
                            for g in range(G)], axis=0)
    state[0 * G:1 * G, :] = e[0] + d[0]
    state[1 * G:2 * G, :] = e[1] + d[1]
    state[2 * G:3 * G, :] = e[2] + d[2]
    state[3 * G:5 * G, :] = jnp.zeros((2 * G, 128), jnp.float32)
    state[5 * G:6 * G, :] = hit0
    state[6 * G:7 * G, :] = jnp.full((G, 128), BIG_T, jnp.float32)

    dma = _seg_dma(vol_ref, slab, sem, zr_ref, win_z, win_y)
    pslot = 2 + jax.lax.rem(tile, 2)

    t0 = _first_group(org_ref, tile, END)
    has_win = t0 < END

    @pl.when(has_win)
    def _():
        dma(pslot, z0i, z0i, z0i).wait()

    t_first = jnp.where(has_win, t0, 0)
    pend0 = org_ref[tile, t_first]

    def advance():
        state[0 * G:1 * G, :] = state[0 * G:1 * G, :] + d[0]
        state[1 * G:2 * G, :] = state[1 * G:2 * G, :] + d[1]
        state[2 * G:3 * G, :] = state[2 * G:3 * G, :] + d[2]

    def substep(slot, oz_c, oy_c, step_idx, step_ok):
        t_f = step_idx.astype(jnp.float32)
        px = state[0 * G:1 * G, :]
        py = state[1 * G:2 * G, :]
        pz = state[2 * G:3 * G, :]
        C = state[3 * G:4 * G, :]
        alpha = state[4 * G:5 * G, :]
        tf = state[6 * G:7 * G, :]
        inside = ((px > 0.0) & (px < 1.0) & (py > 0.0) & (py < 1.0)
                  & (pz > 0.0) & (pz < 1.0))
        alive = (state[5 * G:6 * G, :] > 0.5) & inside & step_ok
        # ownership: the trilinear anchor cell lies in the shard's box
        # (the exact criterion of parallel/context.py _sample_local and
        # parallel/bricks.py _sample_local3)
        z0a = jnp.clip(jnp.floor(pz * fZ - 0.5), 0.0, fZ - 1.0)
        y0a = jnp.clip(jnp.floor(py * fY - 0.5), 0.0, fY - 1.0)
        owned = ((z0a >= zlo_f) & (z0a < zhi_f)
                 & (y0a >= ylo_f) & (y0a < yhi_f))
        comp = alive & owned
        smp = jnp.concatenate(
            [tent_sample(slab[slot], px[g:g + 1], py[g:g + 1], pz[g:g + 1],
                         oz_c, oy_c, dims, WIN_Z, win_y=win_y)
             for g in range(G)], axis=0) * (1.0 / 255.0)
        pa = smp - smp * alpha
        C = jnp.where(comp, C + pa * smp, C)
        alpha = jnp.where(comp, alpha + pa * ALPHA_SCALE, alpha)
        tf = jnp.where(comp, jnp.minimum(tf, t_f), tf)
        # NO early-out: global alpha is unknown to a shard (module doc)
        state[3 * G:4 * G, :] = C
        state[4 * G:5 * G, :] = alpha
        state[5 * G:6 * G, :] = jnp.where(alive, 1.0, 0.0)
        state[6 * G:7 * G, :] = tf
        return jnp.any(alive)

    def body(carry):
        pi, t_cur, cnt, _, pend, mask = carry
        is_first = cnt == 0
        slot_i = jax.lax.rem(cnt, 2)
        # == rem(cnt-1, 2) for cnt >= 1, non-negative so shifts are defined
        slot_s = jax.lax.rem(cnt + 1, 2)
        sslot = jnp.where(is_first, pslot, slot_s)
        w = org_ref[tile, t_cur]
        nd, _, _, _ = _unpack_word(w)
        _, oz_c, oy_c, _ = _unpack_word(pend)

        def adv_body(i):
            advance()
            return i + 1

        jax.lax.while_loop(lambda i: i < k * t_cur - pi, adv_body,
                           jnp.int32(0))

        @pl.when(~is_first)
        def _():
            dma(slot_s, z0i, z0i, z0i).wait()

        mask = jnp.where(is_first, mask, mask & ~(1 << slot_s))

        t_next = jnp.where(nd > 0, t_cur + nd, END)
        t_issue = jnp.where(nd > 0, t_cur + nd, t_cur)
        w_next = org_ref[tile, t_issue]
        _, oz_n, oy_n, _ = _unpack_word(w_next)

        @pl.when((nd > 0) & (((mask >> slot_i) & 1) == 1))
        def _():
            dma(slot_i, z0i, z0i, z0i).wait()

        @pl.when(nd > 0)
        def _():
            dma(slot_i, oz_n, oy_n, z0i).start()

        mask = jnp.where(nd > 0, mask | (1 << slot_i), mask)

        substep(sslot, oz_c, oy_c, k * t_cur, k * t_cur < max_samples)
        any_alive = jnp.bool_(True)
        for j in range(1, k):
            advance()
            any_alive = substep(sslot, oz_c, oy_c, k * t_cur + j,
                                k * t_cur + j < max_samples)
        return k * t_cur + (k - 1), t_next, cnt + 1, any_alive, w_next, mask

    def cond(carry):
        _, t_cur, _, any_alive, _, _ = carry
        return (t_cur < END) & any_alive

    any0 = jnp.any(state[5 * G:6 * G, :] > 0.5)
    end = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, jnp.int32(0), any0, pend0, mask))
    out_ref[tile, 0:2 * G, :] = state[3 * G:5 * G, :]
    out_ref[tile, 2 * G:3 * G, :] = state[6 * G:7 * G, :]
    out_ref[tile, 3 * G:8 * G, :] = jnp.zeros((5 * G, 128), jnp.float32)
    return end[5]


@functools.partial(jax.jit,
                   static_argnames=("dims", "max_samples", "win_z", "group",
                                    "win_y", "lanes"))
def launch_seg(rays_packed, words, vol_ext, zr, dims, max_samples,
               win_z=4, group=2, win_y=WIN_Y, lanes=1):
    """Launch the segment march on one shard.

    ``vol_ext``: the shard's halo-extended slab, (Sz + 1[, Sy + 8], X) f32 in
    [0, 1] (pair-packed in-jit).  ``zr``: (1, 8) i32 SMEM row
    [z_lo, z_hi, y_lo, y_hi, 0, 0, 0, 0] — the owned anchor box (global
    texel indices; y_lo/y_hi = 0/Y when y is unsharded).  ``words``: the
    per-shard table from :func:`build_word_table_seg` (GLOBAL clamped
    origins; the DMA rebases by z_lo/y_lo).

    Returns (C_seg, alpha_seg, t_first) tiled rows, each (tiles, G, 128);
    T_seg = 1 - alpha_seg."""
    n_tiles = rays_packed.shape[0]
    G = lanes
    n_words = -(-max_samples // group)
    t_per = _t_per(n_tiles)
    assert group > 1 and 1 <= G <= LANE_GROUPS_MAX, (group, G)
    assert rays_packed.shape[1] == 8 * G, rays_packed.shape
    assert words.shape == (n_tiles, n_words), (words.shape, n_words)
    assert vol_ext.shape[0] >= win_z and vol_ext.shape[1] >= win_y, \
        (vol_ext.shape, win_z, win_y)
    vol_pairs = pack_pairs(vol_ext)
    kernel = functools.partial(_seg_kernel, dims=dims,
                               max_samples=max_samples, win_z=win_z,
                               k=group, win_y=win_y, t_per=t_per, G=G)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles // t_per,),
        in_specs=[
            pl.BlockSpec((t_per, 8 * G, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_per, n_words), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((t_per, 8 * G, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8 * G, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, win_z, win_y, dims[0]), jnp.float32),
            pltpu.VMEM((8 * G, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )(rays_packed, words, zr, vol_pairs)
    return out[:, 0:G, :], out[:, G:2 * G, :], out[:, 2 * G:3 * G, :]


# ---------------------------------------------------------------------------
# Segment march WITH TF-gradient accumulators: the single-pass closed-form
# adjoint of ops/pallas/tf_kernel.py computed per VOLUME SHARD.  Every
# accumulator composes affinely across shards under the upstream
# transmittance tau_up (see compose_tf_segments), so TF-parameter gradients
# work on volumes too large for one chip's HBM — the brick-sharded
# "gradient all-reduce" of BASELINE config 5 at kernel speed.

def _seg_tf_kernel(rays_ref, org_ref, zr_ref, tf_ref, vol_ref, out_ref,
                   slab, state, sem, *, dims, max_samples, win_z, k,
                   win_y=WIN_Y, t_per=T_PER, G=1):
    END = -(-max_samples // k)
    dma = _seg_dma(vol_ref, slab, sem, zr_ref, win_z, win_y)
    _pipelined_tiles(
        org_ref, None, dma, END, t_per,
        lambda tile, mask: _seg_tf_one_tile(
            rays_ref, org_ref, zr_ref, tf_ref, vol_ref, out_ref, slab,
            state, sem, tile, mask, dims=dims, max_samples=max_samples,
            win_z=win_z, k=k, win_y=win_y, G=G))


def _seg_tf_one_tile(rays_ref, org_ref, zr_ref, tf_ref, vol_ref, out_ref,
                     slab, state, sem, tile, mask, *, dims, max_samples,
                     win_z, k, win_y=WIN_Y, G=1):
    """FIELD-MAJOR state, field f at rows [f*G, (f+1)*G): 0 px, 1 py, 2 pz,
    3 C_seg, 4 alpha_seg, 5 alive, 6 t_first, 7 R, 8 P, 9 QP, 10 SG, 11 SB
    (the five TF accumulators of ``tf_kernel``, computed with the shard's
    LOCAL alpha — composition re-scales them by tau_up).  Out rows:
    field f at [f*G, (f+1)*G) for fields (C, alpha, t_first, R, P, QP, SG,
    SB) — exactly 8 fields."""
    X, Y, Z = dims
    WIN_Z = win_z
    END = -(-max_samples // k)
    z0i = jnp.int32(0)
    fY, fZ = jnp.float32(Y), jnp.float32(Z)
    zlo_f = zr_ref[0, 0].astype(jnp.float32)
    zhi_f = zr_ref[0, 1].astype(jnp.float32)
    ylo_f = zr_ref[0, 2].astype(jnp.float32)
    yhi_f = zr_ref[0, 3].astype(jnp.float32)
    K = tf_ref[0, 0]
    Gc = tf_ref[0, 1]
    B = tf_ref[0, 2]

    e = [jnp.concatenate([rays_ref[tile, 8 * g + i:8 * g + i + 1, :]
                          for g in range(G)], axis=0) for i in range(3)]
    d = [jnp.concatenate([rays_ref[tile, 8 * g + 3 + i:8 * g + 4 + i, :]
                          for g in range(G)], axis=0) for i in range(3)]
    hit0 = jnp.concatenate([rays_ref[tile, 8 * g + 6:8 * g + 7, :]
                            for g in range(G)], axis=0)
    state[0 * G:1 * G, :] = e[0] + d[0]
    state[1 * G:2 * G, :] = e[1] + d[1]
    state[2 * G:3 * G, :] = e[2] + d[2]
    state[3 * G:5 * G, :] = jnp.zeros((2 * G, 128), jnp.float32)
    state[5 * G:6 * G, :] = hit0
    state[6 * G:7 * G, :] = jnp.full((G, 128), BIG_T, jnp.float32)
    state[7 * G:12 * G, :] = jnp.zeros((5 * G, 128), jnp.float32)

    dma = _seg_dma(vol_ref, slab, sem, zr_ref, win_z, win_y)
    pslot = 2 + jax.lax.rem(tile, 2)

    t0 = _first_group(org_ref, tile, END)
    has_win = t0 < END

    @pl.when(has_win)
    def _():
        dma(pslot, z0i, z0i, z0i).wait()

    t_first = jnp.where(has_win, t0, 0)
    pend0 = org_ref[tile, t_first]

    def advance():
        state[0 * G:1 * G, :] = state[0 * G:1 * G, :] + d[0]
        state[1 * G:2 * G, :] = state[1 * G:2 * G, :] + d[1]
        state[2 * G:3 * G, :] = state[2 * G:3 * G, :] + d[2]

    def substep(slot, oz_c, oy_c, step_idx, step_ok):
        t_f = step_idx.astype(jnp.float32)
        px = state[0 * G:1 * G, :]
        py = state[1 * G:2 * G, :]
        pz = state[2 * G:3 * G, :]
        C = state[3 * G:4 * G, :]
        alpha = state[4 * G:5 * G, :]
        tf = state[6 * G:7 * G, :]
        inside = ((px > 0.0) & (px < 1.0) & (py > 0.0) & (py < 1.0)
                  & (pz > 0.0) & (pz < 1.0))
        alive = (state[5 * G:6 * G, :] > 0.5) & inside & step_ok
        z0a = jnp.clip(jnp.floor(pz * fZ - 0.5), 0.0, fZ - 1.0)
        y0a = jnp.clip(jnp.floor(py * fY - 0.5), 0.0, fY - 1.0)
        owned = ((z0a >= zlo_f) & (z0a < zhi_f)
                 & (y0a >= ylo_f) & (y0a < yhi_f))
        comp = alive & owned
        smp = jnp.concatenate(
            [tent_sample(slab[slot], px[g:g + 1], py[g:g + 1], pz[g:g + 1],
                         oz_c, oy_c, dims, WIN_Z, win_y=win_y)
             for g in range(G)], axis=0) * (1.0 / 255.0)
        sc = smp * Gc + B
        pa = smp - smp * alpha
        r = smp / jnp.maximum(1.0 - K * smp, 1e-12)
        # prefix P BEFORE the alpha update (tf_kernel convention), QP
        # against the inclusive prefix — all with the LOCAL alpha
        P = state[8 * G:9 * G, :] + jnp.where(
            comp, smp * sc * (1.0 - alpha), 0.0)
        state[8 * G:9 * G, :] = P
        state[7 * G:8 * G, :] = state[7 * G:8 * G, :] + jnp.where(
            comp, r, 0.0)
        state[9 * G:10 * G, :] = state[9 * G:10 * G, :] + jnp.where(
            comp, r * P, 0.0)
        state[10 * G:11 * G, :] = state[10 * G:11 * G, :] + jnp.where(
            comp, pa * smp, 0.0)
        state[11 * G:12 * G, :] = state[11 * G:12 * G, :] + jnp.where(
            comp, pa, 0.0)
        C = jnp.where(comp, C + pa * sc, C)
        alpha = jnp.where(comp, alpha + pa * K, alpha)
        tf = jnp.where(comp, jnp.minimum(tf, t_f), tf)
        # NO early-out: global alpha is unknown to a shard
        state[3 * G:4 * G, :] = C
        state[4 * G:5 * G, :] = alpha
        state[5 * G:6 * G, :] = jnp.where(alive, 1.0, 0.0)
        state[6 * G:7 * G, :] = tf
        return jnp.any(alive)

    def body(carry):
        pi, t_cur, cnt, _, pend, mask = carry
        is_first = cnt == 0
        slot_i = jax.lax.rem(cnt, 2)
        # == rem(cnt-1, 2) for cnt >= 1, non-negative so shifts are defined
        slot_s = jax.lax.rem(cnt + 1, 2)
        sslot = jnp.where(is_first, pslot, slot_s)
        w = org_ref[tile, t_cur]
        nd, _, _, _ = _unpack_word(w)
        _, oz_c, oy_c, _ = _unpack_word(pend)

        def adv_body(i):
            advance()
            return i + 1

        jax.lax.while_loop(lambda i: i < k * t_cur - pi, adv_body,
                           jnp.int32(0))

        @pl.when(~is_first)
        def _():
            dma(slot_s, z0i, z0i, z0i).wait()

        mask = jnp.where(is_first, mask, mask & ~(1 << slot_s))

        t_next = jnp.where(nd > 0, t_cur + nd, END)
        t_issue = jnp.where(nd > 0, t_cur + nd, t_cur)
        w_next = org_ref[tile, t_issue]
        _, oz_n, oy_n, _ = _unpack_word(w_next)

        @pl.when((nd > 0) & (((mask >> slot_i) & 1) == 1))
        def _():
            dma(slot_i, z0i, z0i, z0i).wait()

        @pl.when(nd > 0)
        def _():
            dma(slot_i, oz_n, oy_n, z0i).start()

        mask = jnp.where(nd > 0, mask | (1 << slot_i), mask)

        substep(sslot, oz_c, oy_c, k * t_cur, k * t_cur < max_samples)
        any_alive = jnp.bool_(True)
        for j in range(1, k):
            advance()
            any_alive = substep(sslot, oz_c, oy_c, k * t_cur + j,
                                k * t_cur + j < max_samples)
        return k * t_cur + (k - 1), t_next, cnt + 1, any_alive, w_next, mask

    def cond(carry):
        _, t_cur, _, any_alive, _, _ = carry
        return (t_cur < END) & any_alive

    any0 = jnp.any(state[5 * G:6 * G, :] > 0.5)
    end = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, jnp.int32(0), any0, pend0, mask))
    # out fields: C, alpha, t_first, R, P, QP, SG, SB at [f*G, (f+1)*G)
    out_ref[tile, 0:2 * G, :] = state[3 * G:5 * G, :]
    out_ref[tile, 2 * G:3 * G, :] = state[6 * G:7 * G, :]
    out_ref[tile, 3 * G:8 * G, :] = state[7 * G:12 * G, :]
    return end[5]


@functools.partial(jax.jit,
                   static_argnames=("dims", "max_samples", "win_z", "group",
                                    "win_y", "lanes"))
def launch_seg_tf(rays_packed, words, vol_ext, zr, tf_scalars, dims,
                  max_samples, win_z=4, group=2, win_y=WIN_Y, lanes=1):
    """Segment march + per-shard TF-gradient accumulators on one shard.
    Returns the raw (tiles, 8G, 128) out array — 8 fields at [f*G, (f+1)*G):
    (C, alpha, t_first, R, P, QP, SG, SB)."""
    n_tiles = rays_packed.shape[0]
    G = lanes
    n_words = -(-max_samples // group)
    t_per = _t_per(n_tiles)
    assert group > 1 and 1 <= G <= LANE_GROUPS_MAX, (group, G)
    assert rays_packed.shape[1] == 8 * G, rays_packed.shape
    assert words.shape == (n_tiles, n_words), (words.shape, n_words)
    vol_pairs = pack_pairs(vol_ext)
    kernel = functools.partial(_seg_tf_kernel, dims=dims,
                               max_samples=max_samples, win_z=win_z,
                               k=group, win_y=win_y, t_per=t_per, G=G)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles // t_per,),
        in_specs=[
            pl.BlockSpec((t_per, 8 * G, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_per, n_words), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((t_per, 8 * G, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8 * G, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, win_z, win_y, dims[0]), jnp.float32),
            pltpu.VMEM((16 * G, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )(rays_packed, words, zr, tf_scalars, vol_pairs)


def compose_tf_segments(C_all, A_all, tf_all, R_all, P_all, QP_all, SG_all,
                        SB_all):
    """Fold (N, ...) per-shard TF-accumulator segments in per-ray traversal
    order (ascending t_first; never-sampled segments are identity maps).

    Under the compositing recurrence, with tau_up the product of upstream
    shard transmittances and P_up the upstream global color prefix:

        C_glob   += tau_up * C_seg            (color = the prefix P itself)
        R_glob   += R_seg                     (r = s/(1-K*s): alpha-free)
        QP_glob  += R_seg * P_up + tau_up * QP_seg
        SG/SB    += tau_up * (SG/SB)_seg      (pa = s*(1-a) scales by tau)
        P_up     += tau_up * P_seg_tot
        tau_up   *= 1 - alpha_seg

    (P_t^glob = P_up + tau_up * P_t^loc termwise, so the inclusive-prefix
    QP picks up the R_seg*P_up cross term.)  Returns the GLOBAL
    (color_T, alpha_T, R, P_tot, QP, SG, SB) — exactly the partials
    ``tf_kernel.render_tf_grads_pallas`` produces on an unsharded volume."""
    order = jnp.argsort(tf_all, axis=0)

    def take(a):
        return jnp.take_along_axis(a, order, axis=0)

    Cs, As, Rs = take(C_all), take(A_all), take(R_all)
    Ps, QPs, SGs, SBs = take(P_all), take(QP_all), take(SG_all), take(SB_all)
    N = C_all.shape[0]
    z = jnp.zeros_like(C_all[0])

    def body(i, st):
        c, tau, P_up, R, QP, SG, SB = st
        c = c + tau * Cs[i]
        QP = QP + Rs[i] * P_up + tau * QPs[i]
        R = R + Rs[i]
        SG = SG + tau * SGs[i]
        SB = SB + tau * SBs[i]
        P_up = P_up + tau * Ps[i]
        tau = tau * (1.0 - As[i])
        return c, tau, P_up, R, QP, SG, SB

    c, tau, P_tot, R, QP, SG, SB = jax.lax.fori_loop(
        0, N, body, (z, jnp.ones_like(z), z, z, z, z, z))
    return c, 1.0 - tau, R, P_tot, QP, SG, SB


def build_word_table_seg(mins, maxs, dims, win_z, max_samples, *, k,
                         win_y, z_lo, n_z, ext_z, y_lo=None, n_y=None,
                         ext_y=None):
    """Per-shard group control words (same packing as
    ``raycast_kernel.build_word_table_group``) with traced shard bounds:

    * groups whose per-step footprints cannot intersect the owned anchor box
      ([z_lo, z_lo + n_z) x [y_lo, y_lo + n_y)) are skipped via the nd chain
      — conservative (footprint mins/maxs bracket the anchors), so every
      owned sample is still marched and masking stays exact;
    * window origins are clamped into the shard's halo-extended slab
      ([z_lo, z_lo + ext_z) rows, [y_lo, y_lo + ext_y) y rows): every owned
      anchor's taps (z0, z0+1 <= z_lo + n_z; y0, y0+1 <= y_lo + n_y) lie in
      the ext box, so a clamped window still covers them (``ext_z >= win_z``
      required; y clamps stay 8-aligned because the y halo is 8 rows).

    ``z_lo``/``y_lo`` may be traced (computed from ``axis_index`` inside
    ``shard_map``).  With ``y_lo=None`` y is unsharded (full rows)."""
    X, Y, Z = dims
    P = -(-max_samples // k)
    pmn, _, _ = group_unions(mins, maxs, max_samples, k=k)
    oz = z_lo + jnp.clip(pmn[..., 1] - z_lo, 0, ext_z - win_z)
    if y_lo is None:
        oy = jnp.clip((pmn[..., 0] // 8) * 8, 0, Y - win_y)
    else:
        oy = y_lo + jnp.clip(((pmn[..., 0] - y_lo) // 8) * 8, 0,
                             ext_y - win_y)
    T = oz.shape[0]
    ok = (mins[..., 1] < z_lo + n_z) & (maxs[..., 1] >= z_lo)
    if y_lo is not None:
        ok = ok & (mins[..., 0] < y_lo + n_y) & (maxs[..., 0] >= y_lo)
    ok = ok[:, :max_samples]
    if k * P > max_samples:
        ok = jnp.concatenate(
            [ok, jnp.zeros((T, k * P - max_samples), bool)], axis=1)
    sampled = ok.reshape(T, P, k).any(axis=2)
    idx = jnp.arange(P, dtype=jnp.int32)
    nxt = jnp.where(sampled, idx, jnp.int32(4 * P + 4))
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(nxt, axis=1), axis=1), axis=1)
    after = jnp.concatenate(
        [nxt[:, 1:], jnp.full((T, 1), 4 * P + 4, jnp.int32)], axis=1)
    nd = jnp.where(after < P, after - idx, 0)
    word = ((nd << 20) | (oz << 9) | ((oy >> 3) << 1)
            | sampled.astype(jnp.int32))
    return word.astype(jnp.int32)
