"""Pallas TPU ray-march kernel — the fast path for the front-to-back
compositing renderer (exact reference semantics, ``raycaster.frag:18-86``).

Design (docs/PERF_NOTES.md "tile-tube"): the image is cut into 16x8-pixel
tiles of 128 rays (one vreg lane per ray).  Rays in a tile are coherent, so at
any step their 2x2x2 trilinear footprints fit a small axis-aligned window.
Per step the kernel:

1. computes texel coordinates and clamped neighbor indices on the VPU;
2. derives the window origin from cross-lane min-reductions and DMAs a
   (4, 16, X) f32 slab from the HBM-resident *pair volume* into VMEM (last two
   dims honor the (8, 128) tiling constraints).  The pair volume packs both x
   neighbors into one f32 word — ``pair[x] = s[x]*256 + s[clamp(x+1)]`` with
   ``s`` the 8-bit sample — so ONE lane gather per ray fetches the whole x
   footprint (integers ≤ 65535 are exact in f32; the unpack is
   floor/multiply/subtract, all exact);
3. builds the 4-tap (z, y) trilinear weights against a sublane iota over the
   64 slab rows, lane-gathers the packed x pair per ray
   (``take_along_axis`` on 128-lane chunks — the only per-lane dynamic
   addressing primitive on TPU), and reduces over rows in two stages
   (y within each z plane, then z);
4. composites with latched alive masks; a ``while_loop`` ends the tile as soon
   as every ray has exited the cube or saturated (``raycaster.frag:53,77``).

There is no XLA gather anywhere — per-element gathers run ~3 orders of
magnitude slower than Mosaic's lane gather on this hardware (measured in
docs/PERF_NOTES.md).

Restrictions (checked by the host prepass, which falls back to the jnp
renderer): X in {128, 256}; Y multiple of 16; Z >= 4; per-(tile, step) z-span
of the footprint <= 4 and y-span <= 16 within an 8-aligned window (holds for
typical cameras; violated only by extreme tile divergence).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..raycast import ALPHA_SCALE, EARLY_OUT_ALPHA, MAX_SAMPLES, apply_reference_transfer

TILE_H = 8    # pixels per tile, rows
TILE_W = 16   # pixels per tile, cols  -> 128 rays = one vreg of lanes
WIN_Z_MAX = 8   # oblique views; near-axis views compile with 4
WIN_Y = 16
BIG = 1 << 20


T_PER = 8  # tiles marched per grid program (amortizes ~50us program overhead)


def tent_sample(slab_block, px, py, pz, oz, oy, dims, win_z):
    """Trilinear sample of one pair-volume window for a 128-ray tile.

    ``slab_block`` is the (win_z, WIN_Y, X) f32 window whose origin is
    (oz, oy) in texel space; (px, py, pz) are (1, 128) positions in [0, 1]
    texture space.  Returns (1, 128) f32 samples in 0..255 units.

    (z, y) trilinear weights are exact tent functions: row i gets
    max(0, 1 - |i - c|) with the tent center interpolated between the
    CLAMPED taps (c = l0 + f*(l1 - l0)): at a volume edge l1 == l0 and the
    edge row gets weight 1 — GL clamp-to-edge exactly, with fewer VPU ops
    than the compare-select form.  All center math stays in f32 (int->float
    casts on (1, 128) slices hang the Mosaic compiler).  The x taps both
    ride in ONE packed f32 word of the pair volume (``pack_pairs``); the
    clamped-floor index + clamped fractional reproduce GL clamp-to-edge at
    both faces (pair[X-1] self-pairs by construction).
    """
    X, Y, Z = dims
    R = win_z * WIN_Y
    n_chunks = X // 128
    fX, fY, fZ = jnp.float32(X), jnp.float32(Y), jnp.float32(Z)

    tz_f = pz * fZ - 0.5
    ty_f = py * fY - 0.5
    z0f = jnp.floor(tz_f)
    y0f = jnp.floor(ty_f)
    z0c_f = jnp.clip(z0f, 0.0, float(Z - 1))
    z1c_f = jnp.clip(z0f + 1.0, 0.0, float(Z - 1))
    y0c_f = jnp.clip(y0f, 0.0, float(Y - 1))
    y1c_f = jnp.clip(y0f + 1.0, 0.0, float(Y - 1))
    oz_f = oz.astype(jnp.float32)
    oy_f = oy.astype(jnp.float32)
    cz = z0c_f - oz_f + (tz_f - z0f) * (z1c_f - z0c_f)
    cy = y0c_f - oy_f + (ty_f - y0f) * (y1c_f - y0c_f)
    cz_b = jnp.broadcast_to(cz, (R, 128))
    cy_b = jnp.broadcast_to(cy, (R, 128))
    iota = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    iz_f = (iota // WIN_Y).astype(jnp.float32)
    iy_f = (iota % WIN_Y).astype(jnp.float32)
    wz = jnp.maximum(0.0, 1.0 - jnp.abs(iz_f - cz_b))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(iy_f - cy_b))
    w = wz * wy

    tx_f = px * fX - 0.5
    x0c_f = jnp.clip(jnp.floor(tx_f), 0.0, float(X - 1))
    fx = jnp.clip(tx_f, 0.0, float(X - 1)) - x0c_f
    xi = x0c_f.astype(jnp.int32)

    rows = slab_block.reshape(R, X)
    xi_b = jnp.broadcast_to(xi, (R, 128))
    pair = jnp.take_along_axis(rows[:, 0:128], jnp.clip(xi_b, 0, 127), axis=1)
    for c in range(1, n_chunks):
        cc = jnp.take_along_axis(
            rows[:, c * 128:(c + 1) * 128],
            jnp.clip(xi_b - c * 128, 0, 127), axis=1)
        pair = jnp.where(xi_b >= c * 128, cc, pair)

    g0 = jnp.floor(pair * (1.0 / 256.0))   # exact: pair < 2^16 in f32
    g1 = pair - g0 * 256.0
    fx_b = jnp.broadcast_to(fx, (R, 128))
    v = g0 * (1.0 - fx_b) + g1 * fx_b
    return jnp.sum(w * v, axis=0, keepdims=True)


def _march_kernel(rays_ref, org_ref, vol_ref, out_ref, slab, state, sem, *,
                  dims, max_samples, win_z):
    for tile in range(T_PER):
        _march_one_tile(rays_ref, org_ref, vol_ref, out_ref, slab, state, sem,
                        tile, dims=dims, max_samples=max_samples, win_z=win_z)


def _march_one_tile(rays_ref, org_ref, vol_ref, out_ref, slab, state, sem,
                    tile, *, dims, max_samples, win_z):
    X, Y, Z = dims
    WIN_Z = win_z
    n_chunks = X // 128
    R = WIN_Z * WIN_Y

    # Vector state lives in VMEM scratch (rows: 0 px, 1 py, 2 pz, 3 color,
    # 4 alpha, 5 alive) — Mosaic cannot yield sub-tile vector carries, so the
    # while_loop carries only scalars.  The volume slab is double-buffered:
    # the DMA for step t+1 overlaps the sampling and compositing of step t.
    # Window origins come from a host-precomputed SMEM table (org_ref,
    # (T_PER, max_samples+1, 2)): the footprint prepass replays the exact
    # incremental position recurrence, so the table is bit-consistent with
    # the in-kernel ray state and the per-step cross-lane min-reductions are
    # gone from the loop.
    state[0:3, :] = rays_ref[tile, 0:3, :]
    state[3:5, :] = jnp.zeros((2, 128), jnp.float32)
    state[5:6, :] = rays_ref[tile, 6:7, :]

    fdims = (jnp.float32(X), jnp.float32(Y), jnp.float32(Z))

    def table_origin(t):
        v = org_ref[tile, t]          # packed oz*2^16 + oy (both < 2^16)
        oz = v >> 16
        oy = pl.multiple_of(v & 0xFFFF, 8)
        return oz, oy

    def start_dma(slot, oz, oy):
        cp = pltpu.make_async_copy(
            vol_ref.at[pl.ds(oz, WIN_Z), pl.ds(oy, WIN_Y), :],
            slab.at[slot], sem.at[slot])
        cp.start()

    def wait_dma(slot, oz, oy):
        pltpu.make_async_copy(
            vol_ref.at[pl.ds(oz, WIN_Z), pl.ds(oy, WIN_Y), :],
            slab.at[slot], sem.at[slot]).wait()

    # prologue: position of step 0, issue its DMA
    p0x = state[0:1, :] + rays_ref[tile, 3:4, :]
    p0y = state[1:2, :] + rays_ref[tile, 4:5, :]
    p0z = state[2:3, :] + rays_ref[tile, 5:6, :]
    inside0 = ((p0x > 0.0) & (p0x < 1.0) & (p0y > 0.0) & (p0y < 1.0)
               & (p0z > 0.0) & (p0z < 1.0))
    alive0 = (state[5:6, :] > 0.5) & inside0
    oz0, oy0 = table_origin(0)
    start_dma(0, oz0, oy0)
    state[0:1, :] = p0x
    state[1:2, :] = p0y
    state[2:3, :] = p0z
    state[5:6, :] = jnp.where(alive0, 1.0, 0.0)

    def body(carry):
        t, _ = carry
        oz_cur, oy_cur = table_origin(t)
        slot = jax.lax.rem(t, 2)
        nslot = jax.lax.rem(t + 1, 2)
        px = state[0:1, :]
        py = state[1:2, :]
        pz = state[2:3, :]
        color = state[3:4, :]
        alpha = state[4:5, :]
        alive = state[5:6, :] > 0.5

        # issue next step's DMA before touching the current slab
        pnx = px + rays_ref[tile, 3:4, :]
        pny = py + rays_ref[tile, 4:5, :]
        pnz = pz + rays_ref[tile, 5:6, :]
        inside_n = ((pnx > 0.0) & (pnx < 1.0) & (pny > 0.0) & (pny < 1.0)
                    & (pnz > 0.0) & (pnz < 1.0))
        oz_n, oy_n = table_origin(t + 1)
        start_dma(nslot, oz_n, oy_n)

        wait_dma(slot, oz_cur, oy_cur)
        smp = tent_sample(slab[slot], px, py, pz, oz_cur, oy_cur,
                          dims, win_z) * (1.0 / 255.0)

        prev_alpha = smp - smp * alpha
        color = jnp.where(alive, color + prev_alpha * smp, color)
        alpha = jnp.where(alive, alpha + prev_alpha * ALPHA_SCALE, alpha)
        alive = alive & (alpha <= EARLY_OUT_ALPHA)
        alive_next = alive & inside_n

        state[0:1, :] = pnx
        state[1:2, :] = pny
        state[2:3, :] = pnz
        state[3:4, :] = color
        state[4:5, :] = alpha
        state[5:6, :] = jnp.where(alive_next, 1.0, 0.0)
        return t + 1, jnp.any(alive_next)

    def cond(carry):
        t, any_alive = carry
        return (t < max_samples) & any_alive

    t_end, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.any(alive0)))
    # drain the last prefetched DMA so semaphores are clean for the next tile
    oz_end, oy_end = table_origin(t_end)
    wait_dma(jax.lax.rem(t_end, 2), oz_end, oy_end)
    out_ref[tile, 0:2, :] = state[3:5, :]


def pack_pairs(volume):
    """(Z, Y, X) float32 in [0, 1] -> f32 pair volume ``s[x]*256 + s[x+1]``
    (8-bit quantized samples, x+1 clamped to the edge — GL_CLAMP_TO_EDGE,
    ``VolumeReader.h:120-122``)."""
    s = jnp.round(jnp.clip(volume, 0.0, 1.0) * 255.0)
    return s * 256.0 + jnp.concatenate([s[:, :, 1:], s[:, :, -1:]], axis=2)


@functools.partial(jax.jit, static_argnames=("dims", "max_samples", "win_z"))
def _launch(rays_packed, origins, volume, dims, max_samples, win_z=4):
    n_tiles = rays_packed.shape[0]
    assert n_tiles % T_PER == 0, (n_tiles, T_PER)
    assert origins.shape == (n_tiles, max_samples + 1), origins.shape
    vol_pairs = pack_pairs(volume)
    kernel = functools.partial(_march_kernel, dims=dims, max_samples=max_samples,
                               win_z=win_z)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles // T_PER,),
        in_specs=[
            pl.BlockSpec((T_PER, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_PER, max_samples + 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((T_PER, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, win_z, WIN_Y, dims[0]), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(rays_packed, origins, vol_pairs)
    return out[:, 0, :], out[:, 1, :]


def _pack_rays(entry_uv, direction, hit, dims):
    """(H, W, 3)+(H, W) -> (tiles, 8, 128) f32: rows 0-2 entry, 3-5 dirStep,
    6 hit, 7 pad.  Ray order inside a tile: TILE_H x TILE_W pixels row-major."""
    H, W, _ = entry_uv.shape
    X, Y, Z = dims
    step = direction * jnp.array([1.0 / X, 1.0 / Y, 1.0 / Z], jnp.float32)

    def tile_lanes(a):  # (H, W) -> (tiles, 128)
        t = a.reshape(H // TILE_H, TILE_H, W // TILE_W, TILE_W)
        return t.transpose(0, 2, 1, 3).reshape(-1, TILE_H * TILE_W)

    rows = [tile_lanes(entry_uv[..., i]) for i in range(3)]
    rows += [tile_lanes(step[..., i]) for i in range(3)]
    rows.append(tile_lanes(hit.astype(jnp.float32)))
    rows.append(jnp.zeros_like(rows[0]))
    return jnp.stack(rows, axis=1)  # (tiles, 8, 128)


def _untile(a, H, W):
    t = a.reshape(H // TILE_H, W // TILE_W, TILE_H, TILE_W)
    return t.transpose(0, 2, 1, 3).reshape(H, W)


@functools.partial(jax.jit, static_argnames=("dims", "max_samples"))
def _footprint_scan(entry_uv, direction, hit, dims, max_samples=MAX_SAMPLES):
    """Footprint prepass: per-(tile, step) window mins plus global max spans.
    Pure camera math (no volume access).  Ray positions are accumulated
    incrementally (``pos += dir_step``), matching the kernel's recurrence
    bit-for-bit so the precomputed windows are exactly the ones the in-kernel
    taps address.  Returns (spans (2,) i32 [span_y_aligned, span_z],
    mins (tiles, max_samples+1, 2) i32 [y0_min, z0_min])."""
    X, Y, Z = dims
    H, W, _ = entry_uv.shape
    step = direction * jnp.array([1.0 / X, 1.0 / Y, 1.0 / Z], jnp.float32)

    def tile_lanes(a):
        t = a.reshape(H // TILE_H, TILE_H, W // TILE_W, TILE_W)
        return t.transpose(0, 2, 1, 3).reshape(-1, TILE_H * TILE_W)

    e = jnp.stack([tile_lanes(entry_uv[..., i]) for i in range(3)], -1)
    d = jnp.stack([tile_lanes(step[..., i]) for i in range(3)], -1)
    hv = tile_lanes(hit)

    fdims = jnp.array([X, Y, Z], jnp.float32)

    def scan_step(pos, _):
        pos = pos + d
        inside = jnp.all((pos > 0.0) & (pos < 1.0), axis=-1) & hv
        tex = pos * fdims - 0.5
        i0 = jnp.floor(tex).astype(jnp.int32)
        lo = jnp.clip(i0, 0, jnp.array([X - 1, Y - 1, Z - 1]))
        hi = jnp.clip(i0 + 1, 0, jnp.array([X - 1, Y - 1, Z - 1]))
        big = jnp.int32(BIG)
        mn = jnp.min(jnp.where(inside[..., None], lo, big), axis=1)
        mx = jnp.max(jnp.where(inside[..., None], hi, -big), axis=1)
        any_in = jnp.any(inside, axis=1)
        # y window must fit after 8-alignment of the origin
        span_y = jnp.where(any_in, mx[:, 1] - (mn[:, 1] // 8) * 8 + 1, 0)
        span_z = jnp.where(any_in, mx[:, 2] - mn[:, 2] + 1, 0)
        span_x = jnp.where(any_in, mx[:, 0] - mn[:, 0] + 1, 0)
        spans = jnp.stack([jnp.max(span_y), jnp.max(span_z),
                           jnp.max(span_x)])
        return pos, (spans, mn[:, 1], mn[:, 2], mn[:, 0])

    pos0 = e
    _, (spans, mn_y, mn_z, mn_x) = jax.lax.scan(scan_step, pos0, None,
                                                length=max_samples + 1)
    spans = jnp.maximum(spans[:-1].max(axis=0), 0)  # extra step excluded
    mins = jnp.stack([mn_y.T, mn_z.T, mn_x.T], axis=-1)  # (tiles, S+1, 3)
    return spans, mins


def _origin_table(mins, dims, win_z):
    """Clip/align the footprint mins into DMA window origins, packed one i32
    per (tile, step): ``oz * 2^16 + oy`` (SMEM pads the minor dim to 128
    lanes, so the table must stay 2-D and scalar-per-step)."""
    X, Y, Z = dims
    oy = jnp.clip((mins[..., 0] // 8) * 8, 0, Y - WIN_Y)
    oz = jnp.clip(mins[..., 1], 0, Z - win_z)
    return (oz * 65536 + oy).astype(jnp.int32)


MIP_SPAN_X = 17  # max per-(tile, step) x extent the occupancy bound covers


def occupancy_mip(volume):
    """(Z, Y, X) f32 in [0, 1] -> (ceil(Z/8), ceil(Y/8), ceil(X/8)) f32
    conservative footprint bound in 0..255 units: cell (i, j, k) is the max
    8-bit sample over z in [8i, 8i+16), y in [8j, 8j+16), x in [8k, 8k+24).
    One gather at (oz >> 3, oy >> 3, mn_x >> 3) bounds every tap of a
    (win_z <= 8, WIN_Y = 16, x-span <= MIP_SPAN_X) tile-step footprint.

    The empty-space-skipping role of the kd-tree's per-node midrange/extent
    metadata (the capability the reference's stubbed compressed-domain
    shader was reaching for, ``isosurface_compressed.frag:18-44``)."""
    s = jnp.round(jnp.clip(volume, 0.0, 1.0) * 255.0)
    Z, Y, X = s.shape
    pz, py, px = (-Z) % 8, (-Y) % 8, (-X) % 8
    s = jnp.pad(s, ((0, pz), (0, py), (0, px)))
    m8 = s.reshape((Z + pz) // 8, 8, (Y + py) // 8, 8,
                   (X + px) // 8, 8).max(axis=(1, 3, 5))

    def fwd_max(m, axis, reach):
        out = m
        for r in range(1, reach):
            shifted = jnp.concatenate(
                [jax.lax.slice_in_dim(m, r, m.shape[axis], axis=axis),
                 jnp.repeat(jax.lax.slice_in_dim(m, m.shape[axis] - 1,
                                                 m.shape[axis], axis=axis),
                            r, axis=axis)], axis=axis)
            out = jnp.maximum(out, shifted)
        return out

    m8 = fwd_max(m8, 0, 2)   # z: window ends before 8i+16
    m8 = fwd_max(m8, 1, 2)   # y: 8-aligned origin, 16 rows
    m8 = fwd_max(m8, 2, 3)   # x: unaligned span up to 17 fits 8k..8k+24
    return m8


@functools.partial(jax.jit, static_argnames=("dims", "win_z", "n_steps"))
def build_word_table(mins, dims, win_z, volume=None, threshold=0.0,
                     n_steps=None):
    """Pack the per-(tile, step) kernel control words (one i32, SMEM pads the
    minor dim to 128 lanes so scalars must share a word):

        bit  0       sample: the step's window may hold values > threshold
        bits 1-8     window origin oy >> 3 (always 8-aligned)
        bits 9-19    window origin oz
        bits 20-29   delta to the next sampled step (0 = no more)

    With ``volume=None`` every step is sampled (the dense path).  With a
    volume, steps whose conservative window bound (``occupancy_mip``) is
    <= ``threshold`` (0..255 units) are skipped: for compositing a skipped
    window is exactly zero so the composite is a no-op; for isosurface a
    skipped window cannot contain a crossing end (s2 >= iso needs a sample
    above the bound) — both skips are exact, not approximations."""
    X, Y, Z = dims
    oy = jnp.clip((mins[..., 0] // 8) * 8, 0, Y - WIN_Y)
    oz = jnp.clip(mins[..., 1], 0, Z - win_z)
    T, S1 = oz.shape
    if volume is None:
        sampled = jnp.ones((T, S1), bool)
    else:
        m = occupancy_mip(volume)
        ox = jnp.clip(mins[..., 2], 0, dims[0] - 1)
        wmax = m[oz >> 3, oy >> 3, ox >> 3]
        sampled = wmax > threshold
    if n_steps is not None:  # positions past the march length never sampled
        sampled = sampled & (jnp.arange(S1) < n_steps)
    idx = jnp.arange(S1, dtype=jnp.int32)
    nxt = jnp.where(sampled, idx, jnp.int32(4 * S1))
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(nxt, axis=1), axis=1), axis=1)
    after = jnp.concatenate(
        [nxt[:, 1:], jnp.full((T, 1), 4 * S1, jnp.int32)], axis=1)
    nd = jnp.where(after < S1, after - idx, 0)
    word = ((nd << 20) | (oz << 9) | ((oy >> 3) << 1)
            | sampled.astype(jnp.int32))
    return word.astype(jnp.int32)


def max_spans(entry_uv, direction, hit, dims, max_samples=MAX_SAMPLES):
    """Worst-case per-(tile, step) footprint extent (span_y after 8-alignment
    of the window origin, span_z); decides the compiled window height."""
    spans, _ = _footprint_scan(entry_uv, direction, hit, dims, max_samples)
    return int(spans[0]), int(spans[1])


def choose_win_z(span_z: int) -> int | None:
    """Smallest window height covering the footprint (None = unsupported,
    fall back to the jnp renderer).  z is the outer dim of the window DMA, so
    any height is legal — sampling cost scales with it, so exact is best."""
    if span_z > WIN_Z_MAX:
        return None
    return max(4, span_z)


def spans_ok(entry_uv, direction, hit, dims, max_samples=MAX_SAMPLES) -> bool:
    span_y, span_z = max_spans(entry_uv, direction, hit, dims, max_samples)
    return choose_win_z(span_z) is not None and span_y <= WIN_Y


def render_compositing_pallas(volume, entry_uv, direction, hit,
                              max_samples: int = MAX_SAMPLES, wrap: str = "clamp",
                              check_spans: bool = True):
    """Drop-in fast replacement for ``render_compositing`` (clamp wrap only).

    ``volume`` is (Z, Y, X) float32 in [0, 1] (8-bit quantized and pair-packed
    in-jit for
    the kernel).  Falls back to the jnp renderer when the volume shape or the
    camera's tile footprints are unsupported.
    """
    from ..raycast import render_compositing

    Z, Y, X = volume.shape
    H, W, _ = entry_uv.shape
    dims = (X, Y, Z)
    win_z = 4
    del check_spans  # the footprint prepass also builds the DMA window table
    unsupported = (
        wrap != "clamp" or X % 128 != 0 or Y % WIN_Y != 0 or Z < 4
        or H % TILE_H != 0 or W % TILE_W != 0
    )
    origins = None
    if not unsupported:
        spans, mins = _footprint_scan(entry_uv, direction, hit, dims,
                                      max_samples)
        span_y, span_z = int(spans[0]), int(spans[1])
        wz = choose_win_z(span_z)
        if wz is None or span_y > WIN_Y or Z < wz:
            unsupported = True
        else:
            win_z = wz
            origins = _origin_table(mins, dims, win_z)
    if unsupported:
        return render_compositing(volume, entry_uv, direction, hit,
                                  max_samples, wrap)

    rays = _pack_rays(entry_uv, direction, hit, dims)
    color, alpha = _launch(rays, origins, volume, dims, max_samples,
                           win_z=win_z)
    color = _untile(color, H, W)
    alpha = _untile(alpha, H, W)
    return apply_reference_transfer(color, alpha), alpha


class CompositingPlan:
    """Plan-once / render-many API: precomputes the tile packing and the span
    prepass for a fixed camera (ray bundle), so per-frame cost is just the
    kernel launch.  Falls back to the jnp renderer when the kernel cannot
    serve the configuration."""

    def __init__(self, entry_uv, direction, hit, dims, max_samples: int = MAX_SAMPLES):
        self.entry_uv = entry_uv
        self.direction = direction
        self.hit = hit
        self.dims = tuple(int(d) for d in dims)
        self.max_samples = int(max_samples)
        X, Y, Z = self.dims
        H, W, _ = entry_uv.shape
        self.shape = (H, W)
        self.win_z = None
        shapes_ok = not (
            X % 128 != 0 or Y % WIN_Y != 0 or Z < 4
            or H % TILE_H != 0 or W % TILE_W != 0
        )
        if shapes_ok:
            spans, mins = _footprint_scan(entry_uv, direction, hit, self.dims,
                                          max_samples)
            span_y, span_z = int(spans[0]), int(spans[1])
            wz = choose_win_z(span_z)
            if wz is not None and span_y <= WIN_Y and Z >= wz:
                self.win_z = wz
                self.origins = _origin_table(mins, self.dims, wz)
        self.use_kernel = self.win_z is not None
        if self.use_kernel:
            self.rays_packed = _pack_rays(entry_uv, direction, hit, self.dims)

    def render(self, volume):
        """volume: (Z, Y, X) float32 in [0, 1].  Returns (rgb, alpha)."""
        from ..raycast import render_compositing

        H, W = self.shape
        if not self.use_kernel:
            return render_compositing(volume, self.entry_uv, self.direction,
                                      self.hit, self.max_samples)
        color, alpha = _launch(self.rays_packed, self.origins, volume,
                               self.dims, self.max_samples, win_z=self.win_z)
        color = _untile(color, H, W)
        alpha = _untile(alpha, H, W)
        return apply_reference_transfer(color, alpha), alpha
