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


T_PER = 64  # max tiles marched per grid program.  Program entry/exit costs
# ~12 us on this chip (measured: a 1024² frame whose word table skips every
# window still took 12.6 ms at 8 tiles/program — docs/PERF_NOTES.md round-3
# roofline), so the tile loop is a fori_loop (O(1) code size) and each
# program serves many tiles.


def _t_per(n_tiles: int) -> int:
    """Largest divisor of ``n_tiles`` that is <= T_PER (grid programs must
    tile the ray array exactly; small test images get small programs)."""
    t = min(T_PER, n_tiles)
    while n_tiles % t:
        t -= 1
    return t


def tent_sample(slab_block, px, py, pz, oz, oy, dims, win_z, xeff=0,
                fmt="f32pair", win_y=WIN_Y, return_parts=False):
    """Trilinear sample of one pair-volume window for a 128-ray tile.

    ``slab_block`` is the (win_z, WIN_Y, ·) window whose origin is
    (oz, oy) in texel space; (px, py, pz) are (1, 128) positions in [0, 1]
    texture space.  Returns (1, 128) f32 samples in 0..255 units.

    (z, y) trilinear weights are exact tent functions: row i gets
    max(0, 1 - |i - c|) with the tent center interpolated between the
    CLAMPED taps (c = l0 + f*(l1 - l0)): at a volume edge l1 == l0 and the
    edge row gets weight 1 — GL clamp-to-edge exactly, with fewer VPU ops
    than the compare-select form.  All center math stays in f32 (int->float
    casts on (1, 128) slices hang the Mosaic compiler).  The x taps both
    ride in ONE packed word:

    * ``fmt="f32pair"``: f32 rows of the pair volume (``pack_pairs``),
      one lane per x — gather lane ``xi``;
    * ``fmt="i32half"``: i32 rows packing TWO pair16 values per word
      (``pack_pairs16``), half the lanes/bytes — gather lane ``xi >> 1``,
      select the half by ``xi & 1``, unpack to the same exact f32 pair.

    The clamped-floor index + clamped fractional reproduce GL clamp-to-edge
    at both faces (pair[X-1] self-pairs by construction).
    """
    X, Y, Z = dims
    R = win_z * win_y
    width = slab_block.shape[-1]  # X, X//2 (i32half) or 128 (narrow-x
    n_chunks = width // 128       # window, volume x of column 0 = ``xeff``)
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
    iz_f = (iota // win_y).astype(jnp.float32)
    iy_f = (iota % win_y).astype(jnp.float32)
    wz = jnp.maximum(0.0, 1.0 - jnp.abs(iz_f - cz_b))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(iy_f - cy_b))
    w = wz * wy

    tx_f = px * fX - 0.5
    x0c_f = jnp.clip(jnp.floor(tx_f), 0.0, float(X - 1))
    fx = jnp.clip(tx_f, 0.0, float(X - 1)) - x0c_f
    xi = x0c_f.astype(jnp.int32)

    rows = slab_block.reshape(R, width)
    xi_b = jnp.broadcast_to(xi - xeff, (R, 128))
    if fmt == "i32half":
        # gather in f32 lanes (bitcast, not convert): the Mosaic lane gather
        # is fast for f32 rows; i32 take_along_axis lowers much slower
        rows_f = jax.lax.bitcast_convert_type(rows, jnp.float32)
        xw = xi_b >> 1
        word_f = jnp.take_along_axis(rows_f[:, 0:128], jnp.clip(xw, 0, 127),
                                     axis=1)
        for c in range(1, n_chunks):
            cc = jnp.take_along_axis(
                rows_f[:, c * 128:(c + 1) * 128],
                jnp.clip(xw - c * 128, 0, 127), axis=1)
            word_f = jnp.where(xw >= c * 128, cc, word_f)
        word = jax.lax.bitcast_convert_type(word_f, jnp.int32)
        p16 = jnp.where((xi_b & 1) == 1, word >> 16, word) & 0xFFFF
        # exact int->float without a convert op: for 0 <= v < 2^23 the f32
        # with bits (0x4B000000 | v) equals 2^23 + v
        pair = jax.lax.bitcast_convert_type(
            p16 | jnp.int32(0x4B000000), jnp.float32) - jnp.float32(8388608.0)
    else:
        pair = jnp.take_along_axis(rows[:, 0:128], jnp.clip(xi_b, 0, 127),
                                   axis=1)
        for c in range(1, n_chunks):
            cc = jnp.take_along_axis(
                rows[:, c * 128:(c + 1) * 128],
                jnp.clip(xi_b - c * 128, 0, 127), axis=1)
            pair = jnp.where(xi_b >= c * 128, cc, pair)

    g0 = jnp.floor(pair * (1.0 / 256.0))   # exact: pair < 2^16 in f32
    g1 = pair - g0 * 256.0
    fx_b = jnp.broadcast_to(fx, (R, 128))
    v = g0 * (1.0 - fx_b) + g1 * fx_b
    out = jnp.sum(w * v, axis=0, keepdims=True)
    if return_parts:
        # (w, xi, fx): everything the scatter ADJOINT needs — row weights,
        # per-lane anchor x index (volume coords), x fraction
        return out, (w, xi, fx)
    return out


def _tile_loop(body, t_per):
    """Run ``body(tile)`` for the ``t_per`` tiles of one grid program as a
    ``fori_loop`` with a *traced* tile index (all tile addressing is on
    leading ref dims, which support dynamic starts) — O(1) code size, so
    t_per can be large enough to amortize the per-program entry cost."""
    def one(tile, carry):
        body(tile)
        return carry

    jax.lax.fori_loop(0, t_per, one, jnp.int32(0))


def _march_kernel(rays_ref, org_ref, vol_ref, out_ref, slab, state, sem, *,
                  dims, max_samples, win_z, group=1, win_y=WIN_Y, t_per=T_PER,
                  G=1):
    if group == 1:
        assert G == 1, "per-step kernel supports a single lane group"
        _tile_loop(lambda tile: _march_one_tile(
            rays_ref, org_ref, vol_ref, out_ref, slab, state, sem, tile,
            dims=dims, max_samples=max_samples, win_z=win_z, win_y=win_y),
            t_per)
    else:
        _march_tiles_group(
            rays_ref, org_ref, None, None, vol_ref, out_ref, slab, state, sem,
            dims=dims, max_samples=max_samples, win_z=win_z, k=group,
            win_y=win_y, t_per=t_per, G=G)


def _march_kernel_narrow(rays_ref, org_ref, xorg_ref, vol_ref, out_ref, slab,
                         state, sem, *, dims, max_samples, win_z, group=2,
                         win_y=WIN_Y, t_per=T_PER, G=1):
    _march_tiles_group(
        rays_ref, org_ref, xorg_ref, None, vol_ref, out_ref, slab, state, sem,
        dims=dims, max_samples=max_samples, win_z=win_z, k=group,
        win_y=win_y, t_per=t_per, G=G)



def _march_kernel_pooled(rays_ref, org_ref, map_ref, vol_ref, out_ref, slab,
                         state, sem, *, dims, max_samples, win_z, group=2,
                         win_y=WIN_Y, t_per=T_PER, G=1):
    _march_tiles_group(
        rays_ref, org_ref, None, map_ref, vol_ref, out_ref, slab, state, sem,
        dims=dims, max_samples=max_samples, win_z=win_z, fmt="i32half",
        k=group, win_y=win_y, t_per=t_per, G=G)


def _march_kernel_pooled_narrow(rays_ref, org_ref, xorg_ref, map_ref, vol_ref,
                                out_ref, slab, state, sem, *, dims,
                                max_samples, win_z, group=2, win_y=WIN_Y,
                                t_per=T_PER, G=1):
    """Narrow slab-pool march: the f32 pair tent path of the dense narrow
    kernel (no i32half unpack) with windows sourced from the sparse
    chunk-major slab pool (``build_slab_pool_narrow``)."""
    _march_tiles_group(
        rays_ref, org_ref, xorg_ref, map_ref, vol_ref, out_ref, slab, state,
        sem, dims=dims, max_samples=max_samples, win_z=win_z, fmt="f32pair",
        k=group, win_y=win_y, t_per=t_per, G=G)


def _window_dma(vol_ref, slab, sem, map_ref, narrow, win_z, win_y):
    """Window-DMA descriptor factory shared by the group kernels: one
    static-shape async copy per (slot, origin).  The same factory builds
    shape-only descriptors (origin 0) for WAITS — a TPU DMA wait blocks on
    the slot's semaphore for the copy's byte count, which depends only on the
    static window shape, so the waiting descriptor's origin is irrelevant."""
    pooled = map_ref is not None

    def dma(slot, oz, oy, xw):
        if pooled and narrow:
            # narrow slab pool (build_slab_pool_narrow): chunk-major
            # (nchunks, slots*SLAB_H, Y, 128) f32 — the xword picks the
            # 128-lane panel exactly as in the dense narrow layout, the
            # slab map picks the resident z-slot
            ms = map_ref[0, oz >> 3]
            src = vol_ref.at[xw >> 16, pl.ds(ms * SLAB_H + (oz & 7), win_z),
                             pl.ds(oy, win_y), :]
        elif pooled:
            # 3D flattened pool: slot rows at [16*slot, 16*slot + SLAB_H)
            ms = map_ref[0, oz >> 3]
            src = vol_ref.at[pl.ds(ms * SLAB_H + (oz & 7), win_z),
                             pl.ds(oy, win_y), :]
        elif narrow:
            src = vol_ref.at[xw >> 16, pl.ds(oz, win_z), pl.ds(oy, win_y), :]
        else:
            src = vol_ref.at[pl.ds(oz, win_z), pl.ds(oy, win_y), :]
        return pltpu.make_async_copy(src, slab.at[slot], sem.at[slot])

    return dma


def _first_group(org_ref, tile, END):
    """Index of a tile's first sampled group (END = tile has none)."""
    w0 = org_ref[tile, 0]
    nd0, _, _, s0bit = _unpack_word(w0)
    return jnp.where(s0bit == 1, 0, jnp.where(nd0 > 0, nd0, END))


def _pipelined_tiles(org_ref, xorg_ref, dma, END, t_per, tile_fn, n_ring=2):
    """Run ``tile_fn(tile, mask) -> mask`` for all ``t_per`` tiles of one grid
    program with a CROSS-TILE DMA pipeline.  Why: the headline config
    early-outs after ~2-3 windows/tile, so a self-contained per-tile pipeline
    pays ~2 exposed DMA latencies per tile (first-window wait + final drain)
    — measured 9.7 ms of a 19.8 ms 1024² frame with an all-skipped word
    table (docs/PERF_NOTES.md round-3 roofline).  Instead:

    * slab slots [0, n_ring) are the in-tile ring (2 = double buffer with
      issue-one-ahead; 3 = issue-TWO-ahead, hiding the full ~1.5 µs DMA
      latency behind two windows of compute — the round-4 roofline's
      ~850 ns/window residual); slots n_ring/n_ring+1 (by tile parity) hold
      FIRST windows, prefetched one tile ahead so their copy lands while
      the previous tile marches;
    * nothing is drained at tile end — in-flight ring DMAs are recorded in a
      pending bitmask carried across tiles (``mask``), waited right before
      their slot is reused (or at program end), so the latency hides behind
      the next tile's work.
    """
    z0 = jnp.int32(0)
    narrow = xorg_ref is not None

    def prefetch_first(tile):
        """Issue tile's first-window DMA into its parity P slot.  Guarded by
        the same has-windows condition under which the tile will wait it, so
        a P slot can never dangle."""
        t0 = _first_group(org_ref, tile, END)

        @pl.when(t0 < END)
        def _():
            ts = jnp.where(t0 < END, t0, 0)
            pend = org_ref[tile, ts]
            xw = xorg_ref[tile, ts] if narrow else jnp.int32(0)
            _, oz, oy, _ = _unpack_word(pend)
            dma(n_ring + jax.lax.rem(tile, 2), oz, oy, xw).start()

    prefetch_first(jnp.int32(0))  # only tile 0's latency is exposed

    def tile_body(tile, mask):
        @pl.when(tile + 1 < t_per)
        def _():
            prefetch_first(tile + 1)

        return tile_fn(tile, mask)

    mask = jax.lax.fori_loop(0, t_per, tile_body, jnp.int32(0))

    for s in range(n_ring):
        @pl.when(((mask >> s) & 1) == 1)
        def _(s=s):
            dma(s, z0, z0, z0).wait()


N_RING = 2  # group-march ring depth (issue-one-ahead; a depth-2/3-slot
# variant measured ~2% SLOWER at the headline config — the extra word read
# and carry cost more than the latency it hid, round-4 notes)

LANE_GROUPS_MAX = 8  # kernel-supported ceiling (asserts/out-row sizing)


def _march_tiles_group(rays_ref, org_ref, xorg_ref, map_ref, vol_ref, out_ref,
                       slab, state, sem, *, dims, max_samples, win_z,
                       fmt="f32pair", k=2, win_y=WIN_Y, t_per=T_PER, G=1):
    END = -(-max_samples // k)
    dma = _window_dma(vol_ref, slab, sem, map_ref, xorg_ref is not None,
                      win_z, win_y)

    def tile_fn(tile, mask):
        return _march_one_tile_group(
            rays_ref, org_ref, vol_ref, out_ref, slab, state, sem, tile,
            mask, dims=dims, max_samples=max_samples, win_z=win_z,
            xorg_ref=xorg_ref, map_ref=map_ref, fmt=fmt, k=k, win_y=win_y,
            G=G)

    _pipelined_tiles(org_ref, xorg_ref, dma, END, t_per, tile_fn,
                     n_ring=N_RING)


def _march_one_tile(rays_ref, org_ref, vol_ref, out_ref, slab, state, sem,
                    tile, *, dims, max_samples, win_z, win_y=WIN_Y):
    X, Y, Z = dims
    WIN_Z = win_z
    END = max_samples  # one-past-last sampled position index

    # Vector state lives in VMEM scratch (rows: 0-2 pos, 3 color, 4 alpha,
    # 5 alive-latch) — Mosaic cannot yield sub-tile vector carries, so the
    # while_loop carries only scalars.  The volume slab is double-buffered.
    # Control comes from the host-precomputed SMEM word table (org_ref,
    # (T_PER, max_samples+1) packed i32 per step — see build_word_table):
    # the footprint prepass replays the exact incremental position
    # recurrence, so windows are bit-consistent with the in-kernel ray
    # state, and the kernel visits *sampled* steps only — skipped windows
    # are exactly zero, so their composite is a no-op (raycaster.frag:69-72
    # with s == 0), making empty-space skipping exact.
    e = [rays_ref[tile, i:i + 1, :] for i in range(3)]
    d = [rays_ref[tile, 3 + i:4 + i, :] for i in range(3)]
    state[0:1, :] = e[0] + d[0]
    state[1:2, :] = e[1] + d[1]
    state[2:3, :] = e[2] + d[2]
    state[3:5, :] = jnp.zeros((2, 128), jnp.float32)
    state[5:6, :] = rays_ref[tile, 6:7, :]

    def dma(slot, oz, oy):
        return pltpu.make_async_copy(
            vol_ref.at[pl.ds(oz, WIN_Z), pl.ds(oy, win_y), :],
            slab.at[slot], sem.at[slot])

    # prologue: issue the DMA for the first sampled step (or a dummy fetch
    # of window 0 so exactly one DMA is always in flight)
    w0 = org_ref[tile, 0]
    nd0, _, _, s0bit = _unpack_word(w0)
    t0 = jnp.where(s0bit == 1, 0, jnp.where(nd0 > 0, nd0, END))
    t_issue = jnp.where(t0 < END, t0, 0)
    pend0 = org_ref[tile, t_issue]
    _, ozp, oyp, _ = _unpack_word(pend0)
    dma(0, ozp, oyp).start()

    def body(carry):
        t_prev, t_cur, cnt, _, pend = carry
        slot = jax.lax.rem(cnt, 2)
        w = org_ref[tile, t_cur]
        nd, _, _, _ = _unpack_word(w)
        _, oz_c, oy_c, _ = _unpack_word(pend)

        # gap-run: advance positions one step at a time (bit-exact with the
        # dense march — a jump p += g*d would round differently)
        def adv_body(k):
            state[0:1, :] = state[0:1, :] + d[0]
            state[1:2, :] = state[1:2, :] + d[1]
            state[2:3, :] = state[2:3, :] + d[2]
            return k + 1

        jax.lax.while_loop(lambda k: k < t_cur - t_prev, adv_body,
                           jnp.int32(0))

        px = state[0:1, :]
        py = state[1:2, :]
        pz = state[2:3, :]
        color = state[3:4, :]
        alpha = state[4:5, :]

        # the inside test is monotone along a ray (convex cube), so testing
        # only at sampled steps reproduces the dense per-step exit latch
        inside = ((px > 0.0) & (px < 1.0) & (py > 0.0) & (py < 1.0)
                  & (pz > 0.0) & (pz < 1.0))
        alive = (state[5:6, :] > 0.5) & inside

        dma(slot, oz_c, oy_c).wait()
        smp = tent_sample(slab[slot], px, py, pz, oz_c, oy_c,
                          dims, WIN_Z, win_y=win_y) * (1.0 / 255.0)

        # issue the DMA for the next sampled step (or a dummy re-fetch)
        t_next = jnp.where(nd > 0, t_cur + nd, END)
        t_issue = jnp.where(nd > 0, t_cur + nd, t_cur)
        w_next = org_ref[tile, t_issue]
        _, oz_n, oy_n, _ = _unpack_word(w_next)
        dma(jax.lax.rem(cnt + 1, 2), oz_n, oy_n).start()

        prev_alpha = smp - smp * alpha
        color = jnp.where(alive, color + prev_alpha * smp, color)
        alpha = jnp.where(alive, alpha + prev_alpha * ALPHA_SCALE, alpha)
        alive = alive & (alpha <= EARLY_OUT_ALPHA)

        state[3:4, :] = color
        state[4:5, :] = alpha
        state[5:6, :] = jnp.where(alive, 1.0, 0.0)
        return t_cur, t_next, cnt + 1, jnp.any(alive), w_next

    def cond(carry):
        _, t_cur, _, any_alive, _ = carry
        return (t_cur < END) & any_alive

    any0 = jnp.any(state[5:6, :] > 0.5)
    end = jax.lax.while_loop(cond, body,
                             (jnp.int32(0), t0, jnp.int32(0), any0, pend0))
    # exactly one DMA is always in flight — drain it
    _, oz_e, oy_e, _ = _unpack_word(end[4])
    dma(jax.lax.rem(end[2], 2), oz_e, oy_e).wait()
    out_ref[tile, 0:2, :] = state[3:5, :]


def _march_one_tile_group(rays_ref, org_ref, vol_ref, out_ref, slab, state,
                          sem, tile, mask, *, dims, max_samples, win_z,
                          xorg_ref=None, map_ref=None, fmt="f32pair", k=2,
                          win_y=WIN_Y, G=1):
    """``k`` march steps per DMA window: word ``p`` covers step indices
    ``k*p .. k*p + k - 1`` and its window is the union of all k footprints,
    so the loop runs 1/k the iterations and issues 1/k the DMAs of the
    per-step kernel (window bytes grow by the extra union height).  Position
    advance is still exactly ``pos += d`` once per step (gap runs replay the
    skipped steps one at a time), so samples and composites are bit-identical
    to the dense march.

    Pipelining (see ``_march_tiles_group``): the tile's FIRST window was
    prefetched into P slot ``2 + tile%2`` one tile ago; iteration ``cnt``
    issues the next window into ring slot ``cnt%2`` right after waiting its
    sample window, and the in-flight set is tracked in ``mask`` (bit = ring
    slot pending) so nothing stalls at tile end — stale ring DMAs are waited
    just before their slot is reused.

    With ``xorg_ref`` (narrow-x mode) the volume is the chunked dual-copy
    layout of ``pack_pairs_narrow`` and each window DMA moves one 128-lane
    panel chosen by the x word — half the bytes at X=256 and a single-chunk
    lane gather.

    With ``map_ref`` (pooled mode, ``fmt="i32half"``) the volume is the
    sparse slab pool of ``build_slab_pool``: each window DMA reads rows
    ``[oz & 7, oz & 7 + win_z)`` of slot ``map_ref[0, oz >> 3]`` — the
    HBM-resident render state is only the occupied slabs.

    ``max_samples`` need not divide by ``k``: the last group is partial and
    its trailing substeps (step index >= max_samples) are masked out of the
    composite, so outputs equal the dense march exactly."""
    X, Y, Z = dims
    WIN_Z = win_z
    END = -(-max_samples // k)  # one-past-last group index (ceil)
    narrow = xorg_ref is not None
    z0i = jnp.int32(0)

    # FIELD-MAJOR batched state: field f at rows [f*G, (f+1)*G) — all per-
    # substep state math runs on (G, 128) blocks (ONE VPU instruction per
    # op instead of G single-sublane (1, 128) ops; the round-4 roofline
    # showed ~364 ns/substep of instruction-issue residual, dominated by
    # exactly these ops).  Fields: 0 px, 1 py, 2 pz, 3 color, 4 alpha,
    # 5 alive.  rays_ref rows stay group-major (8g+i) — gathered once per
    # tile into (G, 128) register blocks here.
    e = [jnp.concatenate([rays_ref[tile, 8 * g + i:8 * g + i + 1, :]
                          for g in range(G)], axis=0) for i in range(3)]
    d = [jnp.concatenate([rays_ref[tile, 8 * g + 3 + i:8 * g + 4 + i, :]
                          for g in range(G)], axis=0) for i in range(3)]
    hit0 = jnp.concatenate([rays_ref[tile, 8 * g + 6:8 * g + 7, :]
                            for g in range(G)], axis=0)
    # per-ray exit row (_footprint_scan texit, clamped to max_samples):
    # position t is inside the cube AND below the march cap iff t < texr —
    # ONE broadcast compare replaces the 6-compare/5-and bounds test per
    # substep (the bounds chain was ~11 VPU ops of the ~850 ns/window
    # residual, round-4 roofline)
    texr = jnp.concatenate([rays_ref[tile, 8 * g + 7:8 * g + 8, :]
                            for g in range(G)], axis=0)
    state[0 * G:1 * G, :] = e[0] + d[0]
    state[1 * G:2 * G, :] = e[1] + d[1]
    state[2 * G:3 * G, :] = e[2] + d[2]
    state[3 * G:5 * G, :] = jnp.zeros((2 * G, 128), jnp.float32)
    state[5 * G:6 * G, :] = hit0

    dma = _window_dma(vol_ref, slab, sem, map_ref, narrow, win_z, win_y)
    pslot = 2 + jax.lax.rem(tile, 2)

    def xword(t):
        return xorg_ref[tile, t] if narrow else jnp.int32(0)

    t0 = _first_group(org_ref, tile, END)
    has_win = t0 < END

    # the prefetched first window: wait it in straight-line code (the same
    # condition under which _march_tiles_group issued it) so the P slot is
    # settled even when no ray is alive and the while loop never runs
    @pl.when(has_win)
    def _():
        dma(pslot, z0i, z0i, z0i).wait()

    t_first = jnp.where(has_win, t0, 0)
    pend0 = org_ref[tile, t_first]
    pendx0 = xword(t_first)

    def advance():
        state[0 * G:1 * G, :] = state[0 * G:1 * G, :] + d[0]
        state[1 * G:2 * G, :] = state[1 * G:2 * G, :] + d[1]
        state[2 * G:3 * G, :] = state[2 * G:3 * G, :] + d[2]

    def substep(slot, oz_c, oy_c, xeff, t):
        px = state[0 * G:1 * G, :]
        py = state[1 * G:2 * G, :]
        pz = state[2 * G:3 * G, :]
        color = state[3 * G:4 * G, :]
        alpha = state[4 * G:5 * G, :]
        alive = (state[5 * G:6 * G, :] > 0.5) & (texr > t)
        smp = jnp.concatenate(
            [tent_sample(slab[slot], px[g:g + 1], py[g:g + 1], pz[g:g + 1],
                         oz_c, oy_c, dims, WIN_Z, xeff=xeff, fmt=fmt,
                         win_y=win_y) for g in range(G)],
            axis=0) * (1.0 / 255.0)
        prev_alpha = smp - smp * alpha
        color = jnp.where(alive, color + prev_alpha * smp, color)
        alpha = jnp.where(alive, alpha + prev_alpha * ALPHA_SCALE, alpha)
        alive = alive & (alpha <= EARLY_OUT_ALPHA)
        state[3 * G:4 * G, :] = color
        state[4 * G:5 * G, :] = alpha
        state[5 * G:6 * G, :] = jnp.where(alive, 1.0, 0.0)
        return jnp.any(alive)  # ONE cross-lane reduce per substep

    def body(carry):
        # pi = state's position index; mask = pending ring-DMA bitmask
        pi, t_cur, cnt, _, pend, pendx, mask = carry
        is_first = cnt == 0
        slot_i = jax.lax.rem(cnt, 2)            # issue target
        # == rem(cnt-1, 2) for cnt >= 1; the +1 form stays non-negative so
        # the `1 << slot_s` shifts below are always defined (cnt == 0 uses
        # pslot and the mask ops are identity)
        slot_s = jax.lax.rem(cnt + 1, 2)        # ring sample source (cnt>=1)
        sslot = jnp.where(is_first, pslot, slot_s)
        nd, oz_c, oy_c, _ = _unpack_word(pend)
        xeff = pendx & 0xFFFF

        # gap-run to step index k*t_cur (bit-exact with the dense march).
        # (A straight-line-advance + rare-branch variant measured EVEN with
        # this plain loop on the headline config, round 5 — keep the loop.)
        def adv_body(i):
            advance()
            return i + 1

        jax.lax.while_loop(lambda i: i < k * t_cur - pi, adv_body,
                           jnp.int32(0))

        # wait the ring DMA issued last iteration (the first window's P-slot
        # copy was waited in the tile prologue)
        @pl.when(~is_first)
        def _():
            dma(slot_s, z0i, z0i, z0i).wait()

        mask = jnp.where(is_first, mask, mask & ~(1 << slot_s))

        # issue the next group's DMA before sampling (maximum overlap); a
        # slot still pending from the PREVIOUS tile is waited first — after
        # warm-up its copy landed long ago, so this never stalls
        t_next = jnp.where(nd > 0, t_cur + nd, END)
        t_issue = jnp.where(nd > 0, t_cur + nd, t_cur)
        w_next = org_ref[tile, t_issue]
        x_next = xword(t_issue)
        _, oz_n, oy_n, _ = _unpack_word(w_next)

        @pl.when((nd > 0) & (((mask >> slot_i) & 1) == 1))
        def _():
            dma(slot_i, z0i, z0i, z0i).wait()

        @pl.when(nd > 0)
        def _():
            dma(slot_i, oz_n, oy_n, x_next).start()

        mask = jnp.where(nd > 0, mask | (1 << slot_i), mask)

        # texr is clamped to max_samples, so the same compare also masks a
        # partial last group's trailing substeps (exactly the dense march,
        # which stops at max_samples)
        t_f = (k * t_cur).astype(jnp.float32)
        substep(sslot, oz_c, oy_c, xeff, t_f)

        # remaining k-1 steps of the group from the same window
        any_alive = jnp.bool_(True)
        for j in range(1, k):
            advance()
            any_alive = substep(sslot, oz_c, oy_c, xeff, t_f + float(j))
        return (k * t_cur + (k - 1), t_next, cnt + 1, any_alive, w_next,
                x_next, mask)

    def cond(carry):
        _, t_cur, _, any_alive, _, _, _ = carry
        return (t_cur < END) & any_alive

    any0 = jnp.any(state[5 * G:6 * G, :] > 0.5)
    end = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), t0, jnp.int32(0), any0, pend0, pendx0, mask))
    # out rows: 0..G-1 = per-group color, G..2G-1 = per-group alpha —
    # exactly the field-major state blocks
    out_ref[tile, 0:G, :] = state[3 * G:4 * G, :]
    out_ref[tile, G:2 * G, :] = state[4 * G:5 * G, :]
    return end[6]  # pending ring-DMA mask, carried to the next tile


def _unpack_word(v):
    """See build_word_table: nd<<20 | oz<<9 | (oy>>3)<<1 | sample."""
    nd = v >> 20
    oz = (v >> 9) & 0x7FF
    oy = pl.multiple_of(((v >> 1) & 0xFF) * 8, 8)
    smp = v & 1
    return nd, oz, oy, smp


def pack_pairs(volume):
    """(Z, Y, X) float32 in [0, 1] -> f32 pair volume ``s[x]*256 + s[x+1]``
    (8-bit quantized samples, x+1 clamped to the edge — GL_CLAMP_TO_EDGE,
    ``VolumeReader.h:120-122``)."""
    s = jnp.round(jnp.clip(volume, 0.0, 1.0) * 255.0)
    return s * 256.0 + jnp.concatenate([s[:, :, 1:], s[:, :, -1:]], axis=2)


@jax.jit
def pack_pairs16(volume):
    """(Z, Y, X) float32 in [0, 1] -> (Z, Y, X//2) int32 packing TWO 16-bit
    pairs per word: ``word[k] = pair16[2k] | pair16[2k+1] << 16`` with
    ``pair16[x] = s[x]*256 + s[x+1]`` (x+1 edge-clamped).  Half the HBM bytes
    of the f32 pair volume, decoded exactly in-kernel by ``tent_sample``'s
    ``fmt="i32half"`` path.  Requires X even."""
    s = jnp.round(jnp.clip(volume, 0.0, 1.0) * 255.0).astype(jnp.int32)
    nxt = jnp.concatenate([s[:, :, 1:], s[:, :, -1:]], axis=2)
    p16 = (s << 8) | nxt
    lo = p16[:, :, 0::2]
    hi = p16[:, :, 1::2]
    return lo | (hi << 16)


SLAB_H = 16        # pool slab height: slab s covers z rows [8s, 8s + 16)
POOL_WIN_Z_MAX = 9  # (oz & 7) + win_z <= 16 for any oz in [8s, 8s + 8)


def build_slab_pool(volume, mip8=None):
    """Sparse z-slab residency for the compressed-domain march: pack the
    volume as pair16 words and keep only slabs that can ever be sampled.

    Returns ``(pool, slab_map)``: ``pool`` is (n_slots, 16, Y, X//2) int32
    where slot 0 is all-zero (shared by every empty slab) and slot i >= 1
    holds z rows [8s, 8s + 16) of an occupied slab s; ``slab_map`` is
    (1, Z//8) int32 with ``slab_map[0, oz >> 3]`` the slot serving any
    window origin oz.  Slabs overlap by 8 rows so every (oz, win_z <= 9)
    window is ONE static-shape DMA from one slot.

    ``mip8`` (per-8³-block maxima, e.g. ``codecs.device.tree_occupancy_mip8``)
    drives the residency decision from compressed-tree metadata; with
    ``mip8=None`` it is computed from the dense volume.  Empty slabs are
    never *sampled* (the occupancy word table skips their windows exactly),
    so mapping them to the zero slot changes no output — it only bounds what
    stays HBM-resident.  Occupied slabs are additionally DEDUPED by content
    (byte hash): the level cut is piecewise constant on node boxes
    (VERDICT round 2 "Next" #4), so coarse cuts repeat whole slabs —
    constant-valued regions, replicated structures — and every repeat maps
    to one resident slot, moving resident bytes toward the codec's
    bits-per-voxel rather than 2 B/occupied-voxel.  This realizes the
    reference's unfinished compressed-domain ambition
    (``isosurface_compressed.frag:18-44``, ``main.cpp:203-237``) the TPU
    way: the resident render state is the packed tree + the deduped
    occupied-slab cache, not a dense f32 pair volume.
    """
    import numpy as np

    Z, Y, X = volume.shape
    assert Z % 8 == 0 and X % 2 == 0, (Z, X)
    p16 = pack_pairs16(volume)
    m8 = np.asarray(block_max8(volume) if mip8 is None else mip8)
    zocc = (m8 > 0.0).any(axis=(1, 2))  # (ceil(Z/8),)
    n_slabs = Z // 8
    occ = zocc[:n_slabs].copy()
    occ[:-1] |= zocc[1:n_slabs]  # slab s spans z-blocks s and s+1
    padded = np.concatenate(
        [np.asarray(p16), np.zeros((8, Y, X // 2), np.int32)], axis=0)
    starts = 8 * np.nonzero(occ)[0].astype(np.int32)
    rows = starts[:, None] + np.arange(SLAB_H, dtype=np.int32)[None]
    slabs = padded[rows]  # (n_occ, SLAB_H, Y, X//2)
    slots = np.zeros(n_slabs, np.int32)
    unique: dict[bytes, int] = {}
    keep: list[int] = []
    occ_idx = np.nonzero(occ)[0]
    for i, s_idx in enumerate(occ_idx):
        key = slabs[i].tobytes()
        slot = unique.get(key)
        if slot is None:
            slot = 1 + len(keep)
            unique[key] = slot
            keep.append(i)
        slots[s_idx] = slot
    pool = jnp.concatenate(
        [jnp.zeros((1, SLAB_H, Y, X // 2), jnp.int32),
         jnp.asarray(slabs[keep])], axis=0)
    return pool, jnp.asarray(slots[None, :])


def build_slab_pool_narrow(volume, mip8=None):
    """Sparse z-slab residency in the NARROW dual-copy pair layout: the
    compressed-domain render state that marches at DENSE-NARROW speed.

    Same residency/dedup policy as :func:`build_slab_pool`, but each slot
    holds its slab's rows of ``pack_pairs_narrow(volume)`` — chunk-major
    ``(nchunks, n_slots*SLAB_H, Y, 128)`` f32 — so the pooled march uses the
    exact f32-pair tent path (single-chunk gather, no i32half unpack) that
    the headline dense kernel uses.  Cost: resident bytes per occupied slab
    are 4x the pair16 pool (f32 words + the 64-shifted copy); the pair16
    pool remains the low-memory option and both are bit-identical in
    output.  Returns (pool, slab_map)."""
    import numpy as np

    Z, Y, X = volume.shape
    assert Z % 8 == 0 and X % 128 == 0, (Z, X)
    wide = np.asarray(pack_pairs_narrow(volume))  # (C, Z, Y, 128)
    C = wide.shape[0]
    m8 = np.asarray(block_max8(volume) if mip8 is None else mip8)
    zocc = (m8 > 0.0).any(axis=(1, 2))
    n_slabs = Z // 8
    occ = zocc[:n_slabs].copy()
    occ[:-1] |= zocc[1:n_slabs]
    padded = np.concatenate(
        [wide, np.zeros((C, 8, Y, 128), np.float32)], axis=1)
    starts = 8 * np.nonzero(occ)[0].astype(np.int32)
    rows = starts[:, None] + np.arange(SLAB_H, dtype=np.int32)[None]
    slabs = padded[:, rows]  # (C, n_occ, SLAB_H, Y, 128)
    slots = np.zeros(n_slabs, np.int32)
    unique: dict[bytes, int] = {}
    keep: list[int] = []
    for i, s_idx in enumerate(np.nonzero(occ)[0]):
        key = slabs[:, i].tobytes()
        slot = unique.get(key)
        if slot is None:
            slot = 1 + len(keep)
            unique[key] = slot
            keep.append(i)
        slots[s_idx] = slot
    pool = np.concatenate(
        [np.zeros((C, 1, SLAB_H, Y, 128), np.float32), slabs[:, keep]],
        axis=1)  # (C, slots, SLAB_H, Y, 128)
    pool = pool.reshape(C, -1, Y, 128)
    return jnp.asarray(pool), jnp.asarray(slots[None, :])


@functools.partial(jax.jit,
                   static_argnames=("dims", "max_samples", "win_z", "group",
                                    "win_y", "lanes"))
def _launch_pooled_narrow(rays_packed, words, xwords, pool, slab_map, dims,
                          max_samples, win_z=4, group=2, win_y=WIN_Y,
                          lanes=1):
    """Compressed-domain launch over the NARROW slab pool
    (``build_slab_pool_narrow``): dense-narrow march arithmetic, sparse
    residency."""
    n_tiles = rays_packed.shape[0]
    G = lanes
    X, Y, Z = dims
    n_words = -(-max_samples // group)
    t_per = _t_per(n_tiles)
    assert group > 1 and win_z <= POOL_WIN_Z_MAX, (group, win_z)
    assert rays_packed.shape[1] == 8 * G and 1 <= G <= LANE_GROUPS_MAX, \
        rays_packed.shape
    assert words.shape == (n_tiles, n_words), (words.shape, n_words)
    assert xwords.shape == (n_tiles, n_words), xwords.shape
    assert pool.shape[0] == (2 * X) // 128 and pool.shape[2:] == (Y, 128), \
        pool.shape
    assert slab_map.shape == (1, Z // 8), slab_map.shape
    word_spec = pl.BlockSpec((t_per, n_words), lambda i: (i, 0),
                             memory_space=pltpu.SMEM)
    kernel = functools.partial(_march_kernel_pooled_narrow, dims=dims,
                               max_samples=max_samples, win_z=win_z,
                               group=group, win_y=win_y, t_per=t_per, G=G)
    out_rows = max(8, 2 * G)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles // t_per,),
        in_specs=[
            pl.BlockSpec((t_per, 8 * G, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            word_spec, word_spec,
            pl.BlockSpec((1, Z // 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((t_per, out_rows, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, out_rows, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((N_RING + 2, win_z, win_y, 128), jnp.float32),
            pltpu.VMEM((8 * G, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((N_RING + 2,)),
        ],
    )(rays_packed, words, xwords, slab_map, pool)
    return out[:, 0:G, :], out[:, G:2 * G, :]


@functools.partial(jax.jit,
                   static_argnames=("dims", "max_samples", "win_z", "group",
                                    "win_y", "lanes"))
def _launch(rays_packed, words, volume, dims, max_samples, win_z=4,
            group=1, xwords=None, win_y=WIN_Y, lanes=1):
    n_tiles = rays_packed.shape[0]
    G = lanes
    n_words = (-(-max_samples // group)) if group > 1 else (max_samples + 1)
    narrow = xwords is not None
    t_per = _t_per(n_tiles)
    assert rays_packed.shape[1] == 8 * G and 1 <= G <= LANE_GROUPS_MAX, \
        rays_packed.shape
    assert G == 1 or group > 1, (G, group)
    assert words.shape == (n_tiles, n_words), (words.shape, n_words)
    assert not narrow or group > 1
    if narrow:
        assert xwords.shape == (n_tiles, -(-max_samples // group)), xwords.shape
    word_spec = pl.BlockSpec((t_per, n_words), lambda i: (i, 0),
                             memory_space=pltpu.SMEM)
    ray_spec = pl.BlockSpec((t_per, 8 * G, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    if narrow:
        vol_pairs = pack_pairs_narrow(volume)
        slab_w = 128
        kernel = functools.partial(_march_kernel_narrow, dims=dims,
                                   max_samples=max_samples, win_z=win_z,
                                   group=group, win_y=win_y, t_per=t_per, G=G)
        in_specs = [ray_spec, word_spec, word_spec,
                    pl.BlockSpec(memory_space=pl.ANY)]
        operands = (rays_packed, words, xwords, vol_pairs)
    else:
        vol_pairs = pack_pairs(volume)
        kernel = functools.partial(_march_kernel, dims=dims,
                                   max_samples=max_samples,
                                   win_z=win_z, group=group, win_y=win_y,
                                   t_per=t_per, G=G)
        in_specs = [ray_spec, word_spec, pl.BlockSpec(memory_space=pl.ANY)]
        operands = (rays_packed, words, vol_pairs)
        slab_w = dims[0]
    out_rows = max(8, 2 * G)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles // t_per,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((t_per, out_rows, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, out_rows, 128), jnp.float32),
        scratch_shapes=[
            # group kernels ring through slots 0..N_RING-1
            # and prefetch the next tile's first window into the two P slots
            # after the ring (cross-tile pipeline)
            pltpu.VMEM((2 if group == 1 else N_RING + 2, win_z, win_y,
                        slab_w), jnp.float32),
            pltpu.VMEM((8 * G, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2 if group == 1 else N_RING + 2,)),
        ],
    )(*operands)
    # out rows 0..G-1 = per-group color, G..2G-1 = per-group alpha
    return out[:, 0:G, :], out[:, G:2 * G, :]


@functools.partial(jax.jit,
                   static_argnames=("dims", "max_samples", "win_z", "group",
                                    "win_y", "lanes"))
def _launch_pooled(rays_packed, words, pool, slab_map, dims, max_samples,
                   win_z=4, group=2, win_y=WIN_Y, lanes=1):
    """Compressed-domain launch: the volume operand is the sparse slab pool
    (``build_slab_pool``) plus its SMEM-resident slab map — no dense pair
    volume exists on device."""
    n_tiles = rays_packed.shape[0]
    G = lanes
    X, Y, Z = dims
    n_words = -(-max_samples // group)
    t_per = _t_per(n_tiles)
    assert group > 1 and win_z <= POOL_WIN_Z_MAX, (group, win_z)
    assert rays_packed.shape[1] == 8 * G and 1 <= G <= LANE_GROUPS_MAX, \
        rays_packed.shape
    assert words.shape == (n_tiles, n_words), (words.shape, n_words)
    assert pool.shape[1:] == (SLAB_H, Y, X // 2), pool.shape
    assert slab_map.shape == (1, Z // 8), slab_map.shape
    word_spec = pl.BlockSpec((t_per, n_words), lambda i: (i, 0),
                             memory_space=pltpu.SMEM)
    kernel = functools.partial(_march_kernel_pooled, dims=dims,
                               max_samples=max_samples, win_z=win_z,
                               group=group, win_y=win_y, t_per=t_per, G=G)
    pool3 = pool.reshape(-1, Y, X // 2)  # 3D view: same-form DMA as dense
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles // t_per,),
        in_specs=[
            pl.BlockSpec((t_per, 8 * G, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            word_spec,
            pl.BlockSpec((1, Z // 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((t_per, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((N_RING + 2, win_z, win_y, X // 2), jnp.int32),
            pltpu.VMEM((8 * G, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((N_RING + 2,)),
        ],
    )(rays_packed, words, slab_map, pool3)
    return out[:, 0:G, :], out[:, G:2 * G, :]


def _tile_lanes(a, G: int = 1):
    """(H, W) -> (tiles, G, 128): cut the image into (TILE_H, G*TILE_W)-pixel
    tiles of G lane groups; group g covers pixel columns [16g, 16g+16) of its
    tile, row-major within the group (the G=1 layout, per 128-lane panel)."""
    H, W = a.shape
    t = a.reshape(H // TILE_H, TILE_H, W // (G * TILE_W), G, TILE_W)
    return t.transpose(0, 2, 3, 1, 4).reshape(-1, G, TILE_H * TILE_W)


def _pack_rays(entry_uv, direction, hit, dims, G: int = 1, t_exit=None):
    """(H, W, 3)+(H, W) -> (tiles, 8*G, 128) f32: per lane group g, rows
    8g+0-2 entry, 8g+3-5 dirStep, 8g+6 hit, 8g+7 t_exit (the per-ray
    leading-inside position count from ``_footprint_scan``, already tiled
    as (tiles, G, 128); pad when absent).  A tile is
    TILE_H x (G*TILE_W) pixels — G vregs of 128 rays sharing one window DMA,
    one control-word stream, and one march loop, so the per-tile scalar
    overhead (the dominant frame cost at the headline config, see
    docs/PERF_NOTES.md round 3) amortizes over G*128 rays."""
    H, W, _ = entry_uv.shape
    X, Y, Z = dims
    step = direction * jnp.array([1.0 / X, 1.0 / Y, 1.0 / Z], jnp.float32)

    rows = [_tile_lanes(entry_uv[..., i], G) for i in range(3)]
    rows += [_tile_lanes(step[..., i], G) for i in range(3)]
    rows.append(_tile_lanes(hit.astype(jnp.float32), G))
    rows.append(jnp.zeros_like(rows[0]) if t_exit is None
                else t_exit.astype(jnp.float32))
    stacked = jnp.stack(rows, axis=2)  # (tiles, G, 8, 128)
    return stacked.reshape(stacked.shape[0], -1, 128)  # (tiles, 8G, 128)


def _untile(a, H, W, G: int = 1):
    """(tiles, G, 128) (or (tiles, 128) when G == 1) -> (H, W)."""
    t = a.reshape(H // TILE_H, W // (G * TILE_W), G, TILE_H, TILE_W)
    return t.transpose(0, 3, 1, 2, 4).reshape(H, W)


@functools.partial(jax.jit, static_argnames=("dims", "max_samples", "G",
                                             "per_group"))
def _footprint_scan(entry_uv, direction, hit, dims, max_samples=MAX_SAMPLES,
                    G: int = 1, per_group: bool = False):
    """Footprint prepass: per-(tile, step) window mins plus global max spans.

    Jitted as ONE program: dispatched eagerly, the 300-step ``lax.scan``
    round-trips the host per iteration — ~13 min/plan over the axon dev
    tunnel vs ~1 s compiled (measured 2026-08-20).
    Pure camera math (no volume access).  Ray positions are accumulated
    incrementally (``pos += dir_step``), matching the kernel's recurrence
    bit-for-bit so the precomputed windows are exactly the ones the in-kernel
    taps address.  Returns (spans (3,) i32 [span_y_aligned, span_z, span_x],
    mins (tiles, max_samples+1, 3) i32 [y0_min, z0_min, x0_min],
    maxs (tiles, max_samples+1, 3) i32 [y1_max, z1_max, x1_max],
    texit (tiles, G, 128) i32 — per-ray count of leading inside positions,
    i.e. position t is inside the cube iff t < texit; exact because inside
    is monotone along a ray entering a convex cube, and bit-consistent with
    the kernels' own position recurrence by the replay argument above).

    With ``per_group=True`` additionally returns per-LANE-GROUP footprints
    (gmins, gmaxs) of shape (tiles, max_samples+1, G, 3) in the same
    [y, z, x] order — the basis for the isosurface per-group occupancy
    bounds (a single lane group's footprint is ~G× tighter than the tile
    union, which is what makes fine-grained bound skipping bite)."""
    X, Y, Z = dims
    H, W, _ = entry_uv.shape
    step = direction * jnp.array([1.0 / X, 1.0 / Y, 1.0 / Z], jnp.float32)

    def tile_lanes(a):  # (H, W) -> (tiles, G*128): all the tile's lanes
        return _tile_lanes(a, G).reshape(-1, G * TILE_H * TILE_W)

    e = jnp.stack([tile_lanes(entry_uv[..., i]) for i in range(3)], -1)
    d = jnp.stack([tile_lanes(step[..., i]) for i in range(3)], -1)
    hv = tile_lanes(hit)

    fdims = jnp.array([X, Y, Z], jnp.float32)

    def scan_step(carry, _):
        pos, prev_in, still, texit = carry
        pos = pos + d
        inside = jnp.all((pos > 0.0) & (pos < 1.0), axis=-1) & hv
        still = still & inside
        texit = texit + still.astype(jnp.int32)
        tex = pos * fdims - 0.5
        i0 = jnp.floor(tex).astype(jnp.int32)
        lo = jnp.clip(i0, 0, jnp.array([X - 1, Y - 1, Z - 1]))
        hi = jnp.clip(i0 + 1, 0, jnp.array([X - 1, Y - 1, Z - 1]))
        big = jnp.int32(BIG)
        lo_m = jnp.where(inside[..., None], lo, big)
        hi_m = jnp.where(inside[..., None], hi, -big)
        mn = jnp.min(lo_m, axis=1)
        mx = jnp.max(hi_m, axis=1)
        any_in = jnp.any(inside, axis=1)
        # y window must fit after 8-alignment of the origin
        span_y = jnp.where(any_in, mx[:, 1] - (mn[:, 1] // 8) * 8 + 1, 0)
        span_z = jnp.where(any_in, mx[:, 2] - mn[:, 2] + 1, 0)
        span_x = jnp.where(any_in, mx[:, 0] - mn[:, 0] + 1, 0)
        spans = jnp.stack([jnp.max(span_y), jnp.max(span_z),
                           jnp.max(span_x)])
        out = (spans, mn[:, 1], mn[:, 2], mn[:, 0],
               mx[:, 1], mx[:, 2], mx[:, 0])
        if per_group:
            # BOUND boxes (not DMA windows): include rays whose PREVIOUS
            # position was inside — their sample here is the clamp-sampled
            # lookahead an exit crossing tests against — so a conservative
            # bound over the box covers every sample a crossing can read
            contrib = hv & (inside | prev_in)
            glo = jnp.where(contrib[..., None], lo, big)
            ghi = jnp.where(contrib[..., None], hi, -big)
            T = lo_m.shape[0]
            gmn = glo.reshape(T, G, TILE_H * TILE_W, 3).min(axis=2)
            gmx = ghi.reshape(T, G, TILE_H * TILE_W, 3).max(axis=2)
            out = out + (gmn, gmx)
        return (pos, inside, still, texit), out

    pos0 = e
    in0 = jnp.zeros(hv.shape, bool)
    still0 = jnp.ones(hv.shape, bool)
    texit0 = jnp.zeros(hv.shape, jnp.int32)
    (_, _, _, texit), outs = jax.lax.scan(
        scan_step, (pos0, in0, still0, texit0), None,
        length=max_samples + 1)
    texit = texit.reshape(-1, G, TILE_H * TILE_W)
    spans, mn_y, mn_z, mn_x, mx_y, mx_z, mx_x = outs[:7]
    spans = jnp.maximum(spans[:-1].max(axis=0), 0)  # extra step excluded
    mins = jnp.stack([mn_y.T, mn_z.T, mn_x.T], axis=-1)  # (tiles, S+1, 3)
    maxs = jnp.stack([mx_y.T, mx_z.T, mx_x.T], axis=-1)
    if per_group:
        gmn, gmx = outs[7], outs[8]  # (S+1, tiles, G, 3) xyz -> [y, z, x]
        gmins = jnp.stack([gmn[..., 1], gmn[..., 2], gmn[..., 0]], axis=-1)
        gmaxs = jnp.stack([gmx[..., 1], gmx[..., 2], gmx[..., 0]], axis=-1)
        gmins = gmins.transpose(1, 0, 2, 3)  # (tiles, S+1, G, 3)
        gmaxs = gmaxs.transpose(1, 0, 2, 3)
        return spans, mins, maxs, gmins, gmaxs, texit
    return spans, mins, maxs, texit


MIP_SPAN_X = 17  # max per-(tile, step) x extent the default occupancy covers


def _reach_x(span_x: int) -> int:
    """fwd_max reach so [mn_x, mn_x + span_x) fits [8k, 8k + 8*reach) for any
    mn_x with k = mn_x >> 3 (worst case mn_x = 8k + 7)."""
    return max(3, -(-(int(span_x) + 7) // 8))


def _reach_z(win_z: int) -> int:
    """fwd_max z reach so a window [oz, oz + win_z) fits [8i, 8i + 8*reach)
    for any oz with i = oz >> 3 (worst case oz = 8i + 7)."""
    return max(2, -(-(int(win_z) + 7) // 8))


def block_max8(volume):
    """(Z, Y, X) f32 in [0, 1] -> (ceil(Z/8), ceil(Y/8), ceil(X/8)) f32
    per-8³-block maximum in 0..255 units (the base grid ``expand_mip``
    turns into a window bound).  ``codecs.device.tree_occupancy_mip8``
    produces the same grid from the compressed tree's own scalars with no
    dense-volume pass."""
    s = jnp.round(jnp.clip(volume, 0.0, 1.0) * 255.0)
    Z, Y, X = s.shape
    pz, py, px = (-Z) % 8, (-Y) % 8, (-X) % 8
    s = jnp.pad(s, ((0, pz), (0, py), (0, px)))
    return s.reshape((Z + pz) // 8, 8, (Y + py) // 8, 8,
                     (X + px) // 8, 8).max(axis=(1, 3, 5))


def expand_mip(m8, reach_x: int = 3, reach_z: int = 2):
    """Forward-max expansion of the 8³ block grid so one gather bounds a
    whole window footprint: cell (i, j, k) covers z in [8i, 8i + 8*reach_z),
    y in [8j, 8j+16), x in [8k, 8k + 8*reach_x)."""

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

    m8 = fwd_max(m8, 0, reach_z)  # z: unaligned window fits 8i..8i+8*reach
    m8 = fwd_max(m8, 1, 2)   # y: 8-aligned origin, 16 rows
    m8 = fwd_max(m8, 2, reach_x)  # x: unaligned span fits 8k..8k+8*reach
    return m8


def occupancy_mip(volume, reach_x: int = 3):
    """Conservative per-cell window bound from a dense volume: cell
    (i, j, k) is the max 8-bit sample over z in [8i, 8i+16),
    y in [8j, 8j+16), x in [8k, 8k + 8*reach_x).  One gather at
    (oz >> 3, oy >> 3, mn_x >> 3) bounds every tap of a (win_z <= 8,
    WIN_Y = 16, x-span <= 8*reach_x - 7) tile-step footprint; callers widen
    ``reach_x`` via ``_reach_x(span_x)`` when the camera's x footprints
    exceed the default MIP_SPAN_X = 17.

    The empty-space-skipping role of the kd-tree's per-node midrange/extent
    metadata (the capability the reference's stubbed compressed-domain
    shader was reaching for, ``isosurface_compressed.frag:18-44``)."""
    return expand_mip(block_max8(volume), reach_x)


@functools.partial(jax.jit,
                   static_argnames=("dims", "win_z", "n_steps", "span_x",
                                    "win_y"))
def build_word_table(mins, dims, win_z, volume=None, threshold=0.0,
                     n_steps=None, span_x=MIP_SPAN_X, mip8=None, win_y=WIN_Y):
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
    oy = jnp.clip((mins[..., 0] // 8) * 8, 0, Y - win_y)
    oz = jnp.clip(mins[..., 1], 0, Z - win_z)
    T, S1 = oz.shape
    if volume is None and mip8 is None:
        sampled = jnp.ones((T, S1), bool)
    else:
        m8 = block_max8(volume) if mip8 is None else mip8
        m = expand_mip(m8, reach_x=_reach_x(span_x))
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


@functools.partial(jax.jit, static_argnames=("max_samples", "k"))
def group_unions(mins, maxs, max_samples, k=2):
    """Group ``p`` = step indices (k*p .. k*p + k - 1): union footprint mins
    and the global worst-case group spans.  Empty steps carry ±BIG sentinels,
    which the min/max unions absorb.  ``max_samples`` need not divide by
    ``k``: the last group is padded with sentinels (the kernel masks the
    trailing substeps).  Returns (group mins (T, P, 3) [y, z, x],
    group maxs (T, P, 3), spans (3,) i32 [span_y_aligned, span_z, span_x])."""
    P = -(-max_samples // k)
    T = mins.shape[0]
    pad = k * P - max_samples
    mn_in = mins[:, :max_samples]
    mx_in = maxs[:, :max_samples]
    if pad:
        mn_in = jnp.concatenate(
            [mn_in, jnp.full((T, pad, 3), BIG, mins.dtype)], axis=1)
        mx_in = jnp.concatenate(
            [mx_in, jnp.full((T, pad, 3), -BIG, maxs.dtype)], axis=1)
    mn = mn_in.reshape(T, P, k, 3).min(axis=2)
    mx = mx_in.reshape(T, P, k, 3).max(axis=2)
    any_in = mx[..., 0] >= mn[..., 0]
    span_y = jnp.where(any_in, mx[..., 0] - (mn[..., 0] // 8) * 8 + 1, 0)
    span_z = jnp.where(any_in, mx[..., 1] - mn[..., 1] + 1, 0)
    span_x = jnp.where(any_in, mx[..., 2] - mn[..., 2] + 1, 0)
    spans = jnp.stack([span_y.max(), span_z.max(), span_x.max()])
    return mn, mx, jnp.maximum(spans, 0)


def pair_unions(mins, maxs, max_samples):
    return group_unions(mins, maxs, max_samples, k=2)


@functools.partial(jax.jit,
                   static_argnames=("dims", "win_z", "max_samples", "span_x",
                                    "k", "win_y"))
def build_word_table_group(mins, maxs, dims, win_z, max_samples, volume=None,
                           threshold=0.0, span_x=MIP_SPAN_X, mip8=None, k=2,
                           win_y=WIN_Y):
    """Group-granularity control words for ``_march_one_tile_group`` (same
    packing as ``build_word_table``; nd counts *groups* of k steps).  Window
    origins come from the group-union footprint; the occupancy skip tests
    each step's own per-step bound (keeping the MIP_SPAN_X guarantee per
    step) and samples the group if any of its steps may exceed ``threshold``
    — a skipped group's composite is exactly a no-op, so skipping stays
    exact."""
    X, Y, Z = dims
    P = -(-max_samples // k)
    pmn, _, _ = group_unions(mins, maxs, max_samples, k=k)
    oy = jnp.clip((pmn[..., 0] // 8) * 8, 0, Y - win_y)
    oz = jnp.clip(pmn[..., 1], 0, Z - win_z)
    T = oz.shape[0]
    if volume is None and mip8 is None:
        sampled = jnp.ones((T, P), bool)
    else:
        m8 = block_max8(volume) if mip8 is None else mip8
        m = expand_mip(m8, reach_x=_reach_x(span_x),
                       reach_z=_reach_z(win_z))
        soz = jnp.clip(mins[..., 1], 0, Z - win_z)
        soy = jnp.clip((mins[..., 0] // 8) * 8, 0, Y - win_y)
        sox = jnp.clip(mins[..., 2], 0, X - 1)
        wmax = m[soz >> 3, soy >> 3, sox >> 3]
        s = wmax > threshold
        s = s[:, :max_samples]
        if k * P > max_samples:  # padded tail steps are never sampled
            s = jnp.concatenate(
                [s, jnp.zeros((T, k * P - max_samples), bool)], axis=1)
        sampled = s.reshape(T, P, k).any(axis=2)
    idx = jnp.arange(P, dtype=jnp.int32)
    nxt = jnp.where(sampled, idx, jnp.int32(4 * P + 4))
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(nxt, axis=1), axis=1), axis=1)
    after = jnp.concatenate(
        [nxt[:, 1:], jnp.full((T, 1), 4 * P + 4, jnp.int32)], axis=1)
    nd = jnp.where(after < P, after - idx, 0)
    word = ((nd << 20) | (oz << 9) | ((oy >> 3) << 1)
            | sampled.astype(jnp.int32))
    return word.astype(jnp.int32)


def build_word_table_pairs(mins, maxs, dims, win_z, max_samples, volume=None,
                           threshold=0.0, span_x=MIP_SPAN_X, mip8=None):
    return build_word_table_group(mins, maxs, dims, win_z, max_samples,
                                  volume=volume, threshold=threshold,
                                  span_x=span_x, mip8=mip8, k=2)


NARROW_SPAN_X = 64  # max pair-union x extent the dual-copy narrow windows fit


def pack_pairs_narrow(volume):
    """Pair volume in the chunked dual-copy layout (2X/128, Z, Y, 128):
    chunks [0, X/128) are the pair volume cut into 128-lane panels; chunks
    [X/128, 2X/128) are the same panels shifted by 64 in x (edge-padded).
    Any x interval of length <= NARROW_SPAN_X lies inside one chunk of one of
    the two copies, so the march can DMA a (win_z, WIN_Y, 128) window instead
    of (win_z, WIN_Y, X) — half the bytes at X=256 — and the lane gather runs
    on a single 128-lane panel (no chunk select)."""
    p = pack_pairs(volume)
    Z, Y, X = p.shape
    shifted = jnp.pad(p[:, :, 64:], ((0, 0), (0, 0), (0, 64)), mode="edge")
    wide = jnp.concatenate([p, shifted], axis=2)
    n = (2 * X) // 128
    return wide.reshape(Z, Y, n, 128).transpose(2, 0, 1, 3)


@functools.partial(jax.jit, static_argnames=("dims", "max_samples", "k"))
def build_xword_table(mins, maxs, dims, max_samples, k=2):
    """Per-(tile, group) narrow-window x words: ``chunk_index << 16 | xeff``
    with ``xeff`` the volume x of window column 0.  Chunk selection: if the
    group's x interval [a, b] stays within one 128-aligned panel use copy 0's
    panel a>>7, else the 64-shifted copy's panel (a-64)>>7 — which covers any
    interval of length <= 65 that straddles a panel boundary."""
    X = dims[0]
    pmn, pmx, _ = group_unions(mins, maxs, max_samples, k=k)
    a = jnp.clip(pmn[..., 2], 0, X - 1)
    b = jnp.clip(pmx[..., 2], 0, X - 1)
    same = (a >> 7) == (b >> 7)
    k = a >> 7
    jc = jnp.maximum(a - 64, 0) >> 7
    xeff = jnp.where(same, k * 128, jc * 128 + 64)
    ci = jnp.where(same, k, X // 128 + jc)
    return ((ci << 16) | xeff).astype(jnp.int32)


def max_spans(entry_uv, direction, hit, dims, max_samples=MAX_SAMPLES):
    """Worst-case per-(tile, step) footprint extent (span_y after 8-alignment
    of the window origin, span_z); decides the compiled window height."""
    spans, _, _, _ = _footprint_scan(entry_uv, direction, hit, dims,
                                     max_samples)
    return int(spans[0]), int(spans[1])


def choose_win_z(span_z: int, cap: int = WIN_Z_MAX) -> int | None:
    """Smallest window height covering the footprint (None = unsupported,
    fall back to the jnp renderer).  z is the outer dim of the window DMA, so
    any height is legal — sampling cost scales with it, so exact is best."""
    if span_z > cap:
        return None
    return max(4, span_z)


LANE_GROUPS_DEFAULT = 4   # vregs of 128 rays per tile (CompositingPlan auto
# ladder).  G=8 was probed in round 4 (the kernels support it, see
# LANE_GROUPS_MAX) and lost the controlled 16-frame A/B: G4+narrow 10.96
# ms/frame vs G8-ladder+narrow 11.50 / G8 no-narrow 14.26 — the apparent
# early G8 win was an unnormalized-frame-count artifact
# (docs/PERF_NOTES.md round 4).
GROUP_KS = (16, 8, 4, 3, 2)  # candidate steps-per-window (besides 1)
WIN_Z_GROUP_MAX = 24      # group windows may be taller than per-step ones
G8_WIN_Z_CAP = 17         # 8-lane-group windows past this lose to G=4 ones
F_WINDOW_NS = 500.0       # modeled fixed cost per window (DMA issue + loop
# scalars + the while-carry chain — the round-4 roofline's ~850 ns/window
# residual with ~2 substeps puts the fixed share well above the sampling)
C_SAMP_QUAD_NS = 0.9      # modeled per-substep sampling cost coefficient,
# QUADRATIC in win_z (round-5 fit): a linear row model predicted k=4/8
# should win the headline and they measured 75.4 vs 98.9 Mrays/s — taller
# windows pay superlinearly (gather chunks, DMA, VMEM pressure, and the
# early-exit waste of coarser groups).  The quadratic fit reproduces every
# measured ordering: k3/wz9 > k2/wz8 > k4/wz10 >> k8/wz14 at G=4 (round
# 5), and k4/wz8 > k2/wz6 at G=2 (round 3).


def _group_cost(k: int, win_z: int, win_y: int = WIN_Y, G: int = 1) -> float:
    """Modeled cost per march step: the window-fixed share (DMA issue +
    loop scalars) amortizes over the k substeps AND is shared by all G lane
    groups, while sampling scales superlinearly with the window height PER
    lane group (see C_SAMP_QUAD_NS).  With the per-frame win_z/win_y
    entering the cost, the planner picks k per camera."""
    # coarser groups overshoot per-ray exits by (k-1)/2 substeps on
    # average; on the ~13-step early-out regime that is a few-percent tax
    # that decides near-ties toward smaller k (measured: pure k=3 beat the
    # k3/k4 mix 98.9 vs 98.0 Mrays/s on the headline orbit)
    waste = 1.0 + (k - 1) / 26.0
    return (F_WINDOW_NS / k
            + C_SAMP_QUAD_NS * win_z * win_z * (win_y / 16.0) * G) * waste


def spans_ok(entry_uv, direction, hit, dims, max_samples=MAX_SAMPLES) -> bool:
    span_y, span_z = max_spans(entry_uv, direction, hit, dims, max_samples)
    return choose_win_z(span_z) is not None and span_y <= WIN_Y


def render_compositing_pallas(volume, entry_uv, direction, hit,
                              max_samples: int = MAX_SAMPLES, wrap: str = "clamp",
                              check_spans: bool = True):
    """Drop-in fast replacement for ``render_compositing`` (clamp wrap only).

    ``volume`` is (Z, Y, X) float32 in [0, 1] (8-bit quantized and pair-packed
    in-jit for the kernel).  Falls back to the jnp renderer when the volume
    shape or the camera's tile footprints are unsupported.
    """
    from ..raycast import render_compositing

    del check_spans  # the footprint prepass also builds the DMA window table
    Z, Y, X = volume.shape
    if wrap != "clamp":
        return render_compositing(volume, entry_uv, direction, hit,
                                  max_samples, wrap)
    plan = CompositingPlan(entry_uv, direction, hit, (X, Y, Z), max_samples)
    return plan.render(volume)


class CompositingPlan:
    """Plan-once / render-many API: precomputes the tile packing and the span
    prepass for a fixed camera (ray bundle), so per-frame cost is just the
    kernel launch.  Falls back to the jnp renderer when the kernel cannot
    serve the configuration.

    The planner picks the steps-per-window ``group`` k from {1, 2, 4, 8} by
    the ``_group_cost`` model: larger k amortizes the per-window fixed cost
    (DMA issue + loop scalar work) over more substeps, at the price of a
    taller union window (more sampling rows per substep).

    With ``pooled=True`` the plan targets the compressed-domain launch
    (``render_pooled``): windows come from the sparse slab pool, so k >= 2,
    win_z <= POOL_WIN_Z_MAX, and X must split into 128-lane pair16 rows."""

    def __init__(self, entry_uv, direction, hit, dims,
                 max_samples: int = MAX_SAMPLES, pooled: bool = False,
                 lane_groups: int | None = None, win_z_cap: int | None = None,
                 _ladder=None):
        """``win_z_cap`` bounds the compiled window height — volume-sharded
        launches (``parallel.kernel_sharded`` segment kernels) need windows
        that fit one shard's z extent, so sharded callers plan with
        ``win_z_cap = local_z`` instead of relying on the cost model to
        happen to pick a short window."""
        self.entry_uv = entry_uv
        self.win_z_cap = win_z_cap
        self.direction = direction
        self.hit = hit
        self.dims = tuple(int(d) for d in dims)
        self.max_samples = int(max_samples)
        self.pooled = bool(pooled)
        X, Y, Z = self.dims
        H, W, _ = entry_uv.shape
        self.shape = (H, W)
        self.win_z = None
        self.win_y = WIN_Y
        self.group = 1
        self.xwords = None
        # lane groups: G vregs of 128 rays per tile sharing one window DMA,
        # word stream, and march loop — per-tile scalar overhead (the
        # dominant cost at the headline config, docs/PERF_NOTES.md rounds
        # 3-4) amortizes over G*128 rays at the price of larger union
        # windows.  Auto: try the widest supported G <= LANE_GROUPS_DEFAULT
        # and step down the ladder when a G's windows exceed the caps.
        if lane_groups is None:
            if _ladder is None:
                g, _ladder = LANE_GROUPS_DEFAULT, []
                while g >= 1:
                    if W % (g * TILE_W) == 0:
                        _ladder.append(g)
                    g //= 2
            G = _ladder[0] if _ladder else 1
        else:
            G = int(lane_groups)
        self.lanes = G
        shapes_ok = not (
            X % 128 != 0 or Y % 8 != 0 or Y < 8 or Z < 4
            or H % TILE_H != 0 or W % (G * TILE_W) != 0
        )
        if pooled and (X % 256 != 0 or Z % 8 != 0):
            shapes_ok = False
        if shapes_ok:
            spans, mins, maxs, texit = _footprint_scan(
                entry_uv, direction, hit, self.dims, max_samples, G=G)
            # per-ray leading-inside count, clamped so one compare covers
            # both the inside test and the max_samples cap in the kernel
            self.texit = jnp.minimum(texit, max_samples).astype(jnp.float32)
            self.mins = mins
            self.maxs = maxs
            self.span_x = int(spans[2])  # per-step; occupancy gates on it
            span_y, span_z = int(spans[0]), int(spans[1])
            # measured crossover (round 4, headline orbit): 8-lane-group
            # tiles beat 4-lane-group ones up to win_z ~17 (6.3 vs 10.9
            # ms/frame) and lose beyond (~19 ms at win_z 18-23) — cap G=8
            # windows there so oblique frames ladder down to G=4
            wz_cap = POOL_WIN_Z_MAX if pooled else (
                G8_WIN_Z_CAP if G >= 8 else WIN_Z_GROUP_MAX)
            if win_z_cap is not None:
                wz_cap = min(wz_cap, win_z_cap)

            def wy_for(sy):  # smallest window height covering the footprint
                if sy <= 8 and Y % 8 == 0 and Y >= 8:
                    return 8
                return WIN_Y if (sy <= WIN_Y and Y >= WIN_Y) else None

            best = None  # (cost, k, win_z, win_y, group_span_x)
            wy1 = wy_for(span_y)
            if G == 1 and not pooled and wy1 is not None \
                    and Z >= max(4, span_z):
                wz = choose_win_z(span_z, cap=min(WIN_Z_MAX, wz_cap))
                if wz is not None:
                    best = (_group_cost(1, wz, wy1, G), 1, wz, wy1, None)
            for k in GROUP_KS:
                _, _, gspans = group_unions(mins, maxs, max_samples, k=k)
                gwz = choose_win_z(int(gspans[1]), cap=wz_cap)
                gwy = wy_for(int(gspans[0]))
                if gwz is None or gwy is None or Z < gwz:
                    continue
                cost = _group_cost(k, gwz, gwy, G)
                if best is None or cost < best[0]:
                    best = (cost, k, gwz, gwy, int(gspans[2]))
            if best is not None:
                _, k, wz, wy, gspan_x = best
                self.group = k
                self.win_z = wz
                self.win_y = wy
                if k == 1:
                    self.words_dense = build_word_table(
                        mins, self.dims, wz, n_steps=max_samples, win_y=wy)
                else:
                    self.words_dense = build_word_table_group(
                        mins, maxs, self.dims, wz, max_samples, k=k, win_y=wy)
                    # narrow-x windows serve the dense march AND the narrow
                    # slab pool (pooled plans use them only when the pool is
                    # the narrowf32 layout — see render_pooled)
                    if gspan_x <= NARROW_SPAN_X:
                        self.xwords = build_xword_table(mins, maxs, self.dims,
                                                        max_samples, k=k)
        self.use_kernel = self.win_z is not None
        if not self.use_kernel and lane_groups is None and len(_ladder) > 1:
            # wide-tile footprints exceeded the window caps — step down the
            # lane-group ladder (e.g. 8 -> 4 -> 2 -> 1)
            self.__init__(entry_uv, direction, hit, dims, max_samples,
                          pooled, lane_groups=None, win_z_cap=win_z_cap,
                          _ladder=_ladder[1:])
            return
        if self.use_kernel:
            self.rays_packed = _pack_rays(entry_uv, direction, hit, self.dims,
                                          G=G, t_exit=self.texit)

    @property
    def pairs(self):  # backward-compat alias
        return self.group > 1

    def bind(self, volume=None, mip8=None):
        """Occupancy word table for this volume: steps whose windows are
        exactly zero are skipped (the composite of a zero sample is a no-op,
        so outputs are unchanged).  Pass ``mip8`` (a
        (ceil(Z/8), ceil(Y/8), ceil(X/8)) per-block max grid, e.g. from
        ``codecs.device.tree_occupancy_mip8``) to skip from compressed-tree
        metadata with no dense-volume pass."""
        assert self.use_kernel
        if self.group > 1:
            return build_word_table_group(self.mins, self.maxs, self.dims,
                                          self.win_z, self.max_samples,
                                          volume=volume, threshold=0.0,
                                          span_x=self.span_x, mip8=mip8,
                                          k=self.group, win_y=self.win_y)
        return build_word_table(self.mins, self.dims, self.win_z,
                                volume=volume, threshold=0.0,
                                n_steps=self.max_samples,
                                span_x=self.span_x, mip8=mip8,
                                win_y=self.win_y)

    def render(self, volume, words=None):
        """volume: (Z, Y, X) float32 in [0, 1].  Returns (rgb, alpha).
        Pass ``words=self.bind(volume)`` to skip empty space exactly."""
        from ..raycast import render_compositing

        H, W = self.shape
        if not self.use_kernel:
            return render_compositing(volume, self.entry_uv, self.direction,
                                      self.hit, self.max_samples)
        if words is None:
            words = self.words_dense
        color, alpha = _launch(self.rays_packed, words, volume,
                               self.dims, self.max_samples, win_z=self.win_z,
                               group=self.group, xwords=self.xwords,
                               win_y=self.win_y, lanes=self.lanes)
        color = _untile(color, H, W, self.lanes)
        alpha = _untile(alpha, H, W, self.lanes)
        return apply_reference_transfer(color, alpha), alpha

    def render_pooled(self, pool, slab_map, words=None):
        """Compressed-domain render from an HBM-resident sparse slab pool.
        Requires a plan constructed with ``pooled=True``.  Bit-identical
        samples/composites to the dense kernel — only the window DMA source
        differs.  The pool format picks the kernel: an int32 pool
        (``build_slab_pool``, pair16 low-memory) runs the i32half tent; an
        f32 chunk-major pool (``build_slab_pool_narrow``) runs the dense
        narrow kernel's f32-pair tent — pooled at dense speed — and needs
        the plan's narrow x words."""
        assert self.pooled and self.use_kernel
        H, W = self.shape
        if words is None:
            words = self.words_dense
        if pool.dtype == jnp.float32:
            assert self.xwords is not None, \
                "narrow pool needs narrow-x windows (camera x-span too wide)"
            color, alpha = _launch_pooled_narrow(
                self.rays_packed, words, self.xwords, pool, slab_map,
                self.dims, self.max_samples, win_z=self.win_z,
                group=self.group, win_y=self.win_y, lanes=self.lanes)
        else:
            color, alpha = _launch_pooled(
                self.rays_packed, words, pool, slab_map, self.dims,
                self.max_samples, win_z=self.win_z, group=self.group,
                win_y=self.win_y, lanes=self.lanes)
        color = _untile(color, H, W, self.lanes)
        alpha = _untile(alpha, H, W, self.lanes)
        return apply_reference_transfer(color, alpha), alpha
