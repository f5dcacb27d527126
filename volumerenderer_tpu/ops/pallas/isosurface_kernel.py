"""Pallas TPU isosurface march — fast path for ``ops/isosurface.py``.

Same tile-tube machinery as the compositing kernel (see
``raycast_kernel.py`` and docs/PERF_NOTES.md): 128-ray tiles, double-buffered
window DMAs driven by the host-precomputed SMEM word table, the shared
pair-volume tent sampler — plus **exact empty-space skipping**: the word
table (``build_word_table``) marks steps whose conservative window bound is
below the isovalue, and the kernel iterates over *sampled* steps only,
advancing ray positions across a gap with an inner loop of single-step adds
(bit-identical to marching every step).  A crossing can never complete
inside a skipped gap (``s2 >= iso`` needs a sample above the window bound),
and the crossing test after a gap uses "previous sample < iso" — guaranteed
by the bound — so hit steps and bisection brackets are exactly those of the
dense march (``isosurface.frag:126``).

Shading (4-step bisection, DELTA=0.01 central-difference normal, Phong —
``isosurface.frag:23-75``) runs as a jitted hit-masked pass against the
packed-neighborhood volume (one gather slice per trilinear eval instead of
eight): its sample offsets (±2.56 voxels at 256³) exceed the marching
window, so it cannot ride the march kernel's DMA windows.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..isosurface import DELTA, DIFFUSE, MAX_SAMPLES, SPEC_POWER, phong
from .raycast_kernel import (BIG, GROUP_KS, LANE_GROUPS_MAX, NARROW_SPAN_X,
                             T_PER, TILE_H,
                             TILE_W, WIN_Y, WIN_Z_GROUP_MAX, _first_group,
                             _footprint_scan, _group_cost, _pack_rays,
                             _pipelined_tiles, _t_per, _tile_loop, _untile,
                             _unpack_word, _window_dma, build_word_table,
                             build_word_table_group, build_xword_table,
                             choose_win_z, group_unions, pack_pairs,
                             tent_sample)


ISO_LANE_GROUPS_DEFAULT = 4  # G=8 swept in round 5 and lost (4.72 vs 6.02
# Mrays/s at the bench config — the union windows inflate faster than the
# per-tile fixed cost amortizes; docs/PERF_NOTES.md round-5 G/k sweep)


def _iso_kernel_group(rays_ref, org_ref, st_ref, vol_ref, iso_ref, out_ref,
                      slab, state, sem, *, dims, n_pos, win_z, k, win_y=WIN_Y,
                      t_per=T_PER, G=1):
    """Grouped + lane-grouped + cross-tile-pipelined isosurface march (same
    machinery as ``raycast_kernel._march_tiles_group``): k positions per DMA
    window, G vregs of rays per tile, first windows prefetched one tile
    ahead, pending ring DMAs carried across tiles.  ``st_ref`` carries the
    per-ray march state rows ([found, t_hit, latch, s_prev] per lane group
    — ``make_fresh_state`` for a fresh march, or a previous launch's state
    output for a phased resume)."""
    END = -(-n_pos // k)
    dma = _window_dma(vol_ref, slab, sem, None, False, win_z, win_y)
    _pipelined_tiles(
        org_ref, None, dma, END, t_per,
        lambda tile, mask: _iso_one_tile_group(
            rays_ref, org_ref, st_ref, vol_ref, out_ref, slab, state, sem,
            tile, mask, dims=dims, n_pos=n_pos, win_z=win_z,
            iso255=iso_ref[0, 0], k=k, win_y=win_y, G=G))


def _iso_kernel_group_narrow(rays_ref, org_ref, st_ref, xorg_ref, vol_ref,
                             iso_ref, out_ref, slab, state, sem, *, dims,
                             n_pos, win_z, k, win_y=WIN_Y, t_per=T_PER, G=1):
    """Narrow-x variant: 128-lane window panels chosen by the x word
    (``raycast_kernel.pack_pairs_narrow``) — half the window bytes at X=256
    and a single-chunk lane gather."""
    END = -(-n_pos // k)
    dma = _window_dma(vol_ref, slab, sem, None, True, win_z, win_y)
    _pipelined_tiles(
        org_ref, xorg_ref, dma, END, t_per,
        lambda tile, mask: _iso_one_tile_group(
            rays_ref, org_ref, st_ref, vol_ref, out_ref, slab, state, sem,
            tile, mask, dims=dims, n_pos=n_pos, win_z=win_z,
            iso255=iso_ref[0, 0], k=k, win_y=win_y, G=G,
            xorg_ref=xorg_ref))



def _iso_one_tile_group(rays_ref, org_ref, st_ref, vol_ref, out_ref, slab,
                        state, sem, tile, mask, *, dims, n_pos, win_z, iso255,
                        k, win_y=WIN_Y, G=1, xorg_ref=None, map_ref=None):
    """Crossing detection on the group march.  Per lane group g, state rows
    at base 8g: 0-2 pos, 3 s_prev, 4 found, 5 latch (hit & inside(pos 0),
    cleared on found AND on cube exit — see below), 6 t_hit; rows 7G..8G
    are the per-group sample staging buffer for the alive gate.

    Crossing semantics follow the REFERENCE exactly (``isosurface.frag:126``
    and the jnp march ``ops/isosurface.py``): the crossing between positions
    t-1 and t requires the ray alive at the NEAR position t-1 — the far
    sample s(t) is a clamp-sampled LOOKAHEAD that may lie outside the cube.
    On a straight ray through the convex cube the alive latch at t-1 equals
    ``hit & inside(pos 0) & inside(pos(t-1))``, so the anchor's aliveness is
    recomputed from the current position (``pos - d``) — exact across
    skipped gaps too.  After a skipped gap the (provably < iso) previous
    sample is stood in by a -1 sentinel; position 0 only seeds s_prev.

    PER-GROUP BOUND REFINEMENT (round 5): the occupancy words come from
    ``build_iso_tables`` — a window is skipped when EVERY lane group's
    (5x8x8-scale) bound is below iso, which bites ~2.4x more often than the
    old tile-union bound on the bench field (sampled 0.84 -> 0.68).  The
    skip stays exact without any in-kernel bookkeeping: a skipped window
    implies every group's samples are < iso, so the existing -1 s_prev
    sentinel covers all lanes.  In-kernel per-group ``@pl.when`` gating was
    built and MEASURED OUT (round-5 A/B: predicated tent regions cost
    ~35 ns each while one lane-group tent costs only ~30 ns — the
    words-only variant beat full predication by 80 ms/frame); the gword
    sample/minskip bits remain available for static replanning.

    Aliveness: the per-ray ``texr`` row (clamped leading-inside count from
    the footprint prepass) replaces the 6-compare bounds test with one
    broadcast compare, and the latch row folds exits at window end so the
    march stops as soon as no ray can still cross."""
    WIN_Z = win_z
    END = -(-n_pos // k)
    z0i = jnp.int32(0)

    # FIELD-MAJOR batched state (see raycast_kernel._march_one_tile_group):
    # field f at rows [f*G, (f+1)*G) — 0 px, 1 py, 2 pz, 3 s_prev, 4 found,
    # 5 latch, 6 t_hit
    e = [jnp.concatenate([rays_ref[tile, 8 * g + i:8 * g + i + 1, :]
                          for g in range(G)], axis=0) for i in range(3)]
    d = [jnp.concatenate([rays_ref[tile, 8 * g + 3 + i:8 * g + 4 + i, :]
                          for g in range(G)], axis=0) for i in range(3)]
    # texr = min(texit, n_pos - 1): position t can anchor/complete a
    # crossing only if t <= texr (see raycast_kernel._footprint_scan)
    texr = jnp.concatenate([rays_ref[tile, 8 * g + 7:8 * g + 8, :]
                            for g in range(G)], axis=0)
    p0 = [e[i] + d[i] for i in range(3)]
    state[0 * G:1 * G, :] = p0[0]
    state[1 * G:2 * G, :] = p0[1]
    state[2 * G:3 * G, :] = p0[2]
    # march state from st_ref (rows: 0..G found, G..2G t_hit, 2G..3G latch,
    # 3G..4G s_prev) — fresh or resumed, the kernel is identical
    state[3 * G:4 * G, :] = st_ref[tile, 3 * G:4 * G, :]
    state[4 * G:5 * G, :] = st_ref[tile, 0:G, :]
    state[5 * G:6 * G, :] = st_ref[tile, 2 * G:3 * G, :]
    state[6 * G:7 * G, :] = st_ref[tile, G:2 * G, :]

    narrow = xorg_ref is not None
    dma = _window_dma(vol_ref, slab, sem, map_ref, narrow, win_z, win_y)
    pslot = 2 + jax.lax.rem(tile, 2)

    def xword(t):
        return xorg_ref[tile, t] if narrow else jnp.int32(0)

    t0 = _first_group(org_ref, tile, END)
    has_win = t0 < END

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

    def substep(sslot, oz_c, oy_c, xeff, t_f, contig):
        """Position with index ``t_f`` (traced f32 scalar): sample, crossing
        test, latch updates.  ``contig``: position t-1 was sampled (its
        s_prev row is live).  The crossing anchor's aliveness and the n_pos
        cap collapse into ONE broadcast compare against the texr row:
        crossing at t needs inside(t-1) & (t < n_pos) <=> t <= texr."""
        px = state[0 * G:1 * G, :]
        py = state[1 * G:2 * G, :]
        pz = state[2 * G:3 * G, :]
        s_prev = state[3 * G:4 * G, :]
        found = state[4 * G:5 * G, :] > 0.5
        latch = state[5 * G:6 * G, :] > 0.5
        t_hit = state[6 * G:7 * G, :]
        s_n = jnp.concatenate(
            [tent_sample(slab[sslot], px[g:g + 1], py[g:g + 1], pz[g:g + 1],
                         oz_c, oy_c, dims, WIN_Z, xeff=xeff, win_y=win_y)
             for g in range(G)], axis=0)
        s_pe = jnp.where(contig, s_prev,
                         jnp.full((G, 128), -1.0, jnp.float32))
        crossing = (latch & (texr >= t_f) & (t_f > 0)
                    & (s_pe < iso255) & (s_n >= iso255) & ~found)
        t_hit = jnp.where(crossing,
                          jnp.broadcast_to(t_f - 1.0, t_hit.shape), t_hit)
        found = found | crossing
        latch = latch & ~found
        state[3 * G:4 * G, :] = s_n
        state[4 * G:5 * G, :] = jnp.where(found, 1.0, 0.0)
        state[5 * G:6 * G, :] = jnp.where(latch, 1.0, 0.0)
        state[6 * G:7 * G, :] = t_hit
        # no ray can cross at any t' > t once texr < t' — fold the bound
        # into the liveness the loop exit reduces over (gating only; the
        # crossing test above re-derives its own anchor each substep)
        return latch & (texr > t_f)

    def body(carry):
        pi, t_cur, cnt, agbits, pend, pendx, mask = carry
        is_first = cnt == 0
        slot_i = jax.lax.rem(cnt, 2)
        # == rem(cnt-1, 2) for cnt >= 1, non-negative so shifts are defined
        slot_s = jax.lax.rem(cnt + 1, 2)
        sslot = jnp.where(is_first, pslot, slot_s)
        w = org_ref[tile, t_cur]
        nd, _, _, _ = _unpack_word(w)
        _, oz_c, oy_c, _ = _unpack_word(pend)
        xeff = pendx & 0xFFFF
        # the first processed window reads the s_prev ROW (self-describing:
        # -1 fresh sentinel, a real value, or the phase driver's rewrite) —
        # later windows use the word-chain adjacency as before
        contig0 = (k * t_cur == pi + 1) | is_first

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
        x_next = xword(t_issue)
        _, oz_n, oy_n, _ = _unpack_word(w_next)

        @pl.when((nd > 0) & (((mask >> slot_i) & 1) == 1))
        def _():
            dma(slot_i, z0i, z0i, z0i).wait()

        @pl.when(nd > 0)
        def _():
            dma(slot_i, oz_n, oy_n, x_next).start()

        mask = jnp.where(nd > 0, mask | (1 << slot_i), mask)

        t_f = (k * t_cur).astype(jnp.float32)
        substep(sslot, oz_c, oy_c, xeff, t_f, contig0)
        alive = jnp.zeros((G, 128), jnp.bool_)
        for j in range(1, k):
            advance()
            alive = substep(sslot, oz_c, oy_c, xeff, t_f + float(j),
                            jnp.bool_(True))
        # the any's scalar result is consumed one iteration later (by cond)
        # — the vector->scalar sync overlaps the next window's DMA wait
        return (k * t_cur + (k - 1), t_next, cnt + 1, jnp.any(alive), w_next,
                x_next, mask)

    def cond(carry):
        _, t_cur, _, any_alive, _, _, _ = carry
        return (t_cur < END) & any_alive

    any0 = jnp.any(state[5 * G:6 * G, :] > 0.5)
    # the initial pi convention: no position has been processed, and the
    # first group's gap-run must advance k*t0 steps from position 0 — pi = 0
    # with contig0 = (k*t0 == 1) would wrongly mark position 1 contiguous
    # after a skipped group 0, except a skipped group 0 implies its bound
    # < iso so the sentinel and the stored init (-1) agree — contig is
    # harmless there.  pi = 0 keeps the gap-run arithmetic of the
    # compositing kernel (advance count = k*t_cur - pi from position 0).
    end = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), t0, jnp.int32(0), any0, pend0, pendx0, mask))
    # out rows: 0..G found, G..2G t_hit, 2G..3G latch, 3G..4G s_prev —
    # the same layout st_ref consumes, so a later phase resumes from it
    out_ref[tile, 0:G, :] = state[4 * G:5 * G, :]
    out_ref[tile, G:2 * G, :] = state[6 * G:7 * G, :]
    out_ref[tile, 2 * G:3 * G, :] = state[5 * G:6 * G, :]
    out_ref[tile, 3 * G:4 * G, :] = state[3 * G:4 * G, :]
    return end[6]


def _iso_kernel_group_pooled_narrow(rays_ref, org_ref, st_ref, xorg_ref,
                                    map_ref, vol_ref, iso_ref, out_ref, slab,
                                    state, sem, *, dims, n_pos, win_z, k,
                                    win_y=WIN_Y, t_per=T_PER, G=1):
    """Grouped iso march over the NARROW slab pool
    (``raycast_kernel.build_slab_pool_narrow``): the dense narrow kernel's
    windows/tents with sparse HBM residency — replaces the per-step G=1
    pooled iso kernel as the compressed-domain fast path (round 5)."""
    END = -(-n_pos // k)
    dma = _window_dma(vol_ref, slab, sem, map_ref, True, win_z, win_y)
    _pipelined_tiles(
        org_ref, xorg_ref, dma, END, t_per,
        lambda tile, mask: _iso_one_tile_group(
            rays_ref, org_ref, st_ref, vol_ref, out_ref, slab, state, sem,
            tile, mask, dims=dims, n_pos=n_pos, win_z=win_z,
            iso255=iso_ref[0, 0], k=k, win_y=win_y, G=G,
            xorg_ref=xorg_ref, map_ref=map_ref))


def _iso_kernel(rays_ref, org_ref, vol_ref, iso_ref, out_ref, slab, state,
                sem, *, dims, max_samples, win_z, win_y=WIN_Y, t_per=T_PER):
    _tile_loop(lambda tile: _iso_one_tile(
        rays_ref, org_ref, vol_ref, out_ref, slab, state, sem, tile,
        dims=dims, max_samples=max_samples, win_z=win_z,
        iso255=iso_ref[0, 0], win_y=win_y), t_per)


def _iso_kernel_pooled(rays_ref, org_ref, map_ref, vol_ref, iso_ref, out_ref,
                       slab, state, sem, *, dims, max_samples, win_z,
                       win_y=WIN_Y, t_per=T_PER):
    _tile_loop(lambda tile: _iso_one_tile(
        rays_ref, org_ref, vol_ref, out_ref, slab, state, sem, tile,
        dims=dims, max_samples=max_samples, win_z=win_z,
        iso255=iso_ref[0, 0], map_ref=map_ref, fmt="i32half",
        win_y=win_y), t_per)


def _iso_one_tile(rays_ref, org_ref, vol_ref, out_ref, slab, state, sem,
                  tile, *, dims, max_samples, win_z, iso255, map_ref=None,
                  fmt="f32pair", win_y=WIN_Y):
    X, Y, Z = dims
    WIN_Z = win_z
    END = max_samples + 1  # one-past-last valid sample position index

    def dma(slot, oz, oy):
        if map_ref is not None:
            # pooled mode: the volume is the sparse slab pool of
            # ``raycast_kernel.build_slab_pool`` — window rows live at
            # [oz & 7, oz & 7 + WIN_Z) of slot map_ref[0, oz >> 3]
            src = vol_ref.at[map_ref[0, oz >> 3], pl.ds(oz & 7, WIN_Z),
                             pl.ds(oy, win_y), :]
        else:
            src = vol_ref.at[pl.ds(oz, WIN_Z), pl.ds(oy, win_y), :]
        return pltpu.make_async_copy(src, slab.at[slot], sem.at[slot])

    # state rows: 0-2 pos (at step t_prev), 3 s(t_prev), 4 found, 5 latch
    # (hit & inside(pos 0), cleared on found), 6 t_hit.  Crossing semantics
    # match the reference exactly (see _iso_one_tile_group): the crossing
    # between t-1 and t requires the ray alive at the NEAR position t-1
    # (recomputed from pos - d), the far sample being a clamp-sampled
    # lookahead that may lie outside the cube.
    e = [rays_ref[tile, i:i + 1, :] for i in range(3)]
    d = [rays_ref[tile, 3 + i:4 + i, :] for i in range(3)]
    hit0 = rays_ref[tile, 6:7, :] > 0.5

    # prologue: position 0; sample it synchronously iff its word says so
    p0 = [e[i] + d[i] for i in range(3)]
    in0 = ((p0[0] > 0.0) & (p0[0] < 1.0) & (p0[1] > 0.0) & (p0[1] < 1.0)
           & (p0[2] > 0.0) & (p0[2] < 1.0))
    w0 = org_ref[tile, 0]
    nd0, oz0, oy0, s0bit = _unpack_word(w0)
    state[0:1, :] = p0[0]
    state[1:2, :] = p0[1]
    state[2:3, :] = p0[2]
    # skipped position 0 is provably < iso: any value < iso255 stands in
    state[3:4, :] = jnp.full((1, 128), -1.0, jnp.float32)
    state[4:5, :] = jnp.zeros((1, 128), jnp.float32)
    state[5:6, :] = jnp.where(hit0 & in0, 1.0, 0.0)
    state[6:7, :] = jnp.full((1, 128), -1.0, jnp.float32)

    @pl.when(s0bit == 1)
    def _():
        cp = dma(0, oz0, oy0)
        cp.start()
        cp.wait()
        state[3:4, :] = tent_sample(slab[0], p0[0], p0[1], p0[2], oz0, oy0,
                                    dims, WIN_Z, fmt=fmt, win_y=win_y)

    cnt0 = s0bit  # samples completed so far; pending DMA lives in slot cnt&1
    t1 = jnp.where(nd0 > 0, nd0, END)
    # always keep exactly one DMA in flight (dummy re-fetch of window 0 when
    # the march is already over) so the drain logic is unconditional
    t_issue = jnp.where(nd0 > 0, nd0, 0)
    w1 = org_ref[tile, t_issue]
    _, ozp, oyp, _ = _unpack_word(w1)
    dma(jax.lax.rem(cnt0, 2), ozp, oyp).start()

    def body(carry):
        t_prev, t_cur, cnt, _, pend = carry
        slot = jax.lax.rem(cnt, 2)
        w = org_ref[tile, t_cur]
        nd, _, _, _ = _unpack_word(w)
        _, oz_c, oy_c, _ = _unpack_word(pend)

        # gap-run: advance positions one step at a time (bit-exact with the
        # dense march) until pos is at step t_cur
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
        s_k = state[3:4, :]
        found = state[4:5, :] > 0.5
        latch = state[5:6, :] > 0.5
        t_hit = state[6:7, :]

        qx = px - d[0]
        qy = py - d[1]
        qz = pz - d[2]
        inside_p = ((qx > 0.0) & (qx < 1.0) & (qy > 0.0) & (qy < 1.0)
                    & (qz > 0.0) & (qz < 1.0))

        dma(slot, oz_c, oy_c).wait()
        s_n = tent_sample(slab[slot], px, py, pz, oz_c, oy_c, dims, WIN_Z,
                          fmt=fmt, win_y=win_y)

        # issue the DMA for the next sampled step (or a dummy re-fetch)
        t_next = jnp.where(nd > 0, t_cur + nd, END)
        t_issue = jnp.where(nd > 0, t_cur + nd, t_cur)
        w_next = org_ref[tile, t_issue]
        _, oz_n, oy_n, _ = _unpack_word(w_next)
        dma(jax.lax.rem(cnt + 1, 2), oz_n, oy_n).start()

        # after a gap the (skipped) previous sample is provably < iso
        s_prev = jnp.where(t_cur - t_prev == 1, s_k,
                           jnp.full((1, 128), -1.0, jnp.float32))
        crossing = (latch & inside_p & (s_prev < iso255) & (s_n >= iso255)
                    & ~found)
        t_hit = jnp.where(
            crossing,
            jnp.broadcast_to((t_cur - 1).astype(jnp.float32), t_hit.shape),
            t_hit)
        found = found | crossing
        latch = latch & ~found
        alive = latch & inside_p  # outside rays survive one lookahead step

        state[3:4, :] = s_n
        state[4:5, :] = jnp.where(found, 1.0, 0.0)
        state[5:6, :] = jnp.where(latch, 1.0, 0.0)
        state[6:7, :] = t_hit
        return t_cur, t_next, cnt + 1, jnp.any(alive), w_next

    def cond(carry):
        _, t_cur, _, any_alive, _ = carry
        return (t_cur < END) & any_alive

    end = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t1, cnt0, jnp.any(hit0 & in0), w1))
    # exactly one DMA is always in flight — drain it
    _, oz_e, oy_e, _ = _unpack_word(end[4])
    dma(jax.lax.rem(end[2], 2), oz_e, oy_e).wait()
    out_ref[tile, 0:1, :] = state[4:5, :]   # found
    out_ref[tile, 1:2, :] = state[6:7, :]   # t_hit


@functools.partial(jax.jit, static_argnames=("dims", "n_pos", "win_z",
                                             "win_y", "group", "lanes"))
def _launch_group(rays_packed, words, volume, iso255, dims, n_pos, win_z=4,
                  win_y=WIN_Y, group=2, lanes=1, xwords=None, state0=None):
    """Grouped iso launch: k positions per window, G lane groups per tile,
    cross-tile DMA pipeline — the fast iso march (docs/PERF_NOTES.md round 3:
    the per-step kernel paid ~2 exposed DMA latencies and a full scalar loop
    per tile per step).  With ``xwords`` the windows are 128-lane narrow-x
    panels (``pack_pairs_narrow``) — half the bytes and a single-chunk
    gather.  ``state0`` is the (tiles, 4G, 128) per-ray march state
    (``make_fresh_state`` or a prior launch's state rows) — the phased
    march resumes by passing a rebuilt word table + the previous state.

    Returns (found, t_hit, state_out) with state_out in the same 4G-row
    layout as ``state0``."""
    from .raycast_kernel import pack_pairs_narrow

    n_tiles = rays_packed.shape[0]
    G = lanes
    k = group
    t_per = _t_per(n_tiles)
    n_words = -(-n_pos // k)
    narrow = xwords is not None
    assert k > 1 and 1 <= G <= LANE_GROUPS_MAX, (k, G)
    assert rays_packed.shape[1] == 8 * G, rays_packed.shape
    assert words.shape == (n_tiles, n_words), (words.shape, n_words)
    assert state0 is not None and state0.shape == (n_tiles, 4 * G, 128),         None if state0 is None else state0.shape
    word_spec = pl.BlockSpec((t_per, n_words), lambda i: (i, 0),
                             memory_space=pltpu.SMEM)
    ray_spec = pl.BlockSpec((t_per, 8 * G, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((t_per, 4 * G, 128), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    iso_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    if narrow:
        assert xwords.shape == (n_tiles, n_words), xwords.shape
        vol_pairs = pack_pairs_narrow(volume)
        slab_w = 128
        kernel = functools.partial(_iso_kernel_group_narrow, dims=dims,
                                   n_pos=n_pos, win_z=win_z, k=k,
                                   win_y=win_y, t_per=t_per, G=G)
        in_specs = [ray_spec, word_spec, st_spec, word_spec,
                    pl.BlockSpec(memory_space=pl.ANY), iso_spec]
        operands = (rays_packed, words, state0, xwords, vol_pairs, iso255)
    else:
        vol_pairs = pack_pairs(volume)
        slab_w = dims[0]
        kernel = functools.partial(_iso_kernel_group, dims=dims, n_pos=n_pos,
                                   win_z=win_z, k=k, win_y=win_y,
                                   t_per=t_per, G=G)
        in_specs = [ray_spec, word_spec, st_spec,
                    pl.BlockSpec(memory_space=pl.ANY), iso_spec]
        operands = (rays_packed, words, state0, vol_pairs, iso255)
    out_rows = max(8, 4 * G)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles // t_per,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((t_per, out_rows, 128),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, out_rows, 128),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, win_z, win_y, slab_w), jnp.float32),
            pltpu.VMEM((8 * G, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )(*operands)
    return out[:, 0:G, :], out[:, G:2 * G, :], out[:, 0:4 * G, :]


@functools.partial(jax.jit, static_argnames=("dims", "n_pos", "win_z",
                                             "win_y", "group", "lanes"))
def _launch_group_pooled_narrow(rays_packed, words, xwords, pool, slab_map,
                                iso255, dims, n_pos, win_z=4, win_y=WIN_Y,
                                group=2, lanes=1, state0=None):
    """Grouped iso march from the narrow slab pool: same returns as
    ``_launch_group`` ((found, t_hit, state_out))."""
    from .raycast_kernel import POOL_WIN_Z_MAX, SLAB_H

    n_tiles = rays_packed.shape[0]
    G = lanes
    k = group
    X, Y, Z = dims
    t_per = _t_per(n_tiles)
    n_words = -(-n_pos // k)
    assert k > 1 and 1 <= G <= LANE_GROUPS_MAX, (k, G)
    assert win_z <= POOL_WIN_Z_MAX, win_z
    assert words.shape == (n_tiles, n_words), (words.shape, n_words)
    assert xwords is not None and xwords.shape == (n_tiles, n_words)
    assert pool.shape[0] == (2 * X) // 128 and pool.shape[2:] == (Y, 128), \
        pool.shape
    assert slab_map.shape == (1, Z // 8), slab_map.shape
    assert state0 is not None and state0.shape == (n_tiles, 4 * G, 128)
    word_spec = pl.BlockSpec((t_per, n_words), lambda i: (i, 0),
                             memory_space=pltpu.SMEM)
    ray_spec = pl.BlockSpec((t_per, 8 * G, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((t_per, 4 * G, 128), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    iso_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    map_spec = pl.BlockSpec((1, Z // 8), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    kernel = functools.partial(_iso_kernel_group_pooled_narrow, dims=dims,
                               n_pos=n_pos, win_z=win_z, k=k, win_y=win_y,
                               t_per=t_per, G=G)
    out_rows = max(8, 4 * G)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles // t_per,),
        in_specs=[ray_spec, word_spec, st_spec, word_spec, map_spec,
                  pl.BlockSpec(memory_space=pl.ANY), iso_spec],
        out_specs=pl.BlockSpec((t_per, out_rows, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, out_rows, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, win_z, win_y, 128), jnp.float32),
            pltpu.VMEM((8 * G, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )(rays_packed, words, state0, xwords, slab_map, pool, iso255)
    return out[:, 0:G, :], out[:, G:2 * G, :], out[:, 0:4 * G, :]


@functools.partial(jax.jit, static_argnames=("dims", "G"))
def make_fresh_state(entry_uv, direction, hit, dims, G):
    """(tiles, 4G, 128) march-state rows for a fresh march: found=0,
    t_hit=-1, latch=hit & inside(pos 0), s_prev=-1.  ``inside(pos 0)`` is
    computed with the identical f32 ops the kernel's position init uses
    (entry + step), so the latch is bit-consistent."""
    from .raycast_kernel import _tile_lanes

    X, Y, Z = dims
    step = direction * jnp.array([1.0 / X, 1.0 / Y, 1.0 / Z], jnp.float32)
    p0 = entry_uv + step
    in0 = jnp.all((p0 > 0.0) & (p0 < 1.0), axis=-1)
    latch0 = _tile_lanes((hit & in0).astype(jnp.float32), G)
    zeros = jnp.zeros_like(latch0)
    neg1 = jnp.full_like(latch0, -1.0)
    return jnp.concatenate([zeros, neg1, latch0, neg1], axis=1)


@functools.partial(jax.jit, static_argnames=("G", "a", "b"))
def _phase_words(base_words, gwords, alive_bits, a, b, G):
    """Phase-i word table: window p in [a, b) is sampled iff some lane
    group has BOTH its bound bit set (``build_iso_tables``) and a ray that
    can still cross (``alive_bits``, (tiles,) int32 bitmask; None = all).
    The nd chain is rebuilt; oz/oy origins ride through from the base
    words."""
    T, P = base_words.shape
    gmask = gwords & ((1 << G) - 1)
    act = gmask if alive_bits is None else (gmask & alive_bits[:, None])
    idx = jnp.arange(P, dtype=jnp.int32)
    sampled = (act != 0) & ((base_words & 1) == 1) & (idx >= a) & (idx < b)
    nxt = jnp.where(sampled, idx, jnp.int32(4 * P + 4))
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(nxt, axis=1), axis=1), axis=1)
    after = jnp.concatenate(
        [nxt[:, 1:], jnp.full((T, 1), 4 * P + 4, jnp.int32)], axis=1)
    nd = jnp.where(after < P, after - idx, 0)
    keep = base_words & ~((0x3FF << 20) | 1)
    return (keep | (nd << 20) | sampled.astype(jnp.int32)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("G", "phase_end", "n_pos"))
def _alive_bits(state, texr, phase_end, n_pos, G):
    """Per-tile lane-group bitmask of rays that can STILL cross after the
    finished phase: latch set AND the crossable range (min(texit, n_pos-1))
    extends past the phase's last position."""
    latch_rows = state[:, 2 * G:3 * G, :]
    tex = jnp.minimum(texr.astype(jnp.float32), float(n_pos - 1))
    crossable = (latch_rows > 0.5) & (tex > float(phase_end))
    return jnp.sum(
        jnp.any(crossable, axis=2).astype(jnp.int32)
        * (1 << jnp.arange(G, dtype=jnp.int32))[None, :], axis=1)


@functools.partial(jax.jit, static_argnames=("G", "a"))
def _rewrite_sprev(state, prev_words, new_words, a, G):
    """Make the s_prev rows valid stand-ins at the next phase's first
    window: keep the real row only where that window is chain-adjacent to
    a window the previous phase actually sampled; otherwise the -1
    sentinel is exact (every intervening window was skipped because every
    still-crossable group's bound was < iso)."""
    T = state.shape[0]
    sampled_new = (new_words & 1) == 1
    anyw = sampled_new.any(axis=1)
    f = jnp.argmax(sampled_new, axis=1)
    P = prev_words.shape[1]
    prevbit = prev_words[jnp.arange(T), jnp.clip(f - 1, 0, P - 1)] & 1
    flag = anyw & (f == a) & (f >= 1) & (prevbit == 1)
    sprev = state[:, 3 * G:4 * G, :]
    return state.at[:, 3 * G:4 * G, :].set(
        jnp.where(flag[:, None, None], sprev, -1.0))


def march_phased(rays_packed, words, gwords, state0, texr, volume, iso255,
                 dims, n_pos, win_z, win_y, k, G, xwords=None,
                 boundaries=()):
    """Phase-replanned iso march (round 5): split the march at static group
    boundaries; between phases, rebuild the word table ON DEVICE with dead
    lane groups' bound bits masked out (``_phase_words``), so drag-regime
    windows whose crossable rays are all gone VANISH from the nd chain —
    fine-grained early-out at word-table cost instead of in-kernel
    predication (which measured out, see module docstring).  Exactness:
    identical samples at every surviving (window, ray) pair; removed
    windows provably cannot host a crossing for any still-crossable ray.

    MEASURED OFF BY DEFAULT on the bench field (round 5): boundaries
    (48,104) marched 128.5 ms vs 124.9 single-phase, (32,72,120) 129.7 —
    with 128 coherent rays per lane group, one straggler keeps the whole
    group alive, so too few windows vanish to cover the extra launch +
    state-threading cost.  The machinery stays (parity-tested across
    boundary placements) for fields/cameras where groups die together.

    ``texr`` is the plan's (tiles, G, 128) leading-inside counts.  Returns
    (found_t, t_hit_t)."""
    P = -(-n_pos // k)
    cuts = [0] + sorted(int(b) for b in boundaries if 0 < b < P) + [P]
    st = state0
    alive = None
    prev_w = None
    for a, b in zip(cuts[:-1], cuts[1:]):
        w_i = _phase_words(words, gwords, alive, a, b, G)
        if prev_w is not None:
            st = _rewrite_sprev(st, prev_w, w_i, a, G)
        found_t, t_hit_t, st = _launch_group(
            rays_packed, w_i, volume, iso255, dims, n_pos, win_z=win_z,
            win_y=win_y, group=k, lanes=G, xwords=xwords, state0=st)
        prev_w = w_i
        if b < P:
            alive = _alive_bits(st, texr, k * b - 1, n_pos, G)
    return found_t, t_hit_t


@functools.partial(jax.jit, static_argnames=("dims", "max_samples", "win_z",
                                              "win_y"))
def _launch(rays_packed, words, volume, iso255, dims, max_samples, win_z=4,
            win_y=WIN_Y):
    n_tiles = rays_packed.shape[0]
    t_per = _t_per(n_tiles)
    # the iso march samples positions 0..max_samples, so the word table
    # carries max_samples + 2 entries (one-past for the dummy prefetch)
    assert words.shape == (n_tiles, max_samples + 2), words.shape
    vol_pairs = pack_pairs(volume)
    kernel = functools.partial(_iso_kernel, dims=dims,
                               max_samples=max_samples, win_z=win_z,
                               win_y=win_y, t_per=t_per)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles // t_per,),
        in_specs=[
            pl.BlockSpec((t_per, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_per, max_samples + 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((t_per, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, win_z, win_y, dims[0]), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(rays_packed, words, vol_pairs, iso255)
    return out[:, 0, :], out[:, 1, :]


@functools.partial(jax.jit, static_argnames=("dims", "max_samples", "win_z",
                                              "win_y"))
def _launch_pooled(rays_packed, words, pool, slab_map, iso255, dims,
                   max_samples, win_z=4, win_y=WIN_Y):
    """Compressed-domain iso launch: the volume operand is the sparse slab
    pool of ``raycast_kernel.build_slab_pool`` (pair16 words) + its SMEM
    slab map — no dense pair volume on device."""
    from .raycast_kernel import POOL_WIN_Z_MAX, SLAB_H

    n_tiles = rays_packed.shape[0]
    X, Y, Z = dims
    t_per = _t_per(n_tiles)
    assert win_z <= POOL_WIN_Z_MAX, win_z
    assert words.shape == (n_tiles, max_samples + 2), words.shape
    assert pool.shape[1:] == (SLAB_H, Y, X // 2), pool.shape
    assert slab_map.shape == (1, Z // 8), slab_map.shape
    kernel = functools.partial(_iso_kernel_pooled, dims=dims,
                               max_samples=max_samples, win_z=win_z,
                               win_y=win_y, t_per=t_per)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles // t_per,),
        in_specs=[
            pl.BlockSpec((t_per, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_per, max_samples + 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Z // 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((t_per, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, win_z, win_y, X // 2), jnp.int32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(rays_packed, words, slab_map, pool, iso255)
    return out[:, 0, :], out[:, 1, :]


# ---------------------------------------------------------------------------
# Per-(tile, window, lane-group) occupancy bounds (round 5).
#
# The tile-level occupancy words skip only 16% of windows on the bench
# turbulence field at the median isovalue: their conservative cell covers a
# 16x16x24-voxel reach (the union footprint of 512 rays x k steps relative
# to an 8-aligned corner), far wider than the field's correlation length.
# A single LANE GROUP's k-step union box is ~5x8x8 voxels, at which scale
# the same field is ~38% skippable (max < iso) plus ~40% single-sampleable
# (min >= iso) — measured on the bench volume.  ``build_iso_tables`` gathers
# per-(tile, window, lane-group) max/min bounds from 4³-block grids
# (forward-expanded so one gather bounds the whole box) and packs them into
# a second SMEM word table:
#
#     bits 0..G-1   sample: group g's window bound may reach iso
#     bits 8..8+G-1 minskip: every tap in group g's box is >= iso — only the
#                   FIRST position of the window can complete a crossing, so
#                   substeps 1..k-1 skip their tent_samples
#
# Exactness: a max-skipped group's staged sample row is set to the -1
# sentinel (its true samples are provably < iso, so every crossing test the
# row feeds — "previous sample < iso" — evaluates as the truth would); a
# min-skipped group's staged row holds its first-position sample (>= iso),
# which masks in-window crossings exactly as the true >= iso samples would.
# The bound boxes include clamp-sampled lookahead positions (rays whose
# previous position was inside), so every sample a crossing can read is
# bounded.

BOUND_BLOCK = 4  # bound-grid granularity (voxels per cell per axis)


def _block_reduce4(s, pad_value, use_max):
    Z, Y, X = s.shape
    b = BOUND_BLOCK
    pz, py, px = (-Z) % b, (-Y) % b, (-X) % b
    if pz or py or px:
        s = jnp.pad(s, ((0, pz), (0, py), (0, px)),
                    constant_values=pad_value)
    r = s.reshape((Z + pz) // b, b, (Y + py) // b, b, (X + px) // b, b)
    return r.max(axis=(1, 3, 5)) if use_max else r.min(axis=(1, 3, 5))


def _fwd_expand(m, axis, reach, use_max):
    """Forward reduction so cell i bounds cells [i, i + reach) (edge cells
    repeat — conservative under clamp-to-edge sampling)."""
    out = m
    for r in range(1, reach):
        shifted = jnp.concatenate(
            [jax.lax.slice_in_dim(m, r, m.shape[axis], axis=axis),
             jnp.repeat(jax.lax.slice_in_dim(m, m.shape[axis] - 1,
                                             m.shape[axis], axis=axis),
                        r, axis=axis)], axis=axis)
        out = jnp.maximum(out, shifted) if use_max else \
            jnp.minimum(out, shifted)
    return out


@functools.partial(jax.jit, static_argnames=("dims", "win_z", "n_pos", "k",
                                             "win_y", "reaches", "G"))
def build_iso_tables(mins, maxs, gmins, gmaxs, dims, win_z, n_pos, k, win_y,
                     volume, iso255f, reaches, G):
    """Build (words, gwords) for the grouped iso march: the tile-level
    control words (same packing as ``build_word_table_group``, with the
    sampled bit refined to "ANY lane group's bound reaches iso") plus the
    per-(tile, window, lane-group) bound words described above."""
    X, Y, Z = dims
    P = -(-n_pos // k)
    T = mins.shape[0]
    # tile-union window origins (identical to build_word_table_group)
    pmn, _, _ = group_unions(mins, maxs, n_pos, k=k)
    oy = jnp.clip((pmn[..., 0] // 8) * 8, 0, Y - win_y)
    oz = jnp.clip(pmn[..., 1], 0, Z - win_z)

    # per-(window, lane-group) union boxes ([y, z, x] mins/maxs)
    pad = k * P - n_pos

    def pad_to(a, fill):
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((T, pad) + a.shape[2:], fill, a.dtype)], axis=1)
        return a

    gmn = pad_to(gmins[:, :n_pos], BIG).reshape(T, P, k, G, 3).min(axis=2)
    gmx = pad_to(gmaxs[:, :n_pos], -BIG).reshape(T, P, k, G, 3).max(axis=2)
    nonempty = gmx[..., 0] >= gmn[..., 0]  # (T, P, G)

    s8 = jnp.round(jnp.clip(volume, 0.0, 1.0) * 255.0)
    m4 = _block_reduce4(s8, 0.0, True)
    n4 = _block_reduce4(s8, 255.0, False)
    rz, ry, rx = reaches
    m4 = _fwd_expand(_fwd_expand(_fwd_expand(m4, 0, rz, True),
                                 1, ry, True), 2, rx, True)
    n4 = _fwd_expand(_fwd_expand(_fwd_expand(n4, 0, rz, False),
                                 1, ry, False), 2, rx, False)
    iz = jnp.clip(gmn[..., 1], 0, Z - 1) >> 2
    iy = jnp.clip(gmn[..., 0], 0, Y - 1) >> 2
    ix = jnp.clip(gmn[..., 2], 0, X - 1) >> 2
    # integer grid values: > iso - 1e-3  <=>  >= iso (build_word_table conv.)
    thr = iso255f - 1e-3
    sample = nonempty & (m4[iz, iy, ix] > thr)
    minskip = nonempty & (n4[iz, iy, ix] >= iso255f)

    sampled = sample.any(axis=2)
    idx = jnp.arange(P, dtype=jnp.int32)
    nxt = jnp.where(sampled, idx, jnp.int32(4 * P + 4))
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(nxt, axis=1), axis=1), axis=1)
    after = jnp.concatenate(
        [nxt[:, 1:], jnp.full((T, 1), 4 * P + 4, jnp.int32)], axis=1)
    nd = jnp.where(after < P, after - idx, 0)
    word = ((nd << 20) | (oz << 9) | ((oy >> 3) << 1)
            | sampled.astype(jnp.int32))
    bitg = (1 << jnp.arange(G, dtype=jnp.int32))
    gword = (jnp.sum(jnp.where(sample, bitg, 0), axis=2)
             | (jnp.sum(jnp.where(minskip, bitg, 0), axis=2) << 8))
    return word.astype(jnp.int32), gword.astype(jnp.int32)


def bound_reaches(gspans) -> tuple[int, int, int]:
    """Static per-axis forward reaches: a box of span s starting anywhere in
    a cell is covered by ``ceil((s + b - 1) / b)`` cells of size b."""
    b = BOUND_BLOCK
    sy, sz, sx = (int(gspans[0]), int(gspans[1]), int(gspans[2]))
    return (-(-(sz + b - 1) // b), -(-(sy + b - 1) // b),
            -(-(sx + b - 1) // b))


@functools.partial(jax.jit, static_argnames=("n_pos", "k"))
def _group_span_max(gmins, gmaxs, n_pos, k):
    """Worst-case per-(window, lane-group) union box extents ((3,) [y,z,x])
    — the static input to ``bound_reaches``."""
    T, _, G, _ = gmins.shape
    P = -(-n_pos // k)
    pad = k * P - n_pos
    mn = gmins[:, :n_pos]
    mx = gmaxs[:, :n_pos]
    if pad:
        mn = jnp.concatenate(
            [mn, jnp.full((T, pad, G, 3), BIG, mn.dtype)], axis=1)
        mx = jnp.concatenate(
            [mx, jnp.full((T, pad, G, 3), -BIG, mx.dtype)], axis=1)
    gmn = mn.reshape(T, P, k, G, 3).min(axis=2)
    gmx = mx.reshape(T, P, k, G, 3).max(axis=2)
    ne = (gmx[..., 0] >= gmn[..., 0])[..., None]
    return jnp.where(ne, gmx - gmn + 1, 0).max(axis=(0, 1, 2))


class IsosurfacePlan:
    """Plan-once / render-many isosurface raycaster.  ``bind(volume)`` builds
    the occupancy word table so empty space is skipped exactly; unbound plans
    sample every step."""

    def __init__(self, entry_uv, direction, hit, dims,
                 max_samples: int = MAX_SAMPLES, pooled: bool = False,
                 lane_groups: int | None = None):
        self.entry_uv = entry_uv
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
        if lane_groups is None:
            G = ISO_LANE_GROUPS_DEFAULT
            while G > 1 and W % (G * TILE_W) != 0:
                G //= 2
        else:
            G = int(lane_groups)
        self.lanes = G
        shapes_ok = not (X % 128 != 0 or Y % 8 != 0 or Y < 8 or Z < 4
                         or H % TILE_H != 0 or W % (G * TILE_W) != 0)
        if pooled and (X % 256 != 0 or Z % 8 != 0):
            shapes_ok = False
        self.gwords = None
        self.gmins = self.gmaxs = None
        if shapes_ok:
            n_pos = self.max_samples + 1  # sampled positions 0..max_samples
            spans, mins, maxs, gmins, gmaxs, texit = _footprint_scan(
                entry_uv, direction, hit, self.dims, n_pos, G=G,
                per_group=True)
            self.texit = texit
            self.gmins, self.gmaxs = gmins, gmaxs
            span_y, span_z = int(spans[0]), int(spans[1])

            def wy_for(sy):
                if sy <= 8 and Y >= 8:
                    return 8
                return WIN_Y if (sy <= WIN_Y and Y >= WIN_Y) else None

            self.mins = mins
            self.maxs = maxs
            self.span_x = int(spans[2])
            best = None  # (cost, k, win_z, win_y)
            wz1 = choose_win_z(span_z)
            wy1 = wy_for(span_y)
            # pooled group marching sources windows from the NARROW slab
            # pool (round 5): cap win_z to the pool's slab coverage and
            # require narrow-fitting x spans; otherwise fall back to the
            # per-step pooled kernel below
            from .raycast_kernel import POOL_WIN_Z_MAX

            wz_cap = POOL_WIN_Z_MAX if pooled else WIN_Z_GROUP_MAX
            for k in GROUP_KS:
                _, _, gs = group_unions(mins, maxs, n_pos, k=k)
                gwz = choose_win_z(int(gs[1]), cap=wz_cap)
                gwy = wy_for(int(gs[0]))
                if gwz is None or gwy is None or Z < gwz:
                    continue
                if pooled and int(gs[2]) > NARROW_SPAN_X:
                    continue
                cost = _group_cost(k, gwz, gwy, G)
                if best is None or cost < best[0]:
                    best = (cost, k, gwz, gwy)
            if best is not None:
                _, k, wz, wy = best
                self.group = k
                self.win_z = wz
                self.win_y = wy
                self.words_dense = build_word_table_group(
                    mins, maxs, self.dims, wz, n_pos, k=k, win_y=wy)
                _, _, gsp = group_unions(mins, maxs, n_pos, k=k)
                if int(gsp[2]) <= NARROW_SPAN_X:
                    # narrow-x windows: half the march DMA bytes and a
                    # single-chunk lane gather (raycast_kernel machinery);
                    # REQUIRED for the pooled group march (guarded above)
                    self.xwords = build_xword_table(mins, maxs, self.dims,
                                                    n_pos, k=k)
                # shade pass geometry: COARSER step groups than the march
                # (shade windows are per hit-bearing group — fewer, slightly
                # taller windows amortize the 10 tent evals; see
                # _render_shaded_kernel)
                ks = max(8, k)
                _, _, gsk = group_unions(mins, maxs, n_pos, k=ks)
                self.shade_k = ks
                self.shade_win_z = max(4, int(gsk[1]))
                self.shade_win_y = 8 * (-(-int(gsk[0]) // 8))
                # the shade pass is gather-bound over its window rows, so
                # narrow 128-lane panels halve it when the padded x reach
                # fits (round 5)
                self.shade_narrow = (int(gsk[2]) + 2 * shade_pad_x(self.dims)
                                     <= NARROW_SPAN_X)
                # _shade_pads budgets +2 texels past the DELTA taps for the
                # one-step bisection bracket + trilinear reach.  Per-step
                # texel motion is |direction_i| (step = direction/dims), <= 1
                # for unit directions — verify against the ACTUAL rays so a
                # non-normalized caller falls back to XLA shading instead of
                # silently sampling outside the VMEM shade window (ADVICE r4)
                self.shade_kernel_ok = bool(
                    float(jnp.max(jnp.abs(direction))) <= 2.0)
            elif G == 1 and wz1 is not None and wy1 is not None and Z >= wz1:
                self.win_z = wz1
                self.win_y = wy1
                self.words_dense = build_word_table(
                    mins, self.dims, wz1, n_steps=n_pos, win_y=wy1)
        self.use_kernel = self.win_z is not None
        if not self.use_kernel and lane_groups is None and G > 1:
            self.__init__(entry_uv, direction, hit, dims, max_samples,
                          pooled, lane_groups=1)
            return
        if self.use_kernel:
            # texr row: position t can anchor/complete a crossing iff
            # t <= min(texit, n_pos - 1) — one compare in the kernel
            texr = jnp.minimum(self.texit, self.max_samples).astype(
                jnp.float32)
            self.rays_packed = _pack_rays(entry_uv, direction, hit, self.dims,
                                          G=G, t_exit=texr)
            self.state0 = make_fresh_state(entry_uv, direction, hit,
                                           self.dims, G)

    def bind(self, volume=None, iso_value=40.0 / 255.0, mip8=None):
        """Occupancy word table for this volume + isovalue (exact skipping).
        Pass ``mip8`` to skip from compressed-tree metadata with no
        dense-volume pass (``codecs.device.tree_occupancy_mip8``).

        With a dense ``volume`` and a grouped plan this ALSO builds the
        per-(tile, window, lane-group) bound words (``build_iso_tables``,
        stored as ``self.gwords`` and picked up by :meth:`render`): the
        fine-grained max-skip / min-skip gates that carry most of the iso
        march's empty-work elimination on fields where the tile-level bound
        is too coarse to bite."""
        assert self.use_kernel
        # skip iff the (integer-valued) window bound is strictly below iso:
        # wmax > iso255 - 1e-3  <=>  wmax >= iso255 for 8-bit window maxima
        thr = jnp.float32(iso_value * 255.0 - 1e-3)
        if self.group > 1:
            if volume is not None and self.gmins is not None:
                n_pos = self.max_samples + 1
                reaches = bound_reaches(_group_span_max(
                    self.gmins, self.gmaxs, n_pos, self.group))
                words, gwords = build_iso_tables(
                    self.mins, self.maxs, self.gmins, self.gmaxs, self.dims,
                    self.win_z, n_pos, self.group, self.win_y, volume,
                    jnp.float32(iso_value * 255.0), reaches, self.lanes)
                self.gwords = gwords
                return words
            self.gwords = None
            return build_word_table_group(
                self.mins, self.maxs, self.dims, self.win_z,
                self.max_samples + 1, volume=volume, threshold=thr,
                span_x=self.span_x, mip8=mip8, k=self.group, win_y=self.win_y)
        return build_word_table(self.mins, self.dims, self.win_z,
                                volume=volume, threshold=thr,
                                n_steps=self.max_samples + 1,
                                span_x=self.span_x, mip8=mip8,
                                win_y=self.win_y)

    def render(self, volume, iso_value=40.0 / 255.0, words=None,
               shade: str = "auto"):
        """``shade``: "auto" runs the in-kernel shading pass whenever the
        grouped march kernel is active (one window DMA per hit-bearing step
        group, all 10 trilinear evals in VMEM); "xla" forces the full-image
        gather shading pass (the pre-round-4 path, kept as oracle)."""
        from ..isosurface import render_isosurface

        if not self.use_kernel:
            return render_isosurface(volume, self.entry_uv, self.direction,
                                     self.hit, iso_value=iso_value,
                                     max_samples=self.max_samples)
        if words is None:
            words = self.words_dense
        H, W = self.shape
        iso255 = jnp.full((1, 1), iso_value * 255.0, jnp.float32)
        if self.group > 1:
            # gwords only pair with their own bind's words (both derive from
            # the same volume+iso); a caller-supplied words table without a
            # matching bind marches unphased
            gwords = self.gwords if words is not self.words_dense else None
            if gwords is not None:
                found_t, t_hit_t = march_phased(
                    self.rays_packed, words, gwords, self.state0, self.texit,
                    volume, iso255, self.dims, self.max_samples + 1,
                    self.win_z, self.win_y, self.group, self.lanes,
                    xwords=self.xwords)
            else:
                found_t, t_hit_t, _ = _launch_group(
                    self.rays_packed, words, volume, iso255, self.dims,
                    self.max_samples + 1, win_z=self.win_z, win_y=self.win_y,
                    group=self.group, lanes=self.lanes, xwords=self.xwords,
                    state0=self.state0)
            if shade in ("auto", "kernel") and getattr(
                    self, "shade_kernel_ok", True):
                return self._render_shaded_kernel(volume, found_t, t_hit_t,
                                                  iso255)
        else:
            found_t, t_hit_t = _launch(self.rays_packed, words, volume,
                                       iso255, self.dims, self.max_samples,
                                       win_z=self.win_z, win_y=self.win_y)
        found = _untile(found_t, H, W, self.lanes) > 0.5
        t_hit = _untile(t_hit_t, H, W, self.lanes)
        return _shade(volume, self.entry_uv, self.direction, found, t_hit,
                      iso_value, self.dims)

    def _render_shaded_kernel(self, volume, found_t, t_hit_t, iso255):
        H, W = self.shape
        G = self.lanes
        n_pos = self.max_samples + 1
        ks = self.shade_k
        pad_z, shift_y, win_zs, win_ys = _shade_pads(
            self.dims, self.shade_win_z, self.shade_win_y)
        swords = build_shade_words(found_t, t_hit_t, self.mins, self.maxs,
                                   self.dims, n_pos, ks, win_zs,
                                   win_ys, pad_z, shift_y)
        sxwords = build_shade_xwords(self.mins, self.maxs, self.dims, n_pos,
                                     ks, shade_pad_x(self.dims)) \
            if getattr(self, "shade_narrow", False) else None
        hr = max(8, 2 * G)
        rows = [found_t, t_hit_t]
        if hr > 2 * G:
            rows.append(jnp.zeros((found_t.shape[0], hr - 2 * G, 128),
                                  jnp.float32))
        hit_rows = jnp.concatenate(rows, axis=1)
        r_t, g_t, b_t = _launch_shade(self.rays_packed, swords, hit_rows,
                                      volume, iso255, self.dims, n_pos,
                                      win_zs, win_ys, ks, lanes=G,
                                      xwords=sxwords)
        rgb = jnp.stack([_untile(r_t, H, W, G), _untile(g_t, H, W, G),
                         _untile(b_t, H, W, G)], axis=-1)
        found = _untile(found_t, H, W, G) > 0.5
        return rgb, found

    def render_pooled(self, pool, slab_map, iso_value=40.0 / 255.0,
                      words=None, shade_pool=None):
        """Compressed-domain isosurface render: march from the sparse slab
        pool (``raycast_kernel.build_slab_pool``), shade from the sparse
        neighborhood pool (``sampling.build_shade_pool``) — at no point does
        a dense volume-sized array exist on device.  March samples, hit
        steps, bisection brackets, normals, and Phong colors are identical
        to the dense path.  ``shade_pool`` is the (pool, slab_map) pair from
        ``build_shade_pool``; required (the marching pool cannot serve the
        shading taps, whose ±DELTA offsets exceed the march windows)."""
        assert self.pooled and self.use_kernel
        assert shade_pool is not None
        if words is None:
            words = self.words_dense
        H, W = self.shape
        iso255 = jnp.full((1, 1), iso_value * 255.0, jnp.float32)
        if self.group > 1:
            # grouped pooled march (round 5): dense-narrow kernel windows
            # sourced from the narrow slab pool
            assert pool.dtype == jnp.float32, \
                "grouped pooled iso needs build_slab_pool_narrow's pool"
            found_t, t_hit_t, _ = _launch_group_pooled_narrow(
                self.rays_packed, words, self.xwords, pool, slab_map, iso255,
                self.dims, self.max_samples + 1, win_z=self.win_z,
                win_y=self.win_y, group=self.group, lanes=self.lanes,
                state0=self.state0)
        else:
            found_t, t_hit_t = _launch_pooled(
                self.rays_packed, words, pool, slab_map, iso255, self.dims,
                self.max_samples, win_z=self.win_z, win_y=self.win_y)
        found = _untile(found_t, H, W, self.lanes) > 0.5
        t_hit = _untile(t_hit_t, H, W, self.lanes)
        spool, smap = shade_pool
        return _shade_pooled(spool, smap, self.entry_uv, self.direction,
                             found, t_hit, iso_value, self.dims)


def _shade_impl(sampler, entry_uv, direction, found, t_hit, iso_value, dims):
    """Shading arithmetic (isosurface.frag:129-156), hit-masked, generic in
    the trilinear sampler: 4-step bisection, DELTA central-difference
    normal, Phong — same math as the jnp reference path."""
    from ..isosurface import DELTA

    X, Y, Z = dims
    step = direction * jnp.array([1.0 / X, 1.0 / Y, 1.0 / Z], jnp.float32)
    pos_near = entry_uv + (t_hit[..., None] + 1.0) * step
    pos_far = pos_near + step
    iso = jnp.asarray(iso_value, jnp.float32)
    left, right = pos_near, pos_far
    for _ in range(4):  # Bisection, isosurface.frag:23-42
        mid = (right + left) * 0.5
        c_m = sampler(mid)
        go_left = (c_m < iso)[..., None]
        left = jnp.where(go_left, mid, left)
        right = jnp.where(go_left, right, mid)
    tc = (right + left) * 0.5
    offsets = jnp.eye(3, dtype=jnp.float32) * DELTA
    s1 = jnp.stack([sampler(tc - offsets[i]) for i in range(3)], axis=-1)
    s2 = jnp.stack([sampler(tc + offsets[i]) for i in range(3)], axis=-1)
    g = (s1 - s2) / 2.0
    norm = jnp.linalg.norm(g, axis=-1, keepdims=True)
    N = g / jnp.where(norm > 0, norm, 1.0)
    V = -direction
    color = jnp.clip(phong(V, N, V), 0.0, 1.0)
    white = jnp.ones(entry_uv.shape[:-1] + (3,), jnp.float32)
    rgb = jnp.where(found[..., None], color, white)
    return rgb, found


@functools.partial(jax.jit, static_argnames=("dims",))
def _shade(volume, entry_uv, direction, found, t_hit, iso_value, dims):
    """Shading pass on the full image, hit-masked.

    Gather-light: all 10 trilinear evals (4-step bisection + 6 gradient taps)
    run against the packed-neighborhood volume — one gather slice per sample
    instead of eight (``sampling.pack_neighborhoods``)."""
    from ..sampling import pack_neighborhoods, sample_trilinear_packed

    packed = pack_neighborhoods(volume)
    return _shade_impl(lambda p: sample_trilinear_packed(packed, p),
                       entry_uv, direction, found, t_hit, iso_value, dims)


@functools.partial(jax.jit, static_argnames=("dims",))
def _shade_pooled(spool, smap, entry_uv, direction, found, t_hit, iso_value,
                  dims):
    """Shading pass against the sparse neighborhood pool
    (``sampling.build_shade_pool``): same gather count as ``_shade`` (one
    slice per trilinear eval, indirected through the z-slab map) with only
    occupied slabs resident."""
    from ..sampling import sample_trilinear_pooled

    return _shade_impl(
        lambda p: sample_trilinear_pooled(spool, smap, dims, p),
        entry_uv, direction, found, t_hit, iso_value, dims)


# ---------------------------------------------------------------------------
# In-kernel shading (VERDICT round 3 missing #2): a second COMPACTED kernel
# pass over hit tiles with device-planned windows.  The march's (found,
# t_hit) output selects, per tile, only the step groups that contain a hit;
# each selected group gets ONE window DMA (the march group's union footprint
# padded by the shading reach: +-DELTA normal taps and the +1-step bisection
# bracket), and all 10 trilinear evals (4-step bisection + 6 gradient taps,
# ``isosurface.frag:23-75``) run from that VMEM window through the same tent
# sampler as the march — replacing the ~0.2-0.4 s/frame of full-image XLA
# gathers that made iso 43x slower than compositing.

def _shade_pads(dims, win_z, win_y):
    """Static shade-window geometry: z pad covers DELTA*Z taps + the 1-texel
    bisection bracket extension; the y shift stays 8-aligned."""
    import math

    X, Y, Z = dims
    pad_z = int(math.ceil(DELTA * Z)) + 2
    pad_y = int(math.ceil(DELTA * Y)) + 2
    shift_y = 8 * ((pad_y + 7) // 8)
    win_zs = min(Z, win_z + 2 * pad_z)
    win_ys = min(Y, win_y + 2 * shift_y)
    return pad_z, shift_y, win_zs, win_ys


@functools.partial(jax.jit, static_argnames=("dims", "n_pos", "k", "win_zs",
                                             "win_ys", "pad_z", "shift_y"))
def build_shade_words(found_t, t_hit_t, mins, maxs, dims, n_pos, k, win_zs,
                      win_ys, pad_z, shift_y):
    """Device-planned shade word table: group ``p`` is sampled iff some ray
    of the tile has ``t_hit`` in positions [k*p, k*p+k); origins are the
    march group-union mins shifted by the shading pads and clamped.  Same
    word packing / nd-chain as ``build_word_table_group``."""
    X, Y, Z = dims
    P = -(-n_pos // k)
    T = mins.shape[0]
    pmn, _, _ = group_unions(mins, maxs, n_pos, k=k)
    oz = jnp.clip(pmn[..., 1] - pad_z, 0, Z - win_zs)
    oy = jnp.clip((pmn[..., 0] // 8) * 8 - shift_y, 0, Y - win_ys)
    grp = jnp.clip(t_hit_t.astype(jnp.int32) // k, 0, P - 1)
    act = found_t > 0.5
    tidx = jnp.broadcast_to(jnp.arange(T)[:, None, None], grp.shape)
    sampled = jnp.zeros((T, P), jnp.int32).at[tidx, grp].max(
        act.astype(jnp.int32)) > 0
    idx = jnp.arange(P, dtype=jnp.int32)
    nxt = jnp.where(sampled, idx, jnp.int32(4 * P + 4))
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(nxt, axis=1), axis=1), axis=1)
    after = jnp.concatenate(
        [nxt[:, 1:], jnp.full((T, 1), 4 * P + 4, jnp.int32)], axis=1)
    nd = jnp.where(after < P, after - idx, 0)
    word = ((nd << 20) | (oz << 9) | ((oy >> 3) << 1)
            | sampled.astype(jnp.int32))
    return word.astype(jnp.int32)


def shade_pad_x(dims) -> int:
    """Static x pad of the shade reach (±DELTA taps + bisection/trilinear)."""
    import math

    return int(math.ceil(DELTA * dims[0])) + 2


@functools.partial(jax.jit, static_argnames=("dims", "n_pos", "k", "pad_x"))
def build_shade_xwords(mins, maxs, dims, n_pos, k, pad_x):
    """Narrow-x panel words for the shade windows: the march group unions
    padded by the shading reach in x, run through the same panel chooser as
    the march (``build_xword_table``)."""
    mn = mins.at[..., 2].add(-pad_x)
    mx = maxs.at[..., 2].add(pad_x)
    return build_xword_table(mn, mx, dims, n_pos, k=k)


def _shade_one_tile(rays_ref, org_ref, xorg_ref, hit_ref, vol_ref, out_ref,
                    slab, sem, tile, mask, *, dims, n_pos, win_zs, iso, k,
                    win_ys, G):
    """Shade all hit rays of one tile, one window DMA per hit-bearing step
    group.  Out rows per lane group g: 8g+0..2 = rgb (white init for
    misses, matching ``isosurface.frag:79`` / ``main.cpp:392``).  With
    ``xorg_ref`` the windows are 128-lane narrow panels — the shade tents
    are gather-bound over win_zs*win_ys rows, so the single-chunk gather
    roughly halves the pass."""
    END = -(-n_pos // k)
    z0i = jnp.int32(0)
    narrow = xorg_ref is not None
    e = [[rays_ref[tile, 8 * g + i:8 * g + i + 1, :] for i in range(3)]
         for g in range(G)]
    d = [[rays_ref[tile, 8 * g + 3 + i:8 * g + 4 + i, :] for i in range(3)]
         for g in range(G)]
    for g in range(G):
        out_ref[tile, 8 * g:8 * g + 8, :] = jnp.ones((8, 128), jnp.float32)

    dma = _window_dma(vol_ref, slab, sem, None, narrow, win_zs, win_ys)
    pslot = 2 + jax.lax.rem(tile, 2)

    def xword(t):
        return xorg_ref[tile, t] if narrow else jnp.int32(0)

    t0 = _first_group(org_ref, tile, END)
    has_win = t0 < END

    @pl.when(has_win)
    def _():
        dma(pslot, z0i, z0i, z0i).wait()

    t_first = jnp.where(has_win, t0, 0)
    pend0 = org_ref[tile, t_first]
    pendx0 = xword(t_first)

    def shade_group(slot, oz_c, oy_c, xeff, p):
        """All shading for rays whose hit group is ``p`` (isosurface.frag
        arithmetic via ``_shade_impl``'s formulas, tent-sampled)."""
        lo_f = (p * k).astype(jnp.float32)

        def samp(px, py, pz):
            return tent_sample(slab[slot], px, py, pz, oz_c, oy_c, dims,
                               win_zs, xeff=xeff,
                               win_y=win_ys) * (1.0 / 255.0)

        for g in range(G):
            found = hit_ref[tile, g:g + 1, :] > 0.5
            th = hit_ref[tile, G + g:G + g + 1, :]
            active = found & (th >= lo_f) & (th < lo_f + float(k))

            # per-(window, lane-group) gate (round 5): a hit-bearing step
            # group usually holds hits for only SOME of the G lane groups —
            # skip the other groups' 10 tent evals entirely (one cross-lane
            # any per group; inactive groups' out rows stay untouched)
            @pl.when(jnp.any(active))
            def _(g=g, found=found, th=th, active=active):
                # pos_near/far = _shade_impl brackets (entry + (t_hit+1)*step)
                near = [e[g][i] + (th + 1.0) * d[g][i] for i in range(3)]
                far = [near[i] + d[g][i] for i in range(3)]
                left, right = near, far
                for _ in range(4):  # Bisection, isosurface.frag:23-42
                    mid = [(right[i] + left[i]) * 0.5 for i in range(3)]
                    c_m = samp(mid[0], mid[1], mid[2])
                    go_left = c_m < iso
                    left = [jnp.where(go_left, mid[i], left[i])
                            for i in range(3)]
                    right = [jnp.where(go_left, right[i], mid[i])
                             for i in range(3)]
                tc = [(right[i] + left[i]) * 0.5 for i in range(3)]
                # central-difference normal, isosurface.frag:47-62
                N = []
                for i in range(3):
                    m1 = [tc[j] - (DELTA if j == i else 0.0)
                          for j in range(3)]
                    p1 = [tc[j] + (DELTA if j == i else 0.0)
                          for j in range(3)]
                    s1 = samp(m1[0], m1[1], m1[2])
                    s2 = samp(p1[0], p1[1], p1[2])
                    N.append((s1 - s2) * 0.5)
                nrm = jnp.sqrt(N[0] * N[0] + N[1] * N[1] + N[2] * N[2])
                inv = 1.0 / jnp.where(nrm > 0, nrm, 1.0)
                N = [N[i] * inv for i in range(3)]
                # Phong with headlight L = V = -dir, isosurface.frag:69-75.
                # rays_packed rows carry the anisotropic STEP vector
                # (direction / dims); undo the per-axis scale to recover the
                # unit view direction (half = normalize(L+V) collapses to it)
                V = [-d[g][0] * float(dims[0]), -d[g][1] * float(dims[1]),
                     -d[g][2] * float(dims[2])]
                vn = jnp.sqrt(V[0] * V[0] + V[1] * V[1] + V[2] * V[2])
                Vn = [V[i] / vn for i in range(3)]
                diff = jnp.maximum(
                    Vn[0] * N[0] + Vn[1] * N[1] + Vn[2] * N[2], 0.0)
                spec = jnp.power(jnp.maximum(
                    jnp.float32(1e-5),
                    Vn[0] * N[0] + Vn[1] * N[1] + Vn[2] * N[2]),
                    jnp.float32(SPEC_POWER))
                for c in range(3):
                    col = jnp.clip(diff * DIFFUSE[c] + spec, 0.0, 1.0)
                    row = out_ref[tile, 8 * g + c:8 * g + c + 1, :]
                    out_ref[tile, 8 * g + c:8 * g + c + 1, :] = jnp.where(
                        active, col, row)

    def body(carry):
        t_cur, cnt, pend, pendx, mask = carry
        is_first = cnt == 0
        slot_i = jax.lax.rem(cnt, 2)
        # == rem(cnt-1, 2) for cnt >= 1, non-negative so shifts are defined
        slot_s = jax.lax.rem(cnt + 1, 2)
        sslot = jnp.where(is_first, pslot, slot_s)
        w = org_ref[tile, t_cur]
        nd, _, _, _ = _unpack_word(w)
        _, oz_c, oy_c, _ = _unpack_word(pend)
        xeff = pendx & 0xFFFF

        @pl.when(~is_first)
        def _():
            dma(slot_s, z0i, z0i, z0i).wait()

        mask = jnp.where(is_first, mask, mask & ~(1 << slot_s))

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
        shade_group(sslot, oz_c, oy_c, xeff, t_cur)
        return t_next, cnt + 1, w_next, x_next, mask

    def cond(carry):
        return carry[0] < END

    end = jax.lax.while_loop(cond, body,
                             (t0, jnp.int32(0), pend0, pendx0, mask))
    return end[4]


def _shade_kernel(rays_ref, org_ref, hit_ref, iso_ref, vol_ref, out_ref,
                  slab, sem, *, dims, n_pos, win_zs, k, win_ys, t_per, G):
    END = -(-n_pos // k)
    dma = _window_dma(vol_ref, slab, sem, None, False, win_zs, win_ys)
    _pipelined_tiles(
        org_ref, None, dma, END, t_per,
        lambda tile, mask: _shade_one_tile(
            rays_ref, org_ref, None, hit_ref, vol_ref, out_ref, slab, sem,
            tile, mask, dims=dims, n_pos=n_pos, win_zs=win_zs,
            iso=iso_ref[0, 0] * (1.0 / 255.0), k=k, win_ys=win_ys, G=G))


def _shade_kernel_narrow(rays_ref, org_ref, xorg_ref, hit_ref, iso_ref,
                         vol_ref, out_ref, slab, sem, *, dims, n_pos, win_zs,
                         k, win_ys, t_per, G):
    END = -(-n_pos // k)
    dma = _window_dma(vol_ref, slab, sem, None, True, win_zs, win_ys)
    _pipelined_tiles(
        org_ref, xorg_ref, dma, END, t_per,
        lambda tile, mask: _shade_one_tile(
            rays_ref, org_ref, xorg_ref, hit_ref, vol_ref, out_ref, slab,
            sem, tile, mask, dims=dims, n_pos=n_pos, win_zs=win_zs,
            iso=iso_ref[0, 0] * (1.0 / 255.0), k=k, win_ys=win_ys, G=G))


@functools.partial(jax.jit, static_argnames=("dims", "n_pos", "win_zs",
                                             "win_ys", "k", "lanes"))
def _launch_shade(rays_packed, shade_words, hit_rows, volume, iso255, dims,
                  n_pos, win_zs, win_ys, k, lanes=1, xwords=None):
    from .raycast_kernel import pack_pairs_narrow

    n_tiles = rays_packed.shape[0]
    G = lanes
    P = -(-n_pos // k)
    t_per = _t_per(n_tiles)
    narrow = xwords is not None
    assert rays_packed.shape[1] == 8 * G, rays_packed.shape
    assert shade_words.shape == (n_tiles, P), (shade_words.shape, P)
    assert hit_rows.shape == (n_tiles, max(8, 2 * G), 128), hit_rows.shape
    ray_spec = pl.BlockSpec((t_per, 8 * G, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    word_spec = pl.BlockSpec((t_per, P), lambda i: (i, 0),
                             memory_space=pltpu.SMEM)
    hit_spec = pl.BlockSpec((t_per, max(8, 2 * G), 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    iso_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    if narrow:
        assert xwords.shape == (n_tiles, P), xwords.shape
        vol_pairs = pack_pairs_narrow(volume)
        slab_w = 128
        kernel = functools.partial(_shade_kernel_narrow, dims=dims,
                                   n_pos=n_pos, win_zs=win_zs, k=k,
                                   win_ys=win_ys, t_per=t_per, G=G)
        in_specs = [ray_spec, word_spec, word_spec, hit_spec, iso_spec,
                    pl.BlockSpec(memory_space=pl.ANY)]
        operands = (rays_packed, shade_words, xwords, hit_rows, iso255,
                    vol_pairs)
    else:
        vol_pairs = pack_pairs(volume)
        slab_w = dims[0]
        kernel = functools.partial(_shade_kernel, dims=dims, n_pos=n_pos,
                                   win_zs=win_zs, k=k, win_ys=win_ys,
                                   t_per=t_per, G=G)
        in_specs = [ray_spec, word_spec, hit_spec, iso_spec,
                    pl.BlockSpec(memory_space=pl.ANY)]
        operands = (rays_packed, shade_words, hit_rows, iso255, vol_pairs)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles // t_per,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((t_per, 8 * G, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8 * G, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, win_zs, win_ys, slab_w), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )(*operands)
    # rgb rows 8g+0..2 per lane group
    return out[:, 0::8, :], out[:, 1::8, :], out[:, 2::8, :]


def render_isosurface_pallas(volume, entry_uv, direction, hit,
                             iso_value=40.0 / 255.0,
                             max_samples: int = MAX_SAMPLES,
                             check_spans: bool = True, skip_empty: bool = True):
    """Drop-in fast replacement for ``render_isosurface`` (clamp wrap only).
    March on TPU with exact empty-space skipping; bisection + normal + Phong
    shading on the hit set via jnp."""
    del check_spans  # the footprint prepass also builds the DMA window table
    Z, Y, X = volume.shape
    plan = IsosurfacePlan(entry_uv, direction, hit, (X, Y, Z), max_samples)
    words = plan.bind(volume, iso_value) if (plan.use_kernel and skip_empty) \
        else None
    return plan.render(volume, iso_value, words=words)
