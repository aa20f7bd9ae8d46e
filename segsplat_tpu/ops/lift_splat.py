"""Splat-formulated first-hit ray march — the fast TPU path for feature lifting.

The direct DDA transcription (ops/lift.first_hit_voxels) advances every ray
through the occupancy grid with a 3-D gather per step; scalar gathers are the
TPU's weakest operation and dominate the lift (measured 610 ms/view at
officescene scale). This module reformulates first-hit as *voxel splatting*,
mirroring the tile rasterizer's structure (SURVEY §7 hard-part 3):

  1. project the occupied voxel CUBES to the image (8-corner AABB — dense
     regular compute over the ~100k-voxel table),
  2. bin voxels to 16×16 pixel tiles, nearest-first, with the packed-key sort
     of ops/rasterize._bin_gaussian_ranks,
  3. per tile, test its pixels' rays against the K nearest candidate cubes with
     an exact slab test in world space, and reduce to the minimum-entry hit.

Semantics match the CUDA kernel's sampled march exactly, including its
miss-on-grazing behavior: the kernel only registers a voxel if a sample point
t = depth_min·(1/dz) + k·increment lands inside the cube
(project_image_cuda_kernel.cu:31-91), so we compute the first on-grid sample
after slab entry and require it to precede slab exit. Hit depth = that sample's
t, matching the march's attribution order. Validated against the DDA oracle in
tests/test_lift_splat.py.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

TILE = 16


def _project_voxels(centers: jax.Array, half: jax.Array, w2c: jax.Array,
                    intrinsics: jax.Array, width: int, height: int,
                    depth_max: float):
    """AABB screen footprint of each voxel cube. Returns (means2d, radius_px,
    depth, valid)."""
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    R, t = w2c[:3, :3], w2c[:3, 3]

    # planar [V] component arrays throughout — a [V,8,3] corner tensor pads
    # its (8,3) minor dims to (8,128), a 42× physical blowup (see the
    # first_hit_voxels_splat layout note)
    wxc, wyc, wzc = centers[:, 0], centers[:, 1], centers[:, 2]
    z = R[2, 0] * wxc + R[2, 1] * wyc + R[2, 2] * wzc + t[2]    # [V]

    u0 = v0 = jnp.inf
    u1 = v1 = -jnp.inf
    any_front = False
    for sx_ in (-1.0, 1.0):
        for sy_ in (-1.0, 1.0):
            for sz_ in (-1.0, 1.0):
                px = wxc + half * sx_
                py = wyc + half * sy_
                pz = wzc + half * sz_
                ccx = R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz + t[0]
                ccy = R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz + t[1]
                ccz = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz + t[2]
                any_front = (ccz > 0) | any_front
                czs = jnp.maximum(ccz, 1e-6)
                u = fx * ccx / czs + cx
                v = fy * ccy / czs + cy
                u0, u1 = jnp.minimum(u0, u), jnp.maximum(u1, u)
                v0, v1 = jnp.minimum(v0, v), jnp.maximum(v1, v)
    means2d = jnp.stack([(u0 + u1) * 0.5, (v0 + v1) * 0.5], axis=1)
    radius = jnp.maximum(u1 - u0, v1 - v0) * 0.5 + 1.0
    valid = (any_front & (z < depth_max * 1.74)
             & (u1 > 0) & (u0 < width) & (v1 > 0) & (v0 < height))
    return means2d, radius, z, valid


def _bin_voxels(means2d, radius, depth, valid, width: int, height: int,
                max_tiles_per_axis: int):
    """Nearest-first per-tile candidate lists (packed-key sort, see
    ops/rasterize._bin_gaussian_ranks)."""
    from segsplat_tpu.ops.rasterize import Projected, _bin_gaussian_ranks

    proj = Projected(means2d=means2d, depths=depth,
                     conics=jnp.zeros((means2d.shape[0], 3)),
                     radii=jnp.where(valid, radius, 0.0), valid=valid)
    return _bin_gaussian_ranks(proj, width, height, max_tiles_per_axis)


def _bin_voxels_dual(means2d, radius, depth, valid, width: int, height: int,
                     max_tiles_per_axis: int, big_budget: int,
                     m_small: int = 2):
    """Two-class binning: voxel footprints are heavily skewed — at lift scale
    almost every voxel spans ≤ m_small tiles per axis, but a single-pass bin
    must emit m² pair slots for ALL of them (7M pairs for m=8 at officescene
    scale; the u32 pair sort alone is ~7 ms/view). Here every voxel emits
    only m_small² slots, except a ``big_budget``-sized set (selected by
    footprint span, descending) that emits the full m² — one concatenated
    packed-key sort keeps the downstream contract identical.

    EXACT whenever at most ``big_budget`` voxels span > m_small tiles (the
    selection takes the largest spans first, and a small voxel selected into
    the big set is still exact — m² covers its AABB too). Overflowing big
    voxels degrade to the top-left m_small×m_small of their AABB; size the
    budget for the scene (default V/8 ≈ 8× headroom over typical scenes).
    Falls back to the single-pass bin when the packed key exceeds 32 bits.
    """
    import math

    from segsplat_tpu.ops.rasterize import TILE as RTILE

    tx_n = -(-width // RTILE)
    ty_n = -(-height // RTILE)
    num_tiles = tx_n * ty_n
    n = means2d.shape[0]
    m = max_tiles_per_axis
    rank_bits = max(int(math.ceil(math.log2(max(n, 2)))), 1)
    tile_bits = max(int(math.ceil(math.log2(num_tiles + 2))), 1)
    if rank_bits + tile_bits > 32 or m <= m_small:
        o, r, off, dims = _bin_voxels(means2d, radius, depth, valid, width,
                                      height, m)
        return o, r, off, dims, jnp.int32(0)

    depth_key = jnp.where(valid, depth, jnp.inf)
    order = jnp.argsort(depth_key)                               # front-to-back
    m2d = means2d[order]
    rad = jnp.where(valid, radius, 0.0)[order]
    val = valid[order]

    x0 = jnp.clip(jnp.floor((m2d[:, 0] - rad) / RTILE), 0, tx_n - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((m2d[:, 1] - rad) / RTILE), 0, ty_n - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((m2d[:, 0] + rad) / RTILE), 0, tx_n - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((m2d[:, 1] + rad) / RTILE), 0, ty_n - 1).astype(jnp.int32)
    span = jnp.maximum(x1 - x0, y1 - y0)                         # [N] tiles-1

    B = min(big_budget, n)
    sel_pos = jnp.argsort(-jnp.where(val, span, -1))[:B]         # depth ranks
    selected = jnp.zeros((n,), bool).at[sel_pos].set(True)
    # voxels spanning > m_small tiles that did NOT fit the big budget — their
    # coverage silently truncates to the top-left m_small^2 tiles; callers
    # surface this count (lift_view_splat third output) so it never corrupts
    # a lift unnoticed
    overflow = jnp.sum(((span >= m_small) & val & ~selected).astype(jnp.int32))

    def emit(mm, x0_, y0_, x1_, y1_, active):
        di = jnp.arange(mm, dtype=jnp.int32)
        dx = jnp.tile(di, mm)                                    # [mm²]
        dy = jnp.repeat(di, mm)
        txs = x0_[None, :] + dx[:, None]                         # [mm², ·]
        tys = y0_[None, :] + dy[:, None]
        in_rect = (txs <= x1_[None, :]) & (tys <= y1_[None, :]) & active[None, :]
        return jnp.where(in_rect, tys * tx_n + txs, num_tiles)

    tid_small = emit(m_small, x0, y0, x1, y1, val & ~selected)   # [ms², N]
    rank = jnp.arange(n, dtype=jnp.uint32)
    keys_small = ((tid_small.astype(jnp.uint32) << rank_bits)
                  | rank[None, :]).reshape(-1)

    xb0, yb0 = x0[sel_pos], y0[sel_pos]
    xb1, yb1 = x1[sel_pos], y1[sel_pos]
    tid_big = emit(m, xb0, yb0, xb1, yb1, val[sel_pos])          # [m², B]
    keys_big = ((tid_big.astype(jnp.uint32) << rank_bits)
                | sel_pos.astype(jnp.uint32)[None, :]).reshape(-1)

    skey = jax.lax.sort(jnp.concatenate([keys_small, keys_big]), dimension=0)
    rank_sorted = (skey & jnp.uint32((1 << rank_bits) - 1)).astype(jnp.int32)
    probes = (jnp.arange(num_tiles + 1, dtype=jnp.uint32) << rank_bits)
    offsets = jnp.searchsorted(skey, probes).astype(jnp.int32)
    return order, rank_sorted, offsets, (tx_n, ty_n), overflow


def _splat_candidates(centers, voxel_ids, c2w, intrinsics, voxel_size,
                      depth_max, width: int, height: int, m: int, K: int,
                      pair_cap, dual_bin: bool = True,
                      big_budget: int = None):
    """Project + bin + per-tile candidate windows (planar [T,K] components).

    LAYOUT NOTES (measured at officescene scale, 38 → 30 ms/view total):
    every per-pair / per-candidate array is PLANAR — separate x/y/z/id
    components of shape [T,K] or [C,K,256] — never stacked with a trailing
    size-3/4 axis (TPU pads the last two dims to (8,128) tiles: a
    [C,K,256,3] slab intermediate costs 42× its logical bytes, a [L,4]
    payload 32×). The pair→voxel gathers COMPOSE at window granularity
    ([T,K] ≈ 260k slots): an order[rank_sorted] pre-gather costs L = V·m²
    scalar gathers (7M pairs, measured +55 ms/view).

    pair_cap statically truncates the SORTED pair list exactly like the
    rasterizer's (sentinels sort last, so any cap ≥ the real pair count is
    exact)."""
    R_c2w = c2w[:3, :3]
    cam_pos = c2w[:3, 3]
    w2c = jnp.zeros((4, 4), jnp.float32)
    w2c = w2c.at[:3, :3].set(R_c2w.T)
    w2c = w2c.at[:3, 3].set(-R_c2w.T @ cam_pos)
    w2c = w2c.at[3, 3].set(1.0)

    half = voxel_size * 0.5
    means2d, radius, depth, valid = _project_voxels(
        centers, half, w2c, intrinsics, width, height, depth_max)
    if dual_bin:
        order, rank_sorted, offsets, (tx_n, ty_n), overflow = _bin_voxels_dual(
            means2d, radius, depth, valid, width, height, m,
            big_budget or max(centers.shape[0] // 8, 1024))
    else:
        order, rank_sorted, offsets, (tx_n, ty_n) = _bin_voxels(
            means2d, radius, depth, valid, width, height, m)
        overflow = jnp.int32(0)
    if pair_cap is not None and pair_cap < rank_sorted.shape[0]:
        rank_sorted = rank_sorted[:pair_cap]
        offsets = jnp.minimum(offsets, pair_cap)

    runs = offsets[1:] - offsets[:-1]
    counts = jnp.minimum(runs, K)
    # surface the per-tile K truncation (same convention as rasterize()'s
    # tile_overflow): a pixel whose true first hit ranks past the K nearest
    # candidates in its tile would silently lift the wrong voxel otherwise
    tile_overflow = jnp.sum(jnp.maximum(runs - K, 0))
    slot = jnp.arange(K, dtype=jnp.int32)
    widx = jnp.clip(offsets[:-1, None] + slot[None, :], 0,
                    rank_sorted.shape[0] - 1)                    # [T,K]
    pair_slot = rank_sorted[widx]                                # [T,K] ranks
    win_vox = order[pair_slot]                                   # [T,K]
    wx = (centers[:, 0] - half)[win_vox]                         # [T,K]
    wy = (centers[:, 1] - half)[win_vox]
    wz = (centers[:, 2] - half)[win_vox]
    wid = voxel_ids[win_vox]                                     # [T,K] int32
    return dict(counts=counts, wx=wx, wy=wy, wz=wz, wid=wid,
                tx_n=tx_n, ty_n=ty_n, R_c2w=R_c2w, cam_pos=cam_pos, half=half,
                bin_overflow=overflow, tile_overflow=tile_overflow)


def _make_tile_best(cand, intrinsics, depth_min, depth_max, ray_increment,
                    K: int):
    """Returns tile_ids [C] → (best [C,256] argmin slot, any_hit [C,256],
    ids [C,K]) — the per-tile exact slab-test / first-march-sample core."""
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    R_c2w, cam_pos, half = cand["R_c2w"], cand["cam_pos"], cand["half"]
    counts, tx_n = cand["counts"], cand["tx_n"]
    wx, wy, wz, wid = cand["wx"], cand["wy"], cand["wz"], cand["wid"]

    # per-tile pixel coords (flattened 16×16, row-major like the image)
    pyg, pxg = jnp.meshgrid(jnp.arange(TILE, dtype=jnp.float32),
                            jnp.arange(TILE, dtype=jnp.float32), indexing="ij")
    pix_x = pxg.ravel()                                          # [256]
    pix_y = pyg.ravel()
    inc = ray_increment
    ox, oy, oz = cam_pos[0], cam_pos[1], cam_pos[2]
    side = 2.0 * half

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-9,
                               jnp.where(d < 0, -1e-9, 1e-9), d)

    def tile_best(tile_ids):                                     # [C]
        cnt = counts[tile_ids]                                   # [C]
        bx = wx[tile_ids]                                        # [C,K]
        by = wy[tile_ids]
        bz = wz[tile_ids]
        ids = wid[tile_ids]
        tx = (tile_ids % tx_n).astype(jnp.float32) * TILE
        ty = (tile_ids // tx_n).astype(jnp.float32) * TILE
        # camera-space dirs — pixel centers at integer coords like the kernel
        # (kinectProjToCamera uses (x-cx)/fx with x the integer pixel index)
        dx = (pix_x[None] + tx[:, None] - cx) / fx               # [C,256]
        dy = (pix_y[None] + ty[:, None] - cy) / fy
        inv_norm = 1.0 / jnp.sqrt(dx * dx + dy * dy + 1.0)
        dcx = dx * inv_norm                                      # [C,256]
        dcy = dy * inv_norm
        dcz = inv_norm
        # d_world = R_c2w @ d_cam, renormalized (matches the previous
        # normalize-twice sequence; R is orthonormal so the second norm ≈ 1)
        dwx = R_c2w[0, 0] * dcx + R_c2w[0, 1] * dcy + R_c2w[0, 2] * dcz
        dwy = R_c2w[1, 0] * dcx + R_c2w[1, 1] * dcy + R_c2w[1, 2] * dcz
        dwz = R_c2w[2, 0] * dcx + R_c2w[2, 1] * dcy + R_c2w[2, 2] * dcz
        inv_wn = 1.0 / jnp.sqrt(dwx * dwx + dwy * dwy + dwz * dwz)
        dwx, dwy, dwz = dwx * inv_wn, dwy * inv_wn, dwz * inv_wn
        t_min = depth_min / dcz                                  # [C,256]
        t_end = depth_max / dcz

        # slab tests, one [C,K,256] pair per axis — no trailing component axis
        ix = safe_inv(dwx)[:, None, :]                           # [C,1,256]
        t1 = (bx[:, :, None] - ox) * ix
        t2 = t1 + side * ix
        t_entry = jnp.minimum(t1, t2)
        t_exit = jnp.maximum(t1, t2)
        iy = safe_inv(dwy)[:, None, :]
        t1 = (by[:, :, None] - oy) * iy
        t2 = t1 + side * iy
        t_entry = jnp.maximum(t_entry, jnp.minimum(t1, t2))
        t_exit = jnp.minimum(t_exit, jnp.maximum(t1, t2))
        iz = safe_inv(dwz)[:, None, :]
        t1 = (bz[:, :, None] - oz) * iz
        t2 = t1 + side * iz
        t_entry = jnp.maximum(t_entry, jnp.minimum(t1, t2))     # [C,K,256]
        t_exit = jnp.minimum(t_exit, jnp.maximum(t1, t2))

        # first sample of the march grid inside [t_entry, t_exit]
        k = jnp.ceil((t_entry - t_min[:, None, :]) / inc)
        k = jnp.maximum(k, 0.0)
        t_s = t_min[:, None, :] + k * inc
        live = (jnp.arange(K)[None, :, None] < cnt[:, None, None])
        hit = (t_entry <= t_exit) & (t_s <= t_exit) & live & \
              (t_s < t_end[:, None, :])
        t_s = jnp.where(hit, t_s, jnp.inf)
        best = jnp.argmin(t_s, axis=1)                           # [C,256]
        any_hit = jnp.isfinite(jnp.min(t_s, axis=1))
        return best, any_hit, ids

    return tile_best


@partial(jax.jit, static_argnames=("width", "height", "max_tiles_per_axis",
                                   "max_per_tile", "tile_chunk", "pair_cap",
                                   "dual_bin", "big_budget"))
def first_hit_voxels_splat(centers: jax.Array,     # [V,3] world voxel centers
                           voxel_ids: jax.Array,   # [V] int32 1-based ids
                           c2w: jax.Array, intrinsics: jax.Array,
                           voxel_size: jax.Array,
                           depth_min: float, depth_max: float,
                           ray_increment: jax.Array,
                           width: int, height: int,
                           max_tiles_per_axis: int = 4,
                           max_per_tile: int = 64,
                           tile_chunk: int = 64,
                           pair_cap: int = None,
                           dual_bin: bool = False,
                           big_budget: int = None) -> jax.Array:
    """Per-pixel first-hit voxel id via splatting. Returns [H, W] int32
    (0=miss). See _splat_candidates for the layout design notes.

    dual_bin defaults to FALSE here (unlike lift_view_splat): this is the
    kernel-parity API (scripts/project_features.py et al.) and it returns
    only the hit image, so a big-budget overflow would be undetectable —
    exactness first. lift_view_splat surfaces the overflow count and keeps
    the fast dual binning on by default.

    NOTE the per-tile ``max_per_tile`` candidate cap still applies here and
    is likewise undetectable from the hit image alone — callers needing a
    guarantee should size max_per_tile generously (or run lift_view_splat,
    whose overflow scalar counts truncated runs)."""
    K = max_per_tile
    cand = _splat_candidates(centers, voxel_ids, c2w, intrinsics, voxel_size,
                             depth_max, width, height, max_tiles_per_axis, K,
                             pair_cap, dual_bin, big_budget)
    tile_best = _make_tile_best(cand, intrinsics, depth_min, depth_max,
                                ray_increment, K)
    tx_n, ty_n = cand["tx_n"], cand["ty_n"]
    num_tiles = tx_n * ty_n

    def tile_hits(tile_ids):
        best, any_hit, ids = tile_best(tile_ids)
        hit_id = jnp.take_along_axis(ids, best, axis=1)
        return jnp.where(any_hit, hit_id, 0)

    tile_hits = jax.checkpoint(tile_hits)
    from segsplat_tpu.ops.rasterize import map_tile_chunks, tiles_to_image
    out = map_tile_chunks(tile_hits, num_tiles, tile_chunk)
    return tiles_to_image(out.reshape(num_tiles, TILE, TILE),
                          ty_n, tx_n, height, width)


@partial(jax.jit, static_argnames=("num_ids", "width", "height",
                                   "max_tiles_per_axis", "max_per_tile",
                                   "tile_chunk", "pair_cap", "dual_bin",
                                   "big_budget"))
def lift_view_splat(centers: jax.Array, voxel_ids: jax.Array,
                    c2w: jax.Array, intrinsics: jax.Array,
                    voxel_size: jax.Array,
                    depth_min: float, depth_max: float,
                    ray_increment: jax.Array,
                    features_hwc: jax.Array,       # [H,W,C] float
                    num_ids: int, width: int, height: int,
                    max_tiles_per_axis: int = 4,
                    max_per_tile: int = 64,
                    tile_chunk: int = 64,
                    pair_cap: int = None,
                    dual_bin: bool = True,
                    big_budget: int = None
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused first-hit + feature accumulation for one view.

    Instead of materializing the [H,W] hit image and scatter-adding 512k
    pixel rows (XLA scatter-add is pinned at ~21 ms/view regardless of id
    coherence or pre-sorting — measured), each tile MXU-contracts its pixels'
    one-hot hit assignment [K,256] against its feature block [256,C],
    yielding per-candidate partials [K,C]; one segment_sum over the T·K
    (~260k) window slots then merges duplicates across tiles. Summation
    groups by (tile, candidate) instead of pixel raster order — identical
    sets of terms, float-associativity differences only.

    Returns (sums [num_ids, C] f32, counts [num_ids] i32, overflow i32
    scalar). overflow sums BOTH truncation sources this view: big-footprint
    voxels that exceeded dual_bin's big_budget (raise big_budget or disable
    dual_bin), and per-tile candidate runs beyond max_per_tile (raise
    max_per_tile) — 0 means no coverage was dropped anywhere.
    """
    K = max_per_tile
    CH = features_hwc.shape[-1]
    cand = _splat_candidates(centers, voxel_ids, c2w, intrinsics, voxel_size,
                             depth_max, width, height, max_tiles_per_axis, K,
                             pair_cap, dual_bin, big_budget)
    tile_best = _make_tile_best(cand, intrinsics, depth_min, depth_max,
                                ray_increment, K)
    tx_n, ty_n = cand["tx_n"], cand["ty_n"]
    num_tiles = tx_n * ty_n
    PX = TILE * TILE

    fpad = jnp.pad(features_hwc.astype(jnp.float32),
                   ((0, ty_n * TILE - height), (0, tx_n * TILE - width),
                    (0, 0)))
    ftiles = fpad.reshape(ty_n, TILE, tx_n, TILE, CH)
    ftiles = ftiles.transpose(0, 2, 1, 3, 4).reshape(num_tiles, PX, CH)

    # in-bounds pixel mask per tile column/row (pad tiles hang off the edges)
    pyg, pxg = jnp.meshgrid(jnp.arange(TILE, dtype=jnp.int32),
                            jnp.arange(TILE, dtype=jnp.int32), indexing="ij")
    pix_xi = pxg.ravel()                                          # [256]
    pix_yi = pyg.ravel()

    def tile_partials(tile_ids):                                  # [C]
        best, any_hit, _ = tile_best(tile_ids)                    # [C,256]
        tx = (tile_ids % tx_n) * TILE
        ty = (tile_ids // tx_n) * TILE
        inb = ((pix_xi[None] + tx[:, None] < width)
               & (pix_yi[None] + ty[:, None] < height))           # [C,256]
        sel = any_hit & inb
        oh = ((jnp.arange(K, dtype=jnp.int32)[None, :, None]
               == best[:, None, :])
              & sel[:, None, :]).astype(jnp.float32)              # [C,K,256]
        ft = ftiles[tile_ids]                                     # [C,256,CH]
        part = jax.lax.dot_general(
            oh, ft, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)                   # [C,K,CH]
        cnt = jnp.sum(oh, axis=2).astype(jnp.int32)               # [C,K]
        return part, cnt

    tile_partials = jax.checkpoint(tile_partials)
    from segsplat_tpu.ops.rasterize import map_tile_chunks
    # pad-duplicate tiles are sliced off inside map_tile_chunks, so each
    # real tile contributes exactly once to the segment sums below
    parts, cnts = map_tile_chunks(tile_partials, num_tiles, tile_chunk)
    seg = cand["wid"].reshape(-1)                                 # [T·K]
    sums = jax.ops.segment_sum(parts.reshape(-1, CH), seg,
                               num_segments=num_ids)
    counts = jax.ops.segment_sum(cnts.reshape(-1), seg,
                                 num_segments=num_ids)
    # row 0 collects misses in scatter_features; here missed pixels are
    # simply absent, so zero row 0 for an identical contract
    sums = sums.at[0].set(0.0)
    counts = counts.at[0].set(0)
    return sums, counts, cand["bin_overflow"] + cand["tile_overflow"]
