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
    cam = centers @ R.T + t                                     # [V,3]
    z = cam[:, 2]

    # 8 cube corners, projected; AABB over corners
    signs = jnp.asarray([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                         for sz in (-1, 1)], jnp.float32)       # [8,3]
    corners = centers[:, None, :] + half * signs[None, :, :]    # [V,8,3]
    ccam = corners @ R.T + t
    cz = jnp.maximum(ccam[..., 2], 1e-6)
    u = fx * ccam[..., 0] / cz + cx                             # [V,8]
    v = fy * ccam[..., 1] / cz + cy
    u0, u1 = u.min(axis=1), u.max(axis=1)
    v0, v1 = v.min(axis=1), v.max(axis=1)
    means2d = jnp.stack([(u0 + u1) * 0.5, (v0 + v1) * 0.5], axis=1)
    radius = jnp.maximum(u1 - u0, v1 - v0) * 0.5 + 1.0
    valid = ((ccam[..., 2] > 0).any(axis=1) & (z < depth_max * 1.74)
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


@partial(jax.jit, static_argnames=("width", "height", "max_tiles_per_axis",
                                   "max_per_tile", "tile_chunk"))
def first_hit_voxels_splat(centers: jax.Array,     # [V,3] world voxel centers
                           voxel_ids: jax.Array,   # [V] int32 1-based ids
                           c2w: jax.Array, intrinsics: jax.Array,
                           voxel_size: jax.Array,
                           depth_min: float, depth_max: float,
                           ray_increment: jax.Array,
                           width: int, height: int,
                           max_tiles_per_axis: int = 4,
                           max_per_tile: int = 64,
                           tile_chunk: int = 64) -> jax.Array:
    """Per-pixel first-hit voxel id via splatting. Returns [H, W] int32 (0=miss)."""
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    R_c2w = c2w[:3, :3]
    cam_pos = c2w[:3, 3]
    w2c = jnp.zeros((4, 4), jnp.float32)
    w2c = w2c.at[:3, :3].set(R_c2w.T)
    w2c = w2c.at[:3, 3].set(-R_c2w.T @ cam_pos)
    w2c = w2c.at[3, 3].set(1.0)

    half = voxel_size * 0.5
    means2d, radius, depth, valid = _project_voxels(
        centers, half, w2c, intrinsics, width, height, depth_max)
    order, rank_sorted, offsets, (tx_n, ty_n) = _bin_voxels(
        means2d, radius, depth, valid, width, height, max_tiles_per_axis)

    # depth-sorted per-voxel payload: cube min corner [3], id
    bmin = (centers - half)[order]                               # [V,3]
    ids_ds = voxel_ids[order].astype(jnp.float32)
    payload = jnp.concatenate([bmin, ids_ds[:, None]], axis=1)   # [V,4]
    K = max_per_tile
    win = payload[rank_sorted]                                   # [L,4]
    counts = jnp.minimum(offsets[1:] - offsets[:-1], K)
    slot = jnp.arange(K, dtype=jnp.int32)
    widx = jnp.clip(offsets[:-1, None] + slot[None, :], 0, win.shape[0] - 1)
    windows = win[widx]                                          # [T,K,4]

    num_tiles = tx_n * ty_n
    PX = TILE * TILE
    # per-tile pixel rays (world space, normalized like the kernel)
    py, px = jnp.meshgrid(jnp.arange(TILE, dtype=jnp.float32),
                          jnp.arange(TILE, dtype=jnp.float32), indexing="ij")
    pix_in_tile = jnp.stack([px.ravel(), py.ravel()], axis=1)    # [256,2]

    inc = ray_increment

    def tile_hits(tile_ids):                                     # [C]
        cnt = counts[tile_ids]                                   # [C]
        wnd = windows[tile_ids]                                  # [C,K,4]
        tx = (tile_ids % tx_n).astype(jnp.float32) * TILE
        ty = (tile_ids // tx_n).astype(jnp.float32) * TILE
        pxy = pix_in_tile[None] + jnp.stack([tx, ty], 1)[:, None, :]  # [C,256,2]
        # camera-space dirs — pixel centers at integer coords like the kernel
        # (kinectProjToCamera uses (x-cx)/fx with x the integer pixel index)
        dx = (pxy[..., 0] - cx) / fx
        dy = (pxy[..., 1] - cy) / fy
        d_cam = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)
        d_cam_n = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
        d_world = d_cam_n @ R_c2w.T                              # [C,256,3]
        d_world = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)
        dz = d_cam_n[..., 2]                                     # [C,256]
        t_min = depth_min / dz
        t_end = depth_max / dz

        o = cam_pos                                              # [3]
        bmin_w = wnd[..., 0:3]                                   # [C,K,3]
        inv_d = 1.0 / jnp.where(jnp.abs(d_world) < 1e-9,
                                jnp.where(d_world < 0, -1e-9, 1e-9), d_world)
        # slab test: [C,K,256] per axis
        t1 = (bmin_w[:, :, None, :] - o) * inv_d[:, None, :, :]
        t2 = (bmin_w[:, :, None, :] + 2 * half - o) * inv_d[:, None, :, :]
        t_entry = jnp.max(jnp.minimum(t1, t2), axis=-1)          # [C,K,256]
        t_exit = jnp.min(jnp.maximum(t1, t2), axis=-1)

        # first sample of the march grid inside [t_entry, t_exit]
        k = jnp.ceil((t_entry - t_min[:, None, :]) / inc)
        k = jnp.maximum(k, 0.0)
        t_s = t_min[:, None, :] + k * inc
        live = (jnp.arange(wnd.shape[1])[None, :, None] < cnt[:, None, None])
        hit = (t_entry <= t_exit) & (t_s <= t_exit) & live & \
              (t_s < t_end[:, None, :])
        t_s = jnp.where(hit, t_s, jnp.inf)
        best = jnp.argmin(t_s, axis=1)                           # [C,256]
        any_hit = jnp.isfinite(jnp.min(t_s, axis=1))
        ids = wnd[..., 3].astype(jnp.int32)                      # [C,K]
        hit_id = jnp.take_along_axis(ids, best, axis=1)
        return jnp.where(any_hit, hit_id, 0)

    tile_hits = jax.checkpoint(tile_hits)
    pad = (-num_tiles) % tile_chunk
    all_tiles = jnp.arange(num_tiles + pad, dtype=jnp.int32) % num_tiles
    out = jax.lax.map(tile_hits, all_tiles.reshape(-1, tile_chunk))
    out = out.reshape(num_tiles + pad, TILE, TILE)[:num_tiles]
    img = out.reshape(ty_n, tx_n, TILE, TILE).transpose(0, 2, 1, 3)
    img = img.reshape(ty_n * TILE, tx_n * TILE)
    return img[:height, :width]
