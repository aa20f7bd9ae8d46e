"""2D→3D feature lifting: per-pixel ray march to the first occupied voxel.

TPU-native rewrite of the CUDA projection kernel
(cuda_project_image_to_sparse_voxel/project_image_cuda_kernel.cu:24-137):

Reference semantics reproduced exactly:
  * camera ray through pixel (x, y):  camDir = normalize(((x-cx)/fx, (y-cy)/fy, 1))
    (kinectProjToCamera, include/cudaUtil.h:104-119 — the depth argument cancels
    under normalize),
  * ray length parametrization:  t ∈ [depth_min, depth_max] · (1/camDir.z), stepped
    by ``ray_increment`` (kernel :31-47),
  * voxel snap:  round((world - grid_origin) / voxel_size)  (kernel :50-51),
  * first occupied voxel along the ray receives the pixel's C-dim feature once
    (kernel :69-91); averaging by hit count happens at the end
    (aggregate_voxel_features_onthefly.py:383-385).

TPU-native differences (by design, not accident):
  * CUDA accumulates with atomicAdd (non-deterministic float order); we emit
    (voxel_id, feature) pairs and reduce with ``jax.ops.segment_sum`` — bit-wise
    deterministic across runs and shardable with a single psum across devices.
  * The per-pixel while loop becomes a chunked ``lax.while_loop``: all pixels advance
    through fixed-size step blocks together, exiting as soon as every ray has hit or
    left the far plane — regular control flow XLA can pipeline, no warp divergence
    analog.
  * ``pred_mode`` (atomicMax over int predictions, kernel :95-137) becomes a
    segment_max.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pixel_ray_dirs(width: int, height: int, fx, fy, cx, cy) -> jax.Array:
    """[H, W, 3] normalized camera-space ray directions."""
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    u = (xs[None, :] - cx) / fx
    v = (ys[:, None] - cy) / fy
    d = jnp.stack([jnp.broadcast_to(u, (height, width)),
                   jnp.broadcast_to(v, (height, width)),
                   jnp.ones((height, width), jnp.float32)], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


@partial(jax.jit, static_argnames=("width", "height", "max_steps", "chunk"))
def first_hit_voxels(occupancy: jax.Array,        # [Z,Y,X] int32, 0 = empty, else 1-based id
                     c2w: jax.Array,              # [4,4] camera-to-world
                     intrinsics: jax.Array,       # [4] (fx, fy, cx, cy)
                     grid_origin: jax.Array,      # [3] world origin of voxel (0,0,0)
                     voxel_size: jax.Array,       # []
                     depth_min: float, depth_max: float, ray_increment: jax.Array,
                     width: int, height: int,
                     max_steps: int, chunk: int = 32) -> jax.Array:
    """Per-pixel first-hit voxel id. Returns [H, W] int32 (0 = no hit)."""
    Z, Y, X = occupancy.shape
    occ_flat = occupancy.reshape(-1)
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]

    cam_dirs = pixel_ray_dirs(width, height, fx, fy, cx, cy).reshape(-1, 3)   # [P,3]
    P = cam_dirs.shape[0]
    R = c2w[:3, :3]
    cam_pos = c2w[:3, 3]
    world_dirs = cam_dirs @ R.T
    world_dirs = world_dirs / jnp.linalg.norm(world_dirs, axis=-1, keepdims=True)

    depth_to_ray = 1.0 / cam_dirs[:, 2]                                        # [P]
    t_start = depth_to_ray * depth_min
    t_end = depth_to_ray * depth_max

    n_chunks = -(-max_steps // chunk)
    step_ids = jnp.arange(chunk, dtype=jnp.float32)

    def probe(t):
        """t: [P, S] ray lengths → hit ids [P, S] (0 if none/out-of-bounds)."""
        world = cam_pos + t[..., None] * world_dirs[:, None, :]               # [P,S,3]
        pos = jnp.round((world - grid_origin) / voxel_size).astype(jnp.int32)
        inb = ((pos[..., 0] >= 0) & (pos[..., 0] < X) &
               (pos[..., 1] >= 0) & (pos[..., 1] < Y) &
               (pos[..., 2] >= 0) & (pos[..., 2] < Z))
        lin = pos[..., 2] * (Y * X) + pos[..., 1] * X + pos[..., 0]
        lin = jnp.where(inb, lin, 0)
        occ = occ_flat[lin]
        return jnp.where(inb, occ, 0)

    def cond(state):
        ci, hit, _ = state
        return (ci < n_chunks) & jnp.any(hit == 0)

    def body(state):
        ci, hit, active_t = state
        t = active_t[:, None] + step_ids[None, :] * ray_increment              # [P,chunk]
        ids = probe(t)
        valid = (t < t_end[:, None]) & (ids > 0)
        # first valid step in this chunk per pixel
        any_hit = jnp.any(valid, axis=1)
        first = jnp.argmax(valid, axis=1)
        chunk_hit = jnp.where(any_hit, jnp.take_along_axis(ids, first[:, None], axis=1)[:, 0], 0)
        new_hit = jnp.where(hit == 0, chunk_hit, hit)
        # pixels whose ray already passed t_end can never hit: mark with -1 sentinel
        exhausted = (active_t + chunk * ray_increment) >= t_end
        new_hit = jnp.where((new_hit == 0) & exhausted, -1, new_hit)
        return ci + 1, new_hit, active_t + chunk * ray_increment

    # seed the carry from t_start so its varying-manual-axes status matches the
    # body output under shard_map (zeros literal would be device-invariant and
    # trip the while_loop vma check)
    hit0 = (t_start * 0.0).astype(jnp.int32)
    ci0 = jnp.zeros((), jnp.int32) + (hit0[0] * 0)
    _, hit, _ = jax.lax.while_loop(cond, body, (ci0, hit0, t_start))
    return jnp.maximum(hit, 0).reshape(height, width)


@partial(jax.jit, static_argnames=("num_ids",))
def scatter_features(features_2d: jax.Array,   # [H,W,C] float
                     hit_ids: jax.Array,       # [H,W] int32, 0 = miss
                     num_ids: int) -> Tuple[jax.Array, jax.Array]:
    """Accumulate per-pixel features into per-voxel sums + hit counts.

    Deterministic segment_sum replacement for the CUDA atomicAdd loop
    (project_image_cuda_kernel.cu:77-90). Row 0 collects misses (the reference also
    leaves row 0 of its 1-based table unused, debug_project_features.py:157-163).
    Returns (feature_sums [num_ids, C] f32, counts [num_ids] i32).
    """
    C = features_2d.shape[-1]
    flat_feats = features_2d.reshape(-1, C).astype(jnp.float32)
    ids = hit_ids.reshape(-1)
    # NB: pre-sorting pixels by id + indices_are_sorted=True makes segment_sum
    # itself 7× faster on v5e (29 → 4 ms for 512k×512 RANDOM ids), but real
    # first-hit ids are spatially coherent and the sort+row-gather (~10 ms)
    # cancels the gain — measured a wash end-to-end, so keep the simple form.
    sums = jax.ops.segment_sum(jnp.where((ids > 0)[:, None], flat_feats, 0.0),
                               ids, num_segments=num_ids)
    counts = jax.ops.segment_sum((ids > 0).astype(jnp.int32), ids, num_segments=num_ids)
    return sums, counts


@partial(jax.jit, static_argnames=("num_ids",))
def scatter_predictions(preds_2d: jax.Array,   # [H,W] int32
                        hit_ids: jax.Array,    # [H,W] int32
                        num_ids: int) -> jax.Array:
    """pred_mode equivalent: per-voxel max over int predictions
    (traverseOccGridPredictionProjecter, kernel :95-137)."""
    ids = hit_ids.reshape(-1)
    vals = preds_2d.reshape(-1)
    vals = jnp.where(ids > 0, vals, jnp.iinfo(jnp.int32).min)
    return jax.ops.segment_max(vals, ids, num_segments=num_ids)


def default_max_steps(width, height, fx, fy, depth_min, depth_max,
                      ray_increment, cx=None, cy=None) -> int:
    """Static bound on ray-march steps: worst-case depth_to_ray over the
    image. Pass cx/cy for off-center principal points — the farthest image
    corner is then max(c, W-1-c) pixels out, not W/2; an underestimated
    bound makes edge rays stop short of depth_max and report misses."""
    dx = max(float(cx), width - 1 - float(cx)) if cx is not None else width / 2
    dy = (max(float(cy), height - 1 - float(cy)) if cy is not None
          else height / 2)
    corner = np.sqrt((dx / fx) ** 2 + (dy / fy) ** 2 + 1.0)
    return int(np.ceil((depth_max - depth_min) * corner / ray_increment)) + 2


def lift_view(features_2d, occupancy, c2w, intrinsics, grid_origin, voxel_size,
              num_ids: int, depth_min: float = 0.01, depth_max: float = 10.0,
              ray_increment: Optional[float] = None, max_steps: Optional[int] = None,
              chunk: int = 32):
    """One view end-to-end: first-hit ray march + feature scatter.

    ``ray_increment`` defaults to voxel_size/2, the reference's setting
    (debug_project_features.py:167-168). Returns (sums [num_ids,C], counts [num_ids]).
    """
    H, W = features_2d.shape[:2]
    fx = float(intrinsics[0]); fy = float(intrinsics[1])
    if ray_increment is None:
        ray_increment = float(voxel_size) * 0.5
    if max_steps is None:
        max_steps = default_max_steps(W, H, fx, fy, depth_min, depth_max,
                                      ray_increment,
                                      cx=float(intrinsics[2]),
                                      cy=float(intrinsics[3]))
    hits = first_hit_voxels(occupancy, jnp.asarray(c2w, jnp.float32),
                            jnp.asarray(intrinsics, jnp.float32),
                            jnp.asarray(grid_origin, jnp.float32),
                            jnp.asarray(voxel_size, jnp.float32),
                            depth_min, depth_max, jnp.asarray(ray_increment, jnp.float32),
                            W, H, max_steps, chunk)
    return scatter_features(jnp.asarray(features_2d), hits, num_ids)


@partial(jax.jit, static_argnames=("num_ids", "max_steps", "chunk", "width", "height"))
def lift_views_scan(features_2d: jax.Array,    # [V,H,W,C]
                    occupancy: jax.Array,      # [Z,Y,X] int32
                    c2ws: jax.Array,           # [V,4,4]
                    intrinsics: jax.Array,     # [V,4]
                    grid_origin: jax.Array, voxel_size: jax.Array,
                    depth_min: float, depth_max: float, ray_increment: jax.Array,
                    num_ids: int, max_steps: int, width: int, height: int,
                    chunk: int = 32):
    """Scan over views with HBM-resident accumulators — the reference streams one view
    per *subprocess* with host-side dict accumulation
    (aggregate_voxel_features_onthefly.py:248-313); here the whole multi-view
    aggregation is one XLA program.
    """
    C = features_2d.shape[-1]

    def step(carry, view):
        sums, counts = carry
        feats, c2w, intr = view
        hits = first_hit_voxels(occupancy, c2w, intr, grid_origin, voxel_size,
                                depth_min, depth_max, ray_increment,
                                width, height, max_steps, chunk)
        s, c = scatter_features(feats, hits, num_ids)
        return (sums + s, counts + c), None

    init = (jnp.zeros((num_ids, C), jnp.float32), jnp.zeros((num_ids,), jnp.int32))
    (sums, counts), _ = jax.lax.scan(step, init, (features_2d, c2ws, intrinsics))
    return sums, counts


def mean_features(sums: jax.Array, counts: jax.Array) -> jax.Array:
    """avg_feats = sums / max(counts, 1), fp16 on disk like the reference
    (aggregate_voxel_features_onthefly.py:383-395)."""
    return sums / jnp.maximum(counts, 1)[:, None].astype(sums.dtype)
