"""Sharded multi-view 2D→3D feature lifting.

The reference streams one view at a time through *subprocesses* with host-side dict
accumulation (aggregate_voxel_features_onthefly.py:248-313). Here the whole
multi-view aggregation is one SPMD program:

  * views are sharded across the mesh's ``view`` axis (each chip ray-marches its
    slice of views against a replicated occupancy grid, accumulating into a local
    HBM-resident [num_ids, C] table via deterministic segment_sum),
  * feature channels are optionally sharded across the ``tensor`` axis (512-D LSeg
    features split into per-chip channel slices). NOTE each tensor chip
    re-runs the ray march for its channel slice — total march FLOPs scale
    with n_tensor, so the tensor axis shrinks the per-chip accumulator and
    feature bandwidth but NOT the hit computation; size meshes accordingly,
  * a single ``psum`` over the view axis merges the per-chip voxel tables over ICI.

Per-chip accumulation order is fixed by lax.scan and segment_sum, and psum has a
fixed reduction tree, so the result is deterministic for a given mesh shape.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from segsplat_tpu.ops.lift import first_hit_voxels, scatter_features
from segsplat_tpu.parallel.mesh import TENSOR_AXIS, VIEW_AXIS


def lift_views_sharded(mesh: Mesh,
                       features_2d: jax.Array,   # [V, H, W, C]
                       occupancy: jax.Array,     # [Z, Y, X] int32
                       c2ws: jax.Array,          # [V, 4, 4]
                       intrinsics: jax.Array,    # [V, 4]
                       grid_origin: jax.Array, voxel_size: jax.Array,
                       depth_min: float, depth_max: float, ray_increment: float,
                       num_ids: int, max_steps: int,
                       chunk: int = 32) -> Tuple[jax.Array, jax.Array]:
    """All-view feature lift over a device mesh.

    V must be a multiple of mesh.shape[view]; C a multiple of mesh.shape[tensor]
    (pad views with zero-size intrinsics / channels with zeros if needed).
    Returns replicated (sums [num_ids, C] f32, counts [num_ids] i32).
    """
    V, H, W, C = features_2d.shape

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(VIEW_AXIS, None, None, TENSOR_AXIS), P(), P(VIEW_AXIS),
                  P(VIEW_AXIS)),
        out_specs=(P(None, TENSOR_AXIS), P()),
    )
    def run(feats, occ, cams, intr):
        def step(carry, view):
            sums, counts = carry
            f, c2w, K = view
            hits = first_hit_voxels(
                occ, c2w, K, grid_origin, voxel_size, depth_min, depth_max,
                jnp.asarray(ray_increment, jnp.float32), W, H, max_steps, chunk)
            s, c = scatter_features(f, hits, num_ids)
            return (sums + s, counts + c), None

        # mark the accumulators device-varying so the scan carry type matches the
        # body output (sums vary over both axes, counts over the view axis)
        init = (jax.lax.pcast(jnp.zeros((num_ids, feats.shape[-1]), jnp.float32),
                              (VIEW_AXIS, TENSOR_AXIS), to="varying"),
                jax.lax.pcast(jnp.zeros((num_ids,), jnp.int32),
                              (VIEW_AXIS,), to="varying"))
        (sums, counts), _ = jax.lax.scan(step, init, (feats, cams, intr))
        # merge per-chip view-partials over ICI; counts are channel-independent,
        # so reduce them on the view axis only
        sums = jax.lax.psum(sums, VIEW_AXIS)
        counts = jax.lax.psum(counts, VIEW_AXIS)
        return sums, counts

    return run(features_2d, occupancy, c2ws, intrinsics)
