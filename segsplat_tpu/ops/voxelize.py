"""Sparse voxel quantization — the MinkowskiEngine / occupancy-grid equivalent.

The reference quantizes points two ways:
  * floor-quantization for grid *construction*: ``floor((p - min) / cell)`` then
    unique, centers at ``idx * cell + min`` (minkowski_voxel_grid_from_ply_advanced.py:
    136-151; ME.SparseTensor in utils/hash_grid.py:742-801),
  * round-quantization for *occupancy lookup*: ``round((p - origin) / voxel_size)``
    with 1-based unique voxel IDs in a dense [Z,Y,X] int array
    (cuda_project_image_to_sparse_voxel/build_sparse_occupancy.py:32-53).

CUDA uses hashing + atomics for this; the TPU-native formulation is sort + segment
reduction: quantize → pack (x,y,z) into one int32 linear key (grid size guarded
< 2³¹ cells) → sort → unique via adjacent difference → ``jax.ops.segment_*`` for
per-voxel feature reduction. Fully deterministic (no atomics) and MXU/VPU friendly.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from segsplat_tpu.core.types import VoxelGrid


def pack_coords(coords: jax.Array, shape_xyz) -> jax.Array:
    """[V,3] int (x,y,z) → linear key  z*Y*X + y*X + x (matches the dense
    occupancy layout, build_sparse_occupancy.py:44-46).

    Keys are int32 ON PURPOSE (this project runs with JAX x64 disabled, so an
    int64 request would silently truncate anyway); the trace-time guard makes
    grids whose keys would not fit fail loudly instead (grids that large are
    far beyond the production 0.04 m officescene scale anyway)."""
    X, Y = int(shape_xyz[0]), int(shape_xyz[1])
    Z = int(shape_xyz[2]) if len(shape_xyz) > 2 else 1
    if Z * Y * X >= 2 ** 31:
        raise ValueError(
            f"grid {X}x{Y}x{Z} has {Z * Y * X} cells >= 2^31: linear keys "
            f"would overflow int32 — raise voxel_size or shrink the grid")
    c = coords.astype(jnp.int32)
    return c[:, 2] * (Y * X) + c[:, 1] * X + c[:, 0]


def unpack_key(key: jax.Array, shape_xyz) -> jax.Array:
    X, Y = int(shape_xyz[0]), int(shape_xyz[1])
    z = key // (Y * X)
    rem = key - z * (Y * X)
    y = rem // X
    x = rem - y * X
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


def voxelize_points(points: np.ndarray, voxel_size: float,
                    features: Optional[np.ndarray] = None,
                    origin: Optional[np.ndarray] = None,
                    reduction: str = "mean") -> VoxelGrid:
    """Floor-quantize points into a sparse grid with optional per-voxel feature
    reduction. Host-side (numpy) — grid construction is a preprocessing stage; the
    jit path is `occupancy_from_coords` / `reduce_by_voxel` below.

    Matches minkowski_voxel_grid_from_ply_advanced.py:136-151: origin defaults to the
    min corner; centers are coord*voxel_size + origin (i.e. the reference's "center"
    is actually the low corner of the cell — we keep that quirk for format parity).
    """
    points = np.asarray(points, np.float64)
    if origin is None:
        origin = points.min(axis=0)
    idx = np.floor((points - origin) / voxel_size).astype(np.int64)
    uniq, inverse = np.unique(idx, axis=0, return_inverse=True)
    feats = None
    if features is not None:
        features = np.asarray(features)
        # accumulate in float64 regardless of input dtype: fp16 partial sums
        # round at spacing 4 above 4096 and fp16 counts cap at 2048 exactly,
        # biasing crowded-voxel means — cast back once at the end
        counts = np.bincount(inverse, minlength=len(uniq)).astype(np.float64)
        feats = np.zeros((len(uniq),) + features.shape[1:], np.float64)
        np.add.at(feats, inverse, features.astype(np.float64))
        if reduction == "mean":
            feats = feats / np.maximum(counts, 1)[:, None]
        feats = feats.astype(features.dtype)
    shape_zyx = tuple(int(s) for s in (uniq.max(axis=0) + 1)[::-1]) if len(uniq) else (0, 0, 0)
    return VoxelGrid(
        coords=jnp.asarray(uniq, jnp.int32),
        origin=jnp.asarray(origin, jnp.float32),
        voxel_size=jnp.asarray(voxel_size, jnp.float32),
        features=None if feats is None else jnp.asarray(feats),
        shape=shape_zyx,
    )


def occupancy_from_grid(grid: VoxelGrid,
                        round_centers: bool = True) -> Tuple[jax.Array, np.ndarray, tuple]:
    """Dense [Z,Y,X] int32 occupancy with 1-based voxel IDs from a sparse grid's
    *centers*, re-quantized by round() — bit-matching build_sparse_occupancy.py:32-53
    (which rounds centers against the grid origin, warning on negatives).

    Returns (occupancy [Z,Y,X], origin [3] f32, shape (Z,Y,X)).
    Voxel ID i+1 corresponds to grid.coords[i] (enumeration order = input order,
    like the reference's ``enumerate(coords)``).
    """
    centers = np.asarray(grid.centers(), np.float64)
    origin = np.asarray(grid.origin, np.float64)
    vs = float(grid.voxel_size)
    if round_centers:
        idx = np.round((centers - origin) / vs).astype(np.int64)
    else:
        idx = np.asarray(grid.coords, np.int64)
    if (idx < 0).any():
        # reference warns and shifts (build_sparse_occupancy.py:36-39)
        shift = np.minimum(idx.min(axis=0), 0)
        idx = idx - shift
        origin = origin + shift * vs
    shape = tuple(int(s) for s in (idx.max(axis=0) + 1)[::-1])  # (Z,Y,X)
    occ = np.zeros(shape, np.int32)
    occ[idx[:, 2], idx[:, 1], idx[:, 0]] = np.arange(1, len(idx) + 1, dtype=np.int32)
    return jnp.asarray(occ), origin.astype(np.float32), shape


@partial(jax.jit, static_argnames=("num_voxels", "reduction"))
def reduce_by_voxel(values: jax.Array, voxel_ids: jax.Array, num_voxels: int,
                    reduction: str = "sum") -> jax.Array:
    """Deterministic per-voxel reduction: the TPU replacement for the CUDA
    ``atomicAdd``/``atomicMax`` accumulators (project_image_cuda_kernel.cu:77-90,133).

    values:    [N, F]   per-sample payload
    voxel_ids: [N]      int32 in [0, num_voxels); negatives are dropped
    """
    valid = voxel_ids >= 0
    ids = jnp.where(valid, voxel_ids, num_voxels)  # route invalid to a trash row
    if reduction == "sum":
        out = jax.ops.segment_sum(
            jnp.where(valid[:, None], values, 0), ids, num_segments=num_voxels + 1)
    elif reduction == "max":
        out = jax.ops.segment_max(
            jnp.where(valid[:, None], values, jnp.iinfo(jnp.int32).min
                      if jnp.issubdtype(values.dtype, jnp.integer) else -jnp.inf),
            ids, num_segments=num_voxels + 1)
    else:
        raise ValueError(reduction)
    return out[:num_voxels]


@partial(jax.jit, static_argnames=("num_voxels",))
def count_by_voxel(voxel_ids: jax.Array, num_voxels: int) -> jax.Array:
    valid = voxel_ids >= 0
    ids = jnp.where(valid, voxel_ids, num_voxels)
    ones = valid.astype(jnp.int32)
    return jax.ops.segment_sum(ones, ids, num_segments=num_voxels + 1)[:num_voxels]


def unique_voxels_jit(coords: jax.Array, capacity: int, shape_xyz):
    """In-jit unique of quantized coords (sorted-key formulation).

    Returns (unique_keys [capacity] int32 padded with -1, inverse [N] int32,
    num_unique [] int32). ``capacity`` bounds the voxel count statically.
    """
    keys = pack_coords(coords, shape_xyz)
    order = jnp.argsort(keys)
    sk = keys[order]
    is_new = jnp.concatenate([jnp.ones((1,), jnp.bool_), sk[1:] != sk[:-1]])
    uidx = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # per-sorted-sample unique index
    num_unique = uidx[-1] + 1
    uniq = jnp.full((capacity,), -1, jnp.int32)
    uniq = uniq.at[jnp.where(is_new, uidx, capacity)].set(sk, mode="drop")
    inverse = jnp.zeros_like(uidx).at[order].set(uidx)
    return uniq, inverse.astype(jnp.int32), num_unique
