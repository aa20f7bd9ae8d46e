"""Adaptive density control under XLA static shapes.

The reference grows/shrinks torch tensors and performs optimizer-state surgery on
every densify step (scene/gaussian_model.py:469-604: clone, split ×2 with sampled
offsets, prune by opacity/screen-size/world-size, Adam exp_avg zeroing for new rows).
XLA cannot reshape parameters, so the TPU-native design keeps a fixed-capacity table
with an ``active`` mask and *reuses free slots*:

  * prune: clear ``active`` (row data stays, rendered with opacity·0),
  * clone/split: children are scattered into the lowest-ranked free slots via a
    cumsum ranking — deterministic, one compiled program, no reallocation,
  * Adam moments of changed rows are zeroed with a mask (same effect as the
    reference's per-group state surgery),
  * when the table genuinely fills, ``grow_capacity`` pads all arrays host-side
    (one recompile per growth, amortized).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from segsplat_tpu.core.transforms import inverse_sigmoid, quat_to_rotmat
from segsplat_tpu.core.types import GaussianTable


class DensifyStats(NamedTuple):
    """Accumulated densification statistics (xyz_gradient_accum / denom /
    max_radii2D of the reference, gaussian_model.py:59-61)."""
    grad_accum: jax.Array   # [C]
    denom: jax.Array        # [C]
    max_radii: jax.Array    # [C]

    @staticmethod
    def zero(capacity: int) -> "DensifyStats":
        # three distinct buffers: aliasing one array would break jit donation
        z = lambda: jnp.zeros((capacity,), jnp.float32)
        return DensifyStats(z(), z(), z())


def add_stats(stats: DensifyStats, means2d_grad: jax.Array,
              visible: jax.Array, radii: jax.Array) -> DensifyStats:
    """Accumulate screenspace-mean gradient norms for visible Gaussians
    (add_densification_stats, gaussian_model.py:606-608)."""
    g = jnp.linalg.norm(means2d_grad[:, :2], axis=-1)
    vis = visible.astype(jnp.float32)
    return DensifyStats(
        grad_accum=stats.grad_accum + g * vis,
        denom=stats.denom + vis,
        max_radii=jnp.maximum(stats.max_radii, radii * vis),
    )


def _scatter_rows(table: GaussianTable, slots: jax.Array, src: jax.Array,
                  field_values: dict) -> GaussianTable:
    """Scatter child rows (gathered from src rows, some fields overridden) into
    free slots. slots entries == capacity are dropped."""
    updates = {}
    for name in ("xyz", "features_dc", "features_rest", "scaling", "rotation",
                 "opacity", "objects_dc"):
        arr = getattr(table, name)
        vals = field_values.get(name, arr[src])
        updates[name] = arr.at[slots].set(vals, mode="drop")
    return dataclasses.replace(table, **updates)


@partial(jax.jit, static_argnames=("max_screen_size_on",))
def densify_and_prune(table: GaussianTable, stats: DensifyStats, rng: jax.Array,
                      grad_threshold: float, min_opacity: float,
                      scene_extent: float, percent_dense: float = 0.01,
                      max_screen_size: float = 20.0,
                      max_screen_size_on: bool = False
                      ) -> Tuple[GaussianTable, DensifyStats, jax.Array, jax.Array]:
    """One clone+split+prune step (densify_and_prune, gaussian_model.py:590-604).

    Returns (table, fresh stats, changed_rows [C] bool — rows whose Adam moments
    must be zeroed, overflow count — children dropped because the table is full).
    """
    C = table.capacity
    grads = jnp.where(stats.denom > 0, stats.grad_accum / jnp.maximum(stats.denom, 1), 0.0)
    scal = table.get_scaling()
    max_scale = scal.max(axis=1)
    opac = table.get_opacity()[:, 0]
    act = table.active

    hot = act & (grads >= grad_threshold)
    clone_mask = hot & (max_scale <= percent_dense * scene_extent)
    split_mask = hot & (max_scale > percent_dense * scene_extent)

    prune = act & (opac < min_opacity)
    if max_screen_size_on:
        prune = prune | (act & (stats.max_radii > max_screen_size)) \
                      | (act & (max_scale > 0.1 * scene_extent))
    # split parents are pruned after spawning children (gaussian_model.py:571-572)
    active_after = act & ~prune & ~split_mask

    # candidate children: [3C] = clone-child | split-child-A | split-child-B
    child_valid = jnp.concatenate([clone_mask, split_mask, split_mask])
    src = jnp.tile(jnp.arange(C), 3)

    # free slots after pruning, lowest index first
    free = ~active_after
    free_order = jnp.argsort(~free)          # free rows first, by index
    n_free = free.sum()
    rank = jnp.cumsum(child_valid.astype(jnp.int32)) - 1
    fits = child_valid & (rank < n_free)
    slots = jnp.where(fits, free_order[jnp.clip(rank, 0, C - 1)], C)
    overflow = (child_valid & ~fits).sum()

    # split children: sample offset ~ N(0, scale) rotated, scale /(0.8·2)
    noise = jax.random.normal(rng, (2 * C, 3)) * jnp.tile(scal, (2, 1))
    rot = quat_to_rotmat(jnp.tile(table.rotation, (2, 1)))
    offsets = jnp.einsum("nij,nj->ni", rot, noise)
    split_xyz = jnp.tile(table.xyz, (2, 1)) + offsets
    split_scaling = jnp.log(jnp.maximum(jnp.tile(scal, (2, 1)) / 1.6, 1e-12))

    child_xyz = jnp.concatenate([table.xyz, split_xyz])
    child_scaling = jnp.concatenate([table.scaling, split_scaling])

    new_table = _scatter_rows(
        table, slots, src,
        {"xyz": child_xyz, "scaling": child_scaling})
    new_active = active_after.at[slots].set(True, mode="drop")
    new_table = dataclasses.replace(new_table, active=new_active)

    # changed rows = pruned ∪ split ∪ newly-activated child slots (the
    # previous (act != new_active) | … terms were all subsets of these)
    changed = (prune | split_mask).at[slots].set(True, mode="drop")
    return new_table, DensifyStats.zero(C), changed, overflow


@jax.jit
def reset_opacity(table: GaussianTable) -> Tuple[GaussianTable, jax.Array]:
    """Clamp all opacities to ≤0.01 (reset_opacity, gaussian_model.py:399-402).
    Returns (table, changed_rows) — the reference also zeroes the opacity Adam state."""
    new_op = inverse_sigmoid(jnp.minimum(table.get_opacity(), 0.01))
    return dataclasses.replace(table, opacity=new_op), table.active


def zero_adam_rows(opt_state, changed: jax.Array, capacity: int,
                   fields=None):
    """Zero first/second moments on changed rows for every [C, ...] leaf — the
    mask-form of the reference's optimizer-state surgery
    (_prune_optimizer / cat_tensors_to_optimizer, gaussian_model.py:469-524).

    ``fields``: optional iterable of param/label names; when given, only
    leaves whose tree path contains one of the names are zeroed — the
    opacity-reset path must zero ONLY the opacity group's moments
    (replace_tensor_to_optimizer(…, "opacity"), gaussian_model.py:454-462),
    not wipe xyz/scale/rotation momentum across the board."""
    fields = set(fields) if fields is not None else None

    def zero_leaf(path, leaf):
        if fields is not None:
            names = {getattr(e, "key", None) for e in path} \
                | {getattr(e, "name", None) for e in path}
            if not (names & fields):
                return leaf
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == capacity \
                and jnp.issubdtype(leaf.dtype, jnp.floating):
            mask = changed.reshape((capacity,) + (1,) * (leaf.ndim - 1))
            return jnp.where(mask, 0.0, leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(zero_leaf, opt_state)


def grow_capacity(table: GaussianTable, stats: DensifyStats,
                  new_capacity: int) -> Tuple[GaussianTable, DensifyStats]:
    """Host-side capacity growth (pad all arrays; one recompile amortized over
    many densify steps)."""
    C = table.capacity
    extra = new_capacity - C
    assert extra > 0

    def pad(x):
        return jnp.concatenate([x, jnp.zeros((extra,) + x.shape[1:], x.dtype)])

    rot = jnp.concatenate([table.rotation, jnp.concatenate(
        [jnp.ones((extra, 1)), jnp.zeros((extra, 3))], axis=1)])
    t = dataclasses.replace(
        table,
        xyz=pad(table.xyz), features_dc=pad(table.features_dc),
        features_rest=pad(table.features_rest), scaling=pad(table.scaling),
        rotation=rot, opacity=pad(table.opacity), objects_dc=pad(table.objects_dc),
        active=jnp.concatenate([table.active, jnp.zeros((extra,), jnp.bool_)]))
    s = DensifyStats(pad(stats.grad_accum), pad(stats.denom), pad(stats.max_radii))
    return t, s
