"""In-framework per-frame instance segmentation (SLIC + region merging).

The reference produces its training ``object_mask/`` pseudo-labels with the
vendored DEVA/SAM/GroundingDINO stack (~11.4k LoC of external models driven by
script/debug_checks_scripts/prepare_pseudo_label.sh). This module provides the
zero-external-weights alternative: classical superpixel instance proposals —
good enough to feed Unified-Lift's identity clustering, whose losses only need
*consistent region ids*, not semantics (the codebook learns the grouping).

Pipeline:
  1. SLIC superpixels on device — grid-seeded k-means in (lab-ish color, xy)
     space. TPU-native formulation: each pixel only competes among the 3×3
     neighboring grid seeds, so the assignment is a dense [9, H, W] distance
     stack (no [K, H, W] blowup, no data-dependent shapes); centroid updates
     are one-hot MXU contractions over NUM seeds. Fixed ``iters`` under jit.
  2. Region merge on host — agglomerate adjacent superpixels whose mean
     colors are within ``merge_thresh`` (union-find over the ≤n_segments
     adjacency graph; microseconds at this scale).
  3. Small regions are absorbed into their most-similar neighbor, ids are
     compacted to 1..N (0 = background reserved, matching
     pipeline/tracking.py's convention).

Feed the resulting per-frame maps to ``prepare_pseudo_label.py track`` for
temporally-consistent ids. SAM-quality boundaries are NOT the goal here; the
external hook remains for that.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import numpy as np


@dataclasses.dataclass
class SegmentConfig:
    n_segments: int = 256        # target superpixel count (grid-rounded)
    compactness: float = 0.25    # xy weight vs color (SLIC m / S analogue)
    iters: int = 8
    merge_thresh: float = 0.08   # mean-color distance to merge regions
    min_pixels: int = 64         # absorb smaller regions into a neighbor


def _grid_dims(h: int, w: int, n: int) -> Tuple[int, int]:
    gy = max(int(round(np.sqrt(n * h / w))), 1)
    gx = max(int(round(n / gy)), 1)
    return gy, gx


@partial(jax.jit, static_argnames=("gy", "gx", "iters", "compactness"))
def _slic_assign(img, gy: int, gx: int, iters: int, compactness: float):
    """img [H, W, 3] float in [0,1] → labels [H, W] int32 in [0, gy·gx)."""
    import jax.numpy as jnp

    H, W, _ = img.shape
    K = gy * gx
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
    py = jnp.broadcast_to(ys[:, None], (H, W))
    px = jnp.broadcast_to(xs[None, :], (H, W))
    feat = jnp.concatenate(
        [img, compactness * py[..., None] * gy,
         compactness * px[..., None] * gx], axis=-1)             # [H,W,5]

    # seed centroids on the grid
    cy0 = (jnp.arange(gy, dtype=jnp.float32) + 0.5) / gy
    cx0 = (jnp.arange(gx, dtype=jnp.float32) + 0.5) / gx
    seed_y = jnp.repeat(cy0, gx)
    seed_x = jnp.tile(cx0, gy)
    iy = jnp.clip((seed_y * H).astype(jnp.int32), 0, H - 1)
    ix = jnp.clip((seed_x * W).astype(jnp.int32), 0, W - 1)
    cent = feat[iy, ix, :]                                       # [K,5]
    cent = cent.at[:, 3].set(compactness * seed_y * gy)
    cent = cent.at[:, 4].set(compactness * seed_x * gx)

    # each pixel's home grid cell
    cell_y = jnp.clip((py * gy).astype(jnp.int32), 0, gy - 1)
    cell_x = jnp.clip((px * gx).astype(jnp.int32), 0, gx - 1)

    offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]

    def step(cent, _):
        # assignment: distance to the 9 neighboring cells' centroids
        best_d = jnp.full((H, W), jnp.inf)
        best_k = jnp.zeros((H, W), jnp.int32)
        for dy, dx in offs:
            ny = jnp.clip(cell_y + dy, 0, gy - 1)
            nx = jnp.clip(cell_x + dx, 0, gx - 1)
            k = ny * gx + nx                                     # [H,W]
            c = cent[k]                                          # [H,W,5]
            d = jnp.sum((feat - c) ** 2, axis=-1)
            take = d < best_d
            best_d = jnp.where(take, d, best_d)
            best_k = jnp.where(take, k, best_k)
        # update: one-hot MXU contraction over K seeds
        oh = jax.nn.one_hot(best_k.reshape(-1), K, dtype=jnp.float32)
        sums = jax.lax.dot_general(
            oh, feat.reshape(-1, feat.shape[-1]),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # [K,5]
        cnt = jnp.sum(oh, axis=0)
        new_cent = jnp.where(cnt[:, None] > 0,
                             sums / jnp.maximum(cnt, 1.0)[:, None], cent)
        return new_cent, best_k

    cent, labs = jax.lax.scan(step, cent, None, length=iters)
    return labs[-1]


def _merge_regions(labels: np.ndarray, image: np.ndarray,
                   cfg: SegmentConfig) -> np.ndarray:
    """Host-side agglomeration of adjacent superpixels by mean color."""
    K = int(labels.max()) + 1
    flat = labels.reshape(-1)
    cols = image.reshape(-1, 3)
    sums = np.zeros((K, 3))
    np.add.at(sums, flat, cols)
    cnt = np.bincount(flat, minlength=K).astype(np.float64)
    mean = sums / np.maximum(cnt, 1.0)[:, None]

    # adjacency from horizontal/vertical label transitions
    pairs = set()
    for a, b in ((labels[:, :-1], labels[:, 1:]),
                 (labels[:-1, :], labels[1:, :])):
        lo = np.minimum(a, b).reshape(-1)
        hi = np.maximum(a, b).reshape(-1)
        for u, v in zip(*np.unique(np.stack([lo, hi]), axis=1)):
            if u != v:
                pairs.add((int(u), int(v)))

    parent = np.arange(K)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(ru, rv):
        # pool color means so later merge decisions see the merged region
        tot = cnt[ru] + cnt[rv]
        mean[ru] = (mean[ru] * cnt[ru] + mean[rv] * cnt[rv]) / max(tot, 1)
        cnt[ru] = tot
        parent[rv] = ru

    # merge similar neighbors (smallest color gap first — stable greedy)
    edges = sorted(pairs, key=lambda e: np.sum((mean[e[0]] - mean[e[1]]) ** 2))
    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv and np.sqrt(np.sum((mean[ru] - mean[rv]) ** 2)) \
                < cfg.merge_thresh:
            union(ru, rv)

    roots = np.array([find(i) for i in range(K)])
    merged = roots[labels]

    # absorb tiny regions into their most-similar neighbor; two merged small
    # regions can still be under min_pixels, so track the pooled size (cnt
    # follows roots through union) and loop until no sub-threshold region
    # has an edge left to absorb along
    sizes = np.bincount(merged.reshape(-1), minlength=K)
    small = set(np.nonzero((sizes > 0) & (sizes < cfg.min_pixels))[0].tolist())
    changed = bool(small)
    while changed and small:
        changed = False
        for u, v in edges:
            ru, rv = find(u), find(v)
            if ru != rv and (ru in small or rv in small):
                union(ru, rv)
                small.discard(rv)                # rv is no longer a root
                if cnt[ru] >= cfg.min_pixels:
                    small.discard(ru)
                else:
                    small.add(ru)
                changed = True
    roots = np.array([find(i) for i in range(K)])
    merged = roots[labels]

    # compact to 1..N (0 reserved for background by convention)
    uniq = np.unique(merged)
    remap = np.zeros(K, np.int32)
    remap[uniq] = np.arange(1, len(uniq) + 1, dtype=np.int32)
    return remap[merged]


def segment_image(image: np.ndarray, cfg: SegmentConfig = SegmentConfig()
                  ) -> np.ndarray:
    """[H, W, 3] uint8/float image → [H, W] int32 instance-id map (ids from 1;
    there is no background class — the tracker/trainer treat every region as
    an instance, like the reference's DEVA id maps)."""
    import jax.numpy as jnp

    img = np.asarray(image)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    H, W = img.shape[:2]
    gy, gx = _grid_dims(H, W, cfg.n_segments)
    labels = np.asarray(_slic_assign(jnp.asarray(img, jnp.float32), gy, gx,
                                     cfg.iters, cfg.compactness))
    return _merge_regions(labels, img, cfg)
