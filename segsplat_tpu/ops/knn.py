"""Nearest-neighbor mean distance — the simple-knn (distCUDA2) equivalent.

The reference seeds initial Gaussian scales with the mean *squared* distance to each
point's 3 nearest neighbors (submodules/simple-knn/simple_knn.cu:185-221, consumed at
scene/gaussian_model.py:150). Its CUDA strategy is Morton-code sort + 1024-point boxes
with AABB rejection + per-point brute force over candidate boxes.

The TPU-native strategy keeps the same skeleton but regularizes it for the VPU:
Morton-sort the points into fixed-size boxes with min/max AABBs (like the CUDA
kernel), then instead of CUDA's divergent per-point rejection loop, every query
ranks ALL boxes by point-to-AABB squared distance (a dense [chunk, n_boxes]
computation), takes the top-M boxes with ``lax.top_k``, and brute-forces their
M·box_size candidate points — a dense regular gather + reduction with static
shapes. AABB distance lower-bounds the true point distance, so with the default
box=16 / m_boxes=32 (512 candidates/query) the result is exact on every tested
distribution (validated against a numpy brute-force oracle in tests/test_knn.py);
both knobs trade throughput for a provable candidate budget exactly like the
reference's 1024-point box size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_MORTON_BITS = 10  # 3 × 10 = 30 bits, fits uint32 (x64 is disabled by default in JAX)


def _expand_bits10(v: jax.Array) -> jax.Array:
    """Interleave two zeros between the low 10 bits (30-bit Morton spread)."""
    v = v.astype(jnp.uint32)
    v &= jnp.uint32(0x3FF)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def morton_codes(points: jax.Array) -> jax.Array:
    """[N,3] float → [N] uint32 Morton codes over the bounding box (coord2Morton,
    simple_knn.cu:54-61 uses the same normalize-then-interleave construction; 10 bits
    per axis is plenty for a locality sort — it is only an ordering heuristic)."""
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    scale = (2.0 ** _MORTON_BITS - 1) / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((points - lo) * scale, 0, 2.0 ** _MORTON_BITS - 1).astype(jnp.uint32)
    return (_expand_bits10(q[:, 0])
            | (_expand_bits10(q[:, 1]) << 1)
            | (_expand_bits10(q[:, 2]) << 2))


@partial(jax.jit, static_argnames=("k", "box", "m_boxes", "chunk"))
def knn_mean_sq_dist(points: jax.Array, k: int = 3, box: int = 16,
                     m_boxes: int = 32, chunk: int = 1024) -> jax.Array:
    """Mean squared distance to the k nearest neighbors of each point.

    Drop-in distCUDA2 equivalent (simple_knn.cu boxMeanDist): returns [N] float32.
    Morton-sort → ``box``-point boxes with AABBs → per query rank all boxes by
    point-to-AABB distance, brute-force the ``m_boxes`` closest. Queries are
    processed in ``chunk`` blocks via lax.map to bound peak memory at
    chunk × n_boxes + chunk × m_boxes·box × 3 floats.
    """
    n = points.shape[0]
    order = jnp.argsort(morton_codes(points))
    sp = points[order]                                        # [N, 3] sorted

    pad = (-n) % box
    spp = jnp.pad(sp, ((0, pad), (0, 0)), constant_values=jnp.inf)
    nb = spp.shape[0] // box
    boxed = spp.reshape(nb, box, 3)
    bmin = jnp.min(jnp.where(jnp.isfinite(boxed), boxed, jnp.inf), axis=1)
    bmax = jnp.max(jnp.where(jnp.isfinite(boxed), boxed, -jnp.inf), axis=1)
    m = min(m_boxes, nb)

    qpad = (-n) % chunk
    q_all = jnp.pad(sp, ((0, qpad), (0, 0)))
    ranks = jnp.pad(jnp.arange(n, dtype=jnp.int32), (0, qpad), constant_values=-1)
    slot = jnp.arange(box, dtype=jnp.int32)

    def block(args):
        q, r = args                                           # [B,3], [B]
        d = jnp.maximum(jnp.maximum(bmin[None] - q[:, None], q[:, None] - bmax[None]), 0.0)
        bd2 = jnp.sum(d * d, axis=-1)                         # [B, nb]
        _, top = jax.lax.top_k(-bd2, m)                       # [B, m] closest boxes
        cidx = (top[:, :, None] * box + slot[None, None, :]).reshape(q.shape[0], -1)
        valid = (cidx < n) & (cidx != r[:, None])             # drop padding + self
        nbrs = sp[jnp.clip(cidx, 0, n - 1)]                   # [B, m·box, 3]
        d2 = jnp.sum((nbrs - q[:, None, :]) ** 2, axis=-1)
        d2 = jnp.where(valid, d2, jnp.inf)
        # top-k smallest via k successive masked minima (k is tiny)
        total = jnp.zeros(d2.shape[:1], points.dtype)
        rows = jnp.arange(d2.shape[0])
        for _ in range(k):
            total = total + jnp.min(d2, axis=1)
            d2 = d2.at[rows, jnp.argmin(d2, axis=1)].set(jnp.inf)
        return total / k

    mean_sorted = jax.lax.map(
        block, (q_all.reshape(-1, chunk, 3), ranks.reshape(-1, chunk))
    ).reshape(-1)[:n]
    return jnp.zeros((n,), points.dtype).at[order].set(mean_sorted)


def initial_log_scales(points: np.ndarray) -> jax.Array:
    """log(sqrt(clamp(dist2, 1e-7))) replicated ×3 — the Gaussian scale init
    (scene/gaussian_model.py:150-151)."""
    d2 = knn_mean_sq_dist(jnp.asarray(points, jnp.float32), k=3)
    s = jnp.log(jnp.sqrt(jnp.clip(d2, 1e-7, None)))
    return jnp.tile(s[:, None], (1, 3))


@partial(jax.jit, static_argnames=("chunk",))
def nearest_neighbor_index(queries: jax.Array, refs: jax.Array,
                           chunk: int = 4096) -> jax.Array:
    """Exact 1-NN index of each query among refs — the voxel→Gaussian map builder
    (voxeltoGaussian_logits.py:86-105 uses a CPU sklearn KDTree; on TPU an exact
    chunked distance argmin rides the MXU via the |q|²-2q·r+|r|² expansion).

    queries [M,3], refs [V,3] → [M] int32.
    """
    r2 = jnp.sum(refs * refs, axis=1)                     # [V]

    M = queries.shape[0]
    pad = (-M) % chunk
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    qc = qp.reshape(-1, chunk, 3)

    def one(q):
        d = -2.0 * (q @ refs.T) + r2[None, :]             # [chunk, V] (+|q|² const)
        return jnp.argmin(d, axis=1).astype(jnp.int32)

    idx = jax.lax.map(one, qc).reshape(-1)
    return idx[:M]
