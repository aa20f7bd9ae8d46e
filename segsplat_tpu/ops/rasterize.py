"""Differentiable N-channel tile rasterizer for 3D Gaussians — TPU-native.

Replaces both native rasterizers of the reference (SURVEY §2.1):
  * diff-gaussian-rasterization (Gaussian-Grouping fork): RGB + 16-channel identity
    pass + 32-channel semantic-logit pass, with screenspace-mean gradients for
    densification (call sites gaussian_renderer/__init__.py:85-120,
    train_unified_lift.py:462-470),
  * gsplat.rasterization for inference-time semantic rendering
    (voxel_to_gaussian/render_semantics_logits.py:92-105).

Design (TPU-first, not a CUDA translation):
  1. project: EWA splatting math — camera-space means, 2D covariance
     J W Σ Wᵀ Jᵀ + 0.3·I, conic, 3σ radius. One fused vectorized pass (VPU).
  2. bin: Gaussians are *pre-sorted by depth*, then each emits up to
     max_tiles_per_axis² (tile, gaussian) pairs over its screen AABB; one stable
     sort by tile id then preserves front-to-back order inside every tile.
     CUDA builds per-tile lists with atomics + a 64-bit radix sort over
     (tile | depth) keys; the stable single-key formulation halves the sort width
     and is deterministic.
  3. blend: per tile, gather a fixed-capacity window of K Gaussians and
     alpha-composite all 16×16 pixels against them with a cumulative-product
     transmittance — dense regular compute (VPU/MXU-friendly), instead of CUDA's
     divergent per-pixel early-exit loop. Saturated transmittance makes the tail
     contribute ~0, so fixed K reproduces early termination numerically.
  4. grad: plain JAX autodiff through the blend (jax.checkpoint keeps memory at
     one tile-chunk); the binning structure is discrete and carries no gradient,
     matching the CUDA backward's treatment.

Capacity knobs (static): ``max_tiles_per_axis`` clips the binned AABB of very
large splats; ``max_per_tile`` caps per-tile blending depth. Both trade a bounded
approximation for static shapes; defaults are sized so typical scenes are exact.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

TILE = 16


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def map_tile_chunks(tile_fn, num_tiles: int, tile_chunk: int):
    """Run ``tile_fn([chunk] int32 tile ids) → pytree of [chunk, ...]`` over
    all tiles in fixed-size chunks via lax.map. The tail chunk pads by
    WRAPPING ids (% num_tiles): duplicate tiles are recomputed — never
    double-written, because the duplicates are sliced off the stacked result
    — keeping one compiled shape for any num_tiles. Shared by the blend,
    lift-splat, and mesh-raster tile drivers. Returns the pytree with
    leading dim ``num_tiles``."""
    pad = (-num_tiles) % tile_chunk
    all_tiles = jnp.arange(num_tiles + pad, dtype=jnp.int32) % num_tiles
    out = jax.lax.map(tile_fn, all_tiles.reshape(-1, tile_chunk))
    return jax.tree_util.tree_map(
        lambda x: x.reshape((num_tiles + pad,) + x.shape[2:])[:num_tiles],
        out)


def tiles_to_image(x: jax.Array, ty_n: int, tx_n: int,
                   height: int, width: int) -> jax.Array:
    """[ty_n·tx_n, TILE, TILE, ...] row-major tile stack → cropped
    [height, width, ...] image."""
    extra = x.shape[3:]
    x = x.reshape((ty_n, tx_n, TILE, TILE) + extra)
    x = jnp.moveaxis(x, 2, 1)
    return x.reshape((ty_n * TILE, tx_n * TILE) + extra)[:height, :width]


class Projected(NamedTuple):
    means2d: jax.Array   # [N, 2] pixel coords
    depths: jax.Array    # [N]
    conics: jax.Array    # [N, 3] (a, b, c) of inverse 2D covariance
    radii: jax.Array     # [N] float, 3σ screen radius (0 = culled)
    valid: jax.Array     # [N] bool


def project_gaussians(means3d: jax.Array, scales: jax.Array, quats: jax.Array,
                      viewmat: jax.Array, fx, fy, cx, cy,
                      width: int, height: int,
                      znear: float = 0.2, eps2d: float = 0.3,
                      tan_fovx: Optional[jax.Array] = None,
                      tan_fovy: Optional[jax.Array] = None) -> Projected:
    """EWA projection of 3D Gaussians to screen space.

    Math follows the public 3DGS formulation (Zwicker et al. EWA splatting):
    cov2d = J W Σ Wᵀ Jᵀ with the frustum-clamped Jacobian, plus the 0.3-pixel
    low-pass the reference rasterizer applies.
    """
    R_w2c = viewmat[:3, :3]
    t_cam = means3d @ R_w2c.T + viewmat[:3, 3]
    z = t_cam[:, 2]
    valid = z > znear

    if tan_fovx is None:
        tan_fovx = (0.5 * width) / fx
    if tan_fovy is None:
        tan_fovy = (0.5 * height) / fy

    zc = jnp.maximum(z, znear)
    # frustum-clamped camera xy for the Jacobian
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = jnp.clip(t_cam[:, 0] / zc, -lim_x, lim_x) * zc
    ty = jnp.clip(t_cam[:, 1] / zc, -lim_y, lim_y) * zc

    # 3D covariance in camera frame — PLANAR [N] component arrays throughout:
    # [N,3,3] tensors pad their (3,3) minor dims to (8,128) tiles (~100×
    # physical bytes; see CLAUDE.md), and under value_and_grad the autodiff
    # residuals of the einsum chain would MATERIALIZE them (measured as a
    # dominant train-step cost; the forward-only path hid it behind fusion).
    qn = quats / (jnp.linalg.norm(quats, axis=-1, keepdims=True) + 1e-12)
    qw, qx, qy, qz = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qw * qz)
    r02 = 2 * (qx * qz + qw * qy)
    r10 = 2 * (qx * qy + qw * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qw * qx)
    r20 = 2 * (qx * qz - qw * qy)
    r21 = 2 * (qy * qz + qw * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)
    s0, s1, s2 = scales[:, 0], scales[:, 1], scales[:, 2]
    # M = R diag(s); Σ = M Mᵀ (symmetric, 6 unique components)
    m00, m01, m02 = r00 * s0, r01 * s1, r02 * s2
    m10, m11, m12 = r10 * s0, r11 * s1, r12 * s2
    m20, m21, m22 = r20 * s0, r21 * s1, r22 * s2
    s00 = m00 * m00 + m01 * m01 + m02 * m02
    s01 = m00 * m10 + m01 * m11 + m02 * m12
    s02 = m00 * m20 + m01 * m21 + m02 * m22
    s11 = m10 * m10 + m11 * m11 + m12 * m12
    s12 = m10 * m20 + m11 * m21 + m12 * m22
    s22 = m20 * m20 + m21 * m21 + m22 * m22
    # cov_cam = W Σ Wᵀ with W = R_w2c (3×3 constants × planar components)
    def _wsigma_row(i):
        # (W Σ)ᵢ· : three planar arrays
        a = R_w2c[i, 0] * s00 + R_w2c[i, 1] * s01 + R_w2c[i, 2] * s02
        b = R_w2c[i, 0] * s01 + R_w2c[i, 1] * s11 + R_w2c[i, 2] * s12
        c_ = R_w2c[i, 0] * s02 + R_w2c[i, 1] * s12 + R_w2c[i, 2] * s22
        return a, b, c_

    p00, p01, p02 = _wsigma_row(0)
    p10, p11, p12 = _wsigma_row(1)
    p20, p21, p22 = _wsigma_row(2)
    c00 = p00 * R_w2c[0, 0] + p01 * R_w2c[0, 1] + p02 * R_w2c[0, 2]
    c01 = p00 * R_w2c[1, 0] + p01 * R_w2c[1, 1] + p02 * R_w2c[1, 2]
    c02 = p00 * R_w2c[2, 0] + p01 * R_w2c[2, 1] + p02 * R_w2c[2, 2]
    c11 = p10 * R_w2c[1, 0] + p11 * R_w2c[1, 1] + p12 * R_w2c[1, 2]
    c12 = p10 * R_w2c[2, 0] + p11 * R_w2c[2, 1] + p12 * R_w2c[2, 2]
    c22 = p20 * R_w2c[2, 0] + p21 * R_w2c[2, 1] + p22 * R_w2c[2, 2]

    inv_z = 1.0 / zc
    inv_z2 = inv_z * inv_z
    # J rows: [fx/z, 0, -fx·x/z²], [0, fy/z, -fy·y/z²]
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    # cov2d = J Σc Jᵀ expanded
    a = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22) + eps2d
    b = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    c = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22) + eps2d

    det = a * c - b * b
    valid = valid & (det > 1e-12)
    det = jnp.where(det > 1e-12, det, 1.0)
    inv_det = 1.0 / det
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=1)

    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    u = fx * t_cam[:, 0] * inv_z + cx
    v = fy * t_cam[:, 1] * inv_z + cy
    means2d = jnp.stack([u, v], axis=1)

    on_screen = ((u + radius > 0) & (u - radius < width) &
                 (v + radius > 0) & (v - radius < height))
    valid = valid & on_screen
    radius = jnp.where(valid, radius, 0.0)
    return Projected(means2d, z, conic, radius, valid)


def _bin_gaussians(proj: Projected, width: int, height: int,
                   max_tiles_per_axis: int,
                   opacities: Optional[jax.Array] = None):
    """Depth-sort then emit (tile, gaussian) pairs over each Gaussian's tile AABB.

    Thin wrapper over _bin_gaussian_ranks (one shared binning implementation):
    the sorted pair ranks are resolved to original Gaussian indices with one
    int32 gather. Returns (sorted_gid [N·M²] int32, tile_offsets [T+1],
    (tx_n, ty_n)).
    """
    order, rank_sorted, offsets, dims = _bin_gaussian_ranks(
        proj, width, height, max_tiles_per_axis, opacities=opacities)
    return order[rank_sorted], offsets, dims


def _blend_tiles(sorted_gid, offsets, proj: Projected, colors, opacities,
                 bg, tx_n: int, ty_n: int, max_per_tile: int,
                 tile_chunk: int = 64):
    """Alpha-composite every tile against its (up to) K nearest-by-depth Gaussians.

    Returns (image [H', W', CH], alpha [H', W', 1]) where H' = ty_n·TILE.
    """
    K = max_per_tile
    CH = colors.shape[1]
    num_tiles = tx_n * ty_n

    counts = jnp.minimum(offsets[1:] - offsets[:-1], K)            # [T]

    # per-pixel offsets inside a tile (pixel centers at +0.5, gsplat convention)
    py, px = jnp.meshgrid(jnp.arange(TILE, dtype=jnp.float32) + 0.5,
                          jnp.arange(TILE, dtype=jnp.float32) + 0.5, indexing="ij")
    pix = jnp.stack([px.ravel(), py.ravel()], axis=1)              # [256, 2]

    def blend_chunk(tile_ids):                                     # [C] tile indices
        start = offsets[tile_ids]                                  # [C]
        cnt = counts[tile_ids]
        slot = jnp.arange(K, dtype=jnp.int32)
        gidx = sorted_gid[jnp.clip(start[:, None] + slot[None, :], 0,
                                   sorted_gid.shape[0] - 1)]       # [C, K]
        live = slot[None, :] < cnt[:, None]                        # [C, K]

        mu = proj.means2d[gidx]                                    # [C, K, 2]
        con = proj.conics[gidx]                                    # [C, K, 3]
        op = opacities[gidx]                                       # [C, K]
        col = colors[gidx]                                         # [C, K, CH]

        tx = (tile_ids % tx_n).astype(jnp.float32) * TILE
        ty = (tile_ids // tx_n).astype(jnp.float32) * TILE
        pxy = pix[None, :, :] + jnp.stack([tx, ty], axis=1)[:, None, :]  # [C,256,2]

        d = mu[:, :, None, :] - pxy[:, None, :, :]                 # [C, K, 256, 2]
        sigma = (0.5 * (con[:, :, 0, None] * d[..., 0] ** 2
                        + con[:, :, 2, None] * d[..., 1] ** 2)
                 + con[:, :, 1, None] * d[..., 0] * d[..., 1])     # [C, K, 256]
        alpha = jnp.minimum(0.999, op[:, :, None] * jnp.exp(-sigma))
        alpha = jnp.where((sigma >= 0) & live[:, :, None] & (alpha >= 1.0 / 255.0),
                          alpha, 0.0)

        one_minus = 1.0 - alpha
        trans = jnp.cumprod(one_minus, axis=1)                     # T after i
        trans_before = jnp.concatenate(
            [jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=1)  # T before i
        w = alpha * trans_before                                   # [C, K, 256]
        img = jnp.einsum("ckp,ckh->cph", w, col)                   # [C, 256, CH]
        t_final = trans[:, -1, :]                                  # [C, 256]
        img = img + t_final[..., None] * bg[None, None, :]
        return img, 1.0 - t_final

    blend_chunk = jax.checkpoint(blend_chunk)

    img, alpha = map_tile_chunks(blend_chunk, num_tiles, tile_chunk)
    img = tiles_to_image(img.reshape(num_tiles, TILE, TILE, CH),
                         ty_n, tx_n, ty_n * TILE, tx_n * TILE)
    alpha = tiles_to_image(alpha.reshape(num_tiles, TILE, TILE),
                           ty_n, tx_n, ty_n * TILE, tx_n * TILE)
    return img, alpha


def _bin_gaussian_ranks(proj: Projected, width: int, height: int,
                        max_tiles_per_axis: int,
                        opacities: Optional[jax.Array] = None):
    """Binning for both blend paths: depth-sort once, then sort (tile, rank)
    pairs with a single PACKED uint32 key (tile ≪ rank_bits | depth_rank) when
    the bit budget allows — unique keys make the sort stability-free and
    single-operand, ~2× cheaper than the stable two-operand sort (the >32-bit
    fallback sorts lexicographically on (tile, rank), which is
    order-independent and therefore bit-identical).

    Layout: per-pair arrays are built [m², N] (one row per AABB tile offset,
    minor dim N) and flattened stream-major. TPU physical layout tiles the
    minor two dims to (8, 128): the depth-major [N, m, m] formulation padded
    every m×m tail to a full (8,128) tile — a ~100× physical blowup for m=3
    that cost ~8 ms/frame at 1080p/200k (measured, scripts/perf_bin_dissect.py)
    for what is ~0.3 ms of real work. Pair order doesn't matter: the sort key
    carries the full (tile, rank) order.

    NB a pre-sort jnp.nonzero(size=cap) compaction of the sentinel pairs was
    measured 2× SLOWER end-to-end than sorting the padded array (nonzero's
    cumsum+gather costs more than the sort work it saves); sentinels sort to
    the tail, so consumers can instead slice the sorted array to a static cap
    (see pair_cap in _blend_tiles_pallas).

    Returns (order [N] depth order, rank_sorted [L], offsets [T+1]).
    """
    tx_n = -(-width // TILE)
    ty_n = -(-height // TILE)
    num_tiles = tx_n * ty_n
    n = proj.means2d.shape[0]
    m = max_tiles_per_axis

    depth_key = jnp.where(proj.valid, proj.depths, jnp.inf)
    order = jnp.argsort(depth_key)
    means2d = proj.means2d[order]
    radii = proj.radii[order]
    valid = proj.valid[order]

    x0 = jnp.clip(jnp.floor((means2d[:, 0] - radii) / TILE), 0, tx_n - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((means2d[:, 1] - radii) / TILE), 0, ty_n - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((means2d[:, 0] + radii) / TILE), 0, tx_n - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((means2d[:, 1] + radii) / TILE), 0, ty_n - 1).astype(jnp.int32)

    di = jnp.arange(m, dtype=jnp.int32)
    dx = jnp.tile(di, m)                                           # [m²]
    dy = jnp.repeat(di, m)
    txs = x0[None, :] + dx[:, None]                                # [m², N]
    tys = y0[None, :] + dy[:, None]
    in_rect = ((txs <= x1[None, :]) & (tys <= y1[None, :]) & valid[None, :])

    if opacities is not None:
        # opacity-aware tile culling — EXACT w.r.t. the blend's alpha ≥ 1/255
        # cutoff: σ(p) ≥ ½·λmin(conic)·d(p)² with λmin ≥ 9/radius²
        # (radius = ceil(3σ₁)), so a tile whose pixel-center rect is farther
        # than d² > 2·ln(255·op)·r²/9 from the mean can only produce
        # α < 1/255 — pairs the blend would discard pixel-by-pixel anyway.
        # Cuts AABB corner tiles; biggest win for large/transparent splats.
        # MEASURED at bench scale (1080p/200k/m=3, ~11 px splats): the
        # per-pair rect-distance math costs +4.0 ms/frame, MORE than the
        # culled blend work saves — opacity_cull therefore defaults to OFF
        # in rasterize(); keep it for large-splat / low-opacity workloads.
        op_s = opacities[order]
        ln_cut = jnp.log(jnp.maximum(255.0 * jnp.minimum(op_s, 0.999), 1e-12))
        d2_max = (2.0 / 9.0) * ln_cut * radii * radii              # [N]
        # margin keeps borderline pairs (float rounding must never cull a
        # pair whose true max alpha reaches the 1/255 cutoff); it must SCALE
        # with the coordinate magnitude — at 1080p the rect-distance math
        # rounds at ~1e-2 for large d², where an absolute 1e-3 would be
        # smaller than one ulp
        d2_max = d2_max + 1e-3 + 1e-5 * jnp.abs(d2_max)
        rx0 = txs.astype(jnp.float32) * TILE + 0.5                 # pixel-center
        ry0 = tys.astype(jnp.float32) * TILE + 0.5                 # rect bounds
        ddx = jnp.maximum(jnp.maximum(rx0 - means2d[None, :, 0],
                                      means2d[None, :, 0] - (rx0 + TILE - 1.0)),
                          0.0)
        ddy = jnp.maximum(jnp.maximum(ry0 - means2d[None, :, 1],
                                      means2d[None, :, 1] - (ry0 + TILE - 1.0)),
                          0.0)
        in_rect = in_rect & (ddx * ddx + ddy * ddy <= d2_max[None, :])

    tile_id = jnp.where(in_rect, tys * tx_n + txs, num_tiles)      # sentinel = T
    tile_flat = tile_id.reshape(m * m * n)
    rank_flat = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :],
                                 (m * m, n)).reshape(m * m * n)

    rank_bits = max(int(math.ceil(math.log2(max(n, 2)))), 1)
    tile_bits = max(int(math.ceil(math.log2(num_tiles + 2))), 1)
    if rank_bits + tile_bits <= 32:
        key = (tile_flat.astype(jnp.uint32) << rank_bits) | rank_flat.astype(jnp.uint32)
        skey = jax.lax.sort(key, dimension=0)
        rank_sorted = (skey & jnp.uint32((1 << rank_bits) - 1)).astype(jnp.int32)
        probes = (jnp.arange(num_tiles + 1, dtype=jnp.uint32) << rank_bits)
        offsets = jnp.searchsorted(skey, probes).astype(jnp.int32)
    else:
        stile, rank_sorted = jax.lax.sort((tile_flat, rank_flat), dimension=0,
                                          num_keys=2)
        offsets = jnp.searchsorted(
            stile, jnp.arange(num_tiles + 1, dtype=jnp.int32)).astype(jnp.int32)
    return order, rank_sorted, offsets, (tx_n, ty_n)


def tile_depth_counts(means3d: jax.Array, scales: jax.Array, quats: jax.Array,
                      viewmat: jax.Array, fx, fy, cx, cy,
                      width: int, height: int,
                      max_tiles_per_axis: int = 8) -> jax.Array:
    """Per-tile pair depth from the binning stage only (projection + sort,
    no blend) — the measured statistic behind auto-sizing ``max_per_tile``
    (pipeline/train._resolve_auto_max_per_tile). The reference rasterizer
    blends unbounded per-tile lists (gaussian_renderer/__init__.py:85-120);
    our fixed-K blend needs K chosen from data, not guessed. Returns int32
    ``[num_tiles]`` pair counts."""
    proj = project_gaussians(means3d, scales, quats, viewmat, fx, fy, cx, cy,
                             width, height)
    _, _, offsets, _ = _bin_gaussian_ranks(proj, width, height,
                                           max_tiles_per_axis)
    return jnp.diff(offsets)


def _blend_tiles_pallas(proj: Projected, colors, opacities, bg,
                        width: int, height: int, max_tiles_per_axis: int,
                        max_per_tile: int, pair_cap: Optional[int] = None,
                        opacity_cull: bool = False,
                        dma_block: Optional[int] = None):
    """Pallas blend path: fused per-Gaussian payload, sorted into per-tile
    contiguous depth-ordered runs (two coalesced row gathers — measured 10×
    faster than per-field or per-element gathers), blended by the DMA kernel
    (ops/blend_pallas.py) with no [T, K] window materialization.

    ``pair_cap`` statically truncates the SORTED pair list before the payload
    gather: out-of-rect sentinel pairs sort to the tail, so any cap ≥ the
    frame's real pair count is exact while the payload gather (the binning
    stage's bandwidth cost) scales with the cap instead of N·m². On overflow
    the deepest runs of the highest tile ids are dropped (offsets are clamped,
    so reads stay in bounds)."""
    from segsplat_tpu.ops.blend_pallas import (GEOM, PAYLOAD_WIDTH,
                                               blend_tiles_pallas_dma)

    K = max_per_tile
    order, rank_sorted, offsets, (tx_n, ty_n) = _bin_gaussian_ranks(
        proj, width, height, max_tiles_per_axis,
        opacities=opacities if opacity_cull else None)
    n_pairs = offsets[-1]      # real (non-sentinel) pair count, pre-cap
    # pairs beyond the per-tile K cap: the blend reads only the first K of
    # each run, so these are silently dropped unless surfaced (the reference
    # blends unbounded per-tile lists, gaussian_renderer/__init__.py:85-120)
    tile_overflow = jnp.sum(jnp.maximum(
        offsets[1:] - offsets[:-1] - max_per_tile, 0))
    if pair_cap is not None and pair_cap < rank_sorted.shape[0]:
        rank_sorted = rank_sorted[:pair_cap]
        offsets = jnp.minimum(offsets, pair_cap)

    n = colors.shape[0]
    CHp = colors.shape[1]
    # NB the packed two-pairs-per-row kernel (ops/blend_pallas2.py) halves DMA
    # traffic but measured 4 ms/frame SLOWER at 1080p — its lane sub-slicing and
    # halved matmul contraction depth cost more than the bytes saved. The blend
    # is compute-bound, so the padded single-pair layout stays the default.
    use_packed = False
    if use_packed and CHp <= 56:
        from segsplat_tpu.ops.blend_pallas2 import blend_tiles_pallas_packed

        payload = jnp.concatenate([
            proj.means2d, proj.conics, opacities[:, None],
            jnp.zeros((n, GEOM - 6), colors.dtype), colors,
            jnp.zeros((n, 64 - GEOM - CHp), colors.dtype)], axis=1)  # [N, 64]
        sorted_payload = payload[order][rank_sorted]                 # [L, 64]
        L = sorted_payload.shape[0]
        pad = K + 4 + (L + K + 4) % 2                                # even total
        sorted_payload = jnp.pad(sorted_payload, ((0, pad), (0, 0)))
        packed = sorted_payload.reshape(-1, 128)                     # free relayout
        img, alpha = blend_tiles_pallas_packed(offsets, packed, bg, tx_n,
                                               ty_n, K)
        return img, alpha, n_pairs, tile_overflow

    payload = jnp.concatenate([
        proj.means2d, proj.conics, opacities[:, None],
        jnp.zeros((n, GEOM - 6), colors.dtype), colors,
        jnp.zeros((n, PAYLOAD_WIDTH - GEOM - CHp), colors.dtype)],
        axis=1)                                                    # [N, 128]
    payload_ds = payload[order]                                    # depth-sorted
    sorted_payload = payload_ds[rank_sorted]                       # per-tile runs
    sorted_payload = jnp.pad(sorted_payload, ((0, K), (0, 0)))     # DMA overrun pad

    from segsplat_tpu.ops.blend_pallas_vjp import blend_core

    img, alpha = blend_core(offsets, sorted_payload, bg, tx_n, ty_n, K,
                            dma_block=dma_block)
    return img, alpha, n_pairs, tile_overflow


@partial(jax.jit, static_argnames=("width", "height", "max_tiles_per_axis",
                                   "max_per_tile", "tile_chunk", "backend",
                                   "pair_cap", "opacity_cull", "dma_block"))
def rasterize(means3d: jax.Array, scales: jax.Array, quats: jax.Array,
              opacities: jax.Array, colors: jax.Array,
              viewmat: jax.Array, fx, fy, cx, cy,
              width: int, height: int,
              bg: Optional[jax.Array] = None,
              means2d_offset: Optional[jax.Array] = None,
              max_tiles_per_axis: int = 8, max_per_tile: int = 512,
              tile_chunk: int = 64, backend: str = "xla",
              pair_cap: Optional[int] = None,
              opacity_cull: bool = False,
              dma_block: Optional[int] = None,
              tan_fovx: Optional[jax.Array] = None,
              tan_fovy: Optional[jax.Array] = None):
    """Full differentiable forward: project → bin → blend.

    colors: [N, CH] per-Gaussian channel payload (RGB / identity / logits —
    channel-generic like the reference's templated NUM_CHANNELS rasterizers).
    means2d_offset: [N, 2] zeros; its gradient is the screenspace-mean gradient the
    densification heuristic consumes (the reference's ``screenspace_points`` trick,
    gaussian_renderer/__init__.py:26-30).

    backend: "xla" (differentiable, any platform) or "pallas" (fused TPU
    kernel, differentiable via the custom-VJP blend in ops/blend_pallas_vjp —
    the default TRAINING and inference path on TPU; requires
    max_per_tile % 128 == 0). Both backends share the caveat that the binning
    structure (tile membership, depth order, K cap) carries no gradient.
    pair_cap (pallas only): static post-sort truncation of the pair list —
    exact whenever it covers the frame's real pair count; see
    _blend_tiles_pallas.
    opacity_cull (BOTH backends — it acts in the shared binning stage, so
    toggling it changes XLA-path binning too, not just pallas):
    exact opacity-aware tile culling in binning.
    MEASURED at bench scale (1080p/200k/m=3, small mostly-opaque splats):
    costs +4.0 ms/frame — the per-pair rect-distance math outweighs the
    culled blend work. Off by default; worth enabling for scenes with large
    or low-opacity splats (m ≥ 6).
    dma_block (pallas only): forward blend window DMA piece size (None = one
    full-window copy per tile, the measured-fastest default; 128 enables
    demand-issued pieces, +2.2 ms/frame at bench scale).

    Returns dict: image [H,W,CH], alpha [H,W], radii [N], visible [N] bool,
    depths [N], tile_overflow (scalar: pairs dropped past the per-tile K cap),
    num_pairs (pallas backend: real pair count before pair_cap).
    """
    CH = colors.shape[1]
    if bg is None:
        bg = jnp.zeros((CH,), colors.dtype)
    proj = project_gaussians(means3d, scales, quats, viewmat, fx, fy, cx, cy,
                             width, height, tan_fovx=tan_fovx, tan_fovy=tan_fovy)
    if means2d_offset is not None:
        proj = proj._replace(means2d=proj.means2d + means2d_offset)
    if backend == "pallas":
        img, alpha, n_pairs, tile_overflow = _blend_tiles_pallas(
            proj, colors, opacities, bg, width, height, max_tiles_per_axis,
            max_per_tile, pair_cap=pair_cap, opacity_cull=opacity_cull,
            dma_block=dma_block)
    else:
        n_pairs = None
        sorted_gid, offsets, (tx_n, ty_n) = _bin_gaussians(
            proj, width, height, max_tiles_per_axis,
            opacities=opacities if opacity_cull else None)
        tile_overflow = jnp.sum(jnp.maximum(
            offsets[1:] - offsets[:-1] - max_per_tile, 0))
        img, alpha = _blend_tiles(sorted_gid, offsets, proj, colors, opacities,
                                  bg, tx_n, ty_n, max_per_tile, tile_chunk)
    out = {
        "image": img[:height, :width],
        "alpha": alpha[:height, :width],
        "radii": proj.radii,
        "visible": proj.valid,
        "depths": proj.depths,
    }
    if n_pairs is not None:
        # real pair count BEFORE the pair_cap truncation: consumers log it so
        # a too-small cap (dropped pairs AND gradients) is never silent
        out["num_pairs"] = n_pairs
    # pairs beyond max_per_tile in some tile: dropped (deepest-first) by both
    # blend paths, unlike the reference's unbounded per-tile lists — surfaced
    # so dense scenes / densify bursts can't silently lose Gaussians+grads
    out["tile_overflow"] = tile_overflow
    return out


def pad_logits_to_channels(logits: jax.Array, num_channels: int = 32) -> jax.Array:
    """Pad/slice per-Gaussian logits to the fixed raster channel count — the
    reference's NUM_CHANNELS=32 contract (render_semantics_logits.py:49-57)."""
    n, c = logits.shape
    if c < num_channels:
        return jnp.pad(logits, ((0, 0), (0, num_channels - c)))
    return logits[:, :num_channels]
