"""Pure-numpy oracles that literally transcribe the reference CUDA semantics
(slow loops, small inputs only). Tests compare the JAX/Pallas kernels against these —
the reference's own validation strategy was CPU prototype scripts
(script/debug_checks_scripts/project_lseg_to_voxels.py), recreated here as
deterministic unit oracles.
"""

import numpy as np


def oracle_first_hit(occupancy, c2w, intrinsics, grid_origin, voxel_size,
                     depth_min, depth_max, ray_increment, width, height):
    """Transcription of traverseOccGridProjecter
    (project_image_cuda_kernel.cu:24-92). Returns [H,W] int32 first-hit ids."""
    Z, Y, X = occupancy.shape
    fx, fy, cx, cy = intrinsics
    R = c2w[:3, :3]
    cam_pos = c2w[:3, 3]
    hits = np.zeros((height, width), np.int32)
    for y in range(height):
        for x in range(width):
            cam_dir = np.array([(x - cx) / fx, (y - cy) / fy, 1.0])
            cam_dir = cam_dir / np.linalg.norm(cam_dir)
            world_dir = R @ cam_dir
            world_dir = world_dir / np.linalg.norm(world_dir)
            dtrl = 1.0 / cam_dir[2]
            t = dtrl * depth_min
            t_end = dtrl * depth_max
            while t < t_end:
                world = cam_pos + t * world_dir
                pos = np.round((world - grid_origin) / voxel_size).astype(int)
                if (0 <= pos[0] < X) and (0 <= pos[1] < Y) and (0 <= pos[2] < Z):
                    occ = occupancy[pos[2], pos[1], pos[0]]
                    if occ != 0:
                        hits[y, x] = occ
                        break
                t += ray_increment
    return hits


def oracle_scatter(features_2d, hits, num_ids):
    """atomicAdd accumulation (kernel :77-90) as host loops."""
    C = features_2d.shape[-1]
    sums = np.zeros((num_ids, C), np.float32)
    counts = np.zeros((num_ids,), np.int32)
    H, W = hits.shape
    for y in range(H):
        for x in range(W):
            i = hits[y, x]
            if i > 0:
                sums[i] += features_2d[y, x]
                counts[i] += 1
    return sums, counts


def oracle_knn_mean_sq(points, k=3):
    """Exact brute-force mean squared distance to k nearest neighbors."""
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    part = np.sort(d2, axis=1)[:, :k]
    return part.mean(axis=1)


def make_test_scene(rng, num_voxels=40, grid_dim=8, voxel_size=0.1):
    """A tiny synthetic scene: a camera at the origin looking down +z at a sparse
    occupancy slab 1m away."""
    origin = np.array([-0.4, -0.4, 0.8], np.float32)
    coords = rng.choice(grid_dim**3, size=num_voxels, replace=False)
    xyz = np.stack([coords % grid_dim, (coords // grid_dim) % grid_dim,
                    coords // grid_dim**2], axis=1)
    occ = np.zeros((grid_dim, grid_dim, grid_dim), np.int32)
    occ[xyz[:, 2], xyz[:, 1], xyz[:, 0]] = np.arange(1, num_voxels + 1)
    c2w = np.eye(4, dtype=np.float32)
    width = height = 24
    f = 30.0
    intr = np.array([f, f, width / 2, height / 2], np.float32)
    return occ, c2w, intr, origin, voxel_size, width, height


def oracle_rasterize(means2d, conics, depths, radii, valid, colors, opacities, bg,
                     width, height):
    """Brute-force per-pixel front-to-back alpha blend over ALL gaussians (no
    tiling, no capacity caps): the uncapped spec for the tile rasterizer."""
    order = np.argsort(np.where(valid, depths, np.inf))
    CH = colors.shape[1]
    img = np.zeros((height, width, CH), np.float64)
    alpha_out = np.zeros((height, width), np.float64)
    for py in range(height):
        for px in range(width):
            pxy = np.array([px + 0.5, py + 0.5])
            T = 1.0
            acc = np.zeros(CH)
            for g in order:
                if not valid[g]:
                    continue
                d = means2d[g] - pxy
                a, b, c = conics[g]
                sigma = 0.5 * (a * d[0] ** 2 + c * d[1] ** 2) + b * d[0] * d[1]
                if sigma < 0:
                    continue
                al = min(0.999, opacities[g] * np.exp(-sigma))
                if al < 1.0 / 255.0:
                    continue
                acc += T * al * colors[g]
                T *= 1.0 - al
                if T < 1e-6:
                    break
            img[py, px] = acc + T * bg
            alpha_out[py, px] = 1.0 - T
    return img, alpha_out
