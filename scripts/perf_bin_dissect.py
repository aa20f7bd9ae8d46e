"""Dissect _bin_gaussian_ranks stage-by-stage on the real TPU: which op eats
the ~9 ms that isn't the pair sort? Progressive truncation: each variant runs
the binning up to stage S and checksums what exists so far."""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from scripts.perf_raster_stages import make_scene, measure_rtt, timeit, vm_of
from segsplat_tpu.core.types import Camera
from segsplat_tpu.ops import rasterize as R


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--m", type=int, default=3)
    args = ap.parse_args()
    W, H = 1920, 1080
    n, m, F = args.n, args.m, args.frames
    TILE = R.TILE
    tx_n, ty_n = -(-W // TILE), -(-H // TILE)
    num_tiles = tx_n * ty_n

    xyz, scales, quats, opac, logits = make_scene(n)
    cam = Camera(R=jnp.eye(3), T=jnp.zeros(3), fov_x=jnp.asarray(1.2),
                 fov_y=jnp.asarray(0.75), width=W, height=H)
    Kin = cam.intrinsics()
    fx, fy, cx, cy = Kin[0, 0], Kin[1, 1], Kin[0, 2], Kin[1, 2]
    vms = jnp.stack([vm_of(0.002 * i, W, H) for i in range(F)])
    rtt = measure_rtt()
    print(f"rtt={rtt*1e3:.1f} ms")

    def upto(stage):
        def fn(vm, xyz_, scales_, quats_):
            proj = R.project_gaussians(xyz_, scales_, quats_, vm, fx, fy,
                                       cx, cy, W, H)
            acc = jnp.sum(proj.radii)
            if stage == 0:
                return acc
            depth_key = jnp.where(proj.valid, proj.depths, jnp.inf)
            order = jnp.argsort(depth_key)
            if stage == 1:
                return acc + jnp.sum(order[::4096].astype(jnp.float32))
            means2d = proj.means2d[order]
            radii = proj.radii[order]
            valid = proj.valid[order]
            if stage == 2:
                return acc + jnp.sum(means2d[::4096, 0]) + jnp.sum(radii[::4096])
            x0 = jnp.clip(jnp.floor((means2d[:, 0] - radii) / TILE), 0, tx_n - 1).astype(jnp.int32)
            y0 = jnp.clip(jnp.floor((means2d[:, 1] - radii) / TILE), 0, ty_n - 1).astype(jnp.int32)
            x1 = jnp.clip(jnp.floor((means2d[:, 0] + radii) / TILE), 0, tx_n - 1).astype(jnp.int32)
            y1 = jnp.clip(jnp.floor((means2d[:, 1] + radii) / TILE), 0, ty_n - 1).astype(jnp.int32)
            di = jnp.arange(m, dtype=jnp.int32)
            txs = x0[:, None, None] + di[None, :, None]
            tys = y0[:, None, None] + di[None, None, :]
            in_rect = ((txs <= x1[:, None, None]) & (tys <= y1[:, None, None])
                       & valid[:, None, None])
            tile_id = jnp.where(in_rect, tys * tx_n + txs, num_tiles)
            tile_flat = tile_id.reshape(n * m * m)
            rank = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None, None],
                                    (n, m, m))
            rank_flat = rank.reshape(n * m * m)
            if stage == 3:
                return (acc + jnp.sum(tile_flat[::4096].astype(jnp.float32))
                        + jnp.sum(rank_flat[::4096].astype(jnp.float32)))
            rank_bits = 18
            key = (tile_flat.astype(jnp.uint32) << rank_bits) | rank_flat.astype(jnp.uint32)
            if stage == 4:
                return acc + jnp.sum(key[::4096].astype(jnp.float32))
            skey = jax.lax.sort(key, dimension=0)
            if stage == 5:
                return acc + jnp.sum(skey[::4096].astype(jnp.float32))
            rank_sorted = (skey & jnp.uint32((1 << rank_bits) - 1)).astype(jnp.int32)
            if stage == 6:
                return acc + jnp.sum(rank_sorted[::4096].astype(jnp.float32))
            probes = (jnp.arange(num_tiles + 1, dtype=jnp.uint32) << rank_bits)
            offsets = jnp.searchsorted(skey, probes).astype(jnp.int32)
            return acc + jnp.sum(offsets.astype(jnp.float32))
        return fn

    names = ["project", "+argsort", "+field gathers", "+pair build",
             "+key pack", "+sort", "+rank unpack", "+searchsorted"]
    prev = 0.0
    for s in range(8):
        t = timeit(f"stage {s}: {names[s]}", upto(s), vms,
                   (xyz, scales, quats), rtt)
        print(f"    delta {t - prev:+.2f} ms")
        prev = t

    # real pair count for cap sizing
    @jax.jit
    def count_pairs(vm, xyz_, scales_, quats_):
        proj = R.project_gaussians(xyz_, scales_, quats_, vm, fx, fy, cx, cy, W, H)
        _, _, offsets, _ = R._bin_gaussian_ranks(proj, W, H, m)
        return offsets[-1]
    print(f"real pairs frame0: {int(count_pairs(vms[0], xyz, scales, quats))} "
          f"of {n*m*m}")


if __name__ == "__main__":
    main()
