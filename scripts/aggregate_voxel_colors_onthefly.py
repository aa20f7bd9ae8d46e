#!/usr/bin/env python
"""RGB aggregation sanity path — drop-in for the reference's
cuda_project_image_to_sparse_voxel/aggregate_voxel_colors_onthefly.py: lift
image COLORS (instead of LSeg features) into the voxel grid and write a
mean-color PLY — the visual check that projection geometry is right."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import os
import tempfile
from argparse import ArgumentParser

import numpy as np
from PIL import Image


def main(argv=None):
    p = ArgumentParser()
    p.add_argument("--voxel_ply", required=True)
    p.add_argument("--images_dir", required=True)
    p.add_argument("--camera_params", required=True)
    p.add_argument("--out_dir", default="output/voxel_colors")
    p.add_argument("--downsample_factor", type=float, default=0.5)
    p.add_argument("--max_views", type=int, default=216)
    args = p.parse_args(argv)

    from segsplat_tpu.io.ply import write_voxel_grid_ply
    from segsplat_tpu.pipeline.lift_features import (LiftConfig,
                                                     aggregate_voxel_features)

    # stage images as [3, H, W] .npy "feature" maps and reuse the lift pipeline
    with tempfile.TemporaryDirectory() as tmp:
        files = sorted(sum((glob.glob(os.path.join(args.images_dir, e))
                            for e in ("*.jpg", "*.png", "*.jpeg", "*.JPG")),
                           []))[:args.max_views]
        if not files:
            raise SystemExit(f"no images in {args.images_dir}")
        for f in files:
            img = np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
            name = os.path.splitext(os.path.basename(f))[0]
            np.save(os.path.join(tmp, name + ".npy"),
                    np.transpose(img, (2, 0, 1)).astype(np.float16))
        cfg = LiftConfig(downsample_factor=args.downsample_factor,
                         max_views=args.max_views, checkpoint_every=0)
        out = aggregate_voxel_features(args.voxel_ply, tmp, args.camera_params,
                                       args.out_dir, cfg)

    sums = np.asarray(out["sums"])[1:]
    counts = np.asarray(out["counts"])[1:]
    nz = counts > 0
    mean = np.zeros_like(sums)
    mean[nz] = sums[nz] / counts[nz, None]
    grid = out["grid"]
    centers = np.asarray(grid.centers())
    cols = (np.clip(mean, 0, 1) * 255).astype(np.uint8)
    ply = os.path.join(args.out_dir, f"voxel_colors_{int(nz.sum())}hit.ply")
    write_voxel_grid_ply(ply, centers, cols, float(grid.voxel_size),
                         np.asarray(grid.origin))
    print(f"[DONE] {int(nz.sum())} voxels colored → {ply}")


if __name__ == "__main__":
    main()
