#!/usr/bin/env python
"""Density-filtered voxel-grid builder — drop-in for the reference's
script/minkowski_voxel_grid_density_filtered.py: opacity + radius-density
filtering then quantization (the advanced builder's filter chain minus the
normal/spikiness stages)."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
from argparse import ArgumentParser

import numpy as np

from segsplat_tpu.pipeline.voxel_grid import (GridFilterConfig, density_mask,
                                              load_gaussian_cloud,
                                              opacity_rank_top, quantize_to_grid,
                                              save_grid)


def main(argv=None):
    p = ArgumentParser()
    p.add_argument("--ply", required=True)
    p.add_argument("--output_dir", default="output/minkowski_grid")
    p.add_argument("--cell_size", type=float, default=0.05)
    p.add_argument("--density_eps", type=float, default=0.05)
    p.add_argument("--density_min_neighbors", type=int, default=10)
    p.add_argument("--opacity_threshold", type=float, default=0.9)
    args = p.parse_args(argv)

    cloud = load_gaussian_cloud(args.ply)
    xyz, colors, opacity = cloud["xyz"], cloud["colors"], cloud["opacity"]
    top = opacity_rank_top(opacity, args.opacity_threshold)
    xyz, colors = xyz[top], colors[top]
    m = density_mask(xyz, args.density_eps, args.density_min_neighbors)
    xyz, colors = xyz[m], colors[m]
    centers, vox_colors, origin, shape = quantize_to_grid(xyz, colors,
                                                          args.cell_size)
    base = os.path.splitext(os.path.basename(args.ply))[0]
    out = os.path.join(args.output_dir,
                       f"{base}_minkowski_{len(centers)}vox_density_grid.ply")
    save_grid(out, dict(centers=centers, colors=vox_colors,
                        voxel_size=args.cell_size, origin=origin, shape=shape))
    print(f"[DONE] {len(centers)} voxels → {out}")


if __name__ == "__main__":
    main()
