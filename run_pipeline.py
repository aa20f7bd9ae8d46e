#!/usr/bin/env python
"""One-command inference pipeline: trained Gaussians → voxel grid → feature
lift → voxel→Gaussian query → semantic novel views.

The reference chains these stages through four conda envs and shell scripts
(voxeltoGaussian_logits.sh, aggregate subprocesses — SURVEY §1); here every
stage runs in-process on TPU with the same artifact files written between
stages (so any stage can be re-run or swapped with reference outputs).

Example:
  python run_pipeline.py \
      -s data/officescene -m output/officescene --iteration 30000 \
      --lseg_dir data/officescene/lseg_features \
      --camera_params data/officescene/camera_params.json \
      --prompt wall floor chair table monitor
"""

from __future__ import annotations

import os
from argparse import ArgumentParser


def main(argv=None):
    p = ArgumentParser()
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--lseg_dir", required=True)
    p.add_argument("--camera_params", required=True)
    p.add_argument("--prompt", nargs="+", required=True)
    p.add_argument("--cell_size", type=float, default=0.04)
    p.add_argument("--opacity_threshold", type=float, default=0.5)
    p.add_argument("--density_eps", type=float, default=0.08)
    p.add_argument("--density_min_neighbors", type=int, default=4)
    p.add_argument("--work_dir", default="")
    p.add_argument("--max_views", type=int, default=216)
    p.add_argument("--skip_render", action="store_true")
    args = p.parse_args(argv)

    from segsplat_tpu.pipeline.lift_features import LiftConfig, aggregate_voxel_features
    from segsplat_tpu.pipeline.query import build_map, extract_gaussian_centers, query
    from segsplat_tpu.pipeline.voxel_grid import (GridFilterConfig,
                                                  build_voxel_grid, save_grid)
    from segsplat_tpu.utils.system import search_for_max_iteration

    it = args.iteration
    if it == -1:
        it = search_for_max_iteration(os.path.join(args.model_path, "point_cloud"))
    ply = os.path.join(args.model_path, "point_cloud", f"iteration_{it}",
                       "point_cloud.ply")
    work = args.work_dir or os.path.join(args.model_path, "semantic_pipeline")
    os.makedirs(work, exist_ok=True)

    print(f"[1/5] voxel grid from {ply}")
    grid = build_voxel_grid(ply, GridFilterConfig(
        cell_size=args.cell_size, opacity_threshold=args.opacity_threshold,
        density_eps=args.density_eps,
        density_min_neighbors=args.density_min_neighbors,
        normal_consistency=1.0), advanced=True)
    grid_ply = os.path.join(work, f"grid_{grid['stats']['voxels']}vox.ply")
    save_grid(grid_ply, grid)
    print(f"      {grid['stats']}")

    print("[2/5] multi-view feature lift")
    lift = aggregate_voxel_features(
        grid_ply, args.lseg_dir, args.camera_params, work,
        LiftConfig(max_views=args.max_views))
    vox_pt = sorted(f for f in os.listdir(work)
                    if f.startswith("ALL_nonzero") and f.endswith(".pt"))[-1]
    vox_pt = os.path.join(work, vox_pt)

    print("[3/5] gaussian centers + 1-NN map")
    mu = os.path.join(work, "gaussian_mu.npy")
    extract_gaussian_centers(ply, mu)
    g2v = os.path.join(work, "gauss2voxel.npy")
    build_map(vox_pt, mu, g2v)

    print(f"[4/5] open-vocab query: {args.prompt}")
    sem = os.path.join(work, "gaussian_semantics.npz")
    query(vox_pt, g2v, mu, args.prompt, sem)

    if not args.skip_render:
        print("[5/5] semantic novel-view rendering")
        import render_semantics_logits as rsl
        rsl.main(["--model_path", args.model_path, "--source_path",
                  args.source_path, "--iteration", str(it),
                  "--semantics", sem, "--skip_test"])
    print(f"[DONE] artifacts in {work}")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
