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
    p.add_argument("--view_chunk", type=int, default=8,
                   help="views per compiled lift step (bounds the single "
                        "host->device feature transfer: chunk*190MB fp16 at "
                        "officescene scale)")
    p.add_argument("--skip_render", action="store_true")
    p.add_argument("--render_views", type=int, default=0,
                   help="render only the first N train views (0 = all)")
    p.add_argument("--render_backend", default="pallas",
                   choices=["pallas", "xla"],
                   help="blend kernel for stage 5 (xla for cpu-backend runs; "
                        "pallas needs a TPU)")
    p.add_argument("--parity_dir", default="",
                   help="directory of reference-produced artifacts "
                        "(ALL_nonzero_voxel_features*.pt, "
                        "gaussian_semantics*.npz, grid_*.ply) to diff this "
                        "run's outputs against via eval/parity.py; a failed "
                        "diff exits nonzero")
    args = p.parse_args(argv)

    from segsplat_tpu.pipeline.lift_features import LiftConfig, aggregate_voxel_features
    from segsplat_tpu.pipeline.query import build_map, extract_gaussian_centers, query
    from segsplat_tpu.pipeline.voxel_grid import (GridFilterConfig,
                                                  build_voxel_grid, save_grid)
    from segsplat_tpu.utils.system import search_for_max_iteration

    import time as _time
    stage_t = {}

    it = args.iteration
    if it == -1:
        it = search_for_max_iteration(os.path.join(args.model_path, "point_cloud"))
    ply = os.path.join(args.model_path, "point_cloud", f"iteration_{it}",
                       "point_cloud.ply")
    work = args.work_dir or os.path.join(args.model_path, "semantic_pipeline")
    os.makedirs(work, exist_ok=True)

    print(f"[1/5] voxel grid from {ply}")
    _t0 = _time.perf_counter()
    grid = build_voxel_grid(ply, GridFilterConfig(
        cell_size=args.cell_size, opacity_threshold=args.opacity_threshold,
        density_eps=args.density_eps,
        density_min_neighbors=args.density_min_neighbors,
        normal_consistency=1.0), advanced=True)
    grid_ply = os.path.join(work, f"grid_{grid['stats']['voxels']}vox.ply")
    save_grid(grid_ply, grid)
    stage_t["voxel_grid"] = _time.perf_counter() - _t0
    print(f"      {grid['stats']}")

    print("[2/5] multi-view feature lift")
    _t0 = _time.perf_counter()
    lift = aggregate_voxel_features(
        grid_ply, args.lseg_dir, args.camera_params, work,
        LiftConfig(max_views=args.max_views, view_chunk=args.view_chunk))
    # use the path the lift stage reports — a lexicographic glob over the
    # work_dir can pick up a stale artifact from a previous run with
    # different grid parameters (the filename embeds the voxel count)
    vox_pt = lift["artifact"]
    stage_t["lift"] = _time.perf_counter() - _t0

    print("[3/5] gaussian centers + 1-NN map")
    _t0 = _time.perf_counter()
    mu = os.path.join(work, "gaussian_mu.npy")
    extract_gaussian_centers(ply, mu)
    g2v = os.path.join(work, "gauss2voxel.npy")
    build_map(vox_pt, mu, g2v)
    stage_t["centers_map"] = _time.perf_counter() - _t0

    print(f"[4/5] open-vocab query: {args.prompt}")
    _t0 = _time.perf_counter()
    sem = os.path.join(work, "gaussian_semantics.npz")
    query(vox_pt, g2v, mu, args.prompt, sem)
    stage_t["query"] = _time.perf_counter() - _t0

    if not args.skip_render:
        print("[5/5] semantic novel-view rendering")
        import render_semantics_logits as rsl
        _t0 = _time.perf_counter()
        rsl.main(["--model_path", args.model_path, "--source_path",
                  args.source_path, "--iteration", str(it),
                  "--semantics", sem, "--skip_test",
                  "--backend", args.render_backend]
                 + (["--max_views", str(args.render_views)]
                    if args.render_views > 0 else []))
        stage_t["render"] = _time.perf_counter() - _t0

    if args.parity_dir:
        if not _check_parity(args.parity_dir, vox_pt, sem, grid_ply):
            raise SystemExit("[PARITY] FAILED — see report above")
    import json as _json
    print("[TIMING] " + _json.dumps(
        {k: round(v, 1) for k, v in stage_t.items()}))
    print(f"[DONE] artifacts in {work}")


def _check_parity(parity_dir: str, vox_pt: str, sem: str,
                  grid_ply: str) -> bool:
    """Diff this run's stage artifacts against same-kind reference artifacts
    in ``parity_dir`` (BASELINE.md bit-closeness target)."""
    import glob

    from segsplat_tpu.eval import parity

    def find(*patterns):
        for pat in patterns:
            hits = sorted(glob.glob(os.path.join(parity_dir, pat)))
            if hits:
                return hits[-1]
        return None

    checks = [
        ("voxel_features", vox_pt,
         find("ALL_nonzero*voxel_features*.pt", "*voxel_features*.pt",
              "*voxel_features*.npz"), parity.compare_voxel_features),
        ("semantics", sem, find("gaussian_semantics*.npz", "*semantics*.npz"),
         parity.compare_semantics),
        ("voxel_grid", grid_ply, find("grid_*.ply", "*grid*.ply"),
         parity.compare_voxel_grids),
    ]
    ok = True
    for kind, ours, theirs, fn in checks:
        if theirs is None:
            print(f"[PARITY] {kind}: no reference artifact in {parity_dir}, "
                  f"skipped")
            continue
        print(f"[PARITY] {kind}: {ours} vs {theirs}")
        for r in fn(ours, theirs):
            print("  " + r.line())
            ok &= r.ok
    return ok


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
