#!/usr/bin/env python
"""Semantic novel-view rendering CLI — drop-in for the reference's
voxel_to_gaussian/render_semantics_logits.py (:260-276)."""

from __future__ import annotations

import os
from argparse import ArgumentParser

import numpy as np

from segsplat_tpu.io.artifacts import load_semantics
from segsplat_tpu.pipeline.render_semantics import (attach_logits_for_table,
                                                    render_semantic_views)
from segsplat_tpu.scene import Scene, to_device_camera
from segsplat_tpu.utils.config import ModelParams, PipelineParams, get_combined_args
from segsplat_tpu.utils.system import safe_state


def main(argv=None):
    parser = ArgumentParser(description="Render per-Gaussian semantic logits")
    model = ModelParams(parser, sentinel=True)
    PipelineParams(parser)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--semantics", required=True,
                        help="gaussian_semantics .npz from voxeltoGaussian query")
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--white_background_sem", action="store_true",
                        help="composite logits on 1s instead of 0s (:250-252)")
    parser.add_argument("--backend", default="pallas", choices=["pallas", "xla"])
    parser.add_argument("--allow_random_weights", action="store_true",
                        help="accept semantics tainted weights_source=random")
    parser.add_argument("--max_views", type=int, default=0,
                        help="render only the first N views of each split "
                             "(0 = all; framework extension for bounded "
                             "runs over the tunnel)")
    args = get_combined_args(parser, argv)
    safe_state(args.quiet)

    scene = Scene(args.source_path, args.model_path, images=args.images,
                  eval_split=args.eval, shuffle=False,
                  load_iteration=args.iteration)
    logits = attach_logits_for_table(
        scene.gaussians, args.semantics,
        allow_random_weights=args.allow_random_weights)
    prompts = [str(s) for s in load_semantics(args.semantics)["prompts"]]
    bg_value = 1.0 if args.white_background_sem else 0.0

    from segsplat_tpu.io.dataset import resolution_scale_for
    for split, cams in (("train", scene.get_train_cameras()),
                        ("test", scene.get_test_cameras())):
        if (split == "train" and args.skip_train) or \
           (split == "test" and args.skip_test) or not cams:
            continue
        scale = resolution_scale_for(cams[0].width, cams[0].height,
                                     args.resolution)
        if args.max_views > 0:
            cams = cams[:args.max_views]
        dcams = [to_device_camera(c, scale) for c in cams]
        out_dir = os.path.join(args.model_path, split,
                               f"ours_{scene.loaded_iter}", "semantics")
        from segsplat_tpu.io.provenance import (read_weights_source,
                                                write_provenance)
        ws = read_weights_source(args.semantics)
        if ws is not None:  # taint/lineage follows the rendered label maps
            write_provenance(out_dir, ws, stage="render_semantics")
        print(f"[INFO] rendering {len(dcams)} {split} views → {out_dir}")
        render_semantic_views(scene.gaussians, dcams, logits, out_dir,
                              prompts=prompts, bg_value=bg_value,
                              backend=args.backend)


if __name__ == "__main__":
    main()
