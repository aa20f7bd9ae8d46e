#!/usr/bin/env python
"""Unified-Lift training CLI — drop-in for the reference's train_unified_lift.py
(train_unified_lift.py:525-586; NB the reference's train.sh references a root
train.py that doesn't exist there — SURVEY §7 quirk list — this one does).

Usage:
  python train.py -s <data_dir> -m <output_dir> --config_file config/train.json
"""

from __future__ import annotations

import json
import sys
from argparse import ArgumentParser, Namespace

from segsplat_tpu.train.trainer import OptimizationConfig
from segsplat_tpu.utils.config import (ModelParams, OptimizationParams,
                                       PipelineParams, save_cfg_args)
from segsplat_tpu.utils.system import safe_state


def main(argv=None):
    parser = ArgumentParser(description="Unified-Lift TPU training")
    lp = ModelParams(parser)
    op = OptimizationParams(parser)
    pp = PipelineParams(parser)
    parser.add_argument("--config_file", type=str, default="")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--detect_anomaly", action="store_true")
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[30_000])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--use_wandb", action="store_true")
    parser.add_argument("--num_classes", type=int, default=256)
    parser.add_argument("--capacity", type=int, default=0)
    parser.add_argument("--pair_cap", type=int, default=0,
                        help="cap sorted raster pairs (speed knob; num_pairs "
                             "is logged and overflow warns)")
    parser.add_argument("--max_per_tile", type=int, default=256,
                        help="per-tile blend K (0 = auto-size from measured "
                             "per-tile pair depth; the reference blends "
                             "unbounded per-tile lists)")
    parser.add_argument("--view_batch", type=int, default=1,
                        help="views per iteration; >1 shards the batch over "
                             "all devices (SPMD data parallelism)")
    parser.add_argument("--mesh_tensor", type=int, default=1,
                        help="tensor-parallel mesh axis for the codebook")
    args = parser.parse_args(argv)
    args.save_iterations.append(args.iterations)

    if args.config_file:
        with open(args.config_file) as f:
            cfg = json.load(f)
        for k, v in cfg.items():
            setattr(args, k, v)

    safe_state(args.quiet)
    dataset = lp.extract(args)
    opt_args = op.extract(args)
    save_cfg_args(args.model_path, dataset)

    # map argparse groups onto the jit-time config
    opt = OptimizationConfig(
        iterations=opt_args.iterations,
        position_lr_init=opt_args.position_lr_init,
        position_lr_final=opt_args.position_lr_final,
        position_lr_delay_mult=opt_args.position_lr_delay_mult,
        position_lr_max_steps=opt_args.position_lr_max_steps,
        feature_lr=opt_args.feature_lr,
        opacity_lr=opt_args.opacity_lr,
        scaling_lr=opt_args.scaling_lr,
        rotation_lr=opt_args.rotation_lr,
        percent_dense=opt_args.percent_dense,
        lambda_dssim=opt_args.lambda_dssim,
        densification_interval=opt_args.densification_interval,
        opacity_reset_interval=opt_args.opacity_reset_interval,
        densify_from_iter=opt_args.densify_from_iter,
        densify_until_iter=opt_args.densify_until_iter,
        densify_grad_threshold=opt_args.densify_grad_threshold,
        num_classes=args.num_classes,
    )
    from segsplat_tpu.pipeline.train import TrainRunConfig, train

    run = TrainRunConfig(
        iterations=opt.iterations,
        test_iterations=tuple(args.test_iterations),
        save_iterations=tuple(args.save_iterations),
        checkpoint_iterations=tuple(args.checkpoint_iterations),
        white_background=dataset.white_background,
        resolution=dataset.resolution,
        num_classes=args.num_classes,
        raster_pair_cap=args.pair_cap,
        raster_max_per_tile=args.max_per_tile,
        view_batch=args.view_batch,
        mesh_tensor=args.mesh_tensor,
    )
    gui = None
    if args.port > 0:
        from segsplat_tpu.viewer import NetworkGUI
        gui = NetworkGUI()
        try:
            gui.init(args.ip, args.port)
            print(f"GUI server at {args.ip}:{args.port}")
        except OSError as e:
            print(f"[WARN] viewer port unavailable ({e}); GUI disabled")
            gui = None

    print(f"Optimizing {dataset.model_path}")
    train(dataset.source_path, dataset.model_path, opt=opt, run=run,
          images=dataset.images, object_dir=dataset.object_path,
          eval_split=dataset.eval, capacity=args.capacity or None,
          start_checkpoint=args.start_checkpoint, gui=gui)
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
