#!/usr/bin/env python
"""Multi-view 2D→3D feature aggregation CLI — drop-in for the reference's
cuda_project_image_to_sparse_voxel/aggregate_voxel_features_onthefly.py (which
hard-codes its paths at :23-29 and spawns two subprocesses per view; here paths
are flags and the sweep is one on-device program)."""

from __future__ import annotations

from argparse import ArgumentParser

from segsplat_tpu.pipeline.lift_features import LiftConfig, aggregate_voxel_features


def main(argv=None):
    p = ArgumentParser(description="Lift LSeg feature maps into a sparse voxel grid")
    p.add_argument("--voxel_ply", required=True,
                   help="voxel-grid PLY with voxel_size/grid_origin header comments")
    p.add_argument("--lseg_dir", required=True,
                   help="directory of per-image [C,H,W] .npy feature maps")
    p.add_argument("--camera_params", required=True,
                   help="COLMAP-derived camera params JSON")
    p.add_argument("--out_dir", default="output/voxel_features")
    p.add_argument("--depth_min", type=float, default=0.01)
    p.add_argument("--depth_max", type=float, default=10.0)
    p.add_argument("--downsample_factor", type=float, default=0.5)
    p.add_argument("--max_views", type=int, default=216)
    p.add_argument("--checkpoint_every", type=int, default=20)
    p.add_argument("--view_chunk", type=int, default=8)
    p.add_argument("--image_size", type=int, nargs=2, default=None,
                   metavar=("H", "W"))
    p.add_argument("--first_only", action="store_true",
                   help="only process the first view (debug)")
    p.add_argument("--method", default="splat", choices=["splat", "dda"],
                   help="splat = fast voxel-splatting first hit; dda = exact "
                        "CUDA-kernel transcription")
    p.add_argument("--mesh_view", type=int, default=0,
                   help="shard each view chunk over N devices (0 = all "
                        "available if >1, 1 = force single-device)")
    p.add_argument("--allow_random_weights", action="store_true",
                   help="accept a feature dir stamped weights_source=random "
                        "(taint propagates into the output artifacts)")
    args = p.parse_args(argv)

    cfg = LiftConfig(depth_min=args.depth_min, depth_max=args.depth_max,
                     downsample_factor=args.downsample_factor,
                     max_views=args.max_views,
                     checkpoint_every=args.checkpoint_every,
                     view_chunk=args.view_chunk, method=args.method)
    mesh = None
    n_view = args.mesh_view
    if n_view == 0:
        import jax
        n_view = len(jax.devices())
    if n_view > 1:
        from segsplat_tpu.parallel.mesh import make_mesh
        import jax
        mesh = make_mesh(n_view=n_view, n_tensor=1,
                         devices=jax.devices()[:n_view])
        print(f"[INFO] sharding view chunks over {n_view} devices")
    out = aggregate_voxel_features(args.voxel_ply, args.lseg_dir,
                                   args.camera_params, args.out_dir, cfg,
                                   image_size=(tuple(args.image_size)
                                               if args.image_size else None),
                                   mesh=mesh, first_only=args.first_only,
                                   allow_random_weights=args.allow_random_weights)
    print(f"[DONE] {out['views_per_sec']:.2f} views/s")


if __name__ == "__main__":
    main()
