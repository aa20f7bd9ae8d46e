#!/usr/bin/env python
"""LERF-Masked segmentation inference — rebuild of the reference's
script/debug_checks_scripts/render_lerf_mask_unified_lift.py (:46-134): render
16-ch identity features per view, classify with the trained codebook, select
object ids matching a text-query mask (IoA > 0.7), export per-view
softmax-thresholded test masks.

The reference grounds the text query with GroundingDINO+SAM on frame 0
(:156-165, ext/grounded_sam.py:58-115). In-framework grounding replaces that
external dependency: --query_text scores frame-0 LSeg pixel features against
the prompt vs the LERF negative prompts (pipeline/query.text_query_mask) —
pass --lseg_feat (frame-0 .npy) or --lseg_dir (extract_lseg_features output).
A precomputed binary PNG via --query_mask is still accepted and wins if
given."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
from argparse import ArgumentParser

import numpy as np
from PIL import Image


def main(argv=None):
    import jax.numpy as jnp

    from segsplat_tpu.io.dataset import resolution_scale_for
    from segsplat_tpu.render import render
    from segsplat_tpu.scene import Scene, to_device_camera
    from segsplat_tpu.train.editing import select_obj_ioa
    from segsplat_tpu.utils.config import ModelParams, get_combined_args

    parser = ArgumentParser()
    ModelParams(parser, sentinel=True)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--classifier", default="",
                        help="classifier.npz codebook (defaults to the one next "
                             "to the loaded point cloud)")
    parser.add_argument("--query_mask", default="",
                        help="binary PNG mask of the queried object on view 0 "
                             "(the grounded-SAM output in the reference); "
                             "optional when --query_text is given")
    parser.add_argument("--query_text", default="",
                        help="text prompt, grounded in-framework against "
                             "frame-0 LSeg features (--lseg_feat/--lseg_dir)")
    parser.add_argument("--lseg_feat", default="",
                        help="frame-0 LSeg feature map .npy for --query_text")
    parser.add_argument("--lseg_dir", default="",
                        help="directory of per-view LSeg .npy maps; frame 0's "
                             "is matched by camera name")
    parser.add_argument("--relevancy_threshold", type=float, default=0.5)
    parser.add_argument("--ioa_threshold", type=float, default=0.7)
    parser.add_argument("--softmax_threshold", type=float, default=0.2)
    parser.add_argument("--out_name", default="test_mask")
    parser.add_argument("--allow_random_weights", action="store_true",
                        help="accept LSeg features tainted "
                             "weights_source=random (taint propagates to the "
                             "mask output dir)")
    args = get_combined_args(parser, argv)

    scene = Scene(args.source_path, args.model_path, images=args.images,
                  eval_split=args.eval, shuffle=False,
                  load_iteration=args.iteration)
    from segsplat_tpu.io.artifacts import find_codebook, load_codebook
    cls_path = args.classifier or find_codebook(args.model_path,
                                                scene.loaded_iter)
    code_book = jnp.asarray(load_codebook(cls_path))            # [256,16]

    cams = scene.get_test_cameras() or scene.get_train_cameras()
    scale = resolution_scale_for(cams[0].width, cams[0].height, args.resolution)
    dcams = [to_device_camera(c, scale) for c in cams]
    bg = jnp.zeros((3,))

    def view_logits(cam):
        out = render(scene.gaussians, cam, bg)
        obj = out["render_object"]                               # [16,H,W]
        return jnp.einsum("kd,dhw->khw", code_book, obj)         # [256,H,W]

    # frame 0: pick object ids under the query mask (:76-78)
    logits0 = view_logits(dcams[0])
    pred0 = np.asarray(jnp.argmax(logits0, axis=0))
    # grounding provenance: random-weight LSeg features must not silently
    # become LERF eval numbers (io/provenance.py); the stamp propagates to
    # the mask output dir so eval_lerf_mask.py sees it on pred_root.
    grounding_source = "grounding:precomputed_mask"
    if args.query_mask:
        qmask = np.asarray(Image.open(args.query_mask).convert("L").resize(
            (pred0.shape[1], pred0.shape[0]), Image.NEAREST)) > 128
    elif args.query_text:
        from segsplat_tpu.pipeline.query import text_query_mask

        feat_path = args.lseg_feat
        if not feat_path:
            if not args.lseg_dir:
                raise SystemExit("--query_text needs --lseg_feat or --lseg_dir")
            feat_path = os.path.join(args.lseg_dir,
                                     f"{cams[0].image_name}.npy")
        from segsplat_tpu.io.provenance import (read_weights_source,
                                                require_untainted)
        grounding_source = read_weights_source(feat_path)
        require_untainted(grounding_source, args.allow_random_weights,
                          f"LSeg features {feat_path}")
        fmap = np.load(feat_path).astype(np.float32)             # [C,h,w]
        qsmall = text_query_mask(fmap, args.query_text,
                                 threshold=args.relevancy_threshold,
                                 channels_first=True)
        qmask = np.asarray(Image.fromarray(
            qsmall.astype(np.uint8) * 255).resize(
            (pred0.shape[1], pred0.shape[0]), Image.NEAREST)) > 128
        print(f"[INFO] grounded '{args.query_text}' → "
              f"{int(qmask.sum())} px on frame 0")
    else:
        raise SystemExit("pass --query_mask or --query_text")
    ids = select_obj_ioa(pred0, qmask, args.ioa_threshold)
    print(f"[INFO] selected object ids: {ids}")

    out_dir = os.path.join(args.model_path, args.out_name,
                           f"ours_{scene.loaded_iter}")
    os.makedirs(out_dir, exist_ok=True)
    from segsplat_tpu.io.provenance import write_provenance
    write_provenance(out_dir,
                     grounding_source if grounding_source is not None
                     else "grounding:unstamped_lseg_features",
                     stage="render_lerf_mask")
    import jax

    for cam, info in zip(dcams, cams):
        logits = view_logits(cam)
        if ids:
            prob = jax.nn.softmax(logits, axis=0)                # [256,H,W]
            sel = np.asarray(prob)[np.asarray(ids)].max(axis=0)  # [H,W]
        else:
            sel = np.zeros(pred0.shape, np.float32)
        mask = (sel > args.softmax_threshold).astype(np.uint8) * 255
        Image.fromarray(mask).save(
            os.path.join(out_dir, f"{info.image_name}.png"))
    print(f"[DONE] masks → {out_dir}")


if __name__ == "__main__":
    main()
