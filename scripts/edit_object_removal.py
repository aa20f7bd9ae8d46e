#!/usr/bin/env python
"""Object removal on a trained scene — the reference's edit_object_removal
workflow (script/debug_checks_scripts/edit_object_removal.sh; NB the
``edit_object_removal.py`` it invokes is ABSENT from the reference repo —
SURVEY §1 L7 — this implements the documented behavior): classify Gaussians
with the trained codebook, deactivate the selected object ids, save the edited
point cloud."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
from argparse import ArgumentParser

import numpy as np


def main(argv=None):
    import jax.numpy as jnp

    from segsplat_tpu.scene import Scene, save_gaussian_table
    from segsplat_tpu.train.editing import mask3d_from_classes, removal_setup
    from segsplat_tpu.utils.config import ModelParams, get_combined_args

    parser = ArgumentParser()
    ModelParams(parser, sentinel=True)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--select_obj_id", type=int, nargs="+", required=True)
    parser.add_argument("--classifier", default="")
    parser.add_argument("--out_iteration", type=int, default=0,
                        help="iteration tag for the edited save (default: "
                             "loaded_iter + 1)")
    args = get_combined_args(parser, argv)

    scene = Scene(args.source_path, args.model_path, images=args.images,
                  shuffle=False, load_iteration=args.iteration)
    from segsplat_tpu.io.artifacts import find_codebook, load_codebook
    cls_path = args.classifier or find_codebook(args.model_path,
                                                scene.loaded_iter)
    code_book = load_codebook(cls_path)

    mask = mask3d_from_classes(scene.gaussians, code_book, args.select_obj_id)
    print(f"[INFO] removing {int(mask.sum())} gaussians "
          f"(ids {args.select_obj_id})")
    edited = removal_setup(scene.gaussians, mask)
    out_it = args.out_iteration or (scene.loaded_iter + 1)
    path = scene.save(out_it, edited)
    print(f"[DONE] → {path}")


if __name__ == "__main__":
    main()
