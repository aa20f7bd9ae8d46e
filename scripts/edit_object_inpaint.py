#!/usr/bin/env python
"""Object inpainting on a trained scene — the reference's edit_object_inpaint
workflow (edit_object_inpaint.sh; entry .py absent upstream — SURVEY §1 L7):
remove the selected object's Gaussians, seed replacements from surrounding
geometry, then finetune ONLY the new rows against inpainted images with the
gradient mask of gaussian_model.py:187-205.

The inpainted frames (--images, e.g. images_inpaint_unseen/) can come from
the external LaMa hook like the reference, or be produced in-framework with
scripts/inpaint_images.py (TPU push-pull + diffusion fill,
segsplat_tpu/ops/inpaint.py)."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
from argparse import ArgumentParser

import numpy as np


def main(argv=None):
    from segsplat_tpu.scene import Scene
    from segsplat_tpu.train.editing import inpaint_setup, mask3d_from_classes
    from segsplat_tpu.utils.config import ModelParams, get_combined_args

    parser = ArgumentParser()
    ModelParams(parser, sentinel=True)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--select_obj_id", type=int, nargs="+", required=True)
    parser.add_argument("--classifier", default="")
    parser.add_argument("--finetune_iters", type=int, default=0,
                        help="masked finetune steps against --images "
                             "(expects LaMa-inpainted images, e.g. "
                             "images_inpaint_unseen/)")
    parser.add_argument("--out_iteration", type=int, default=0)
    args = get_combined_args(parser, argv)

    scene = Scene(args.source_path, args.model_path, images=args.images,
                  shuffle=False, load_iteration=args.iteration)
    from segsplat_tpu.io.artifacts import find_codebook, load_codebook
    cls_path = args.classifier or find_codebook(args.model_path,
                                                scene.loaded_iter)
    code_book = load_codebook(cls_path)

    mask = mask3d_from_classes(scene.gaussians, code_book, args.select_obj_id)
    print(f"[INFO] inpainting over {int(mask.sum())} removed gaussians")
    edited, new_rows = inpaint_setup(scene.gaussians, mask)
    print(f"[INFO] seeded {int(new_rows.sum())} replacement gaussians")

    if args.finetune_iters > 0:
        edited = _finetune(scene, edited, new_rows, args)
    out_it = args.out_iteration or (scene.loaded_iter + 1)
    path = scene.save(out_it, edited)
    print(f"[DONE] → {path}")


def _finetune(scene, table, new_rows, args):
    """Masked finetune: photometric-only steps updating only the seeded rows."""
    import jax
    import jax.numpy as jnp
    import optax

    from segsplat_tpu.io.dataset import resolution_scale_for
    from segsplat_tpu.render import render
    from segsplat_tpu.scene import to_device_camera
    from segsplat_tpu.train import losses as L
    from segsplat_tpu.train.editing import finetune_grad_mask
    from segsplat_tpu.train.trainer import table_params, with_params

    cams = scene.get_train_cameras()
    scale = resolution_scale_for(cams[0].width, cams[0].height, args.resolution)
    mask_fn = finetune_grad_mask(new_rows)
    opt = optax.adam(1.6e-4, eps=1e-15)
    params = table_params(table)
    opt_state = opt.init(params)
    bg = jnp.zeros((3,))

    @jax.jit
    def step(params, opt_state, cam, gt):
        def loss_fn(p):
            out = render(with_params(table, p), cam, bg)
            return (0.8 * L.l1_loss(out["render"], gt)
                    + 0.2 * (1.0 - L.ssim(out["render"], gt)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = mask_fn(grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    for it in range(args.finetune_iters):
        ci = int(rng.integers(0, len(cams)))
        cam = to_device_camera(cams[ci], scale)
        gt = jnp.asarray(np.transpose(cams[ci].load_image(scale), (2, 0, 1)))
        params, opt_state, loss = step(params, opt_state, cam, gt)
        if it % 50 == 0:
            print(f"  finetune {it}: loss {float(loss):.4f}")
    return with_params(table, params)


if __name__ == "__main__":
    main()
