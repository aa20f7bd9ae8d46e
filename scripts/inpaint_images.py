#!/usr/bin/env python
"""Fill removed-object holes in training frames — the in-framework stand-in
for the reference's vendored LaMa stage (lama/prepare_pseudo_label.py:1-25,
which copies LaMa outputs into ``images_inpaint_unseen/`` for the
edit_object_inpaint finetune).

Masks can be given either as the training ``object_mask/`` id maps plus
--select_obj_id (the reference's selection convention), or as binary PNGs
(nonzero = hole). The hole is optionally dilated (the reference dilates masks
before LaMa so shadows/fringes are refilled too), then filled on the TPU with
either mask-aware push–pull + Jacobi diffusion (--method pushpull,
segsplat_tpu/ops/inpaint.py) or texture-synthesizing multi-scale PatchMatch
patch voting (--method patch, the default — segsplat_tpu/ops/inpaint_patch.py,
closer to what LaMa produces on textured backgrounds).

Usage:
  python scripts/inpaint_images.py --images <dir> --masks <dir> \
      --out images_inpaint_unseen [--select_obj_id 3 7] [--dilate 12] \
      [--method patch|pushpull]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
from argparse import ArgumentParser

import numpy as np


def load_mask(path: str, select_ids):
    from PIL import Image

    m = np.array(Image.open(path))
    if m.ndim == 3:
        m = m[..., 0]
    if select_ids:
        return np.isin(m, np.asarray(select_ids))
    return m > 127


def dilate(mask: np.ndarray, radius: int) -> np.ndarray:
    if radius <= 0:
        return mask
    try:
        from scipy.ndimage import binary_dilation

        return binary_dilation(mask, iterations=radius)
    except Exception:  # pragma: no cover - scipy always present in-image
        out = mask.copy()
        for _ in range(radius):
            out[1:] |= mask[:-1]
            out[:-1] |= mask[1:]
            out[:, 1:] |= out[:, :-1]
            out[:, :-1] |= out[:, 1:]
            mask = out.copy()
        return out


def main(argv=None):
    from PIL import Image

    from segsplat_tpu.ops.inpaint import inpaint_pushpull

    p = ArgumentParser()
    p.add_argument("--images", required=True)
    p.add_argument("--masks", required=True,
                   help="dir of object_mask id maps or binary mask PNGs; "
                        "matched to images by basename stem")
    p.add_argument("--out", required=True)
    p.add_argument("--select_obj_id", type=int, nargs="*", default=None,
                   help="treat masks as id maps and fill these ids")
    p.add_argument("--dilate", type=int, default=12)
    p.add_argument("--smooth_iters", type=int, default=64)
    p.add_argument("--method", choices=("patch", "pushpull"),
                   default="patch",
                   help="patch: texture-synthesizing PatchMatch voting; "
                        "pushpull: membrane (harmonic) fill only")
    p.add_argument("--report_lpips", action="store_true",
                   help="score each fill vs the ORIGINAL frame with LPIPS "
                        "(eval/lpips.py; real reference calibration heads, "
                        "stamped backbone) — quantifies how perceptually "
                        "invisible the fill is outside the removed object")
    args = p.parse_args(argv)
    lp_params = None
    if args.report_lpips:
        from segsplat_tpu.eval.lpips import load_lpips
        lp_params = load_lpips(net="vgg")
        print(f"[INFO] lpips: lins={lp_params['lin_source']} "
              f"backbone={lp_params['backbone_source']}")

    os.makedirs(args.out, exist_ok=True)
    mask_by_stem = {os.path.splitext(f)[0]: os.path.join(args.masks, f)
                    for f in sorted(os.listdir(args.masks))}
    n = 0
    prev = None     # previous patch-fill: temporal seed (inpaint_sequence)
    for f in sorted(os.listdir(args.images)):
        stem = os.path.splitext(f)[0]
        if stem not in mask_by_stem:
            continue
        img = np.asarray(Image.open(os.path.join(args.images, f)).convert(
            "RGB"), np.float32) / 255.0
        hole = dilate(load_mask(mask_by_stem[stem], args.select_obj_id),
                      args.dilate)
        if args.method == "patch":
            from segsplat_tpu.ops.inpaint_patch import inpaint_texture

            init = prev if prev is not None \
                and prev.shape == img.shape else None
            out = inpaint_texture(img, hole, init_fill=init)
            prev = out
        else:
            out = np.asarray(inpaint_pushpull(img, hole,
                                              smooth_iters=args.smooth_iters))
        Image.fromarray((np.clip(out, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(args.out, f))
        if lp_params is not None:
            from segsplat_tpu.eval.lpips import lpips
            print(f"  {f}: lpips_vgg={float(lpips(img, out, lp_params)):.4f} "
                  f"hole={hole.mean():.3f}")
        n += 1
    print(f"[DONE] inpainted {n} frames -> {args.out}")


if __name__ == "__main__":
    main()
