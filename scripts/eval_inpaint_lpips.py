#!/usr/bin/env python
"""Perceptual scoring of the inpainting substitutes (VERDICT r3 #4).

The reference vendors LaMa and judges inpainting by LPIPS
(lama/saicinpainting/evaluation/losses/lpips.py; the shipped calibration
heads at lama/models/lpips_models/{vgg,alex}.pth are the only real
pretrained weights in this environment). This script scores our two
inpainters — push–pull+diffusion (ops/inpaint.py) and multi-scale
PatchMatch texture synthesis (ops/inpaint_patch.py) — on NATURAL images
cropped from the reference tree itself (the gcim.jpg photograph and the
paper-figure scene renders), under LaMa-style irregular-stroke and
rectangle masks (lama/saicinpainting/training/data/masks.py).

Backbone caveat: torchvision ImageNet weights do not exist offline, so
LPIPS runs with the real calibration heads over a deterministic seed-0
backbone (eval/lpips.py module doc). Scores are a relative texture-
similarity instrument between the two methods, stamped in the output.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_IMAGES = [
    "/root/reference/lama/saicinpainting/evaluation/masks/countless/images/gcim.jpg",
    "/root/reference/poster/compare5.png",
    "/root/reference/material/Teaser.png",
    "/root/reference/poster/pipeline_final.png",
]


def natural_crops(size: int, per_image: int, seed: int = 0,
                  paths=None) -> list:
    """Textured [size,size,3] float crops in [0,1] from the reference's real
    images; near-flat crops (std < 0.04) are rejected."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    crops = []
    for p in (paths or REF_IMAGES):
        if not os.path.exists(p):
            continue
        im = Image.open(p).convert("RGB")
        arr = np.asarray(im, np.float32) / 255.0
        h, w = arr.shape[:2]
        if min(h, w) <= size:
            continue
        got, tries = 0, 0
        while got < per_image and tries < 200:
            tries += 1
            y = int(rng.integers(0, h - size))
            x = int(rng.integers(0, w - size))
            c = arr[y:y + size, x:x + size]
            if c.std() < 0.04:       # flat background / margins
                continue
            crops.append((os.path.basename(p), c))
            got += 1
    return crops


def stroke_mask(h: int, w: int, rng, strokes: int = 3) -> np.ndarray:
    """Irregular thick-stroke hole (LaMa's DrawMethod.LINE irregular masks,
    saicinpainting/training/data/masks.py)."""
    m = np.zeros((h, w), bool)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(strokes):
        y, x = rng.uniform(0.2 * h, 0.8 * h), rng.uniform(0.2 * w, 0.8 * w)
        ang = rng.uniform(0, 2 * np.pi)
        for _seg in range(int(rng.integers(2, 5))):
            ln = rng.uniform(0.15, 0.35) * min(h, w)
            y2, x2 = y + ln * np.sin(ang), x + ln * np.cos(ang)
            n = max(int(ln), 2)
            ys = np.linspace(y, y2, n)
            xs = np.linspace(x, x2, n)
            r = rng.uniform(0.02, 0.045) * min(h, w)
            for cy, cx in zip(ys, xs):
                m |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            y, x = y2, x2
            ang += rng.uniform(-1.0, 1.0)
    return m


def rect_mask(h: int, w: int, rng) -> np.ndarray:
    m = np.zeros((h, w), bool)
    bh = int(rng.uniform(0.15, 0.3) * h)
    bw = int(rng.uniform(0.15, 0.3) * w)
    y = int(rng.integers(h // 8, h - bh - h // 8))
    x = int(rng.integers(w // 8, w - bw - w // 8))
    m[y:y + bh, x:x + bw] = True
    return m


def _ssim(a: np.ndarray, b: np.ndarray) -> float:
    import jax.numpy as jnp
    from segsplat_tpu.train.losses import ssim
    return float(ssim(jnp.asarray(a.transpose(2, 0, 1)),
                      jnp.asarray(b.transpose(2, 0, 1))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=192)
    p.add_argument("--per_image", type=int, default=3)
    p.add_argument("--masks_per_crop", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_json", default="inpaint_lpips_eval.json")
    p.add_argument("--patch_iters", type=int, default=6)
    p.add_argument("--methods", nargs="+",
                   default=["pushpull", "patch",
                            "meanfill", "noisefill", "wrongtex"],
                   help="known-bad controls (meanfill/noisefill/wrongtex) "
                        "calibrate the instrument's low end: bad fills must "
                        "score well above both methods on the same crops "
                        "(VERDICT r4 weak #5)")
    p.add_argument("--platform", default=None, choices=(None, "cpu", "tpu"),
                   help="force a jax platform (use cpu when the TPU tunnel "
                        "is down; jax is preimported so this must be a "
                        "config.update, not an env var)")
    args = p.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms",
                          "cpu" if args.platform == "cpu" else "axon")

    from segsplat_tpu.eval.lpips import load_lpips, lpips
    from segsplat_tpu.ops.inpaint import inpaint_pushpull
    from segsplat_tpu.ops.inpaint_patch import inpaint_texture

    crops = natural_crops(args.size, args.per_image, args.seed)
    if not crops:
        raise SystemExit("no reference images available for crops")
    print(f"[INFO] {len(crops)} natural crops @ {args.size}px")
    params = {net: load_lpips(net=net) for net in ("vgg", "alex")}
    for net, pr in params.items():
        print(f"[INFO] lpips/{net}: lins={pr['lin_source']} "
              f"backbone={pr['backbone_source']}")

    rng = np.random.default_rng(args.seed + 1)
    rows = []
    for ci, (src, img) in enumerate(crops):
        for mi in range(args.masks_per_crop):
            mask = (stroke_mask(args.size, args.size, rng) if mi % 2 == 0
                    else rect_mask(args.size, args.size, rng))
            for method in args.methods:
                if method == "pushpull":
                    out = np.asarray(inpaint_pushpull(img, mask))
                elif method == "patch":
                    out = np.asarray(inpaint_texture(
                        img, mask, pm_iters=args.patch_iters,
                        seed=args.seed))
                # known-bad controls — the instrument's low-end calibration
                elif method == "meanfill":
                    out = img.copy()
                    out[mask] = img[~mask].mean(axis=0)
                elif method == "noisefill":
                    crng = np.random.default_rng(args.seed + 7 * ci + mi)
                    out = img.copy()
                    out[mask] = crng.uniform(
                        size=(int(mask.sum()), 3)).astype(np.float32)
                elif method == "wrongtex":
                    # paste an UNRELATED natural crop into the hole — the
                    # plausible-but-wrong failure a fill can actually produce
                    other = crops[(ci + len(crops) // 2) % len(crops)][1]
                    out = img.copy()
                    out[mask] = other[mask]
                else:
                    raise SystemExit(f"unknown method {method!r}")
                hole = mask[..., None]
                mae = float(np.abs((out - img) * hole).sum()
                            / max(hole.sum() * 3, 1))
                row = {
                    "crop": f"{src}#{ci}", "mask": ["stroke", "rect"][mi % 2],
                    "hole_frac": float(mask.mean()), "method": method,
                    "mae_hole": mae, "ssim": _ssim(out, img),
                    "lpips_vgg": float(lpips(img, out, params["vgg"])),
                    "lpips_alex": float(lpips(img, out, params["alex"])),
                }
                rows.append(row)
                print(f"  {row['crop']:24s} {row['mask']:6s} {method:9s} "
                      f"mae={mae:.4f} ssim={row['ssim']:.4f} "
                      f"lpips_vgg={row['lpips_vgg']:.4f} "
                      f"lpips_alex={row['lpips_alex']:.4f}")

    summary = {}
    for method in args.methods:
        rs = [r for r in rows if r["method"] == method]
        summary[method] = {k: float(np.mean([r[k] for r in rs]))
                           for k in ("mae_hole", "ssim", "lpips_vgg",
                                     "lpips_alex")}
        s = summary[method]
        print(f"[MEAN] {method:9s} mae={s['mae_hole']:.4f} "
              f"ssim={s['ssim']:.4f} lpips_vgg={s['lpips_vgg']:.4f} "
              f"lpips_alex={s['lpips_alex']:.4f}")
    # instrument dynamic range: the worst (highest-scoring) REAL method vs
    # the best (lowest-scoring) known-bad control, per net — the committed
    # answer to "does the scale separate good from bad fills at the low end?"
    controls = [m for m in args.methods
                if m in ("meanfill", "noisefill", "wrongtex")]
    real = [m for m in args.methods if m not in controls]
    dynamic_range = {}
    if controls and real:
        for net in ("lpips_vgg", "lpips_alex"):
            worst_real = max(summary[m][net] for m in real)
            best_control = min(summary[m][net] for m in controls)
            dynamic_range[net] = {
                "worst_real_method": worst_real,
                "best_control": best_control,
                "separation_x": round(best_control / max(worst_real, 1e-9), 1)}
            print(f"[RANGE] {net}: worst real {worst_real:.4f} vs best "
                  f"control {best_control:.4f} → separation "
                  f"{dynamic_range[net]['separation_x']}x")

    out = {"rows": rows, "summary": summary,
           "dynamic_range": dynamic_range,
           "lpips_provenance": {n: {"lins": params[n]["lin_source"],
                                    "backbone": params[n]["backbone_source"]}
                                for n in params},
           "size": args.size, "seed": args.seed}
    with open(args.out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[DONE] → {args.out_json}")
    return out


if __name__ == "__main__":
    main()
