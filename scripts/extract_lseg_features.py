#!/usr/bin/env python
"""Per-image LSeg 512-D dense feature extraction — drop-in for the reference's
script/extract_lseg_features.py (:43-98: resize shorter side to 360, pad to /32,
save [512, H, W] fp16 .npy per image)."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import os
from argparse import ArgumentParser

import numpy as np
from PIL import Image


def main(argv=None):
    p = ArgumentParser()
    p.add_argument("--images", required=True, help="input image directory")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--checkpoint", default="",
                   help="LSeg torch checkpoint (demo_e200.ckpt) to convert; "
                        "random-init weights are used when absent (features "
                        "are then NOT semantically meaningful — logged)")
    p.add_argument("--short_side", type=int, default=360)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"],
                   help="MXU compute dtype (bf16: 59 ms/img for ViT-L on v5e)")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from segsplat_tpu.models.lseg import LSegModel, convert_lseg_checkpoint, pad_to_multiple

    from segsplat_tpu.io.provenance import RANDOM, write_provenance

    params = None
    if args.checkpoint and os.path.exists(args.checkpoint):
        import torch
        sd = torch.load(args.checkpoint, map_location="cpu",
                        weights_only=False)
        sd = sd.get("state_dict", sd)
        params = convert_lseg_checkpoint(
            {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")})
        print(f"[INFO] loaded LSeg weights from {args.checkpoint}")
        weights_source = f"checkpoint:{os.path.basename(args.checkpoint)}"
    else:
        print("[WARN] no LSeg checkpoint — using random weights; extracted "
              "features will not be semantically meaningful (stamped "
              "weights_source=random; downstream stages refuse them unless "
              "--allow_random_weights)")
        weights_source = RANDOM
    import jax.numpy as _jnp
    model = LSegModel(params=params,
                      compute_dtype=(_jnp.bfloat16 if args.dtype == "bfloat16"
                                     else _jnp.float32))

    os.makedirs(args.out_dir, exist_ok=True)
    write_provenance(args.out_dir, weights_source,
                     short_side=args.short_side, dtype=args.dtype)
    files = sorted(sum((glob.glob(os.path.join(args.images, e))
                        for e in ("*.jpg", "*.jpeg", "*.png", "*.JPG")), []))
    if not files:
        raise RuntimeError(f"no images in {args.images}")
    for f in files:
        img = Image.open(f).convert("RGB")
        w, h = img.size
        scale = args.short_side / min(w, h)
        img = img.resize((round(w * scale), round(h * scale)), Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 255.0
        arr, orig_hw = pad_to_multiple(arr, 32)
        feats = model.features(jnp.asarray(arr)[None])[0]      # [H, W, 512]
        feats = np.asarray(feats)[:orig_hw[0], :orig_hw[1]]
        out = np.transpose(feats, (2, 0, 1)).astype(np.float16)  # [512, H, W]
        name = os.path.splitext(os.path.basename(f))[0]
        np.save(os.path.join(args.out_dir, name + ".npy"), out)
        print(f"[OK] {name}: {out.shape}")


if __name__ == "__main__":
    main()
