#!/usr/bin/env python
"""Per-view logit confidence map — drop-in for the reference's
voxel_to_gaussian/logit_confidence_map.py (:6-25): confidence = top1−top2
softmax probability, PNG with colorbar."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from argparse import ArgumentParser

import numpy as np

from segsplat_tpu.pipeline.render_semantics import (confidence_from_logits,
                                                    save_confidence_png)


def main(argv=None):
    p = ArgumentParser()
    p.add_argument("--logits", required=True, help="[P,H,W] .npy logits")
    p.add_argument("--out", required=True, help="output PNG path")
    args = p.parse_args(argv)

    logits = np.load(args.logits).astype(np.float32)
    conf = confidence_from_logits(logits, axis=0)
    save_confidence_png(args.out, conf)
    print(f"[DONE] confidence map → {args.out} "
          f"(mean {conf.mean():.3f}, min {conf.min():.3f}, max {conf.max():.3f})")


if __name__ == "__main__":
    main()
