#!/usr/bin/env python
"""Tracker-level offline sweep on a pseudo-label-loop scene (no retraining).

The hard-scene run (BASELINE.md round 5) showed the label side is the
limiter: SLIC+track reaches 58% of the GT-label training bound and loses 5
of 20 objects outright. Training costs ~2.3 h per configuration on the
single core, but tracking quality can be scored directly against the GT
instance maps the loop persists (merge_debug.npz `gts`): treat the tracked
label maps as predictions and apply the SAME two mIoU protocols
(pseudo_label_loop.match_miou) — an upper proxy for what training can learn
from those labels. This harness sweeps association variants (motion
prediction, appearance gate, thresholds) in minutes and picks what the one
full training run should use.

Rebuilds the evidence loop around the reference's DEVA driver
(script/debug_checks_scripts/prepare_pseudo_label.sh:24-57).
"""

from __future__ import annotations

import json
import os
import sys
from argparse import ArgumentParser

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_inputs(root: str, gts_npz: str):
    from PIL import Image

    from scripts.prepare_pseudo_label import _load_frame_ids

    seg_dir = os.path.join(root, "seg_raw")
    files = sorted(f for f in os.listdir(seg_dir) if f.endswith(".png"))
    seg = [_load_frame_ids(os.path.join(seg_dir, f)) for f in files]
    img_dir = os.path.join(root, "images")
    imgs = sorted(f for f in os.listdir(img_dir)
                  if f.lower().endswith((".png", ".jpg")))
    images = [np.asarray(Image.open(os.path.join(img_dir, f)).convert("RGB"))
              for f in imgs]
    gts = [g for g in np.load(gts_npz)["gts"]]
    assert len(seg) == len(images) == len(gts)
    return seg, images, gts


def score(tracked, gts, n_objects: int) -> dict:
    from scripts.pseudo_label_loop import match_miou, tracker_consistency

    consistency, n_tracks = tracker_consistency(tracked, gts)
    n_pred = int(max(int(t.max()) for t in tracked)) + 1
    grouped, obj_ious, strict, bg = match_miou(tracked, gts, n_pred,
                                               n_objects=n_objects)
    return {"n_tracks": n_tracks, "consistency": round(consistency, 4),
            "label_miou_grouped": round(grouped, 4),
            "label_miou_strict": round(strict, 4),
            "objects_covered@0.5": int(sum(x > 0.5 for x in obj_ious)),
            "objects_lost@0.1": int(sum(x < 0.1 for x in obj_ious))}


def main(argv=None):
    import jax
    jax.config.update("jax_platforms", "cpu")

    from segsplat_tpu.pipeline.tracking import (ConsolidateConfig,
                                                TrackerConfig,
                                                associate_sequence,
                                                consolidate_tracks)

    p = ArgumentParser()
    p.add_argument("root", help="run root with seg_raw/ and images/")
    p.add_argument("--gts", default=None,
                   help="npz with the GT instance maps (default: "
                        "root/merge_debug.npz)")
    p.add_argument("--n_objects", type=int, default=20)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    seg, images, gts = load_inputs(args.root,
                                   args.gts
                                   or os.path.join(args.root,
                                                   "merge_debug.npz"))
    variants = [
        ("baseline iou=0.4 mem=8", dict(iou_threshold=0.4, memory_frames=8,
                                        min_pixels=40, motion=False), None),
        ("motion", dict(iou_threshold=0.4, memory_frames=8, min_pixels=40,
                        motion=True), None),
        ("motion+gate0.15", dict(iou_threshold=0.4, memory_frames=8,
                                 min_pixels=40, motion=True,
                                 color_gate=0.15), "img"),
        ("motion+gate0.25", dict(iou_threshold=0.4, memory_frames=8,
                                 min_pixels=40, motion=True,
                                 color_gate=0.25), "img"),
        ("motion iou=0.3", dict(iou_threshold=0.3, memory_frames=8,
                                min_pixels=40, motion=True), None),
        ("motion iou=0.3 gate0.25", dict(iou_threshold=0.3, memory_frames=8,
                                         min_pixels=40, motion=True,
                                         color_gate=0.25), "img"),
        ("motion mem=15 gate0.25", dict(iou_threshold=0.4, memory_frames=15,
                                        min_pixels=40, motion=True,
                                        color_gate=0.25), "img"),
        ("best+centroid1.5", dict(iou_threshold=0.3, memory_frames=8,
                                  min_pixels=40, motion=True,
                                  color_gate=0.25,
                                  centroid_fallback_frac=1.5), "img"),
        ("best+centroid3.0", dict(iou_threshold=0.3, memory_frames=8,
                                  min_pixels=40, motion=True,
                                  color_gate=0.25,
                                  centroid_fallback_frac=3.0), "img"),
    ]
    results = []
    for name, kw, use_img in variants:
        tracked = associate_sequence(seg, TrackerConfig(**kw),
                                     images=images if use_img else None)
        row = {"variant": name, **score(tracked, gts, args.n_objects)}
        results.append(row)
        print(json.dumps(row))
        # each variant also scored with the in-clip consensus merge on top
        merged = consolidate_tracks(tracked, images, ConsolidateConfig())
        row_m = {"variant": name + " +consolidate",
                 **score(merged, gts, args.n_objects)}
        results.append(row_m)
        print(json.dumps(row_m))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
