"""Offline re-score of a pseudo-label-loop run from its persisted merge inputs.

`scripts/pseudo_label_loop.py` saves merge_debug.npz (preds, gts, objects_dc,
code_book, xyz, active) right before its final metric block, so a run whose
training finished can be re-scored — both mIoU protocols plus the
post-train class consolidation — without repeating the hours of training.
Built to recover the hard-scene GT-bound run (2000 iters, ~2.3 h on the
single CPU core) whose in-process eval died on the CPU-backend
hoisted-constant quirk (fixed in ops/assignment.py; this script is the
recovery path AND a standalone tuning harness).

Mirrors the reference's offline eval split: training writes artifacts,
eval_scannetpp-style scripts re-read them (reference
script/eval_scannetpp_unified_lift.py reads persisted label maps).
"""

from __future__ import annotations

import json
import os
import sys
from argparse import ArgumentParser

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rescore(npz_path: str, n_objects: int, mix_threshold: float | None = None,
            feat_threshold: float | None = None) -> dict:
    from scripts.pseudo_label_loop import match_miou
    from segsplat_tpu.pipeline.consolidate import (ClassMergeConfig,
                                                   consolidate_classes)

    d = np.load(npz_path)
    preds = [p for p in d["preds"]]
    gts = [g for g in d["gts"]]
    n_pred = int(d["code_book"].shape[0]) + 1

    miou, obj_ious, miou_1to1, bg_iou = match_miou(
        preds, gts, n_pred, n_objects=n_objects)

    cfg = ClassMergeConfig()
    if mix_threshold is not None:
        cfg = ClassMergeConfig(mix_threshold=mix_threshold,
                               feat_threshold=cfg.feat_threshold)
    if feat_threshold is not None:
        cfg = ClassMergeConfig(mix_threshold=cfg.mix_threshold,
                               feat_threshold=feat_threshold)
    merge_stats: dict = {}
    remap = consolidate_classes(
        d["objects_dc"].reshape(d["objects_dc"].shape[0], -1),
        d["code_book"], d["xyz"], active=d["active"],
        cfg=cfg, stats=merge_stats)
    preds_m = [remap[p] for p in preds]
    miou_m, _, miou_1to1_m, _ = match_miou(preds_m, gts, n_pred,
                                           n_objects=n_objects)
    used = np.unique(np.concatenate([np.unique(p) for p in preds]))
    used = used[used > 0]
    return {
        "post_train_identity_miou_grouped": round(miou, 4),
        "per_object_iou_grouped": [round(x, 4) for x in obj_ious],
        "post_train_identity_miou_1to1": round(miou_1to1, 4),
        "background_iou": round(bg_iou, 4),
        "class_merge": {"grouped": round(miou_m, 4),
                        "strict_1to1": round(miou_1to1_m, 4),
                        "rendered_classes_before": int(len(used)),
                        "rendered_classes_after": int(len(np.unique(remap[used]))),
                        "mix_threshold": cfg.mix_threshold,
                        "feat_threshold": cfg.feat_threshold,
                        "stats": merge_stats},
    }


def main(argv=None):
    import jax
    jax.config.update("jax_platforms", "cpu")

    p = ArgumentParser()
    p.add_argument("root", help="run root (or direct merge_debug.npz path)")
    p.add_argument("--n_objects", type=int, default=20)
    p.add_argument("--mix_threshold", type=float, default=None)
    p.add_argument("--feat_threshold", type=float, default=None)
    args = p.parse_args(argv)

    npz = args.root if args.root.endswith(".npz") else os.path.join(
        args.root, "merge_debug.npz")
    print(json.dumps(rescore(npz, args.n_objects,
                             mix_threshold=args.mix_threshold,
                             feat_threshold=args.feat_threshold)))


if __name__ == "__main__":
    main()
