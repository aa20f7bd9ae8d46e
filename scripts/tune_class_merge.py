#!/usr/bin/env python
"""Offline tuner for the post-train codebook-class merge (VERDICT r3 #5).

Consumes the merge_debug.npz a pseudo_label_loop run persists (trained
identity features, codebook, positions, rendered preds, GT maps) and sweeps
merge criteria WITHOUT retraining — training dominates the loop's cost;
merging is pure post-processing. Reports grouped + strict-1-1 mIoU per
criterion so thresholds in pipeline/consolidate.py are set from measurement,
not guesswork. GT is used ONLY for scoring, never inside a criterion.

Usage:
  python scripts/tune_class_merge.py --npz /tmp/hard_slic/merge_debug.npz \
      --n_objects 20
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
from argparse import ArgumentParser

import numpy as np


def score(preds, gts, n_pred, n_objects):
    import scripts.pseudo_label_loop as L
    grouped, _, strict, bg = L.match_miou(list(preds), list(gts), n_pred,
                                          n_objects=n_objects)
    return grouped, strict


def apply_remap(preds, remap):
    return [remap[p] for p in preds]


def main(argv=None):
    p = ArgumentParser()
    p.add_argument("--npz", required=True)
    p.add_argument("--n_objects", type=int, required=True)
    p.add_argument("--platform", default="cpu")
    p.add_argument("--out_json", default=None)
    args = p.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from segsplat_tpu.pipeline.consolidate import (ClassMergeConfig,
                                                   consolidate_classes)

    d = np.load(args.npz)
    feat, cb, xyz, active = (d["objects_dc"], d["code_book"], d["xyz"],
                             d["active"])
    preds, gts = d["preds"], d["gts"]
    n_pred = cb.shape[0] + 1

    g0, s0 = score(preds, gts, n_pred, args.n_objects)
    print(f"baseline (no merge): grouped={g0:.4f} strict_1to1={s0:.4f}")
    rows = [{"criterion": "none", "grouped": g0, "strict": s0}]

    for mix_t in (0.02, 0.04, 0.06, 0.08, 0.12):
        for feat_t in (-1.0, 0.0, 0.3, 0.5, 0.8):
            stats = {}
            cfg = ClassMergeConfig(mix_threshold=mix_t,
                                   feat_threshold=feat_t)
            remap = consolidate_classes(feat, cb, xyz, active=active,
                                        cfg=cfg, stats=stats)
            merged = int((remap[1:] != np.arange(1, len(remap))).sum())
            if merged == 0 and rows and rows[-1].get("merged") == 0:
                continue
            g, s = score(apply_remap(preds, remap), gts, n_pred,
                         args.n_objects)
            row = {"criterion": f"mix>={mix_t},cos>={feat_t}",
                   "grouped": round(g, 4), "strict": round(s, 4),
                   "merged": merged,
                   "merge_pairs": stats.get("n_merge_pairs")}
            rows.append(row)
            print(f"mix>={mix_t:.2f} cos>={feat_t:+.1f}: grouped={g:.4f} "
                  f"strict={s:.4f} merged_ids={merged}")

    best = max(rows, key=lambda r: (r["strict"], r["grouped"]))
    print(f"[BEST] {json.dumps(best)}")
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump({"rows": rows, "best": best}, f, indent=1)
    return rows


if __name__ == "__main__":
    main()
