#!/usr/bin/env python
"""Parity against REAL reference artifacts: the ~2.7 GB of per-view label maps
the reference pipeline itself produced and shipped in its tree
(voxel_to_gaussian/semantics_*/train/labels/*_labels.pt, written by
render_semantics_logits.py:141-143 — {'label_indices': [584,876] int64}).

Three checks, all on genuine reference-run outputs (not builder-made goldens):

  A. Bit-exact load/save round-trip of the real files through
     segsplat_tpu.io.artifacts (load_label_map/save_label_map): values, dtype
     and shape must survive a .pt -> framework -> .pt cycle unchanged.
  B. Full-protocol cross-variant evaluation: the reference produced the SAME
     216-view officescene sweep from three different voxel grids (87,319-voxel
     occupancy grid and two 195,120-voxel mesh-sampled runs;
     voxeltoGaussian_logits.sh). Running eval_scannetpp's confusion/mIoU/fwIoU
     machinery between variants exercises the whole metric stack on real
     584x876 maps and measures how much the reference's own outputs move when
     only the voxel grid changes (a scale for "parity" claims).
  C. Label-histogram statistics per variant (pixel fraction per class, the
     analyze_gaussian_semantics-style report) with the 13 officescene prompts
     from voxeltoGaussian_logits.sh.

Writes PARITY_REAL.md at the repo root. Usage:
    python scripts/parity_real.py [--ref_root /root/reference/voxel_to_gaussian]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import os
import tempfile
import time
from argparse import ArgumentParser

import numpy as np

from segsplat_tpu.eval.metrics import (confusion_matrix, iou_per_class,
                                       miou_from_confusion)
from segsplat_tpu.io.artifacts import load_label_map, save_label_map

# The 13 officescene prompts the reference used to produce these label maps
# (voxeltoGaussian_logits.sh PROMPTS=...; class id == prompt position).
OFFICESCENE_PROMPTS = ["chair", "cabinet", "window", "wall", "door", "keyboard",
                       "ceiling", "floor", "table", "laptop", "paper", "light",
                       "monitor"]

VARIANTS = ["semantics_87319_30000_NEW", "semantics_195120_30000_train",
            "semantics_195120_30000_train_NEW"]


def find_variants(ref_root: str):
    out = {}
    for v in VARIANTS:
        d = os.path.join(ref_root, v, "train", "labels")
        files = sorted(glob.glob(os.path.join(d, "*_labels.pt")))
        if files:
            out[v] = files
    return out


def roundtrip_check(files, sample: int = 8):
    """A: load each sampled real .pt, re-save through the framework writer,
    reload, and require exact value/dtype/shape equality."""
    import torch
    idxs = np.linspace(0, len(files) - 1, min(sample, len(files))).astype(int)
    checked = 0
    with tempfile.TemporaryDirectory() as td:
        for i in idxs:
            src = files[int(i)]
            ref = torch.load(src, map_location="cpu", weights_only=False)
            ref_arr = ref["label_indices"].numpy()
            ours = load_label_map(src)
            assert ours.dtype == ref_arr.dtype and ours.shape == ref_arr.shape, \
                f"{src}: loader changed dtype/shape {ours.dtype}{ours.shape}"
            assert np.array_equal(ours, ref_arr), f"{src}: loader changed values"
            dst = os.path.join(td, os.path.basename(src))
            save_label_map(dst, ours)
            back = torch.load(dst, map_location="cpu", weights_only=False)
            assert set(back.keys()) == {"label_indices"}, \
                f"{dst}: wrong key set {set(back.keys())}"
            back_arr = back["label_indices"].numpy()
            assert back_arr.dtype == ref_arr.dtype, \
                f"{dst}: dtype drift {back_arr.dtype} vs {ref_arr.dtype}"
            assert np.array_equal(back_arr, ref_arr), f"{dst}: value drift"
            checked += 1
    return checked


def histogram(files, num_classes: int):
    counts = np.zeros(num_classes, np.int64)
    shapes = set()
    for f in files:
        arr = load_label_map(f)
        shapes.add(arr.shape)
        counts += np.bincount(arr.ravel(), minlength=num_classes)[:num_classes]
    return counts, shapes


def cross_variant(files_a, files_b, num_classes: int):
    by_base = {os.path.basename(f): f for f in files_b}
    conf = np.zeros((num_classes, num_classes), np.int64)
    matched = 0
    for fa in files_a:
        fb = by_base.get(os.path.basename(fa))
        if fb is None:
            continue
        a = load_label_map(fa)
        b = load_label_map(fb)
        conf += confusion_matrix(b, a, num_classes)
        matched += 1
    return conf, matched


def main(argv=None):
    p = ArgumentParser()
    p.add_argument("--ref_root", default="/root/reference/voxel_to_gaussian")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PARITY_REAL.md"))
    p.add_argument("--max_views", type=int, default=0,
                   help="0 = all views; >0 caps per-variant views (smoke runs)")
    args = p.parse_args(argv)

    variants = find_variants(args.ref_root)
    if not variants:
        raise SystemExit(f"no semantics_* label dirs under {args.ref_root}")
    if args.max_views > 0:
        variants = {k: v[: args.max_views] for k, v in variants.items()}
    C = len(OFFICESCENE_PROMPTS)

    lines = ["# PARITY_REAL — framework vs genuine reference artifacts", "",
             f"Source: `{args.ref_root}/semantics_*/train/labels/*_labels.pt` — "
             "per-view label maps produced by the REFERENCE pipeline "
             "(render_semantics_logits.py:141-143) on ScanNet++ officescene, "
             "216+ views at 584x876, 13 classes "
             "(voxeltoGaussian_logits.sh prompts).", ""]

    # A: round-trip
    lines += ["## A. Bit-exact load/save round-trip of real files", ""]
    for name, files in variants.items():
        t0 = time.time()
        n = roundtrip_check(files)
        lines.append(f"- `{name}`: {n}/{len(files)} sampled files round-tripped "
                     f"EXACT (values+dtype+shape) in {time.time()-t0:.1f}s")
        print(lines[-1])
    lines.append("")

    # C: histograms
    lines += ["## B. Per-variant label histograms (pixel fraction per class)", ""]
    header = "| class | " + " | ".join(variants) + " |"
    lines += [header, "|---|" + "---|" * len(variants)]
    hists = {}
    for name, files in variants.items():
        counts, shapes = histogram(files, C)
        hists[name] = counts
        assert shapes == {(584, 876)} or args.max_views, \
            f"{name}: unexpected shapes {shapes}"
    for cid, prompt in enumerate(OFFICESCENE_PROMPTS):
        row = [f"{hists[n][cid] / max(hists[n].sum(), 1):.4f}" for n in variants]
        lines.append(f"| {cid} {prompt} | " + " | ".join(row) + " |")
    lines.append("")
    for name, files in variants.items():
        lines.append(f"- `{name}`: {len(files)} views, "
                     f"{int(hists[name].sum()):,} labelled pixels")
    lines.append("")

    # B: cross-variant eval
    lines += ["## C. Cross-variant mIoU (full eval protocol on real maps)", "",
              "Same scene + views, different reference voxel grids. These numbers",
              "measure how much the reference's own output moves with grid choice",
              "— the natural scale against which any 'parity' delta must be read.",
              "", "| pair | views | pixel acc | mIoU | fwIoU |",
              "|---|---|---|---|---|"]
    names = list(variants)
    per_class_blocks = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            conf, matched = cross_variant(variants[a], variants[b], C)
            iou = iou_per_class(conf)
            miou = miou_from_confusion(conf)
            freq = conf.sum(axis=1) / max(conf.sum(), 1)
            fwiou = float(np.nansum(np.where(np.isnan(iou), 0.0, iou) * freq))
            acc = float(np.trace(conf) / max(conf.sum(), 1))
            lines.append(f"| {a} vs {b} | {matched} | {acc:.4f} | {miou:.4f} "
                         f"| {fwiou:.4f} |")
            print(lines[-1])
            blk = [f"### {a} vs {b} — per-class IoU", ""]
            for cid in range(C):
                if not np.isnan(iou[cid]):
                    blk.append(f"- {OFFICESCENE_PROMPTS[cid]:10s} "
                               f"IoU {iou[cid]:.4f}  freq {freq[cid]:.4f}")
            per_class_blocks.append("\n".join(blk))
    lines.append("")
    lines += per_class_blocks
    lines += ["", "Produced by `scripts/parity_real.py`; existence-guarded test: "
              "`tests/test_parity_real.py`."]

    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
