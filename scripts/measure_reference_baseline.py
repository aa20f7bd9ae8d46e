#!/usr/bin/env python
"""Measure the REFERENCE lift pipeline's hardware-independent per-view host
cost on this machine — the denominator for the ">=5x reference" lift target
(VERDICT round-2 item #3).

The reference processes ONE view per kernel run through this host loop
(aggregate_voxel_features_onthefly.py:244-313):

  1. shutil.copy of the [512,h,w] fp16 LSeg feature .npy into a tmp dir (:244)
  2. subprocess #1: python prepare_tensor_data.py — interpreter + torch/cv2
     imports, np.load of the .npy, PER-CHANNEL cv2.resize of all 512 channels
     to the lift resolution (prepare_tensor_data.py:117-127), torch.save of a
     float32 [1,1,H,W,512] tensor dict (~1.05 GB at 876x584)
  3. parent torch.load of that 1 GB dict (debug step 2, :263)
  4. subprocess #2: python debug_project_features.py — interpreter + imports,
     torch.load of the 1 GB dict again (:25), [GPU march — NOT counted],
     torch.save of per-voxel fp16 rows (:252-257)
  5. parent torch.load of proj_output + per-voxel python dict accumulation
     (tuple-keyed dict, one torch tensor add per hit voxel, :296-313)

Every stage here is CPU/disk/python — no GPU work is included — so the sum is
a LOWER BOUND on the reference's seconds/view regardless of how fast its GPU
is. Our bench.py reports lift_vs_baseline against this number.

Writes baseline_host_lift.json at the repo root. Usage:
    python scripts/measure_reference_baseline.py [--views 3] [--hit_voxels 40000]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from argparse import ArgumentParser

import numpy as np

# officescene geometry (BASELINE.md): images 1752x1168, LSeg features saved at
# shorter-side 360 (extract_lseg_features.py:66) -> [512, 360, 540]; lift at
# 0.5x downsample -> 876x584 (colmap_camera_params.sh:6-8).
C, FH, FW = 512, 360, 540
H, W = 584, 876


def t(fn, reps=1):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main(argv=None):
    p = ArgumentParser()
    p.add_argument("--views", type=int, default=3, help="measurement repeats")
    p.add_argument("--hit_voxels", type=int, default=40000,
                   help="voxels hit per view for the dict-accumulation stage "
                        "(87,319-voxel grid; a typical view sees a fraction)")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "baseline_host_lift.json"))
    args = p.parse_args(argv)

    import cv2
    import torch

    tmp = tempfile.mkdtemp(prefix="refbase_")
    stages = {}
    try:
        # stage 1: copy of the fp16 feature map
        feat16 = np.random.default_rng(0).standard_normal(
            (C, FH, FW)).astype(np.float16)
        src = os.path.join(tmp, "feat.npy")
        np.save(src, feat16)
        dst_dir = os.path.join(tmp, "stage")
        os.makedirs(dst_dir, exist_ok=True)
        stages["copy_feature_npy"] = t(
            lambda: shutil.copy(src, dst_dir), args.views)

        # stage 2a: subprocess interpreter + import cost, x2 (both children
        # import torch+numpy; child #1 also cv2)
        spawn = t(lambda: subprocess.run(
            [sys.executable, "-c", "import torch, numpy, cv2"], check=True),
            args.views)
        stages["subprocess_spawn_x2"] = 2 * spawn

        # stage 2b: np.load + per-channel cv2 resize exactly as
        # prepare_tensor_data.py:117-127 (fp16 -> f32 per channel, INTER_LINEAR)
        def load_and_resize():
            arr = np.load(src)
            up = np.zeros((C, H, W), dtype=np.float32)
            for c in range(C):
                ch = np.ascontiguousarray(arr[c].astype(np.float32))
                up[c] = cv2.resize(ch, (W, H), interpolation=cv2.INTER_LINEAR)
            return up.astype(arr.dtype)
        stages["per_channel_cv2_resize"] = t(load_and_resize, args.views)

        # stage 2c: torch.save of the float32 tensor dict
        # (prepare_tensor_data.py:152 keeps float32 -> ~1.05 GB at this size)
        feats32 = torch.from_numpy(
            np.zeros((1, 1, H, W, C), np.float32))
        tensor_path = os.path.join(tmp, "tensor_data.pt")
        dd = {"encoded_2d_features": feats32,
              "intrinsicParams": torch.zeros(1, 4),
              "viewMatrixInv": torch.eye(4).unsqueeze(0),
              "grid_origin": torch.zeros(3), "voxel_size": 0.04}
        stages["torch_save_tensor_data"] = t(
            lambda: torch.save(dd, tensor_path), args.views)
        sz = os.path.getsize(tensor_path)

        # stages 3+4: parent debug load + child #2 load of the same dict
        stages["torch_load_tensor_data_x2"] = 2 * t(
            lambda: torch.load(tensor_path, map_location="cpu"), args.views)

        # stage 4b/5a: proj_output round-trip (fp16 [N,512] + [N,3] indices)
        N = args.hit_voxels
        proj = {"projected_feats": torch.from_numpy(
                    np.random.default_rng(1).standard_normal(
                        (N, C)).astype(np.float16)),
                "projected_indices": torch.from_numpy(
                    np.random.default_rng(2).integers(
                        0, 60, (N, 3)).astype(np.int64))}
        proj_path = os.path.join(tmp, "proj_output.pt")
        stages["proj_output_roundtrip"] = (
            t(lambda: torch.save(proj, proj_path), args.views)
            + t(lambda: torch.load(proj_path), args.views))

        # stage 5b: per-voxel python dict accumulation
        # (aggregate_voxel_features_onthefly.py:296-313)
        feats_t = proj["projected_feats"]
        idx_t = proj["projected_indices"]

        def accumulate():
            vsum = {}
            vcount = {}
            for idx, feat in zip(idx_t, feats_t):
                key = tuple(idx.tolist())
                if vsum.get(key) is None:
                    vsum[key] = feat.clone()
                    vcount[key] = 1
                else:
                    vsum[key] += feat
                    vcount[key] += 1
            return vsum
        stages["python_dict_accumulate"] = t(accumulate, args.views)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    total = sum(stages.values())
    out = {
        "seconds_per_view_lower_bound": round(total, 3),
        "views_per_s_upper_bound": round(1.0 / total, 3),
        "stages_s": {k: round(v, 3) for k, v in stages.items()},
        "config": {"channels": C, "feat_hw": [FH, FW], "lift_hw": [H, W],
                   "hit_voxels": args.hit_voxels,
                   "tensor_data_bytes": sz},
        "notes": "host/disk/python stages only (best-of-%d); ZERO GPU time "
                 "included, so the reference's true s/view is strictly larger. "
                 "Measured on the build machine (single CPU core)."
                 % args.views,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
