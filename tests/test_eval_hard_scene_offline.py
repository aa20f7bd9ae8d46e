"""Offline pseudo-label-loop re-scorer (scripts/eval_hard_scene_offline.py):
the recovery path for runs whose in-process eval died must reproduce
match_miou's protocols from the persisted merge inputs."""

import json
import os
import subprocess
import sys

import numpy as np


def _tiny_npz(path, H=24, W=24, n_obj=2, K=8, D=4):
    """Two objects each rendered as one pred class, perfect labels."""
    rng = np.random.default_rng(0)
    gts = np.zeros((3, H, W), np.int32)
    preds = np.zeros((3, H, W), np.int32)
    gts[:, 2:10, 2:10] = 1
    gts[:, 14:22, 14:22] = 2
    preds[:, 2:10, 2:10] = 3          # pred class 3 ↔ object 1
    preds[:, 14:22, 14:22] = 5        # pred class 5 ↔ object 2
    # distinct feature clusters per class so consolidation must NOT merge
    feat = rng.normal(size=(64, D)).astype(np.float32)
    code = np.zeros((K, D), np.float32)
    code[3] = (1, 0, 0, 0)
    code[5] = (0, 1, 0, 0)
    xyz = rng.random((64, 3)).astype(np.float32)
    xyz[:32] += 10.0                  # two spatial clusters
    np.savez_compressed(path, preds=preds, gts=gts, objects_dc=feat,
                        code_book=code, xyz=xyz,
                        active=np.ones(64, bool))


def test_rescore_perfect_labels(tmp_path):
    from scripts.eval_hard_scene_offline import rescore

    npz = str(tmp_path / "merge_debug.npz")
    _tiny_npz(npz)
    out = rescore(npz, n_objects=2)
    assert out["post_train_identity_miou_grouped"] == 1.0
    assert out["post_train_identity_miou_1to1"] == 1.0
    assert out["background_iou"] == 1.0
    assert out["class_merge"]["grouped"] == 1.0


def test_rescore_cli_json_line(tmp_path):
    npz = str(tmp_path / "merge_debug.npz")
    _tiny_npz(npz)
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "eval_hard_scene_offline.py"),
         npz, "--n_objects", "2"],
        capture_output=True, text=True, timeout=480)
    assert r.returncode == 0, r.stderr[-500:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["post_train_identity_miou_grouped"] == 1.0
