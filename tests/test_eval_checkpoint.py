"""Mid-train snapshot harvest (scripts/eval_hard_scene_checkpoint.py): a
--save_at point-cloud snapshot re-scored offline must reproduce the loop's
own in-process eval.  This is the safety net for multi-hour hard-scene runs
killed by wall-clock budgets on the single CPU core — the snapshot at the
final iteration IS the post-train state, so the offline score must agree.

The offline path differs structurally (PLY round-trip compacts to active
rows, scene/GT regenerated from the seed) so agreement is asserted within a
small tolerance, not bit-exactness.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.filterwarnings("ignore")
def test_checkpoint_eval_matches_inprocess(tmp_path):
    from scripts.eval_hard_scene_checkpoint import eval_checkpoint
    from scripts.pseudo_label_loop import run_loop

    root = str(tmp_path)
    iters = 60
    r = run_loop(root, frames=6, H=64, W=64, iterations=iters,
                 capacity=1024, quiet=True, save_at=(iters,))

    it_dir = os.path.join(root, "model", "point_cloud", f"iteration_{iters}")
    assert os.path.exists(os.path.join(it_dir, "point_cloud.ply"))
    assert os.path.exists(os.path.join(it_dir, "classifier.npz"))

    out = eval_checkpoint(root, iters, frames=6, size=64, n_objects=5,
                          layout="fixed", textured=False, seed=0,
                          max_per_tile=512, capacity=1024)

    assert abs(out["post_train_identity_miou_grouped"]
               - r["post_train_identity_miou_grouped"]) < 0.05, (out, r)
    assert abs(out["post_train_identity_miou_1to1"]
               - r["post_train_identity_miou_1to1"]) < 0.05, (out, r)
    assert abs(out["background_iou"] - r["background_iou"]) < 0.05, (out, r)
    # the snapshot's merge inputs feed the same consolidation stack
    assert abs(out["class_merge"]["grouped"]
               - r["class_merge"]["grouped"]) < 0.05, (out, r)
    # and the npz it writes is consumable by the existing offline tooling
    assert os.path.exists(os.path.join(root, f"merge_debug_iter{iters}.npz"))
