"""Pseudo-label quality loop, fast slice (VERDICT round-2 item #4): render a
GT-instance sweep with the framework's own rasterizer, produce object_mask/
via SLIC+track (the DEVA-substitute path), train Unified-Lift on those
pseudo-labels, and assert the trained identity features recover the GT
objects. The full-scale numbers (36 frames / 128² / 2000 iters on the real
chip: tracker consistency 0.88, grouped identity mIoU 0.70) are recorded in
BASELINE.md; this slice runs a miniature of the same loop.

Reference protocol being substituted: prepare_pseudo_label.sh:24-57 (DEVA)
feeding dataset_readers.py:105-106.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.filterwarnings("ignore")
def test_pseudo_label_loop_miniature(tmp_path):
    from scripts.pseudo_label_loop import run_loop

    r = run_loop(str(tmp_path), frames=8, H=96, W=96, iterations=150,
                 capacity=2048, quiet=True)
    # calibration run (CPU, this config): consistency 0.88, grouped mIoU
    # 0.39, bg IoU 0.94 — thresholds leave headroom for seed drift
    assert r["tracker_consistency"] > 0.75, r
    assert r["post_train_identity_miou_grouped"] > 0.25, r
    assert r["background_iou"] > 0.8, r
    # the tracker must produce a usable id budget (not one-id-per-frame soup)
    assert 5 <= r["n_tracks"] <= 120, r
    # LERF-Masked protocol on the trained scene (text grounding → IoA id
    # selection → argmax-membership export; calibration: mask IoU 0.22,
    # boundary IoU 0.16 at this config) — and a control prompt with a fresh
    # random embedding must select no object ids
    assert r["lerf"]["lerf_mask_iou"] > 0.10, r
    assert r["lerf"]["lerf_boundary_iou"] > 0.05, r
    # grounding noise may push a px-scale argmax fragment past the IoA gate,
    # but the control prompt's exported mask must cover ~nothing
    assert r["lerf"]["control_export_px_frac"] < 0.01, r
