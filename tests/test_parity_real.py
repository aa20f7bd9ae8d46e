"""Parity checks against GENUINE reference artifacts (not builder goldens).

The reference tree ships ~2.7 GB of per-view label maps its own pipeline wrote
(voxel_to_gaussian/semantics_*/train/labels/*_labels.pt, writer at
render_semantics_logits.py:141-143). These tests are existence-guarded: they
run wherever that tree is mounted and skip elsewhere. The full 648-file sweep
lives in scripts/parity_real.py -> PARITY_REAL.md; here we keep a fast slice.
"""

import glob
import os

import numpy as np
import pytest

REF_ROOT = "/root/reference/voxel_to_gaussian"
VARIANT_A = os.path.join(REF_ROOT, "semantics_87319_30000_NEW", "train", "labels")
VARIANT_B = os.path.join(REF_ROOT, "semantics_195120_30000_train_NEW", "train",
                         "labels")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(VARIANT_A), reason="reference artifacts not mounted")


def _files(d, n):
    fs = sorted(glob.glob(os.path.join(d, "*_labels.pt")))
    assert len(fs) >= n
    return fs[:n]


def test_real_label_map_roundtrip_exact(tmp_path):
    """load_label_map/save_label_map preserve a real reference file exactly
    (values, dtype int64, shape [584,876], single-key dict layout)."""
    import torch
    from segsplat_tpu.io.artifacts import load_label_map, save_label_map

    for src in _files(VARIANT_A, 2):
        ref = torch.load(src, map_location="cpu", weights_only=False)
        assert set(ref.keys()) == {"label_indices"}
        ref_arr = ref["label_indices"].numpy()
        assert ref_arr.shape == (584, 876) and ref_arr.dtype == np.int64

        ours = load_label_map(src)
        np.testing.assert_array_equal(ours, ref_arr)
        assert ours.dtype == ref_arr.dtype

        dst = str(tmp_path / os.path.basename(src))
        save_label_map(dst, ours)
        back = torch.load(dst, map_location="cpu", weights_only=False)
        assert set(back.keys()) == {"label_indices"}
        np.testing.assert_array_equal(back["label_indices"].numpy(), ref_arr)
        assert back["label_indices"].numpy().dtype == ref_arr.dtype


def test_real_label_values_in_prompt_range():
    """Real maps use exactly the 13-prompt class space from
    voxeltoGaussian_logits.sh (ids 0..12)."""
    from segsplat_tpu.io.artifacts import load_label_map

    arr = load_label_map(_files(VARIANT_A, 1)[0])
    assert arr.min() >= 0 and arr.max() <= 12


def test_eval_protocol_on_real_maps():
    """The full confusion/mIoU stack runs on real 584x876 maps: self-eval is
    exactly 1.0, and cross-variant agreement is high but not perfect (the two
    reference runs differ only in voxel grid)."""
    from segsplat_tpu.eval.metrics import (confusion_matrix,
                                           miou_from_confusion)
    from segsplat_tpu.io.artifacts import load_label_map

    conf_self = np.zeros((13, 13), np.int64)
    conf_cross = np.zeros((13, 13), np.int64)
    npx = 0
    for fa, fb in zip(_files(VARIANT_A, 3), _files(VARIANT_B, 3)):
        assert os.path.basename(fa) == os.path.basename(fb)
        a, b = load_label_map(fa), load_label_map(fb)
        conf_self += confusion_matrix(a, a, 13)
        conf_cross += confusion_matrix(b, a, 13)
        npx += a.size
    assert conf_self.sum() == npx == conf_cross.sum()
    assert miou_from_confusion(conf_self) == pytest.approx(1.0)
    acc = conf_cross.trace() / conf_cross.sum()
    assert 0.5 < acc < 1.0, f"cross-variant pixel acc {acc} out of sane range"


def test_eval_scannetpp_cli_on_real_files(capsys, tmp_path):
    """scripts/eval_scannetpp.py end-to-end on REAL reference files (a 4-view
    slice symlinked into tmp dirs; the full 216-view run is in PARITY_REAL.md)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.eval_scannetpp import main

    pred_d, gt_d = tmp_path / "pred", tmp_path / "gt"
    pred_d.mkdir(), gt_d.mkdir()
    for fa, fb in zip(_files(VARIANT_A, 4), _files(VARIANT_B, 4)):
        os.symlink(fa, pred_d / os.path.basename(fa))
        os.symlink(fb, gt_d / os.path.basename(fb))
    main(["--pred_dir", str(pred_d), "--gt_dir", str(gt_d),
          "--num_classes", "13"])
    out = capsys.readouterr().out
    assert "mIoU" in out and "4 views" in out
