"""In-framework instance segmentation (pipeline/segment.py): SLIC proposals +
region merging must recover synthetic colored shapes, and the segment→track
chain must produce temporally consistent object_mask/ ids from raw frames."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _shapes_frame(shift=0, H=96, W=128):
    """Gray background + red rectangle + blue disk (shifted by ``shift``)."""
    img = np.full((H, W, 3), 90, np.uint8)
    x0 = 12 + shift
    img[18:50, x0:x0 + 34] = (200, 40, 40)
    yy, xx = np.mgrid[:H, :W]
    cx = 90 + shift
    disk = (yy - 64) ** 2 + (xx - cx) ** 2 < 17 ** 2
    img[disk] = (40, 60, 210)
    return img, (slice(18, 50), slice(x0, x0 + 34)), disk


def test_segment_recovers_shapes():
    from segsplat_tpu.pipeline.segment import SegmentConfig, segment_image

    img, rect, disk = _shapes_frame()
    ids = segment_image(img, SegmentConfig(n_segments=128))
    assert ids.min() >= 1
    # each shape should be (mostly) one region, distinct from background
    rect_ids = ids[rect].reshape(-1)
    rect_mode = np.bincount(rect_ids).argmax()
    assert (rect_ids == rect_mode).mean() > 0.9
    disk_ids = ids[disk]
    disk_mode = np.bincount(disk_ids).argmax()
    assert (disk_ids == disk_mode).mean() > 0.9
    bg_mode = np.bincount(ids[2:10, 2:10].reshape(-1)).argmax()
    assert len({int(rect_mode), int(disk_mode), int(bg_mode)}) == 3
    # and not over-fragmented overall
    assert len(np.unique(ids)) < 20


def test_segment_then_track_cli(tmp_path):
    """Raw frames → `segment` → `track` end to end: the moving shapes keep
    stable ids across frames."""
    from PIL import Image

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import prepare_pseudo_label as cli

    frames = tmp_path / "images"
    frames.mkdir()
    for i in range(3):
        img, _, _ = _shapes_frame(shift=3 * i)
        Image.fromarray(img).save(frames / f"f_{i:03d}.png")

    seg_dir = str(tmp_path / "seg")
    cli.main(["segment", "--images", str(frames), "--out", seg_dir,
              "--n_segments", "128"])
    assert len(os.listdir(seg_dir)) == 3

    trk_dir = str(tmp_path / "object_mask")
    cli.main(["track", "--masks", seg_dir, "--out", trk_dir,
              "--iou_threshold", "0.3"])
    maps = [np.array(Image.open(os.path.join(trk_dir, f)))
            for f in sorted(os.listdir(trk_dir))]

    # the disk keeps one stable id across all frames
    ref_ids = []
    for i, m in enumerate(maps):
        _, _, disk = _shapes_frame(shift=3 * i)
        vals = m[disk]
        ref_ids.append(np.bincount(vals).argmax())
    assert ref_ids[0] == ref_ids[1] == ref_ids[2] != 0
