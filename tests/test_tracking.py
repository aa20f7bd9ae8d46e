"""DEVA-lite temporal id association (VERDICT round-1 item #10): moving
objects with scrambled per-frame ids must come out with stable global ids,
including across a short occlusion."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from segsplat_tpu.pipeline.tracking import TrackerConfig, associate_sequence


def _square(canvas, x, y, s, v):
    canvas[y:y + s, x:x + s] = v


def _make_sequence(occlude_frame=None):
    """Two squares drifting right/down (2 px/frame); per-frame ids are
    SCRAMBLED (the tracker input contract). Object A can vanish for one
    frame."""
    frames = []
    for t in range(6):
        f = np.zeros((48, 48), np.int32)
        if occlude_frame != t:
            _square(f, 2 + 2 * t, 4, 10, (t % 3) + 1)          # object A
        _square(f, 6, 25 + 2 * t, 12, ((t + 1) % 3) + 1)       # object B
        frames.append(f)
    return frames


def _ids_at(tracked, t, y, x):
    return int(tracked[t][y, x])


def test_stable_ids_across_scrambled_frames():
    tracked = associate_sequence(_make_sequence(),
                                 TrackerConfig(min_pixels=4))
    # object A center per frame keeps one id; object B another
    a_ids = {_ids_at(tracked, t, 8, 2 + 2 * t + 5) for t in range(6)}
    b_ids = {_ids_at(tracked, t, 25 + 2 * t + 6, 12) for t in range(6)}
    assert len(a_ids) == 1 and len(b_ids) == 1
    assert a_ids != b_ids
    assert 0 not in a_ids | b_ids


def test_reappearing_object_keeps_id_within_memory():
    tracked = associate_sequence(_make_sequence(occlude_frame=3),
                                 TrackerConfig(min_pixels=4, memory_frames=5))
    a_before = _ids_at(tracked, 2, 8, 2 + 4 + 5)
    a_after = _ids_at(tracked, 4, 8, 2 + 8 + 5)
    assert a_before == a_after != 0
    assert (tracked[3] == a_before).sum() == 0  # gone during occlusion


def test_new_object_gets_new_id():
    frames = _make_sequence()
    f_extra = frames[-1].copy()
    # a fresh per-frame id (A carries (5%3)+1=3, B carries 1 at t=5)
    _square(f_extra, 36, 2, 8, 2)
    frames.append(f_extra)
    tracked = associate_sequence(frames, TrackerConfig(min_pixels=4))
    ids_last = set(np.unique(tracked[-1])) - {0}
    ids_prev = set(np.unique(tracked[-2])) - {0}
    assert len(ids_last - ids_prev) == 1  # exactly one fresh id


def test_track_cli(tmp_path):
    """prepare_pseudo_label.py track: color masks in → consistent gray ids."""
    from PIL import Image

    import prepare_pseudo_label as cli

    masks = tmp_path / "masks"
    masks.mkdir()
    colors = [(255, 0, 0), (0, 255, 0)]
    for t in range(6):
        rgb = np.zeros((48, 48, 3), np.uint8)
        # colors SWAP between the objects every frame (scrambled input ids)
        rgb[4:14, 2 + 2 * t:12 + 2 * t] = colors[t % 2]          # object A
        rgb[25 + 2 * t:37 + 2 * t, 6:18] = colors[1 - t % 2]     # object B
        Image.fromarray(rgb).save(masks / f"{t:03d}.png")
    out = tmp_path / "object_mask"
    cli.main(["track", "--masks", str(masks), "--out", str(out),
              "--min_pixels", "4"])
    outs = sorted(os.listdir(out))
    assert len(outs) == 6
    t0 = np.asarray(Image.open(out / outs[0]))
    t5 = np.asarray(Image.open(out / outs[5]))
    # object A's id at its frame-0 and frame-5 positions agree
    assert t0[8, 7] == t5[8, 17] != 0
    assert t0[30, 12] == t5[40, 12] != 0
    assert t0[8, 7] != t0[30, 12]


def test_consolidate_merges_split_object():
    """In-clip consensus (pipeline/tracking.consolidate_tracks): one object
    segmented as two half-regions in every frame merges into ONE id, while a
    differently-colored neighbor and a same-colored but never-adjacent object
    keep their own ids."""
    from segsplat_tpu.pipeline.tracking import (ConsolidateConfig,
                                                consolidate_tracks)

    frames, images = [], []
    for t in range(6):
        m = np.zeros((48, 48), np.int32)
        img = np.zeros((48, 48, 3), np.float32)
        x = 2 + 2 * t
        _square(m, x, 4, 6, 1)            # object A, left half
        _square(m, x + 6, 4, 6, 2)        # object A, right half (adjacent)
        img[4:10, x:x + 12] = (0.9, 0.1, 0.1)          # same red
        _square(m, x, 20, 8, 3)           # object B: touches A's band? no —
        img[20:28, x:x + 8] = (0.1, 0.2, 0.9)          # blue, separate rows
        _square(m, 6, 38, 8, 4)           # object C: red like A, far away
        img[38:46, 6:14] = (0.9, 0.1, 0.1)
        frames.append(m)
        images.append(img)
    out = consolidate_tracks(frames, images, ConsolidateConfig(
        min_cooccur=3, adjacency_frac=0.5, boundary_min=4, color_thresh=0.15))
    f0 = out[0]
    # halves of A merged
    assert f0[6, 4] == f0[6, 12] != 0
    # B and C survive as their own ids
    assert f0[24, 4] not in (0, f0[6, 4])
    assert f0[42, 8] not in (0, f0[6, 4], f0[24, 4])
    # ids compacted to 1..3
    assert set(np.unique(f0)) == {0, 1, 2, 3}


def test_consolidate_color_gate_blocks_cross_object_merge():
    """Two consistently-adjacent but differently-colored tracks must NOT
    merge; without images (no color evidence) adjacency alone merges them."""
    from segsplat_tpu.pipeline.tracking import (ConsolidateConfig,
                                                consolidate_tracks)

    frames, images = [], []
    for t in range(5):
        m = np.zeros((32, 32), np.int32)
        img = np.zeros((32, 32, 3), np.float32)
        _square(m, 4, 4, 8, 1)
        _square(m, 12, 4, 8, 2)           # always touching object 1
        img[4:12, 4:12] = (1.0, 0.0, 0.0)
        img[4:12, 12:20] = (0.0, 1.0, 0.0)
        frames.append(m)
        images.append(img)
    cfg = ConsolidateConfig(min_cooccur=3, adjacency_frac=0.5,
                            boundary_min=4, color_thresh=0.15)
    kept = consolidate_tracks(frames, images, cfg)
    assert kept[0][8, 8] != kept[0][8, 16]
    merged = consolidate_tracks(frames, None, cfg)
    assert merged[0][8, 8] == merged[0][8, 16]


def test_motion_prediction_tracks_fast_mover():
    """A small object moving farther than its own extent per frame fragments
    under raw IoU (zero overlap between consecutive frames) but stays one
    track with constant-velocity mask prediction — the orbit-sweep failure
    mode the hard scene exposed (BASELINE.md round 5)."""
    frames = []
    for t in range(6):
        f = np.zeros((64, 64), np.int32)
        _square(f, 2 + 9 * t, 10, 6, 1)   # 6-px object moving 9 px/frame
        frames.append(f)
    raw = associate_sequence(frames, TrackerConfig(min_pixels=4, motion=False))
    ids_raw = {int(raw[t][13, 2 + 9 * t + 3]) for t in range(6)}
    assert len(ids_raw) > 1, "without motion the fast mover fragments"
    # frame 0->1 has zero overlap AND no learned velocity yet — the
    # centroid fallback makes the first link (9 px ≤ 2·√36), which
    # bootstraps the velocity; motion prediction then carries every
    # subsequent frame
    mot = associate_sequence(
        frames, TrackerConfig(min_pixels=4, motion=True, iou_threshold=0.2,
                              centroid_fallback_frac=2.0))
    ids_mot = {int(mot[t][13, 2 + 9 * t + 3]) for t in range(6)}
    assert len(ids_mot) == 1 and 0 not in ids_mot


def test_color_gate_vetoes_cross_color_link():
    """Two same-shape objects swap places; with the appearance gate the ids
    follow the COLORS, not the positions."""
    imgs, frames = [], []
    for t in range(4):
        f = np.zeros((32, 48), np.int32)
        img = np.zeros((32, 48, 3), np.float32)
        xa, xb = (4, 30) if t < 2 else (30, 4)   # swap at t=2
        _square(f, xa, 8, 8, 1)
        _square(f, xb, 8, 8, 2)
        img[8:16, xa:xa + 8] = (1.0, 0.1, 0.1)   # red object
        img[8:16, xb:xb + 8] = (0.1, 0.1, 1.0)   # blue object
        frames.append(f)
        imgs.append(img)
    tracked = associate_sequence(
        frames, TrackerConfig(min_pixels=4, motion=False, memory_frames=5,
                              iou_threshold=0.05, color_gate=0.3,
                              centroid_fallback_frac=4.0),
        images=imgs)
    red_ids = {int(tracked[0][12, 8]), int(tracked[3][12, 34])}
    blue_ids = {int(tracked[0][12, 34]), int(tracked[3][12, 8])}
    assert len(red_ids) == 1 and len(blue_ids) == 1
    assert red_ids != blue_ids


def test_budget_fallback_keeps_pixels_labeled():
    """When the id budget is exhausted, new instances merge into the best
    live track instead of silently becoming background (measured 21% fg
    dropout on the hard scene before the fallback)."""
    frames = []
    f0 = np.zeros((32, 64), np.int32)
    _square(f0, 2, 2, 6, 1)
    _square(f0, 20, 2, 6, 2)
    frames.append(f0)
    f1 = np.zeros((32, 64), np.int32)
    _square(f1, 2, 2, 6, 1)      # matches track 1
    _square(f1, 40, 20, 6, 2)    # brand-new region, but budget is full
    frames.append(f1)
    tracked = associate_sequence(frames, TrackerConfig(min_pixels=4,
                                                       max_ids=2))
    new_region = tracked[1][20:26, 40:46]
    assert (new_region > 0).all(), "fallback labels instead of dropping"
    assert int(new_region[0, 0]) in (1, 2)
