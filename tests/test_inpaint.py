"""Built-in 2D inpainting (ops/inpaint.py) — the LaMa-equivalent stage.

Oracle facts: push-pull + Jacobi diffusion must (a) never touch known pixels,
(b) fill a hole in a constant image exactly, (c) approximate the harmonic
(membrane) interpolant on a linear ramp — which is the ramp itself."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _hole(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


def test_constant_image_filled_exactly():
    from segsplat_tpu.ops.inpaint import inpaint_pushpull

    img = np.full((32, 48, 3), 0.6, np.float32)
    hole = _hole(32, 48, 10, 20, 15, 30)
    out = np.asarray(inpaint_pushpull(img, hole))
    np.testing.assert_allclose(out, 0.6, atol=1e-5)


def test_known_pixels_untouched():
    from segsplat_tpu.ops.inpaint import inpaint_pushpull

    rng = np.random.default_rng(0)
    img = rng.random((33, 47, 3)).astype(np.float32)   # odd dims on purpose
    hole = _hole(33, 47, 5, 12, 20, 33)
    out = np.asarray(inpaint_pushpull(img, hole))
    np.testing.assert_array_equal(out[~hole], img[~hole])
    assert np.isfinite(out).all()


def test_linear_ramp_recovered():
    from segsplat_tpu.ops.inpaint import inpaint_pushpull

    h, w = 40, 40
    ramp = np.broadcast_to(np.linspace(0, 1, w, dtype=np.float32),
                           (h, w))[..., None].copy()
    hole = _hole(h, w, 14, 26, 14, 26)
    out = np.asarray(inpaint_pushpull(ramp, hole, smooth_iters=400))
    # harmonic interpolant of a linear boundary is the linear function
    assert np.abs(out - ramp)[hole].max() < 0.02


def test_batch_scan_matches_single():
    from segsplat_tpu.ops.inpaint import inpaint_frames, inpaint_pushpull

    rng = np.random.default_rng(1)
    imgs = rng.random((3, 16, 24, 3)).astype(np.float32)
    masks = np.stack([_hole(16, 24, 4, 8, 6, 12)] * 3)
    batch = np.asarray(inpaint_frames(imgs, masks, smooth_iters=8))
    single = np.asarray(inpaint_pushpull(imgs[1], masks[1], smooth_iters=8))
    np.testing.assert_allclose(batch[1], single, atol=1e-6)


def test_cli_end_to_end(tmp_path):
    from PIL import Image

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import inpaint_images as cli

    imgs = tmp_path / "images"
    masks = tmp_path / "object_mask"
    out = tmp_path / "images_inpaint_unseen"
    imgs.mkdir()
    masks.mkdir()
    rng = np.random.default_rng(2)
    frame = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
    idmap = np.zeros((24, 32), np.uint8)
    idmap[8:16, 10:20] = 7
    Image.fromarray(frame).save(imgs / "r_0.png")
    Image.fromarray(idmap).save(masks / "r_0.png")

    cli.main(["--images", str(imgs), "--masks", str(masks), "--out",
              str(out), "--select_obj_id", "7", "--dilate", "2"])
    filled = np.array(Image.open(out / "r_0.png"))
    assert filled.shape == frame.shape
    # outside the dilated hole the frame is preserved
    assert (filled[:4] == frame[:4]).all()
    # inside the hole the content changed (no longer the original noise)
    assert (filled[10:14, 12:18] != frame[10:14, 12:18]).any()
