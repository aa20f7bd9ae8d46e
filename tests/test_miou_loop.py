"""mIoU protocol closed loop: the Gaussian semantic-logit rasterizer and the
mesh GT label renderer are INDEPENDENT geometry paths (alpha-blended splats
vs z-buffered triangles); on a scene where Gaussians sit exactly on labeled
quads they must agree almost everywhere, so the ScanNet++ mIoU protocol
(README.md:101-103) self-validates end to end without real weights."""

import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from segsplat_tpu.eval.metrics import confusion_matrix, miou_from_confusion
from segsplat_tpu.ops.mesh_raster import MISS_LABEL, rasterize_mesh_labels
from segsplat_tpu.ops.rasterize import rasterize


def _quad(x0, x1, y0, y1, z):
    v = np.array([[x0, y0, z], [x1, y0, z], [x1, y1, z], [x0, y1, z]],
                 np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return v, f


def test_gaussian_semantics_match_mesh_gt_miou():
    W, H = 96, 80
    fx = fy = 90.0
    cx, cy = W / 2, H / 2
    vm = jnp.eye(4)

    # two labeled quads, well separated, facing the camera at z=3
    vA, fA = _quad(-1.4, -0.15, -0.9, 0.9, 3.0)
    vB, fB = _quad(0.15, 1.4, -0.9, 0.9, 3.0)
    verts = np.concatenate([vA, vB])
    faces = np.concatenate([fA, fB + 4])
    face_labels = np.array([1, 1, 2, 2], np.int32)

    gt, _depth, _of = rasterize_mesh_labels(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(face_labels),
        vm, fx, fy, cx, cy, W, H, max_tiles_per_axis=6, max_per_tile=64,
        tile_chunk=5)
    gt = np.asarray(gt)
    assert (gt == 1).sum() > 400 and (gt == 2).sum() > 400

    # Gaussians tiling the same quads, logits one-hot to the quad's label
    def carpet(x0, x1, y0, y1, z, n=24):
        xs, ys = np.meshgrid(np.linspace(x0, x1, n), np.linspace(y0, y1, n))
        return np.stack([xs.ravel(), ys.ravel(),
                         np.full(n * n, z, np.float32)], axis=1)

    ptsA = carpet(-1.4, -0.15, -0.9, 0.9, 3.0)
    ptsB = carpet(0.15, 1.4, -0.9, 0.9, 3.0)
    pts = jnp.asarray(np.concatenate([ptsA, ptsB]).astype(np.float32))
    n = pts.shape[0]
    labels = np.concatenate([np.ones(len(ptsA)), 2 * np.ones(len(ptsB))]
                            ).astype(np.int32)
    logits = np.full((n, 3), -10.0, np.float32)
    logits[np.arange(n), labels] = 10.0

    scales = jnp.full((n, 3), 0.05)
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
    opac = jnp.full((n,), 0.95)
    out = rasterize(pts, scales, quats, opac, jnp.asarray(logits), vm,
                    fx, fy, cx, cy, width=W, height=H,
                    max_tiles_per_axis=6, max_per_tile=128, tile_chunk=5,
                    backend="xla")
    sem = np.asarray(out["image"])                       # [H, W, 3]
    alpha = np.asarray(out["alpha"]).reshape(H, W)
    pred = np.where(alpha > 0.5, np.argmax(sem, axis=-1), MISS_LABEL)

    # evaluate exactly like scripts/eval_scannetpp.py: confusion over pixels
    # where GT is defined, MISS in pred counts as a miss class
    mask = gt != MISS_LABEL
    conf = confusion_matrix(np.where(pred == MISS_LABEL, 0, pred)[mask],
                            gt[mask], num_classes=3)
    from segsplat_tpu.eval.metrics import iou_per_class
    iou = iou_per_class(conf)
    miou = float(np.nanmean(iou[1:]))    # classes 1,2 — background/miss (0)
    #                                      never occurs in this GT
    agree = (pred[mask] == gt[mask]).mean()
    assert agree > 0.9, f"pixel agreement only {agree:.3f}"
    assert miou > 0.8, f"mIoU only {miou:.3f} (per-class {iou})"
