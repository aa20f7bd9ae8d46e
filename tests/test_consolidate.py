"""pipeline/consolidate.py: post-train codebook-class merging must fuse
spatially-interleaved classes with agreeing identity features (fragments of
one object) and must NOT fuse adjacent-but-distinct objects whose features
disagree — the failure mode that cost the mask-IoU-only merge the grouped
protocol in round 3 (BASELINE.md)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from segsplat_tpu.pipeline.consolidate import (ClassMergeConfig,
                                               classify_gaussians,
                                               consolidate_classes)


def _make_scene(seed=0):
    """Three 'objects':
      object A: classes 0 and 1, Gaussians interleaved in one ball, feature
                directions 12° apart (blended supervision);
      object B: class 2, adjacent ball (touching A), orthogonal features;
      object C: class 3, far away.
    code_book rows are the feature directions themselves, so per-Gaussian
    argmax classification reproduces the construction."""
    rng = np.random.default_rng(seed)
    D = 16
    fa = np.zeros(D)
    fa[0] = 1.0
    fa1 = np.zeros(D)
    fa1[0], fa1[1] = np.cos(0.2), np.sin(0.2)        # cos≈0.98 with fa
    fb = np.zeros(D)
    fb[2] = 1.0
    fc = np.zeros(D)
    fc[3] = 1.0
    code_book = np.stack([fa, fa1, fb, fc]).astype(np.float32)

    nA, nB, nC = 400, 300, 300
    xyzA = rng.normal(0, 0.12, (nA, 3))              # one ball, two classes
    clsA = rng.integers(0, 2, nA)                    # interleaved fragments
    xyzB = np.array([0.35, 0, 0]) + rng.normal(0, 0.12, (nB, 3))  # touches A
    xyzC = np.array([3.0, 3.0, 3.0]) + rng.normal(0, 0.12, (nC, 3))
    xyz = np.concatenate([xyzA, xyzB, xyzC]).astype(np.float32)

    feat = np.concatenate([
        code_book[clsA] + rng.normal(0, 0.05, (nA, 16)),
        code_book[2] + rng.normal(0, 0.05, (nB, 16)),
        code_book[3] + rng.normal(0, 0.05, (nC, 16)),
    ]).astype(np.float32)
    return feat, code_book, xyz


def test_merges_interleaved_agreing_fragments_only():
    feat, code_book, xyz = _make_scene()
    remap = consolidate_classes(feat, code_book, xyz)
    # rendered ids are 1-based: classes 0,1 -> ids 1,2 must merge
    assert remap[1] == remap[2], "interleaved same-object fragments must fuse"
    # B touches A spatially but features are orthogonal: must stay separate
    assert remap[3] not in (remap[1], remap[2])
    # far-away C untouched
    assert remap[4] not in (remap[1], remap[3])
    assert remap[0] == 0, "background id preserved"


def test_no_merge_when_features_disagree_despite_mixing():
    """Same geometry as object A's interleaving but orthogonal features —
    the feature gate must block the merge that pure mask/space evidence
    would make."""
    rng = np.random.default_rng(1)
    D = 16
    f0 = np.zeros(D)
    f0[0] = 1.0
    f1 = np.zeros(D)
    f1[1] = 1.0
    code_book = np.stack([f0, f1]).astype(np.float32)
    n = 400
    xyz = rng.normal(0, 0.12, (n, 3)).astype(np.float32)
    cls = rng.integers(0, 2, n)
    feat = (code_book[cls] + rng.normal(0, 0.05, (n, D))).astype(np.float32)
    remap = consolidate_classes(feat, code_book, xyz)
    assert remap[1] != remap[2]


def test_classify_and_small_class_guard():
    feat, code_book, xyz = _make_scene()
    cls = classify_gaussians(feat, code_book)
    assert set(np.unique(cls)) == {0, 1, 2, 3}
    # classes under min_gaussians never participate
    cfg = ClassMergeConfig(min_gaussians=10_000)
    remap = consolidate_classes(feat, code_book, xyz, cfg=cfg)
    np.testing.assert_array_equal(remap, np.arange(len(code_book) + 1))


def test_active_mask_and_empty():
    feat, code_book, xyz = _make_scene()
    active = np.zeros(len(xyz), bool)          # nothing active
    remap = consolidate_classes(feat, code_book, xyz, active=active)
    np.testing.assert_array_equal(remap, np.arange(len(code_book) + 1))
