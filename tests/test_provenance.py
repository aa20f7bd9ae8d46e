"""Weights-provenance tainting: random-weight features must not silently reach
an eval number (VERDICT r3 #7). The reference requires a real checkpoint
(script/extract_lseg_features.py:43-62); our offline random-weights fallback
stamps `weights_source=random` and every downstream stage refuses or loudly
propagates the taint: extract → lift → query → render → eval."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from segsplat_tpu.io.provenance import (RANDOM, is_tainted, read_weights_source,
                                        require_untainted, write_provenance)


def test_provenance_roundtrip(tmp_path):
    d = str(tmp_path / "arts")
    write_provenance(d, RANDOM, stage="extract")
    assert read_weights_source(d) == RANDOM
    # file inside the dir resolves to the same sidecar
    f = os.path.join(d, "x.npy")
    np.save(f, np.zeros(3))
    assert read_weights_source(f) == RANDOM
    assert is_tainted(RANDOM) and not is_tainted("checkpoint:demo_e200.ckpt")
    assert not is_tainted(None)  # pre-provenance artifacts stay usable
    require_untainted("checkpoint:demo_e200.ckpt", False, "x")   # no raise
    require_untainted(RANDOM, True, "x")                         # opted in
    with pytest.raises(RuntimeError, match="RANDOM weights"):
        require_untainted(RANDOM, False, "x")


def test_lift_refuses_tainted_feature_dir(tmp_path):
    """aggregate_voxel_features fails fast on a tainted lseg_dir."""
    from segsplat_tpu.pipeline.lift_features import (LiftConfig,
                                                     aggregate_voxel_features)
    # minimal grid ply (we only need to get past grid loading to the check)
    from segsplat_tpu.io.ply import write_voxel_grid_ply
    grid_ply = str(tmp_path / "grid.ply")
    centers = np.array([[0.0, 0.0, 0.0], [0.25, 0.0, 0.0]], np.float32)
    write_voxel_grid_ply(grid_ply, centers,
                         np.zeros((2, 3), np.uint8), 0.25, np.zeros(3))
    lseg = tmp_path / "lseg"
    lseg.mkdir()
    np.save(lseg / "view000.npy", np.zeros((4, 8, 8), np.float16))
    write_provenance(str(lseg), RANDOM)
    with pytest.raises(RuntimeError, match="RANDOM weights"):
        aggregate_voxel_features(grid_ply, str(lseg), "unused.json",
                                 str(tmp_path / "out"), LiftConfig())


def test_query_refuses_then_propagates(tmp_path):
    """query_voxels: refuse tainted voxel features; with the override the
    taint follows the semantics artifact, and render/eval refuse THAT."""
    from segsplat_tpu.pipeline.query import query_voxels

    vox_dir = tmp_path / "vox"
    vox_dir.mkdir()
    vox_path = str(vox_dir / "feats.npz")
    rng = np.random.default_rng(0)
    np.savez(vox_path, pos=rng.random((10, 3)).astype(np.float32),
             feat=rng.random((10, 16)).astype(np.float16),
             voxel_coords=np.zeros((10, 3), np.int32))
    write_provenance(str(vox_dir), RANDOM, stage="lift")

    out = tmp_path / "sem" / "gaussian_semantics.npz"
    out.parent.mkdir()
    with pytest.raises(RuntimeError, match="RANDOM weights"):
        query_voxels(vox_path, ["chair", "floor"], str(out))

    query_voxels(vox_path, ["chair", "floor"], str(out),
                 allow_random_weights=True)
    assert read_weights_source(str(out)) == RANDOM, "taint must propagate"

    # the render stage refuses the tainted semantics
    from segsplat_tpu.pipeline.render_semantics import attach_logits_for_table
    with pytest.raises(RuntimeError, match="RANDOM weights"):
        attach_logits_for_table(None, str(out))


def test_eval_refuses_tainted_predictions(tmp_path):
    """The final gate: eval CLIs cannot emit a number from tainted label maps."""
    import eval_scannetpp

    pred = tmp_path / "pred"
    gt = tmp_path / "gt"
    pred.mkdir(), gt.mkdir()
    lab = np.zeros((8, 8), np.int64)
    np.save(pred / "00000.npy", lab)
    np.save(gt / "00000_label.npy", lab)
    write_provenance(str(pred), RANDOM, stage="render_semantics")
    argv = ["--pred_dir", str(pred), "--gt_dir", str(gt), "--num_classes", "2"]
    with pytest.raises(RuntimeError, match="RANDOM weights"):
        eval_scannetpp.main(argv)
    eval_scannetpp.main(argv + ["--allow_random_weights"])  # explicit opt-in

    import eval_lerf_mask
    with pytest.raises(RuntimeError, match="RANDOM weights"):
        eval_lerf_mask.main(["--gt_root", str(tmp_path), "--pred_root",
                             str(tmp_path), "--scenes", "pred",
                             "--out_csv", str(tmp_path / "o.csv")])


def test_write_never_downgrades_taint(tmp_path):
    """A clean stamp into a directory already stamped random keeps the taint
    (directory-granular sidecar: the tainted co-located artifacts still
    exist); the attempted clean source is recorded for forensics."""
    import json

    d = str(tmp_path / "arts")
    write_provenance(d, RANDOM, stage="extract")
    write_provenance(d, "checkpoint:demo_e200.ckpt", stage="query")
    assert read_weights_source(d) == RANDOM
    with open(os.path.join(d, "_weights_provenance.json")) as f:
        rec = json.load(f)
    assert rec["shadowed_sources"] == ["checkpoint:demo_e200.ckpt"]
    # tainted→tainted and clean→clean overwrites stay plain overwrites
    write_provenance(d, RANDOM, stage="again")
    assert read_weights_source(d) == RANDOM
    d2 = str(tmp_path / "clean")
    write_provenance(d2, "checkpoint:a.ckpt")
    write_provenance(d2, "checkpoint:b.ckpt")
    assert read_weights_source(d2) == "checkpoint:b.ckpt"


def test_strict_mode_rejects_unstamped(tmp_path):
    """--require_provenance: unstamped artifacts fail in strict mode only."""
    require_untainted(None, False, "x")                       # default: ok
    with pytest.raises(RuntimeError, match="NO weights-provenance"):
        require_untainted(None, False, "x", strict=True)
    require_untainted("checkpoint:demo_e200.ckpt", False, "x", strict=True)
    with pytest.raises(RuntimeError, match="RANDOM weights"):
        require_untainted(RANDOM, False, "x", strict=True)

    # end-to-end on the eval CLI
    import eval_scannetpp
    pred = tmp_path / "pred"
    gt = tmp_path / "gt"
    pred.mkdir(), gt.mkdir()
    lab = np.zeros((8, 8), np.int64)
    np.save(pred / "00000.npy", lab)
    np.save(gt / "00000_label.npy", lab)
    argv = ["--pred_dir", str(pred), "--gt_dir", str(gt), "--num_classes", "2"]
    eval_scannetpp.main(argv)                       # unstamped, default: ok
    with pytest.raises(RuntimeError, match="NO weights-provenance"):
        eval_scannetpp.main(argv + ["--require_provenance"])
    write_provenance(str(pred), "checkpoint:demo_e200.ckpt",
                     stage="render_semantics")
    eval_scannetpp.main(argv + ["--require_provenance"])      # stamped: ok


def test_convert_propagates_taint(tmp_path):
    from segsplat_tpu.pipeline.query import convert_pt_to_npz

    src = tmp_path / "a"
    dst = tmp_path / "b"
    src.mkdir(), dst.mkdir()
    p = str(src / "v.npz")
    np.savez(p, pos=np.zeros((2, 3), np.float32),
             feat=np.zeros((2, 4), np.float16),
             voxel_coords=np.zeros((2, 3), np.int32))
    write_provenance(str(src), RANDOM)
    out = str(dst / "v.npz")
    convert_pt_to_npz(p, out)
    assert read_weights_source(out) == RANDOM
