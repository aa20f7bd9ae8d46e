"""End-to-end stage-pipeline tests on a tiny synthetic scene: gaussian PLY →
voxel grid → occupancy → feature lift → 1-NN map → query → artifacts, exercising
the actual CLI entry points (the reference's test strategy was visual debug
scripts; SURVEY §4 says the rebuild must create this layer)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.fixture(scope="module")
def synthetic_scene(tmp_path_factory):
    """A gaussian PLY + LSeg-style feature maps + camera json."""
    root = tmp_path_factory.mktemp("scene")
    rng = np.random.default_rng(0)
    n = 3000
    from segsplat_tpu.io.ply import save_gaussian_ply

    xyz = (rng.random((n, 3)) * 2 - 1).astype(np.float32)
    ply = str(root / "point_cloud.ply")
    save_gaussian_ply(
        ply, xyz=xyz,
        features_dc=rng.random((n, 1, 3)).astype(np.float32),
        features_rest=np.zeros((n, 15, 3), np.float32),
        opacity=rng.normal(1.0, 1.0, (n, 1)).astype(np.float32),
        scaling=np.full((n, 3), -4.0, np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        objects_dc=rng.random((n, 1, 16)).astype(np.float32))

    # LSeg-style fp16 feature maps + matching cameras (looking at the cloud)
    feat_dir = root / "lseg"
    feat_dir.mkdir()
    C, H, W = 16, 24, 32
    fx = 20.0
    images, cams = {}, {"0": {"params": [fx, fx, W, H]}}  # full-res intrinsics
    for i in range(4):
        ang = 2 * np.pi * i / 4
        pos = np.array([3 * np.sin(ang), 0.0, -3 * np.cos(ang)])
        fwd = -pos / np.linalg.norm(pos)
        right = np.cross([0.0, 1.0, 0.0], fwd)
        right = right / np.linalg.norm(right)
        up = np.cross(fwd, right)
        Rc2w = np.stack([right, up, fwd], axis=1)
        Rw2c = Rc2w.T
        t = -Rw2c @ pos
        name = f"view{i:03d}"
        images[str(i)] = {"name": name + ".jpg", "camera_id": "0",
                          "R": Rw2c.tolist(), "tvec": t.tolist()}
        np.save(feat_dir / f"{name}.npy",
                rng.random((C, H, W)).astype(np.float16))
    cam_json = str(root / "camera_params.json")
    with open(cam_json, "w") as f:
        json.dump({"images": images, "cameras": cams}, f)
    return dict(root=str(root), ply=ply, lseg=str(feat_dir), cams=cam_json,
                n=n, C=C, H=H, W=W)


def test_voxel_grid_cli(synthetic_scene):
    import importlib
    mod = importlib.import_module("minkowski_voxel_grid_from_ply_advanced")
    out_dir = os.path.join(synthetic_scene["root"], "grid")
    mod.main(["--ply", synthetic_scene["ply"], "--output_dir", out_dir,
              "--cell_size", "0.25", "--opacity_threshold", "0.5",
              "--density_eps", "0.3", "--density_min_neighbors", "2",
              "--normal_consistency", "1.0"])
    plys = [f for f in os.listdir(out_dir) if f.endswith(".ply")]
    assert len(plys) == 1
    from segsplat_tpu.io.ply import read_voxel_grid_ply
    centers, colors, vs, origin, shape = read_voxel_grid_ply(
        os.path.join(out_dir, plys[0]))
    assert vs == 0.25 and len(centers) > 10 and origin is not None
    synthetic_scene["grid_ply"] = os.path.join(out_dir, plys[0])


def test_full_pipeline(synthetic_scene, tmp_path):
    if "grid_ply" not in synthetic_scene:
        test_voxel_grid_cli(synthetic_scene)
    grid_ply = synthetic_scene["grid_ply"]

    # occupancy CLI
    import importlib
    occ_mod = importlib.import_module("build_sparse_occupancy")
    occ_path = str(tmp_path / "occ.npz")
    occ_mod.main(["--voxel_ply", grid_ply, "--output", occ_path])
    occ = np.load(occ_path)
    assert (occ["occupancy_3D"] > 0).sum() > 10

    # feature lifting
    from segsplat_tpu.pipeline.lift_features import LiftConfig, aggregate_voxel_features
    out_dir = str(tmp_path / "lift")
    res = aggregate_voxel_features(
        grid_ply, synthetic_scene["lseg"], synthetic_scene["cams"], out_dir,
        LiftConfig(depth_min=0.2, depth_max=8.0, downsample_factor=1.0,
                   view_chunk=2, checkpoint_every=4))
    counts = np.asarray(res["counts"])
    assert counts[1:].sum() > 0, "some voxels must receive features"
    arts = [f for f in os.listdir(out_dir) if f.startswith("ALL_nonzero")]
    assert any(f.endswith(".pt") for f in arts)
    vox_pt = os.path.join(out_dir, [f for f in arts if f.endswith(".pt")][0])

    # build_map + query via the CLI
    import voxeltoGaussian_logits as vg
    mu_path = str(tmp_path / "mu.npy")
    from segsplat_tpu.pipeline.query import extract_gaussian_centers
    extract_gaussian_centers(synthetic_scene["ply"], mu_path)
    map_path = str(tmp_path / "gauss2voxel.npy")
    vg.main(["build_map", "--vox", vox_pt, "--gauss", mu_path,
             "--out", map_path])
    g2v = np.load(map_path)
    assert g2v.shape[0] == synthetic_scene["n"]

    sem_path = str(tmp_path / "gaussian_semantics.npz")
    vg.main(["query", "--vox", vox_pt, "--map", map_path, "--gauss", mu_path,
             "--prompt", "chair", "table", "--out", sem_path])
    from segsplat_tpu.io.artifacts import load_semantics
    sem = load_semantics(sem_path)
    assert sem["labels"].shape == (synthetic_scene["n"],)
    assert sem["logits"].shape == (synthetic_scene["n"], 2)
    assert list(sem["prompts"]) == ["chair", "table"]


def test_metrics():
    from segsplat_tpu.eval.metrics import (boundary_iou, fw_iou, mask_iou,
                                           mean_iou, psnr_np)
    a = np.zeros((32, 32), np.uint8)
    a[8:24, 8:24] = 255
    assert mask_iou(a, a) == 1.0
    b = np.roll(a, 4, axis=0)
    assert 0.0 < mask_iou(a, b) < 1.0
    assert boundary_iou(a, a) == 1.0
    assert 0.0 <= boundary_iou(a, b) < 1.0

    gt = np.array([[0, 0, 1, 1], [2, 2, 1, 1]])
    assert mean_iou(gt, gt, 3) == 1.0
    pred = gt.copy()
    pred[0, 0] = 1
    assert 0.0 < mean_iou(pred, gt, 3) < 1.0
    assert 0.0 < fw_iou(pred, gt, 3) <= 1.0
    assert psnr_np(np.zeros((4, 4)), np.zeros((4, 4))) == float("inf")


def test_config_roundtrip(tmp_path):
    from argparse import ArgumentParser, Namespace

    from segsplat_tpu.utils.config import (ModelParams, get_combined_args,
                                           save_cfg_args)
    ns = Namespace(source_path="/data/x", model_path=str(tmp_path),
                   images="images", white_background=False, sh_degree=3)
    save_cfg_args(str(tmp_path), ns)

    parser = ArgumentParser()
    ModelParams(parser, sentinel=True)
    parser.add_argument("--iteration", type=int, default=-1)
    merged = get_combined_args(parser, ["--model_path", str(tmp_path)])
    assert merged.source_path == "/data/x"
    assert merged.model_path == str(tmp_path)


def test_cfg_args_no_code_execution(tmp_path):
    """The reference eval()s cfg_args (arguments/__init__.py:107) — ours must not."""
    from argparse import ArgumentParser

    from segsplat_tpu.utils.config import ModelParams, get_combined_args
    with open(tmp_path / "cfg_args", "w") as f:
        f.write("Namespace(source_path=__import__('os').getcwd())")
    parser = ArgumentParser()
    ModelParams(parser, sentinel=True)
    merged = get_combined_args(parser, ["--model_path", str(tmp_path)])
    # malicious file is rejected, CLI args still work
    assert merged.model_path == str(tmp_path)
    assert getattr(merged, "source_path", None) in (None, "")


def test_sentinel_defaults_without_cfg_args(tmp_path):
    """A model dir with NO cfg_args (pipeline-only runs) must resolve
    sentinel params to their real defaults instead of dropping them from
    the merged namespace (round-3 regression: render_semantics_logits
    crashed on args.resolution for fabricated model dirs)."""
    from argparse import ArgumentParser

    from segsplat_tpu.utils.config import ModelParams, get_combined_args
    parser = ArgumentParser()
    ModelParams(parser, sentinel=True)
    merged = get_combined_args(parser, ["--model_path", str(tmp_path)])
    assert merged.model_path == str(tmp_path)      # CLI wins
    assert merged.resolution == -1                 # real default restored
    assert merged.images == "images"
    assert merged.sh_degree == 3
    assert merged.white_background is False


def test_device_put_bounded_splits(monkeypatch):
    """Transfers above the relay-safe byte cap must be sliced along the
    leading axis and reassemble bit-exactly on device."""
    from segsplat_tpu.pipeline import lift_features as lf

    monkeypatch.setattr(lf, "_MAX_TRANSFER_BYTES", 1000)
    arr = np.arange(7 * 60, dtype=np.float32).reshape(7, 60)  # 240 B/row
    out = np.asarray(lf._device_put_bounded(arr))
    np.testing.assert_array_equal(out, arr)
    # non-contiguous input and fp16 survive the slicing
    arr16 = np.asarray(np.arange(6 * 80, dtype=np.float16).reshape(6, 80).T)
    out16 = np.asarray(lf._device_put_bounded(np.ascontiguousarray(arr16.T)))
    np.testing.assert_array_equal(out16, arr16.T)
    # under-cap arrays take the single-put path
    small = np.ones((2, 3), np.float32)
    np.testing.assert_array_equal(
        np.asarray(lf._device_put_bounded(small)), small)


def test_palette_matches_reference_construction():
    from segsplat_tpu.utils.palette import bit_shuffle_palette
    pal = bit_shuffle_palette(8)
    # transcribed expectations from the reference loop (voxeltoGaussian_logits.py:301-316)
    assert pal[0].tolist() == [0, 0, 0]
    assert pal[1].tolist() == [128, 0, 0]
    assert pal[2].tolist() == [0, 128, 0]
    assert pal[4].tolist() == [0, 0, 128]


def test_parity_harness(tmp_path, rng):
    """The artifact-diff harness detects equality and differences."""
    from segsplat_tpu.eval import parity
    from segsplat_tpu.io.artifacts import save_semantics, save_voxel_features

    xyz = rng.random((50, 3)).astype(np.float32)
    feats = rng.random((50, 8)).astype(np.float32)
    coords = rng.integers(0, 20, (50, 3))
    a = str(tmp_path / "a.npz")
    save_voxel_features(a, xyz, feats, coords)
    # permuted copy → parity must match by coordinate
    perm = rng.permutation(50)
    b = str(tmp_path / "b.npz")
    save_voxel_features(b, xyz[perm], feats[perm], coords[perm])
    reports = parity.compare_voxel_features(a, b)
    assert all(r.ok for r in reports), [r.line() for r in reports]

    # corrupted copy → must fail
    c = str(tmp_path / "c.npz")
    save_voxel_features(c, xyz, feats + 0.5, coords)
    reports = parity.compare_voxel_features(a, c)
    assert not all(r.ok for r in reports)

    s1 = str(tmp_path / "s1.npz")
    s2 = str(tmp_path / "s2.npz")
    logits = rng.random((40, 3)).astype(np.float32)
    save_semantics(s1, logits.argmax(1), logits, ["a", "b", "c"])
    save_semantics(s2, logits.argmax(1), logits + 1e-6, ["a", "b", "c"])
    assert all(r.ok for r in parity.compare_semantics(s1, s2))
