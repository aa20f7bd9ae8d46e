"""Training-orchestration smoke test: a few real iterations on a tiny Blender-style
scene, exercising the full schedule (densify, opacity reset, SH bump, save,
checkpoint, resume)."""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def blender_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("blender")
    rng = np.random.default_rng(0)
    frames = []
    for i in range(3):
        ang = 2 * np.pi * i / 3
        pos = np.array([3 * np.sin(ang), 0.0, 3 * np.cos(ang)])
        fwd = -pos / np.linalg.norm(pos)
        right = np.cross([0.0, 1.0, 0.0], fwd)
        right = right / np.linalg.norm(right)
        up = np.cross(fwd, right)
        # OpenCV c2w, converted to Blender axes (the reader flips cols 1:3 back)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, fwd, pos
        c2w[:3, 1:3] *= -1
        name = f"r_{i}"
        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / f"{name}.png")
        frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
    with open(root / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.9, "frames": frames}, f)
    # small point cloud so the smoke test compiles fast
    from segsplat_tpu.io.dataset import store_point_cloud_ply
    xyz = (rng.random((96, 3)) * 2 - 1).astype(np.float32)
    store_point_cloud_ply(str(root / "points3d.ply"), xyz,
                          (rng.random((96, 3)) * 255).astype(np.uint8))
    return str(root)


def test_train_smoke_with_full_schedule(blender_scene, tmp_path):
    from segsplat_tpu.pipeline.train import TrainRunConfig, train
    from segsplat_tpu.train.trainer import OptimizationConfig

    model_path = str(tmp_path / "model")
    opt = OptimizationConfig(
        iterations=12, densify_from_iter=4, densify_until_iter=10,
        densification_interval=5, opacity_reset_interval=8, num_classes=16)
    run = TrainRunConfig(
        iterations=12, test_iterations=(12,), save_iterations=(12,),
        checkpoint_iterations=(12,), sh_up_every=6, log_every=2,
        num_classes=16, raster_max_tiles_per_axis=4, raster_max_per_tile=64,
        raster_tile_chunk=4)
    state = train(blender_scene, model_path, opt=opt, run=run, capacity=192)

    assert int(state.step) == 12
    ply = os.path.join(model_path, "point_cloud", "iteration_12",
                       "point_cloud.ply")
    assert os.path.exists(ply)
    assert os.path.exists(os.path.join(model_path, "point_cloud",
                                       "iteration_12", "classifier.npz"))
    assert os.path.exists(os.path.join(model_path, "cameras.json"))
    metrics = [json.loads(l) for l in
               open(os.path.join(model_path, "metrics.jsonl"))]
    assert metrics and all(np.isfinite(m["total"]) for m in metrics
                           if "total" in m)
    assert any("eval_psnr" in m and np.isfinite(m["eval_psnr"])
               for m in metrics), "test-iteration eval must log PSNR"

    # saved PLY round-trips through the Scene loader with identity features
    from segsplat_tpu.scene import load_gaussian_table
    t2 = load_gaussian_table(ply, max_sh_degree=3)
    n_active = int(np.asarray(state.table.active).sum())
    assert int(np.asarray(t2.active).sum()) == n_active
    assert float(np.abs(np.asarray(t2.objects_dc)).max()) > 0

    # resume from the checkpoint
    ckpt = os.path.join(model_path, "chkpnts", "chkpnt12")
    assert os.path.exists(ckpt)
    run2 = TrainRunConfig(
        iterations=14, test_iterations=(), save_iterations=(), log_every=2,
        checkpoint_iterations=(), sh_up_every=6, num_classes=16,
        raster_max_tiles_per_axis=4, raster_max_per_tile=64, raster_tile_chunk=4)
    state2 = train(blender_scene, str(tmp_path / "model2"), opt=opt, run=run2,
                   capacity=192, start_checkpoint=ckpt)
    assert int(state2.step) == 14


def test_auto_max_per_tile_probe(blender_scene, tmp_path):
    """raster_max_per_tile=0 auto-sizes the blend K from measured per-tile
    pair depth (VERDICT r4 #2): multiple of the 128-lane Pallas quantum,
    inside [256, 4096], deterministic for a fixed scene."""
    from segsplat_tpu.pipeline.train import (TrainRunConfig,
                                             _resolve_auto_max_per_tile)
    from segsplat_tpu.scene import Scene

    scene = Scene(blender_scene, str(tmp_path / "m"), capacity=192, seed=0)
    run = TrainRunConfig(num_classes=16, raster_max_tiles_per_axis=4,
                         raster_max_per_tile=0)
    cap = _resolve_auto_max_per_tile(scene, scene.gaussians, run)
    cap2 = _resolve_auto_max_per_tile(scene, scene.gaussians, run)
    assert cap == cap2
    assert cap % 128 == 0 and 256 <= cap <= 4096
