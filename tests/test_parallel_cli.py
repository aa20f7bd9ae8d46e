"""CLI-level SPMD tests (VERDICT round-1 item #2): the lift CLI and the training
pipeline must actually drive the parallel layer on the 8-virtual-device CPU mesh
(conftest.py) and match the single-device results."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _ring_cameras(n, fx=20.0, w=16, h=16, radius=2.5):
    """n inward-looking cameras on a ring; returns the stage camera-params
    JSON dict pieces ({name: entry}, {cam_id: [fx,fy,cx,cy]})."""
    images, cams = {}, {"0": {"params": [fx, fx, w / 2, h / 2]}}
    names = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        pos = np.array([radius * np.sin(ang), 0.0, -radius * np.cos(ang)])
        fwd = -pos / np.linalg.norm(pos)
        right = np.cross([0.0, 1.0, 0.0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, fwd, pos
        w2c = np.linalg.inv(c2w)
        name = f"view_{i:03d}"
        images[str(i)] = {"name": name + ".png", "camera_id": "0",
                          "R": w2c[:3, :3].tolist(),
                          "tvec": w2c[:3, 3].tolist()}
        names.append(name)
    return images, cams, names


@pytest.fixture(scope="module")
def lift_inputs(tmp_path_factory):
    """Voxel-grid PLY + 8 stub LSeg maps + camera json for the lift CLI."""
    from segsplat_tpu.io.ply import write_voxel_grid_ply

    root = tmp_path_factory.mktemp("liftcli")
    rng = np.random.default_rng(0)
    vs = 0.25
    ii = np.stack(np.meshgrid(*([np.arange(5)] * 3), indexing="ij"),
                  axis=-1).reshape(-1, 3)
    origin = np.array([-0.5, -0.5, -0.5], np.float32)
    centers = (origin + ii * vs).astype(np.float32)
    grid_ply = str(root / "grid.ply")
    write_voxel_grid_ply(grid_ply, centers,
                         np.full((len(centers), 3), 128, np.uint8), vs, origin)

    V = 8
    images, cams, names = _ring_cameras(V)
    lseg = root / "lseg"
    lseg.mkdir()
    for name in names:
        np.save(lseg / f"{name}.npy", rng.random((6, 16, 16)).astype(np.float16))
    cam_json = str(root / "cams.json")
    with open(cam_json, "w") as f:
        json.dump({"images": images, "cameras": cams}, f)
    return dict(root=str(root), grid_ply=grid_ply, lseg=str(lseg),
                cam_json=cam_json)


def _run_lift_cli(lift_inputs, out_dir, mesh_view):
    import aggregate_voxel_features_onthefly as cli

    cli.main(["--voxel_ply", lift_inputs["grid_ply"],
              "--lseg_dir", lift_inputs["lseg"],
              "--camera_params", lift_inputs["cam_json"],
              "--out_dir", out_dir, "--downsample_factor", "1.0",
              "--view_chunk", "4", "--max_views", "8",
              "--checkpoint_every", "8", "--depth_max", "6.0",
              "--mesh_view", str(mesh_view)])
    from segsplat_tpu.io.artifacts import load_voxel_features
    pts = [f for f in os.listdir(out_dir)
           if f.startswith("ALL_nonzero") and f.endswith(".pt")]
    assert len(pts) == 1
    return load_voxel_features(os.path.join(out_dir, pts[0]))


def test_lift_cli_sharded_matches_single_device(lift_inputs, tmp_path):
    """aggregate_voxel_features_onthefly.py --mesh_view 4 == --mesh_view 1."""
    single = _run_lift_cli(lift_inputs, str(tmp_path / "single"), 1)
    sharded = _run_lift_cli(lift_inputs, str(tmp_path / "sharded"), 4)
    assert len(single["pos"]) > 0, "lift must hit voxels"
    np.testing.assert_array_equal(sharded["coords"], single["coords"])
    np.testing.assert_allclose(np.asarray(sharded["feat"], np.float32),
                               np.asarray(single["feat"], np.float32),
                               rtol=1e-3, atol=1e-3)  # artifacts are fp16


@pytest.fixture(scope="module")
def blender_scene(tmp_path_factory):
    """Tiny synthetic blender scene with uniform 32x32 cameras."""
    from PIL import Image

    from segsplat_tpu.io.dataset import store_point_cloud_ply

    root = tmp_path_factory.mktemp("scene_pcli")
    rng = np.random.default_rng(0)
    frames = []
    for i in range(4):
        ang = 2 * np.pi * i / 4
        pos = np.array([3 * np.sin(ang), 0.0, 3 * np.cos(ang)])
        fwd = -pos / np.linalg.norm(pos)
        right = np.cross([0.0, 1.0, 0.0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, fwd, pos
        c2w[:3, 1:3] *= -1
        name = f"r_{i}"
        Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(
            root / f"{name}.png")
        frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
    with open(root / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.9, "frames": frames}, f)
    xyz = (rng.random((64, 3)) * 2 - 1).astype(np.float32)
    store_point_cloud_ply(str(root / "points3d.ply"), xyz,
                          (rng.random((64, 3)) * 255).astype(np.uint8))
    return str(root)


def _train_cfg(view_batch, mesh_view):
    from segsplat_tpu.pipeline.train import TrainRunConfig
    from segsplat_tpu.train.trainer import OptimizationConfig

    opt = OptimizationConfig(iterations=3, densify_from_iter=99,
                             densify_until_iter=0, num_classes=16)
    run = TrainRunConfig(iterations=3, test_iterations=(), save_iterations=(3,),
                         checkpoint_iterations=(), sh_up_every=99, log_every=1,
                         num_classes=16, raster_max_tiles_per_axis=4,
                         raster_max_per_tile=64, raster_tile_chunk=4,
                         view_batch=view_batch, mesh_view=mesh_view)
    return opt, run


def test_train_view_batch_sharded_matches_one_device_mesh(blender_scene,
                                                          tmp_path):
    """view_batch=2 sharded over 2 devices == the same batch on a 1-device
    mesh: identical camera schedule + rngs → near-identical parameters.

    Each config runs in its own subprocess (tests/_parallel_train_worker.py):
    one process = one mesh, the production shape — two differently-meshed
    programs in one process trip a CPU-backend lifted-constant quirk that no
    real run encounters."""
    import subprocess

    worker = os.path.join(os.path.dirname(__file__),
                          "_parallel_train_worker.py")
    results = {}
    for tag, mesh_view in (("dp2", 2), ("dp1", 1)):
        out_npy = str(tmp_path / f"{tag}.npy")
        r = subprocess.run(
            [sys.executable, worker, blender_scene, str(tmp_path / tag),
             "2", str(mesh_view), out_npy],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, f"{tag} failed:\n{r.stdout}\n{r.stderr}"
        results[tag] = np.load(out_npy)
    np.testing.assert_allclose(results["dp2"], results["dp1"],
                               rtol=1e-4, atol=1e-5)


def test_train_cli_view_batch(blender_scene, tmp_path):
    """Root train.py CLI with --view_batch 2 drives the parallel step and
    saves the usual artifacts. Runs in a subprocess (one process = one mesh,
    the production shape; see _parallel_train_worker.py docstring)."""
    import subprocess

    model = str(tmp_path / "model_vb")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    argv = ["-s", blender_scene, "-m", model, "--iterations", "3",
            "--test_iterations", "-1", "--save_iterations", "3",
            "--checkpoint_iterations", "-1", "--num_classes", "16",
            "--capacity", "96", "--view_batch", "2", "--port", "0",
            "--densify_from_iter", "99", "--densify_until_iter", "0"]
    code = ("import jax; jax.config.update('jax_platforms','cpu'); "
            "import sys, train; train.main(sys.argv[1:])")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    if "xla_force_host_platform_device_count" not in env.get("XLA_FLAGS", ""):
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8"
                            ).strip()
    r = subprocess.run([sys.executable, "-c", code] + argv, cwd=repo, env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"train CLI failed:\n{r.stdout}\n{r.stderr}"
    assert os.path.exists(os.path.join(model, "point_cloud", "iteration_3",
                                       "point_cloud.ply"))
    with open(os.path.join(model, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert all(np.isfinite(r["total"]) for r in recs if "total" in r)
