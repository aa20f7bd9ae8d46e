"""End-to-end CLI chain on a tiny trained scene: semantics attach → render CLI →
confidence/eval/stats CLIs — the full L6 inference surface."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.fixture(scope="module")
def trained_scene(tmp_path_factory):
    """A few-iteration trained model over a synthetic blender scene."""
    import json as _json

    from PIL import Image
    root = tmp_path_factory.mktemp("scene")
    rng = np.random.default_rng(0)
    frames = []
    for i in range(3):
        ang = 2 * np.pi * i / 3
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
        _json.dump({"camera_angle_x": 0.9, "frames": frames}, f)
    from segsplat_tpu.io.dataset import store_point_cloud_ply
    xyz = (rng.random((80, 3)) * 2 - 1).astype(np.float32)
    store_point_cloud_ply(str(root / "points3d.ply"), xyz,
                          (rng.random((80, 3)) * 255).astype(np.uint8))

    from segsplat_tpu.pipeline.train import TrainRunConfig, train
    from segsplat_tpu.train.trainer import OptimizationConfig
    model = str(root / "model")
    opt = OptimizationConfig(iterations=4, densify_from_iter=99,
                             densify_until_iter=0, num_classes=16)
    run = TrainRunConfig(iterations=4, test_iterations=(), save_iterations=(4,),
                         checkpoint_iterations=(), sh_up_every=99, log_every=2,
                         num_classes=16, raster_max_tiles_per_axis=4,
                         raster_max_per_tile=64, raster_tile_chunk=4)
    train(str(root), model, opt=opt, run=run, capacity=128)
    # write a cfg_args for get_combined_args-based CLIs
    from argparse import Namespace
    from segsplat_tpu.utils.config import save_cfg_args
    save_cfg_args(model, Namespace(
        source_path=str(root), model_path=model, images="images",
        object_path="object_mask", resolution=-1, white_background=False,
        sh_degree=3, eval=False, train_split=False, data_device="tpu",
        n_views=0, random_init=False, train_test_exp=False))
    return dict(root=str(root), model=model)


def test_render_semantics_cli_and_downstream(trained_scene, tmp_path):
    from segsplat_tpu.io.ply import read_ply

    model = trained_scene["model"]
    ply = os.path.join(model, "point_cloud", "iteration_4", "point_cloud.ply")
    n = len(read_ply(ply).vertex)

    # fabricate a gaussian_semantics artifact (3 prompts)
    rng = np.random.default_rng(1)
    from segsplat_tpu.io.artifacts import save_semantics
    sem_path = str(tmp_path / "gaussian_semantics.npz")
    logits = rng.standard_normal((n, 3)).astype(np.float32)
    save_semantics(sem_path, labels=logits.argmax(1), logits=logits,
                   prompts=["wall", "chair", "floor"])

    import render_semantics_logits as rsl
    rsl.main(["--model_path", model, "--iteration", "4",
              "--semantics", sem_path, "--skip_test", "--backend", "xla"])

    out_dir = os.path.join(model, "train", "ours_4", "semantics")
    files = os.listdir(out_dir)
    assert any(f.endswith("_labels.pt") for f in files)
    assert any(f.endswith("_mask_color.png") for f in files)
    assert any(f.endswith("_logits.npy") for f in files)
    assert any(f.endswith("_confidence.png") for f in files)

    # confidence CLI on a saved logits file
    import logit_confidence_map as lcm
    logits_file = os.path.join(out_dir, sorted(
        f for f in files if f.endswith("_logits.npy"))[0])
    lcm.main(["--logits", logits_file, "--out", str(tmp_path / "conf.png")])
    assert os.path.exists(tmp_path / "conf.png")

    # ScanNet++-style eval: predictions vs themselves → perfect mIoU
    import eval_scannetpp as ev
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ev.main(["--pred_dir", out_dir, "--gt_dir", out_dir,
                 "--num_classes", "3"])
    assert "mIoU 1.0000" in buf.getvalue()

    # stats CLI
    import analyze_gaussian_semantics as ags
    with contextlib.redirect_stdout(io.StringIO()):
        ags.main(["--semantics", sem_path])


def test_gaussian_color_stats_cli(trained_scene, tmp_path):
    """Both reference micro stats dumps (semantics_stats/gaussian_features_dc_
    stats.py, gaussian_rgb_stats.py) via the unified --mode CLI."""
    import contextlib
    import io

    import gaussian_color_stats as gcs

    model = trained_scene["model"]
    ply = os.path.join(model, "point_cloud", "iteration_4", "point_cloud.ply")

    # dc mode on a trained gaussian PLY (f_dc_* ladder) + histogram PNGs
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        gcs.main(["--ply", ply, "--mode", "dc", "--bins", "8"])
    out = buf.getvalue()
    assert "(features_dc)" in out and "Red channel" in out
    assert "histogram:" in out and "mean:" in out
    import glob
    assert len(glob.glob(ply + "_*_hist.png")) == 3

    # rgb mode on a red/green/blue voxel-grid PLY (0-255 histogram range)
    from segsplat_tpu.io.ply import write_voxel_grid_ply
    rng = np.random.default_rng(5)
    vply = str(tmp_path / "grid.ply")
    write_voxel_grid_ply(vply, rng.random((50, 3)).astype(np.float32),
                         rng.integers(0, 256, (50, 3)).astype(np.uint8),
                         0.05, np.zeros(3, np.float32))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        gcs.main(["--ply", vply, "--mode", "rgb", "--bins", "4"])
    out = buf.getvalue()
    assert "R channel" in out and "B channel" in out
    # histogram range pinned to (0,255): 4 bins sum to all 50 voxels
    import gaussian_color_stats as g2
    from segsplat_tpu.io.ply import read_ply
    stats = g2.color_stats(g2.get_rgb(read_ply(vply)), bins=4, mode="rgb")
    assert sum(stats["R"]["histogram"]) == 50


def test_render_lerf_mask_text_grounded(trained_scene, tmp_path):
    """LERF-mask CLI self-contained from a TEXT query (no --query_mask): text
    → frame-0 LSeg relevancy mask → IoA id selection → per-view test masks."""
    import render_lerf_mask as rlm

    model = trained_scene["model"]
    # synthetic frame-0 LSeg features: top half matches the prompt's
    # (deterministic hash) embedding → grounding selects that region
    from tests.make_goldens import hash_prompt_embeddings
    C, h, w = 12, 16, 16
    emb_p = hash_prompt_embeddings(["chair"], C)[0]
    emb_n = hash_prompt_embeddings(["object"], C)[0]
    fmap = np.tile(emb_n, (h, w, 1)).astype(np.float32)
    fmap[:8] = emb_p
    feat = str(tmp_path / "frame0.npy")
    np.save(feat, np.transpose(fmap, (2, 0, 1)))   # [C,h,w] like the extractor

    import contextlib, io
    with contextlib.redirect_stdout(io.StringIO()):
        rlm.main(["--model_path", model, "--iteration", "4",
                  "--query_text", "chair", "--lseg_feat", feat])
    out_dir = os.path.join(model, "test_mask", "ours_4")
    masks = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    assert len(masks) == 3  # one per camera


def test_editing_cli(trained_scene, tmp_path):
    import edit_object_removal as rem

    model = trained_scene["model"]
    # point the classifier at the trained one
    import contextlib, io
    with contextlib.redirect_stdout(io.StringIO()):
        rem.main(["--model_path", model, "--iteration", "4",
                  "--select_obj_id", "0", "1", "2", "3",
                  "--out_iteration", "5"])
    out = os.path.join(model, "point_cloud", "iteration_5", "point_cloud.ply")
    assert os.path.exists(out)


def test_run_pipeline_end_to_end(trained_scene, tmp_path):
    """The one-command pipeline over the tiny trained scene (stub LSeg maps)."""
    import json as _json

    root, model = trained_scene["root"], trained_scene["model"]
    rng = np.random.default_rng(3)
    # stub 8-channel feature maps named after synthetic cameras + camera json
    lseg = tmp_path / "lseg"
    lseg.mkdir()
    images, cams = {}, {"0": {"params": [20.0, 20.0, 16.0, 16.0]}}
    with open(os.path.join(root, "transforms_train.json")) as f:
        frames = _json.load(f)["frames"]
    for i, fr in enumerate(frames):
        c2w = np.array(fr["transform_matrix"])
        c2w[:3, 1:3] *= -1
        w2c = np.linalg.inv(c2w)
        name = os.path.basename(fr["file_path"])
        images[str(i)] = {"name": name + ".png", "camera_id": "0",
                          "R": w2c[:3, :3].tolist(),
                          "tvec": w2c[:3, 3].tolist()}
        np.save(lseg / f"{name}.npy", rng.random((8, 16, 16)).astype(np.float16))
    cam_json = str(tmp_path / "cams.json")
    with open(cam_json, "w") as f:
        _json.dump({"images": images, "cameras": cams}, f)

    import run_pipeline
    work = str(tmp_path / "work")
    run_pipeline.main(["-s", root, "-m", model, "--iteration", "4",
                       "--lseg_dir", str(lseg), "--camera_params", cam_json,
                       "--prompt", "wall", "chair",
                       "--cell_size", "0.3", "--density_eps", "0.8",
                       "--density_min_neighbors", "1", "--work_dir", work,
                       "--skip_render"])
    assert os.path.exists(os.path.join(work, "gaussian_semantics.npz"))
    assert os.path.exists(os.path.join(work, "gauss2voxel.npy"))
