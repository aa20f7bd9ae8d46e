import numpy as np
import pytest

from segsplat_tpu.io import ply as ply_io
from segsplat_tpu.io import colmap as colmap_io
from segsplat_tpu.io import artifacts
from segsplat_tpu.io import dataset as ds


def test_ply_roundtrip_binary(tmp_path, rng):
    dt = np.dtype([("x", "f4"), ("y", "f4"), ("z", "f4"), ("red", "u1")])
    v = np.zeros(100, dt)
    v["x"] = rng.normal(size=100).astype(np.float32)
    v["red"] = rng.integers(0, 255, 100).astype(np.uint8)
    p = str(tmp_path / "a.ply")
    ply_io.write_ply(p, v, comments=["hello world"], binary=True)
    c = ply_io.read_ply(p)
    assert c.comments == ["hello world"]
    assert np.array_equal(c["x"], v["x"])
    assert np.array_equal(c["red"], v["red"])


def test_ply_roundtrip_ascii(tmp_path, rng):
    dt = np.dtype([("x", "f4"), ("y", "f4"), ("z", "f4")])
    v = np.zeros(10, dt)
    v["x"] = np.arange(10, dtype=np.float32) * 0.5
    p = str(tmp_path / "a.ply")
    ply_io.write_ply(p, v, binary=False)
    c = ply_io.read_ply(p)
    assert np.allclose(c["x"], v["x"])


def test_voxel_grid_ply_metadata_roundtrip(tmp_path, rng):
    centers = rng.normal(size=(50, 3)).astype(np.float32)
    colors = rng.integers(0, 255, (50, 3)).astype(np.uint8)
    p = str(tmp_path / "grid.ply")
    ply_io.write_voxel_grid_ply(p, centers, colors, voxel_size=0.04,
                                grid_origin=np.array([-1.0, 2.0, 0.5]),
                                grid_shape=(10, 20, 30))
    c2, col2, vs, origin, shape = ply_io.read_voxel_grid_ply(p)
    assert vs == pytest.approx(0.04)
    assert np.allclose(origin, [-1.0, 2.0, 0.5])
    assert shape == (10, 20, 30)
    assert np.allclose(c2, centers, atol=1e-5)
    assert np.array_equal(col2, colors)


def test_reference_ascii_header_compat(tmp_path):
    """Parse a header formatted exactly like the reference writer
    (minkowski_voxel_grid_from_ply_advanced.py:176-199)."""
    txt = (
        "ply\nformat ascii 1.0\n"
        "comment voxel_size 0.05\n"
        "comment grid_origin -1.5 0.0 2.25\n"
        "element vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
        "0.0 0.5 1.0 255 0 0\n"
        "1.0 1.5 2.0 0 255 0\n")
    p = tmp_path / "ref.ply"
    p.write_text(txt)
    centers, colors, vs, origin, shape = ply_io.read_voxel_grid_ply(str(p))
    assert vs == pytest.approx(0.05)
    assert np.allclose(origin, [-1.5, 0.0, 2.25])
    assert shape is None
    assert np.allclose(centers[1], [1.0, 1.5, 2.0])
    assert colors[0, 0] == 255


def test_gaussian_ply_roundtrip(tmp_path, rng):
    n = 37
    data = dict(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        features_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
        features_rest=rng.normal(size=(n, 15, 3)).astype(np.float32),
        opacity=rng.normal(size=(n, 1)).astype(np.float32),
        scaling=rng.normal(size=(n, 3)).astype(np.float32),
        rotation=rng.normal(size=(n, 4)).astype(np.float32),
        objects_dc=rng.normal(size=(n, 1, 16)).astype(np.float32),
    )
    p = str(tmp_path / "pc.ply")
    ply_io.save_gaussian_ply(p, **data)
    out = ply_io.load_gaussian_ply(p, max_sh_degree=3)
    for k in data:
        assert np.allclose(out[k], data[k], atol=1e-6), k
    # reference-compatible mode drops identity features (gaussian_model.py:404-452)
    out2 = ply_io.load_gaussian_ply(p, load_objects=False)
    assert "objects_dc" not in out2


def test_colmap_binary_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(20, 3))
    rgb = rng.integers(0, 255, (20, 3)).astype(np.uint8)
    colmap_io.write_points3D_binary(str(tmp_path / "points3D.bin"), xyz, rgb)
    x2, r2, e2 = colmap_io.read_points3D_binary(str(tmp_path / "points3D.bin"))
    assert np.allclose(x2, xyz)
    assert np.array_equal(r2, rgb)

    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    images = {1: colmap_io.ColmapImage(
        id=1, qvec=q, tvec=np.array([0.1, 0.2, 0.3]), camera_id=1, name="img0.png",
        xys=np.zeros((0, 2)), point3D_ids=np.zeros(0, np.int64))}
    colmap_io.write_extrinsics_binary(str(tmp_path / "images.bin"), images)
    im2 = colmap_io.read_extrinsics_binary(str(tmp_path / "images.bin"))
    assert np.allclose(im2[1].qvec, q)
    assert im2[1].name == "img0.png"

    cams = {1: colmap_io.ColmapCamera(id=1, model="PINHOLE", width=640, height=480,
                                      params=np.array([500.0, 510.0, 320.0, 240.0]))}
    colmap_io.write_intrinsics_binary(str(tmp_path / "cameras.bin"), cams)
    c2 = colmap_io.read_intrinsics_binary(str(tmp_path / "cameras.bin"))
    assert c2[1].width == 640 and np.allclose(c2[1].params, cams[1].params)


def test_voxel_feature_artifacts(tmp_path, rng):
    xyz = rng.normal(size=(30, 3)).astype(np.float32)
    feats = rng.normal(size=(30, 64)).astype(np.float32)
    coords = rng.integers(0, 50, (30, 3))
    for ext in (".pt", ".npz"):
        p = str(tmp_path / f"vox{ext}")
        artifacts.save_voxel_features(p, xyz, feats, coords)
        d = artifacts.load_voxel_features(p)
        assert np.allclose(d["pos"], xyz)
        assert np.allclose(d["feat"], feats, atol=1e-2)  # fp16 on disk


def test_semantics_artifact(tmp_path, rng):
    labels = rng.integers(0, 5, 100).astype(np.int16)
    logits = rng.normal(size=(100, 5)).astype(np.float32)
    p = str(tmp_path / "sem.npz")
    artifacts.save_semantics(p, labels, logits, ["wall", "chair", "table", "floor", "lamp"])
    d = artifacts.load_semantics(p)
    assert np.array_equal(d["labels"], labels)
    assert list(d["prompts"]) == ["wall", "chair", "table", "floor", "lamp"]


def test_nerfpp_norm():
    cams = []
    for i in range(4):
        R = np.eye(3)
        T = np.array([i * 1.0, 0, 0])
        cams.append(ds.CameraInfo(uid=i, R=R, T=T, fov_x=1.0, fov_y=1.0,
                                  image_path="", image_name=str(i), width=10, height=10))
    norm = ds.get_nerfpp_norm(cams)
    assert norm["radius"] > 0


def test_load_codebook_all_formats(tmp_path, rng):
    """Drop-in interop: our classifier.npz AND the reference's torch-saved
    classifier.pth (raw [256,16] tensor, train_unified_lift.py:295-297,437;
    also the Conv2d [256,16,1,1] weight it was reshaped from)."""
    import torch

    cb = rng.normal(size=(256, 16)).astype(np.float32)
    p_npz = str(tmp_path / "classifier.npz")
    np.savez(p_npz, code_book=cb)
    np.testing.assert_array_equal(artifacts.load_codebook(p_npz), cb)

    p_pth = str(tmp_path / "classifier.pth")
    torch.save(torch.from_numpy(cb), p_pth)
    np.testing.assert_allclose(artifacts.load_codebook(p_pth), cb, atol=0)

    p_conv = str(tmp_path / "classifier_conv.pth")
    torch.save(torch.from_numpy(cb[:, :, None, None]), p_conv)
    np.testing.assert_allclose(artifacts.load_codebook(p_conv), cb, atol=0)

    p_sd = str(tmp_path / "classifier_sd.pth")
    torch.save({"weight": torch.from_numpy(cb[:, :, None, None])}, p_sd)
    np.testing.assert_allclose(artifacts.load_codebook(p_sd), cb, atol=0)


def test_find_codebook_prefers_npz_falls_back_pth(tmp_path):
    import torch

    base = tmp_path / "model" / "point_cloud" / "iteration_30000"
    base.mkdir(parents=True)
    model = str(tmp_path / "model")
    # neither exists → npz path (caller gets the clean FileNotFoundError)
    assert artifacts.find_codebook(model, 30000).endswith("classifier.npz")
    torch.save(torch.zeros(256, 16), str(base / "classifier.pth"))
    assert artifacts.find_codebook(model, 30000).endswith("classifier.pth")
    np.savez(str(base / "classifier.npz"), code_book=np.zeros((256, 16)))
    assert artifacts.find_codebook(model, 30000).endswith("classifier.npz")


def test_extrinsics_text_zero_point_image(tmp_path):
    """COLMAP writes an EMPTY POINTS2D line for an image with zero points;
    the pair-structured parser must consume it instead of eating the next
    image's header (regression: blank-filtering misaligned the parse)."""
    from segsplat_tpu.io.colmap import read_extrinsics_text

    p = tmp_path / "images.txt"
    p.write_text("# images.txt\n"
                 "1 1 0 0 0 0.5 0.5 0.5 1 a.png\n"
                 "\n"
                 "2 0 1 0 0 1.5 1.5 1.5 1 b.png\n"
                 "1.0 2.0 7 3.0 4.0 9\n")
    ims = read_extrinsics_text(str(p))
    assert ims[1].name == "a.png" and len(ims[1].point3D_ids) == 0
    assert ims[2].name == "b.png" and list(ims[2].point3D_ids) == [7, 9]
    np.testing.assert_allclose(ims[2].tvec, [1.5, 1.5, 1.5])


def test_scene_missing_checkpoints_raises(tmp_path):
    """Scene(load_iteration=-1) with no iteration_* checkpoints must FAIL,
    not silently re-initialize a random table that looks trained."""
    import pytest

    from segsplat_tpu.scene import Scene

    with pytest.raises(FileNotFoundError, match="no point_cloud"):
        Scene(str(tmp_path / "nonexistent_src"), str(tmp_path / "model"),
              load_iteration=-1)


def test_default_max_steps_off_center_principal_point():
    """An off-center principal point lengthens the worst-case corner ray;
    the step bound must grow accordingly (regression: centered assumption
    made edge rays stop short of depth_max and report misses)."""
    from segsplat_tpu.ops.lift import default_max_steps

    centered = default_max_steps(640, 480, 500.0, 500.0, 0.01, 10.0, 0.02,
                                 cx=320, cy=240)
    off = default_max_steps(640, 480, 500.0, 500.0, 0.01, 10.0, 0.02,
                            cx=500, cy=240)
    assert off > centered
    # default (no cx/cy) equals the centered assumption
    assert default_max_steps(640, 480, 500.0, 500.0, 0.01, 10.0,
                             0.02) == centered


def test_single_prompt_confidence_map():
    """A 1-prompt query has no runner-up: margin is 1.0, not a partition
    crash (regression: np.partition kth=-2 on a size-1 axis)."""
    from segsplat_tpu.pipeline.render_semantics import confidence_from_logits

    c = confidence_from_logits(np.random.default_rng(0).random((1, 6, 7)),
                               axis=0)
    assert c.shape == (6, 7) and (c == 1.0).all()
