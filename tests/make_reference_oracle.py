#!/usr/bin/env python
"""Generate SECOND-ORACLE golden data by EXECUTING the reference's own CPU
prototype (VERDICT round-2 item #6 — break the builder-oracle circularity).

The reference ships a plain-numpy projection prototype,
``script/debug_checks_scripts/project_lseg_to_voxels.py`` (backproject every
pixel at its depth, nearest-voxel assignment by brute force, mean
aggregation), plus ``colmap_read_utils.py`` (its own COLMAP binary parser).
This script runs THAT code — unmodified except for swapping the four
hard-coded path constants — against a small synthetic scene written by the
framework's COLMAP binary writers, with stub modules standing in for its
display-only dependencies (open3d point-cloud load, tqdm, matplotlib). The
prototype's genuine qvec→R math, K⁻¹ backprojection, nearest-voxel search and
averaging produce the expected outputs, which are committed as
``tests/golden/ref_proto_lift.npz`` and consumed by
``tests/test_reference_oracle.py``.

Run (requires /root/reference mounted):
    python tests/make_reference_oracle.py
"""

from __future__ import annotations

import os
import re
import sys
import tempfile
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_PROTO_DIR = "/root/reference/script/debug_checks_scripts"
OUT = os.path.join(REPO, "tests", "golden", "ref_proto_lift.npz")

H, W, C = 16, 20, 12     # H ≥ 10 so the prototype keeps [H, W, C] layout
N_SIDE = 6               # 6³ = 216 voxels


def build_scene(rng):
    """Synthetic scene: a voxel cube in front of two inward-looking cameras."""
    from segsplat_tpu.core.transforms import rotmat2qvec
    from segsplat_tpu.io.colmap import (ColmapCamera, ColmapImage,
                                        write_extrinsics_binary,
                                        write_intrinsics_binary)

    g = np.stack(np.meshgrid(*[np.arange(N_SIDE)] * 3, indexing="ij"),
                 axis=-1).reshape(-1, 3)
    # jitter breaks exact nearest-voxel ties (a regular grid puts backprojected
    # points equidistant between centers, where f32/f64 argmin order differs)
    vox = (g * 0.25 + np.array([-0.625, -0.625, 1.4])
           + rng.uniform(-0.04, 0.04, g.shape)).astype(np.float64)

    fx = fy = 24.0
    cams = {1: ColmapCamera(id=1, model="PINHOLE", width=W, height=H,
                            params=np.array([fx, fy, W / 2, H / 2]))}
    images = {}
    cam_truth = {}
    for i in range(2):
        ang = 0.25 * (i - 0.5)
        Rwc = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                        [-np.sin(ang), 0, np.cos(ang)]])
        center = np.array([1.2 * np.sin(ang), 0.1 * i, 1.9 - 1.9 * np.cos(ang)])
        tvec = -Rwc @ center
        name = f"img_{i:03d}.jpg"
        images[i + 1] = ColmapImage(
            id=i + 1, qvec=rotmat2qvec(Rwc), tvec=tvec, camera_id=1,
            name=name, xys=np.zeros((0, 2)), point3D_ids=np.zeros(0, np.int64))
        cam_truth[name] = (Rwc, tvec)

    feats = rng.standard_normal((2, H, W, C)).astype(np.float32)
    depth0 = (2.0 + 0.4 * rng.random((H, W))).astype(np.float32)
    return vox, cams, images, cam_truth, feats, depth0


def run_reference_prototype(tmp, vox, cams, images, feats, depth0):
    """Execute the reference script with stub display deps and swapped paths."""
    from segsplat_tpu.io.colmap import (write_extrinsics_binary,
                                        write_intrinsics_binary)

    sparse = os.path.join(tmp, "sparse0")
    featdir = os.path.join(tmp, "lseg_features")
    os.makedirs(sparse), os.makedirs(featdir)
    write_intrinsics_binary(os.path.join(sparse, "cameras.bin"), cams)
    write_extrinsics_binary(os.path.join(sparse, "images.bin"), images)
    for i in range(feats.shape[0]):
        np.save(os.path.join(featdir, f"img_{i:03d}.npy"), feats[i])
    # NB: the prototype's per-pixel-depth branch is unreachable as written —
    # a *_depth.npy in FEATURE_DIR is itself globbed as a feature file and
    # crashes its loop — so the oracle runs the (live) constant-depth path
    vox_ply = os.path.join(tmp, "vox.ply")   # stub maps .ply → .npy on load
    np.save(vox_ply.replace(".ply", ".npy"), vox)
    out_npy = os.path.join(tmp, "voxel_features_out.npy")

    # stub modules: geometry untouched, display-only deps no-op'd
    o3d = types.ModuleType("open3d")
    o3d.io = types.SimpleNamespace(read_point_cloud=lambda p: types.SimpleNamespace(
        points=np.load(p.replace(".ply", ".npy"))))
    tqdm_mod = types.ModuleType("tqdm")
    tqdm_mod.tqdm = lambda x, **k: x
    plt = types.ModuleType("matplotlib.pyplot")
    for fn in ("figure", "hist", "title", "xlabel", "ylabel", "tight_layout",
               "savefig"):
        setattr(plt, fn, lambda *a, **k: None)
    mpl = types.ModuleType("matplotlib")
    mpl.pyplot = plt

    src = open(os.path.join(REF_PROTO_DIR, "project_lseg_to_voxels.py")).read()
    # swap ONLY the four hard-coded path constants
    src = re.sub(r'^VOXEL_PLY = .*$', f'VOXEL_PLY = {vox_ply!r}',
                 src, flags=re.M)
    src = re.sub(r'^FEATURE_DIR = .*$', f'FEATURE_DIR = {featdir!r}',
                 src, flags=re.M)
    src = re.sub(r'^OUTPUT_FEATURES = .*$', f'OUTPUT_FEATURES = {out_npy!r}',
                 src, flags=re.M)
    src = re.sub(r'^COLMAP_SPARSE_DIR = .*$', f'COLMAP_SPARSE_DIR = {sparse!r}',
                 src, flags=re.M)

    saved_mods = dict(sys.modules)
    saved_path = list(sys.path)
    sys.modules.update({"open3d": o3d, "tqdm": tqdm_mod,
                        "matplotlib": mpl, "matplotlib.pyplot": plt})
    sys.path.insert(0, REF_PROTO_DIR)       # its own colmap_read_utils
    try:
        ns = {"__name__": "__ref_proto__", "__file__": "project_lseg_to_voxels.py"}
        exec(compile(src, "reference:project_lseg_to_voxels.py", "exec"), ns)
    finally:
        sys.modules.clear()
        sys.modules.update(saved_mods)
        sys.path[:] = saved_path
    return (np.load(out_npy),
            ns["voxel_feat_count"].copy(),
            {k: (np.asarray(Kk), np.asarray(R), np.asarray(t))
             for k, (Kk, R, t) in ns["img_pose_dict"].items()})


def main():
    if not os.path.isdir(REF_PROTO_DIR):
        raise SystemExit("reference tree not mounted; goldens unchanged")
    rng = np.random.default_rng(42)
    vox, cams, images, cam_truth, feats, depth0 = build_scene(rng)
    with tempfile.TemporaryDirectory() as tmp:
        avg, counts, poses = run_reference_prototype(
            tmp, vox, cams, images, feats, depth0)
    assert counts.sum() == 2 * H * W, "every pixel must land on some voxel"
    assert np.isfinite(avg).all()

    # reference-parsed poses ride along so the test can cross-check our
    # io/colmap loader against the reference's colmap_read_utils parse
    pose_names = sorted(poses)
    np.savez_compressed(
        OUT,
        vox=vox.astype(np.float64), feats=feats, depth0=depth0,
        voxel_feat_avg=avg.astype(np.float32),
        voxel_feat_count=counts.astype(np.int32),
        pose_names=np.array(pose_names),
        pose_K=np.stack([poses[n][0] for n in pose_names]),
        pose_R=np.stack([poses[n][1] for n in pose_names]),
        pose_t=np.stack([poses[n][2].reshape(3) for n in pose_names]),
        qvecs=np.stack([images[i + 1].qvec for i in range(2)]),
        tvecs=np.stack([images[i + 1].tvec for i in range(2)]),
        names=np.array([images[i + 1].name for i in range(2)]))
    print(f"wrote {OUT}: {avg.shape} avg, {int((counts > 0).sum())}/{len(vox)} "
          f"voxels hit")


if __name__ == "__main__":
    main()
