"""Scene facade — the reference's ``Scene`` class (scene/__init__.py:21-100)
rebuilt functionally on io/ + core/ + train/.

Responsibilities kept 1:1: detect COLMAP vs Blender layout, load cameras + point
cloud, persist ``input.ply`` and ``cameras.json`` into the model dir, shuffle the
cameras, create the GaussianTable from the point cloud or load a saved iteration
(``point_cloud/iteration_N/point_cloud.ply``; auto-picked with
search_for_max_iteration when load_iteration=-1).
"""

from __future__ import annotations

import json
import os
import random
from typing import List, Optional

import numpy as np

from segsplat_tpu.core.transforms import fov2focal, get_world2view
from segsplat_tpu.core.types import Camera, GaussianTable
from segsplat_tpu.io.dataset import CameraInfo, SceneInfo, load_scene
from segsplat_tpu.io.ply import load_gaussian_ply, save_gaussian_ply
from segsplat_tpu.utils.system import mkdir_p, search_for_max_iteration


def camera_to_json(idx: int, cam: CameraInfo) -> dict:
    """cameras.json entry (reference utils/camera_utils.py:74-94)."""
    w2c = get_world2view(cam.R, cam.T)
    c2w = np.linalg.inv(w2c)
    pos = c2w[:3, 3]
    rot = c2w[:3, :3]
    return {
        "id": idx,
        "img_name": cam.image_name,
        "width": cam.width,
        "height": cam.height,
        "position": pos.tolist(),
        "rotation": [r.tolist() for r in rot],
        "fy": fov2focal(cam.fov_y, cam.height),
        "fx": fov2focal(cam.fov_x, cam.width),
    }


def to_device_camera(info: CameraInfo, resolution_scale: float = 1.0) -> Camera:
    """CameraInfo → jit-friendly Camera pytree at the loaded resolution."""
    import jax.numpy as jnp

    w = round(info.width / resolution_scale)
    h = round(info.height / resolution_scale)
    return Camera(R=jnp.asarray(info.R, jnp.float32),
                  T=jnp.asarray(info.T, jnp.float32),
                  fov_x=jnp.asarray(info.fov_x, jnp.float32),
                  fov_y=jnp.asarray(info.fov_y, jnp.float32),
                  width=w, height=h)


class Scene:
    """Scene + GaussianTable lifecycle (reference scene/__init__.py)."""

    def __init__(self, source_path: str, model_path: str,
                 images: str = "images", object_dir: str = "object_mask",
                 eval_split: bool = False, shuffle: bool = True,
                 load_iteration: Optional[int] = None,
                 capacity: Optional[int] = None, max_sh_degree: int = 3,
                 seed: int = 0):
        self.model_path = model_path
        self.loaded_iter = None
        self.max_sh_degree = max_sh_degree

        if load_iteration is not None:
            if load_iteration == -1:
                self.loaded_iter = search_for_max_iteration(
                    os.path.join(model_path, "point_cloud"))
                if self.loaded_iter is None:
                    # silently re-initializing here would hand eval/render a
                    # random-init table that LOOKS like a trained model
                    raise FileNotFoundError(
                        f"load_iteration=-1 but no point_cloud/iteration_* "
                        f"checkpoints under {model_path}")
            else:
                self.loaded_iter = load_iteration
            print(f"Loading trained model at iteration {self.loaded_iter}")

        self.info: SceneInfo = load_scene(source_path, images=images,
                                          eval_split=eval_split,
                                          object_dir=object_dir)
        self.cameras_extent = self.info.nerf_normalization["radius"]

        if not self.loaded_iter and model_path:
            mkdir_p(model_path)
            # persist input.ply + cameras.json like the reference (:52-71)
            with open(self.info.ply_path, "rb") as src, \
                    open(os.path.join(model_path, "input.ply"), "wb") as dst:
                dst.write(src.read())
            cams = [camera_to_json(i, c) for i, c in enumerate(
                self.info.train_cameras + self.info.test_cameras)]
            with open(os.path.join(model_path, "cameras.json"), "w") as f:
                json.dump(cams, f)

        self.train_cameras: List[CameraInfo] = list(self.info.train_cameras)
        self.test_cameras: List[CameraInfo] = list(self.info.test_cameras)
        if shuffle:
            rng = random.Random(seed)
            rng.shuffle(self.train_cameras)

        if self.loaded_iter:
            ply = os.path.join(model_path, "point_cloud",
                               f"iteration_{self.loaded_iter}", "point_cloud.ply")
            self.gaussians: GaussianTable = load_gaussian_table(
                ply, max_sh_degree=max_sh_degree, capacity=capacity)
        else:
            from segsplat_tpu.train.trainer import init_table_from_pcd
            xyz = self.info.point_cloud_xyz.astype(np.float32)
            rgb = self.info.point_cloud_rgb.astype(np.float32)
            cap = capacity or int(2 ** np.ceil(np.log2(max(len(xyz) * 4, 1024))))
            self.gaussians = init_table_from_pcd(xyz, rgb, cap,
                                                 max_sh_degree=max_sh_degree,
                                                 seed=seed)

    # ── persistence (reference scene/__init__.py:90-95) ──────────────────────
    def save(self, iteration: int, table: Optional[GaussianTable] = None) -> str:
        table = table if table is not None else self.gaussians
        out_dir = os.path.join(self.model_path, "point_cloud",
                               f"iteration_{iteration}")
        mkdir_p(out_dir)
        path = os.path.join(out_dir, "point_cloud.ply")
        save_gaussian_table(path, table)
        return path

    def get_train_cameras(self) -> List[CameraInfo]:
        return self.train_cameras

    def get_test_cameras(self) -> List[CameraInfo]:
        return self.test_cameras


def table_from_arrays(arrays: dict, capacity: Optional[int] = None,
                      max_sh_degree: int = 3) -> GaussianTable:
    """Build a fixed-capacity GaussianTable from loaded [N,...] arrays, padding
    inactive rows up to ``capacity`` (default: N rounded up ×1.5 for headroom)."""
    import dataclasses as dc

    import jax.numpy as jnp

    n = arrays["xyz"].shape[0]
    cap = capacity or max(int(n * 1.5), 1)
    t = GaussianTable.empty(cap, max_sh_degree)
    r = t.features_rest.shape[1]

    def place(base, vals):
        vals = np.asarray(vals, np.float32)
        out = np.zeros(base.shape, np.float32)
        out[:n] = vals.reshape((n,) + base.shape[1:])
        return jnp.asarray(out)

    fr = arrays["features_rest"]
    if fr.shape[1] < r:
        fr = np.pad(fr, ((0, 0), (0, r - fr.shape[1]), (0, 0)))
    fr = fr[:, :r]
    fields = dict(
        xyz=place(t.xyz, arrays["xyz"]),
        features_dc=place(t.features_dc, arrays["features_dc"]),
        features_rest=place(t.features_rest, fr),
        scaling=place(t.scaling, arrays["scaling"]),
        rotation=place(t.rotation, arrays["rotation"]),
        opacity=place(t.opacity, arrays["opacity"]),
        active=jnp.asarray(np.arange(cap) < n),
        active_sh_degree=jnp.asarray(max_sh_degree, jnp.int32),
    )
    if "objects_dc" in arrays:
        fields["objects_dc"] = place(t.objects_dc, arrays["objects_dc"])
    return dc.replace(t, **fields)


def load_gaussian_table(path: str, max_sh_degree: int = 3,
                        capacity: Optional[int] = None,
                        load_objects: bool = True) -> GaussianTable:
    """load_ply → GaussianTable (restores obj_dc_* identity features, unlike the
    reference's load_ply — SURVEY §5.4 known gap)."""
    arrays = load_gaussian_ply(path, max_sh_degree=max_sh_degree,
                               load_objects=load_objects)
    return table_from_arrays(arrays, capacity=capacity, max_sh_degree=max_sh_degree)


def save_gaussian_table(path: str, table: GaussianTable) -> None:
    """Write only ACTIVE rows in the reference's gaussian-PLY field layout
    (scene/gaussian_model.py:363-397, incl. obj_dc_* identity fields)."""
    active = np.asarray(table.active)
    save_gaussian_ply(
        path,
        xyz=np.asarray(table.xyz)[active],
        features_dc=np.asarray(table.features_dc)[active],
        features_rest=np.asarray(table.features_rest)[active],
        opacity=np.asarray(table.opacity)[active],
        scaling=np.asarray(table.scaling)[active],
        rotation=np.asarray(table.rotation)[active],
        objects_dc=np.asarray(table.objects_dc)[active],
    )
