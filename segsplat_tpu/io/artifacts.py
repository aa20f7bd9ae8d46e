"""Stage-artifact I/O: the file contracts between pipeline stages.

The reference's stages communicate through files (SURVEY §1): voxel-feature dumps
``ALL_nonzero_voxel_features_*.pt`` with keys {xyz, avg_feats, voxel_coords}
(aggregate_voxel_features_onthefly.py:379-453), gaussian→voxel maps ``gauss2voxel.npy``,
semantic query results ``gaussian_semantics_*.npz`` with {labels, logits, prompts}
(voxeltoGaussian_logits.py:235), and per-view label dumps ``*_labels.pt``
(render_semantics_logits.py:141-143).

torch (CPU) is used ONLY here, for `.pt` byte-compatibility with the reference; every
artifact also round-trips through `.npz` so the framework runs torch-free.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

try:  # torch-cpu for .pt compatibility only — never on the compute path
    import torch
    _HAS_TORCH = True
except Exception:  # pragma: no cover
    _HAS_TORCH = False


def save_voxel_features(path: str, xyz: np.ndarray, avg_feats: np.ndarray,
                        voxel_coords: np.ndarray) -> None:
    """Save the lifted-feature artifact. .pt matches the reference dict layout
    (aggregate_voxel_features_onthefly.py:379-395: xyz world f32, avg_feats fp16,
    voxel_coords int); .npz uses {pos, feat, coords}."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if path.endswith((".pt", ".pth")):
        if not _HAS_TORCH:
            raise RuntimeError("torch unavailable; save as .npz instead")
        torch.save({
            "xyz": torch.from_numpy(np.asarray(xyz, np.float32)),
            "avg_feats": torch.from_numpy(np.asarray(avg_feats, np.float16)),
            "voxel_coords": torch.from_numpy(np.asarray(voxel_coords, np.int64)),
        }, path)
    else:
        np.savez_compressed(path, pos=np.asarray(xyz, np.float32),
                            feat=np.asarray(avg_feats, np.float16),
                            coords=np.asarray(voxel_coords, np.int64))


def load_voxel_features(path: str) -> Dict[str, np.ndarray]:
    """Load a voxel-feature artifact from .pt/.pth or .npz (tolerant key handling,
    mirroring voxeltoGaussian_logits.py load_voxels:40-54)."""
    if path.endswith((".pt", ".pth")):
        if not _HAS_TORCH:
            raise RuntimeError("torch unavailable; convert to .npz first")
        d = torch.load(path, map_location="cpu", weights_only=False)
        if "xyz" in d and "avg_feats" in d:
            out = {"pos": d["xyz"].float().numpy(), "feat": d["avg_feats"].float().numpy()}
            if "voxel_coords" in d:
                out["coords"] = d["voxel_coords"].numpy()
            return out
        if "pos" in d and "feat" in d:
            return {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
                    for k, v in d.items()}
        raise KeyError(f"{path}: missing voxel keys, found {list(d)}")
    d = np.load(path)
    if "pos" in d and "feat" in d:
        return {k: d[k] for k in d.files}
    raise KeyError(f"{path}: missing voxel keys, found {d.files}")


def save_semantics(path: str, labels: np.ndarray, logits: np.ndarray, prompts) -> None:
    """gaussian_semantics .npz contract (voxeltoGaussian_logits.py:235)."""
    np.savez(path, labels=np.asarray(labels), logits=np.asarray(logits),
             prompts=np.array(list(prompts)))


def load_semantics(path: str) -> Dict[str, np.ndarray]:
    d = np.load(path, allow_pickle=False)
    return {k: d[k] for k in d.files}


def save_label_map(path: str, label_indices: np.ndarray) -> None:
    """Per-view rendered label map, .pt {'label_indices': [H,W]} matching
    render_semantics_logits.py:141-143."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if path.endswith(".pt"):
        if not _HAS_TORCH:
            raise RuntimeError("torch unavailable; save as .npy instead")
        torch.save({"label_indices": torch.from_numpy(np.asarray(label_indices))}, path)
    else:
        np.save(path, np.asarray(label_indices))


def load_label_map(path: str) -> np.ndarray:
    if path.endswith(".pt"):
        if not _HAS_TORCH:
            raise RuntimeError(f"torch unavailable: cannot load {path}")
        d = torch.load(path, map_location="cpu", weights_only=False)
        return d["label_indices"].numpy()
    return np.load(path)


def load_feature_map(path: str) -> np.ndarray:
    """A per-image LSeg feature map [C,H,W] (fp16 .npy, extract_lseg_features.py:95-98)."""
    return np.load(path)


def load_codebook(path: str) -> np.ndarray:
    """The [256,16] identity codebook, from either this framework's
    ``classifier.npz`` (key ``code_book``) or the reference's torch-saved
    ``classifier.pth`` — a raw [256,16] tensor (train_unified_lift.py:295-297,
    437) or the 1×1-Conv2d weight layout [256,16,1,1] it was reshaped from."""
    if path.endswith(".npz"):
        return np.load(path)["code_book"].astype(np.float32)
    if not _HAS_TORCH:
        raise RuntimeError(f"torch unavailable: cannot load {path}")
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):           # state_dict-style {'weight': ...}
        obj = next(iter(obj.values()))
    arr = np.asarray(obj.detach().float().numpy() if hasattr(obj, "detach")
                     else obj, np.float32)
    if arr.ndim == 4:                   # Conv2d weight [K,16,1,1]
        arr = arr[:, :, 0, 0]
    if arr.ndim != 2:
        raise ValueError(f"{path}: expected a [num_classes,16] codebook, "
                         f"got shape {arr.shape}")
    return arr


def find_codebook(model_path: str, iteration: int) -> str:
    """Path of the codebook next to ``point_cloud/iteration_N``: prefers our
    ``classifier.npz``, falls back to the reference's ``classifier.pth`` so
    reference-trained model dirs work unmodified."""
    base = os.path.join(model_path, "point_cloud", f"iteration_{iteration}")
    npz = os.path.join(base, "classifier.npz")
    pth = os.path.join(base, "classifier.pth")
    return npz if os.path.exists(npz) or not os.path.exists(pth) else pth


def save_feature_map(path: str, feats: np.ndarray) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.save(path, np.asarray(feats, np.float16))
