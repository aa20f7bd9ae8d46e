"""Golden-artifact generator (VERDICT round-1 item #4).

Builds small artifacts in the reference's exact file formats — voxel-feature
.pt, gaussian_semantics .npz, per-view *_labels.pt, header-comment voxel-grid
PLY — from the PURE-NUMPY oracles (tests/oracles.py, literal transcriptions of
the CUDA reference semantics) on a fixed-seed synthetic scene, and freezes
them under tests/golden/.

tests/test_parity_golden.py regenerates the same artifacts through the JAX
framework paths and diffs them with eval/parity.py, proving both the file
contract and numeric bit-closeness every round. Regenerate (only when the
scene definition changes) with:  python tests/make_goldens.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tests.oracles import make_test_scene, oracle_first_hit, oracle_scatter  # noqa: E402

SEED = 42
NUM_VOXELS = 48
GRID_DIM = 8
N_VIEWS = 3
CHANNELS = 6
PROMPTS = ["wall", "chair"]
DEPTH_MIN, DEPTH_MAX = 0.5, 3.0
GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden")


def scene_inputs():
    """Deterministic scene + views + feature maps shared by generator & test."""
    rng = np.random.default_rng(SEED)
    occ, c2w0, intr, origin, vs, W, H = make_test_scene(
        rng, num_voxels=NUM_VOXELS, grid_dim=GRID_DIM, voxel_size=0.1)
    views = []
    for i in range(N_VIEWS):
        a = 0.08 * i
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                                [-np.sin(a), 0, np.cos(a)]], np.float32)
        views.append(c2w)
    feats = rng.random((N_VIEWS, H, W, CHANNELS)).astype(np.float32)
    return occ, np.stack(views), intr, origin, vs, W, H, feats


def id_coords(occ):
    """[num_ids-1, 3] (x, y, z) integer coords indexed by voxel id - 1."""
    nz = np.argwhere(occ)                       # rows (z, y, x)
    ids = occ[nz[:, 0], nz[:, 1], nz[:, 2]]
    coords = np.zeros((ids.max(), 3), np.int32)
    coords[ids - 1] = nz[:, ::-1]
    return coords


def hash_prompt_embeddings(prompts, feat_dim):
    """The framework's deterministic fallback embeddings
    (pipeline/query._encode_prompts hash branch) — recomputed here so golden
    logits don't depend on importing jax."""
    import hashlib

    rngs = [np.random.default_rng(int.from_bytes(
        hashlib.sha256(p.encode()).digest()[:4], "little")) for p in prompts]
    emb = np.stack([r.standard_normal(feat_dim) for r in rngs]).astype(np.float32)
    return emb / np.linalg.norm(emb, axis=1, keepdims=True)


def build_goldens(out_dir=GOLD_DIR):
    from segsplat_tpu.io.artifacts import (save_label_map, save_semantics,
                                           save_voxel_features)
    from segsplat_tpu.io.ply import write_voxel_grid_ply

    os.makedirs(out_dir, exist_ok=True)
    occ, views, intr, origin, vs, W, H, feats = scene_inputs()
    coords = id_coords(occ)
    num_ids = coords.shape[0] + 1
    centers = (origin + coords * vs + vs / 2).astype(np.float32)

    sums = np.zeros((num_ids, CHANNELS), np.float32)
    counts = np.zeros((num_ids,), np.int32)
    hits_all = []
    for i in range(len(views)):
        hits = oracle_first_hit(occ, views[i], intr, origin, vs,
                                DEPTH_MIN, DEPTH_MAX, vs * 0.5, W, H)
        s, c = oracle_scatter(feats[i], hits, num_ids)
        sums += s
        counts += c
        hits_all.append(hits)

    nzm = counts[1:] > 0
    mean = np.zeros_like(sums[1:])
    mean[nzm] = sums[1:][nzm] / counts[1:][nzm, None]

    # 1. voxel-feature artifact (reference contract: {xyz, avg_feats fp16,
    #    voxel_coords (z,y,x)} — aggregate…onthefly.py:379-453)
    save_voxel_features(os.path.join(out_dir, "golden_voxel_features.pt"),
                        xyz=centers[nzm], avg_feats=mean[nzm],
                        voxel_coords=coords[nzm][:, ::-1])

    # 2. semantics artifact: open-vocab scoring of the per-voxel features
    emb = hash_prompt_embeddings(PROMPTS, CHANNELS)
    f = mean[nzm]
    fn = f / (np.linalg.norm(f, axis=1, keepdims=True) + 1e-12)
    logits = np.float32(np.exp(np.log(1 / 0.07))) * (fn @ emb.T)
    labels = logits.argmax(axis=1).astype(np.int64)
    save_semantics(os.path.join(out_dir, "golden_semantics.npz"),
                   labels=labels, logits=logits.astype(np.float32),
                   prompts=PROMPTS)

    # 3. per-view label maps (render_semantics_logits.py *_labels.pt contract):
    #    label of the first-hit voxel per pixel, 255 = miss
    id_to_label = np.full((num_ids,), 255, np.int64)
    id_to_label[1:][nzm] = labels
    for i, hits in enumerate(hits_all):
        save_label_map(os.path.join(out_dir, f"view{i:02d}_labels.pt"),
                       id_to_label[hits])

    # 4. header-comment voxel-grid PLY (minkowski_*_advanced.py contract)
    heat = np.clip(counts[1:] / max(counts.max(), 1), 0, 1)
    cols = np.stack([255 * heat, 64 + 0 * heat, 255 * (1 - heat)],
                    axis=1).astype(np.uint8)
    write_voxel_grid_ply(os.path.join(out_dir, "golden_grid.ply"),
                         centers, cols, float(vs), origin,
                         grid_shape=occ.shape[::-1])
    print(f"[DONE] goldens → {out_dir}")


if __name__ == "__main__":
    build_goldens()
