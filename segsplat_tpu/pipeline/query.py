"""Voxel→Gaussian transfer + open-vocabulary CLIP-text querying (stage L6).

Rebuild of voxel_to_gaussian/voxeltoGaussian_logits.py (subcommands convert /
build_map / query, :350-384), voxeltovoxel_logits.py, and
extract_gaussian_centers.py. The reference's 1-NN map uses a CPU sklearn KDTree in
200k batches (:86-105); ours is an exact chunked distance argmin on the MXU
(ops/knn.nearest_neighbor_index). The label projection (:189-199) is a jitted
features·textᵀ matmul over the whole voxel table at once instead of 10k-row host
batches.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from segsplat_tpu.io.artifacts import (load_semantics, load_voxel_features,
                                       save_semantics, save_voxel_features)
from segsplat_tpu.io.ply import read_ply, write_voxel_grid_ply
from segsplat_tpu.utils.palette import bit_shuffle_palette


def extract_gaussian_centers(ply_path: str, out_path: str) -> np.ndarray:
    """Gaussian checkpoint PLY → mu [M,3] .npy/.npz
    (extract_gaussian_centers.py:15-50)."""
    c = read_ply(ply_path)
    mu = c.xyz().astype(np.float32)
    if out_path.endswith(".npz"):
        np.savez(out_path, mu=mu)
    else:
        np.save(out_path, mu)
    return mu


def load_gaussian_centers(path: str) -> np.ndarray:
    if path.endswith(".npz"):
        d = np.load(path)
        return d["mu"] if "mu" in d else d[d.files[0]]
    if path.endswith(".ply"):
        return read_ply(path).xyz().astype(np.float32)
    return np.load(path)


def convert_pt_to_npz(pt_path: str, out_path: str) -> None:
    """.pt/.pth voxel features → .npz (reference `convert` subcommand)."""
    d = load_voxel_features(pt_path)
    np.savez_compressed(out_path, **d)
    _propagate_provenance(pt_path, out_path, stage="convert")


def _propagate_provenance(src_path: str, out_path: str, stage: str) -> None:
    """Carry the weights-provenance sidecar from ``src_path``'s directory to
    ``out_path``'s (io/provenance: taint must survive format conversions)."""
    import os

    from segsplat_tpu.io.provenance import read_weights_source, write_provenance
    ws = read_weights_source(src_path)
    if ws is not None:
        write_provenance(os.path.dirname(os.path.abspath(out_path)) or ".",
                         ws, stage=stage)


def _check_taint(voxel_features_path: str, allow: bool,
                 strict: bool = False):
    from segsplat_tpu.io.provenance import read_weights_source, require_untainted
    ws = read_weights_source(voxel_features_path)
    require_untainted(ws, allow, f"voxel features {voxel_features_path}",
                      strict=strict)
    return ws


def build_map(voxel_features_path: str, gaussians_path: str, out_path: str,
              batch: int = 200_000) -> np.ndarray:
    """1-NN voxel index per Gaussian center → gauss2voxel.npy
    (voxeltoGaussian_logits.py:86-105)."""
    import jax.numpy as jnp

    from segsplat_tpu.ops.knn import nearest_neighbor_index

    vox = load_voxel_features(voxel_features_path)
    mu = load_gaussian_centers(gaussians_path)
    idx = np.asarray(nearest_neighbor_index(
        jnp.asarray(mu, jnp.float32), jnp.asarray(vox["pos"], jnp.float32)))
    np.save(out_path, idx.astype(np.int64))
    return idx


def query(voxel_features_path: str, map_path: str, gaussians_path: str,
          prompts: Sequence[str], out_path: str,
          text_model=None, logit_scale: float = 1.0 / 0.07,
          save_ply: bool = True, allow_random_weights: bool = False,
          require_provenance: bool = False) -> dict:
    """Open-vocab query: encode prompts with the CLIP text tower, project 512-D
    voxel features to per-label logits, argmax per voxel, gather onto Gaussians
    via the 1-NN map, save .npz {labels, logits, prompts} + colored PLY
    (voxeltoGaussian_logits.py:162-344)."""
    import jax.numpy as jnp

    from segsplat_tpu.models.clip_text import project_features_to_labels

    from segsplat_tpu.pipeline.lift_features import _device_put_bounded

    _check_taint(voxel_features_path, allow_random_weights,
                 strict=require_provenance)
    vox = load_voxel_features(voxel_features_path)
    # bounded transfer: a reference-scale table (~900k×512 f32 ≈ 1.8 GB) in
    # one device_put would kill the tunnel relay (CLAUDE.md, ≤128 MiB rule)
    feats = _device_put_bounded(
        np.asarray(vox["feat"], np.float32))                    # [V, 512]

    text_emb = _encode_prompts(prompts, text_model, feats.shape[-1])
    logits = np.asarray(project_features_to_labels(
        feats, jnp.asarray(text_emb, jnp.float32), logit_scale))  # [V, P]
    voxel_cls = logits.argmax(axis=1).astype(np.int64)

    g2v = np.load(map_path)
    g_labels = voxel_cls[g2v]
    g_logits = logits[g2v]

    save_semantics(out_path, labels=g_labels, logits=g_logits, prompts=prompts)
    _propagate_provenance(voxel_features_path, out_path, stage="query")
    if save_ply:
        mu = load_gaussian_centers(gaussians_path)   # only the PLY needs it
        pal = bit_shuffle_palette(max(len(prompts), 1))
        base = os.path.splitext(out_path)[0]
        write_voxel_grid_ply(base + "_gaussians.ply", mu, pal[g_labels],
                             voxel_size=0.0, grid_origin=np.zeros(3))
        write_voxel_grid_ply(base + "_voxels.ply", np.asarray(vox["pos"]),
                             pal[voxel_cls], voxel_size=0.0,
                             grid_origin=np.zeros(3))
    return {"labels": g_labels, "logits": g_logits, "voxel_labels": voxel_cls}


def query_voxels(voxel_features_path: str, prompts: Sequence[str],
                 out_path: str, text_model=None,
                 logit_scale: float = 1.0 / 0.07,
                 allow_random_weights: bool = False,
                 require_provenance: bool = False) -> dict:
    """Voxel-level variant (voxeltovoxel_logits.py:138-291): labels stay on
    voxels, no Gaussian map."""
    import jax.numpy as jnp

    from segsplat_tpu.models.clip_text import project_features_to_labels

    from segsplat_tpu.pipeline.lift_features import _device_put_bounded

    _check_taint(voxel_features_path, allow_random_weights,
                 strict=require_provenance)
    vox = load_voxel_features(voxel_features_path)
    feats = _device_put_bounded(np.asarray(vox["feat"], np.float32))
    text_emb = _encode_prompts(prompts, text_model, feats.shape[-1])
    logits = np.asarray(project_features_to_labels(
        feats, jnp.asarray(text_emb, jnp.float32), logit_scale))
    labels = logits.argmax(axis=1).astype(np.int64)
    save_semantics(out_path, labels=labels, logits=logits, prompts=prompts)
    _propagate_provenance(voxel_features_path, out_path, stage="query_voxels")
    pal = bit_shuffle_palette(max(len(prompts), 1))
    write_voxel_grid_ply(os.path.splitext(out_path)[0] + "_voxels.ply",
                         np.asarray(vox["pos"]), pal[labels],
                         voxel_size=0.0, grid_origin=np.zeros(3))
    return {"labels": labels, "logits": logits}


def _encode_prompts(prompts: Sequence[str], text_model, feat_dim: int):
    """Prompt → [P, D] embeddings via the CLIP text tower; a deterministic
    hash-projection fallback keeps the pipeline runnable without converted
    weights (clearly logged — logits are then NOT semantically meaningful)."""
    if text_model is not None:
        return np.asarray(text_model.encode_prompts(prompts))
    from segsplat_tpu.models.clip_text import TextTower
    from segsplat_tpu.models.tokenizer import get_tokenizer

    try:
        from segsplat_tpu.models.tokenizer import HashTokenizer
        tower = TextTower()
        tok = get_tokenizer()
        # TextTower() without params RANDOM-initializes and get_tokenizer
        # silently hash-falls-back — both "succeed" while producing
        # meaningless embeddings; route to the loudly-warned fallback
        if tower.random_init or isinstance(tok, HashTokenizer):
            raise ValueError("no converted CLIP text weights / BPE merges "
                             "available")
        emb = np.asarray(tower.encode(tok(list(prompts))))
        if emb.shape[-1] != feat_dim:
            raise ValueError(f"text dim {emb.shape[-1]} != feature dim {feat_dim}")
        return emb
    except Exception as e:  # pragma: no cover
        print(f"[WARN] CLIP text tower unavailable ({e}); using deterministic "
              f"hash embeddings — labels will not be semantically meaningful")
        import hashlib
        # stable digest (NOT built-in hash(), which is salted per process via
        # PYTHONHASHSEED and would break artifact reproducibility)
        rngs = [np.random.default_rng(int.from_bytes(
            hashlib.sha256(p.encode()).digest()[:4], "little"))
            for p in prompts]
        emb = np.stack([r.standard_normal(feat_dim) for r in rngs]).astype(np.float32)
        return emb / np.linalg.norm(emb, axis=1, keepdims=True)


LERF_NEGATIVES = ("object", "things", "stuff", "texture")


def text_query_mask(feature_map: np.ndarray, prompt: str,
                    negatives: Sequence[str] = LERF_NEGATIVES,
                    threshold: float = 0.5,
                    channels_first: bool = False,
                    text_model=None) -> np.ndarray:
    """LSeg-native text grounding — the in-framework replacement for the
    reference's GroundingDINO+SAM frame-0 query (ext/grounded_sam.py:58-115,
    consumed at render_lerf_mask_unified_lift.py:71-78): score per-pixel LSeg
    features against the prompt vs the canonical LERF negative prompts and
    threshold the prompt's softmax relevancy.

    feature_map: [H, W, C] LSeg features for the query view ([C, H, W] with
    ``channels_first=True`` — the layout extract_lseg_features writes).
    Returns a boolean [H, W] mask.
    """
    import jax
    import jax.numpy as jnp

    f = np.asarray(feature_map, np.float32)
    if f.ndim != 3:
        raise ValueError(f"feature map must be 3D, got {f.shape}")
    if channels_first:                  # [C, H, W] → [H, W, C]
        f = np.transpose(f, (1, 2, 0))
    emb = _encode_prompts([prompt, *negatives], text_model, f.shape[-1])
    emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-12)

    @jax.jit
    def relevancy(feats, text):
        n = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-12)
        logits = 100.0 * jnp.einsum("hwc,pc->hwp", n, text)
        # canonical LERF relevancy: min over per-negative PAIRWISE softmaxes
        # softmax([s_p, s_ni])[0] = sigmoid(s_p - s_ni), minimized at the
        # hardest negative — NOT one (P+1)-way softmax, whose score dilutes
        # with the negative count and shifts the threshold semantics
        return jax.nn.sigmoid(logits[..., 0]
                              - jnp.max(logits[..., 1:], axis=-1))

    from segsplat_tpu.pipeline.lift_features import _device_put_bounded
    rel = np.asarray(relevancy(_device_put_bounded(f), jnp.asarray(emb)))
    return rel > threshold
