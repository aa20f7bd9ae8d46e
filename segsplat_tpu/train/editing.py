"""Object editing on the GaussianTable — rebuild of the Gaussian-Grouping-inherited
editing setups (scene/gaussian_model.py:187-353): removal, inpainting
initialization, and masked finetuning, plus the 3D object-selection helpers their
shell workflows use (ext/grounded_sam.py:102-115 select_obj_ioa and the codebook
classification of edit_object_removal).

TPU-native form: the reference mutates nn.Parameters and registers gradient
hooks; here every edit is a pure table→table function, and "frozen rows" are a
gradient MASK applied inside the train step (the hook equivalent under jit).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

from segsplat_tpu.core.types import GaussianTable


def classify_gaussians(table: GaussianTable, code_book) -> np.ndarray:
    """Per-Gaussian class id: argmax codebook logits over the 16-D identity
    features (edit_object_removal's selection path; the rendered-feature
    classifier of train_unified_lift.py:371 applied per Gaussian)."""
    import jax.numpy as jnp

    obj = jnp.asarray(table.objects_dc)[:, 0, :]          # [C,16]
    logits = obj @ jnp.asarray(code_book).T               # [C,256]
    return np.asarray(jnp.argmax(logits, axis=1))


def mask3d_from_classes(table: GaussianTable, code_book,
                        selected_ids: Sequence[int]) -> np.ndarray:
    """[capacity] bool — rows whose identity class is in selected_ids."""
    cls = classify_gaussians(table, code_book)
    sel = np.isin(cls, np.asarray(list(selected_ids)))
    return sel & np.asarray(table.active)


def removal_setup(table: GaussianTable, mask3d: np.ndarray) -> GaussianTable:
    """Remove selected Gaussians (removal_setup, gaussian_model.py:222-248):
    deactivate masked rows. The reference physically drops rows; the
    fixed-capacity table clears ``active`` — renders identically and the next
    save_gaussian_table writes only live rows."""
    import jax.numpy as jnp

    keep = np.asarray(table.active) & ~np.asarray(mask3d, bool)
    return dataclasses.replace(table, active=jnp.asarray(keep))


def inpaint_setup(table: GaussianTable, mask3d: np.ndarray,
                  num_new_points: Optional[int] = None, k: int = 5,
                  seed: int = 0) -> Tuple[GaussianTable, np.ndarray]:
    """Remove masked Gaussians and seed replacements around the hole
    (inpaint_setup, gaussian_model.py:250-330): new points sample positions
    inside the removed region with features copied from the k nearest REMAINING
    Gaussians (KD-tree lookup). Returns (table, new_row_mask) — the new rows are
    the trainable set for finetune."""
    import jax.numpy as jnp
    from scipy.spatial import cKDTree

    act = np.asarray(table.active)
    sel = np.asarray(mask3d, bool) & act
    keep = act & ~sel
    if num_new_points is None:
        num_new_points = int(sel.sum())

    xyz = np.asarray(table.xyz)
    hole_xyz = xyz[sel]
    rng = np.random.default_rng(seed)
    if num_new_points == 0 or len(hole_xyz) == 0 or keep.sum() == 0:
        return removal_setup(table, mask3d), np.zeros(table.capacity, bool)
    qi = rng.integers(0, len(hole_xyz), num_new_points)
    query = hole_xyz[qi] + rng.normal(0, 0.01, (num_new_points, 3))

    kdt = cKDTree(xyz[keep])
    _, nbr = kdt.query(query, k=min(k, int(keep.sum())))
    # k=1 returns a flat (N,) array; atleast_2d would make it (1,N) and the
    # row-indexed pick below would go out of bounds — reshape per query row
    nbr = np.asarray(nbr).reshape(len(query), -1)
    keep_rows = np.flatnonzero(keep)
    # copy each new point's features from one random neighbor (the reference
    # samples among the k nearest, :275-305)
    pick = nbr[np.arange(num_new_points), rng.integers(0, nbr.shape[1],
                                                       num_new_points)]
    src_rows = keep_rows[pick]

    free = np.flatnonzero(~keep)[:num_new_points]
    n_new = len(free)

    def place(field, new_xyz=None):
        arr = np.asarray(getattr(table, field)).copy()
        arr[free] = np.asarray(new_xyz if new_xyz is not None
                               else arr[src_rows[:n_new]])
        return jnp.asarray(arr)

    new_active = keep.copy()
    new_active[free] = True
    new_mask = np.zeros(table.capacity, bool)
    new_mask[free] = True
    t = dataclasses.replace(
        table,
        xyz=place("xyz", query[:n_new].astype(np.float32)),
        features_dc=place("features_dc"),
        features_rest=place("features_rest"),
        scaling=place("scaling"),
        rotation=place("rotation"),
        opacity=place("opacity"),
        objects_dc=place("objects_dc"),
        active=jnp.asarray(new_active))
    return t, new_mask


def finetune_grad_mask(trainable_rows: np.ndarray):
    """Gradient mask for masked finetuning (finetune_setup's register_hook,
    gaussian_model.py:187-205): multiply every per-row parameter gradient by the
    mask; identity features stay frozen. Returns a callable — use as
    ``mask_fn = finetune_grad_mask(rows); grads = mask_fn(grads)`` inside the
    step (see scripts/edit_object_inpaint.py:_finetune)."""
    import jax.numpy as jnp

    mask = jnp.asarray(np.asarray(trainable_rows, np.float32))

    def apply(g_params: dict) -> dict:
        out = {}
        for k, g in g_params.items():
            if k == "objects_dc":
                out[k] = jnp.zeros_like(g)      # requires_grad=False equivalent
            else:
                m = mask.reshape((mask.shape[0],) + (1,) * (g.ndim - 1))
                out[k] = g * m
        return out

    return apply


def select_obj_ioa(pred_masks: np.ndarray, sam_mask: np.ndarray,
                   threshold: float = 0.7) -> list:
    """Class ids whose rendered mask is mostly inside the SAM text mask
    (intersection-over-area > 0.7, ext/grounded_sam.py:102-115).

    pred_masks: [H, W] int class-id map; sam_mask: [H, W] bool/0-1."""
    sam = np.asarray(sam_mask) > 0
    out = []
    for cid in np.unique(pred_masks):
        m = pred_masks == cid
        area = m.sum()
        if area == 0:
            continue
        if (m & sam).sum() / area > threshold:
            out.append(int(cid))
    return out
