"""Semantic novel-view rendering (stage L6, the FPS-metric path).

Rebuild of voxel_to_gaussian/render_semantics_logits.py: load a trained scene at
an iteration, attach per-Gaussian semantic logits (padded/sliced to 32 channels,
:49-57), rasterize the logit payload per view, argmax → label map, save per view:
``*_labels.pt`` {label_indices}, a palette-colored mask PNG, raw ``*_logits.npy``,
and a confidence-map PNG (top1−top2 softmax margin, logit_confidence_map.py:6-25
— computed in-process instead of the reference's subprocess per view :229-241).

TPU-native: rendering uses the fused Pallas blend kernel (backend="pallas") and
views stream through one compiled program per resolution.
"""

from __future__ import annotations

import os
import warnings
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image

from segsplat_tpu.core.types import NUM_SEMANTIC_CHANNELS
from segsplat_tpu.io.artifacts import load_semantics, save_label_map
from segsplat_tpu.utils.palette import bit_shuffle_palette
from segsplat_tpu.utils.system import mkdir_p


def confidence_from_logits(logits: np.ndarray, axis: int = -1) -> np.ndarray:
    """top1 − top2 softmax probability margin (logit_confidence_map.py:6-25).

    A single-class axis has no runner-up: the margin is the full probability
    mass (1.0 everywhere), not a partition error."""
    x = np.asarray(logits, np.float64)
    if x.shape[axis] == 1:
        return np.ones(np.take(x, 0, axis=axis).shape, np.float32)
    x = x - x.max(axis=axis, keepdims=True)
    p = np.exp(x)
    p /= p.sum(axis=axis, keepdims=True)
    part = np.partition(p, -2, axis=axis)
    top1 = np.take(part, -1, axis=axis)
    top2 = np.take(part, -2, axis=axis)
    return (top1 - top2).astype(np.float32)


def save_confidence_png(path: str, conf: np.ndarray) -> None:
    """Grayscale confidence PNG (the reference also adds a matplotlib colorbar;
    a viridis version is written alongside when matplotlib is available)."""
    Image.fromarray((np.clip(conf, 0, 1) * 255).astype(np.uint8)).save(path)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4))
        im = ax.imshow(conf, cmap="viridis", vmin=0, vmax=1)
        fig.colorbar(im, ax=ax)
        ax.set_title("logit confidence (top1 - top2)")
        fig.savefig(os.path.splitext(path)[0] + "_colorbar.png",
                    bbox_inches="tight", dpi=100)
        plt.close(fig)
    except ImportError:
        pass  # matplotlib is optional; the grayscale PNG above always exists
    except Exception as e:
        warnings.warn(f"colorbar confidence PNG failed for {path}: {e!r}")


def render_semantic_views(table, cameras: Sequence, logits: np.ndarray,
                          out_dir: str, prompts: Optional[Sequence[str]] = None,
                          bg_value: float = 0.0, save_logits: bool = True,
                          backend: str = "pallas",
                          max_tiles_per_axis: int = 6,
                          max_per_tile: int = 256,
                          pair_cap: Optional[int] = None,
                          view_batch: int = 8) -> List[np.ndarray]:
    """Render every camera; write the reference's per-view artifact set.

    table: GaussianTable; cameras: list of core.types.Camera;
    logits: [N, P] per-Gaussian semantic logits (active rows aligned).

    pair_cap: None picks min(N·m², 3M) for the pallas backend — the sorted
    payload gather is the raster's HBM cost (3 × cap × 512 B transient: a
    200k-Gaussian scene at m=8 uncapped compiles to 18.3 GB and OOMs a 16 GB
    v5e; measured in scripts/officescene_scale_run.py). Truncation is NEVER
    silent: frames where num_pairs exceeds the cap (or tiles exceed K) warn.

    view_batch: cameras per jitted dispatch (render_semantics_many lax.scan —
    one compile + one host sync per batch instead of per view).
    """
    import jax.numpy as jnp

    from segsplat_tpu.render import render_semantics_many

    mkdir_p(out_dir)
    n_prompts = logits.shape[1]
    pal = bit_shuffle_palette(max(n_prompts, 1))
    logits32 = jnp.asarray(logits, jnp.float32)
    if pair_cap is None and backend == "pallas":
        pair_cap = min(int(table.xyz.shape[0]) * max_tiles_per_axis ** 2,
                       3_000_000)

    label_maps = []
    for i, sem, aux in render_semantics_many(
            table, cameras, logits32, bg_value=bg_value,
            max_tiles_per_axis=max_tiles_per_axis,
            max_per_tile=max_per_tile, backend=backend,
            pair_cap=pair_cap, view_batch=view_batch):
        npairs = aux.get("num_pairs", 0)
        if pair_cap and npairs > pair_cap:
            print(f"[WARN] view {i}: {npairs} pairs > pair_cap {pair_cap} — "
                  f"deepest pairs dropped; raise pair_cap")
        ovf = aux["tile_overflow"]
        if ovf:
            print(f"[WARN] view {i}: {ovf} pairs beyond per-tile K="
                  f"{max_per_tile} — raise max_per_tile")
        # per-view fetch (~65 MB at 876×584) keeps each device→host transfer
        # under the tunnel-safe bound; sem is a device slice of the batch
        sem_np = np.asarray(sem)[:n_prompts]                      # [P, H, W]
        labels = sem_np.argmax(axis=0).astype(np.int32)
        label_maps.append(labels)

        name = f"{i:05d}"
        save_label_map(os.path.join(out_dir, f"{name}_labels.pt"), labels)
        Image.fromarray(pal[labels]).save(
            os.path.join(out_dir, f"{name}_mask_color.png"))
        if save_logits:
            np.save(os.path.join(out_dir, f"{name}_logits.npy"),
                    sem_np.astype(np.float16))
        conf = confidence_from_logits(sem_np, axis=0)
        save_confidence_png(os.path.join(out_dir, f"{name}_confidence.png"), conf)
        if prompts is not None:
            _save_legend_png(os.path.join(out_dir, f"{name}_legend.png"),
                             labels, pal, prompts)
    return label_maps


def _save_legend_png(path: str, labels: np.ndarray, pal: np.ndarray,
                     prompts: Sequence[str]) -> None:
    """Mask + legend side panel (render_semantics_logits.py:176-222)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.patches as mpatches
        import matplotlib.pyplot as plt

        present = np.unique(labels)
        fig, ax = plt.subplots(figsize=(8, 5))
        ax.imshow(pal[labels])
        ax.axis("off")
        patches = [mpatches.Patch(color=pal[c] / 255.0,
                                  label=prompts[c] if c < len(prompts) else str(c))
                   for c in present]
        ax.legend(handles=patches, loc="center left", bbox_to_anchor=(1.0, 0.5),
                  fontsize=8)
        fig.savefig(path, bbox_inches="tight", dpi=100)
        plt.close(fig)
    except ImportError:
        pass  # matplotlib is optional; labels/mask artifacts always exist
    except Exception as e:
        warnings.warn(f"legend PNG failed for {path}: {e!r}")


def attach_logits_for_table(table, semantics_path: str,
                            allow_random_weights: bool = False) -> np.ndarray:
    """Load gaussian_semantics .npz and align [M, P] logits to the table's active
    rows (render_semantics_logits.py:49-57 pads/slices to 32 channels at raster
    time — render_semantics does that internally). Refuses artifacts tainted
    weights_source=random (io/provenance) unless ``allow_random_weights``."""
    from segsplat_tpu.io.provenance import read_weights_source, require_untainted
    require_untainted(read_weights_source(semantics_path), allow_random_weights,
                      f"semantics {semantics_path}")
    d = load_semantics(semantics_path)
    logits = np.asarray(d["logits"], np.float32)
    n_active = int(np.asarray(table.active).sum())
    if logits.shape[0] != n_active:
        raise ValueError(f"semantics rows {logits.shape[0]} != active gaussians "
                         f"{n_active}")
    full = np.zeros((table.capacity, logits.shape[1]), np.float32)
    full[np.asarray(table.active)] = logits
    return full
