"""Unified-Lift training loop — optax + one jitted train step.

The reference's loop (train_unified_lift.py:287-500): per iteration render one view,
photometric L1+SSIM, identity-feature losses (contrastive / confidence-gated CE vs
Hungarian virtual GT / codebook clustering / norm reg), dual Adam optimizers
(Gaussians with per-group LRs + exp-decay xyz schedule; codebook at 5e-4),
densify/prune every 100 iters until 15k, opacity reset every 3k.

TPU-native differences:
  * the whole step (render fwd+bwd, all losses, both optimizer updates) is ONE
    compiled XLA program; the reference crosses host↔device every iteration for the
    Hungarian match — here it is a jit-safe pure_callback on a [256,256] cost,
  * parameters live in a fixed-capacity GaussianTable (densify via free-slot
    scatter, train/densify.py) instead of tensor reallocation,
  * per-group learning rates via optax.multi_transform over the table pytree,
  * data-parallel multi-view batching via parallel/ (the reference is strictly
    one view per step).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from segsplat_tpu.core.sh import rgb2sh
from segsplat_tpu.core.transforms import get_expon_lr_func, inverse_sigmoid
from segsplat_tpu.core.types import Camera, GaussianTable, NUM_CODEBOOK, NUM_OBJECTS
from segsplat_tpu.ops.knn import knn_mean_sq_dist
from segsplat_tpu.render import render
from segsplat_tpu.train import losses as L
from segsplat_tpu.train.densify import DensifyStats, add_stats


@dataclasses.dataclass
class OptimizationConfig:
    """Hyperparameters, defaults = the reference's OptimizationParams
    (arguments/__init__.py:73-98)."""
    iterations: int = 30_000
    position_lr_init: float = 1.6e-4
    position_lr_final: float = 1.6e-6
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 2.5e-3
    opacity_lr: float = 0.05
    scaling_lr: float = 5e-3
    rotation_lr: float = 1e-3
    codebook_lr: float = 5e-4
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3_000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 2e-4
    min_opacity: float = 0.005
    num_classes: int = 256
    # loss weights (train_unified_lift.py:416)
    w_contrastive: float = 1e-6
    w_cls: float = 1e-4
    w_clustering: float = 1.0
    w_reg: float = 1e-6


class TrainState(NamedTuple):
    table: GaussianTable
    opt_state: Any
    code_book: jax.Array          # [256, 16]
    cls_opt_state: Any
    stats: DensifyStats
    step: jax.Array


def init_table_from_pcd(points: np.ndarray, colors: np.ndarray, capacity: int,
                        max_sh_degree: int = 3, seed: int = 0) -> GaussianTable:
    """create_from_pcd equivalent (gaussian_model.py:136-164): SH-DC from RGB,
    random identity features, scales from 3-NN mean distance, opacity 0.1."""
    n = points.shape[0]
    assert capacity >= n
    t = GaussianTable.empty(capacity, max_sh_degree)
    d2 = np.asarray(knn_mean_sq_dist(jnp.asarray(points, jnp.float32)))
    log_scale = np.log(np.sqrt(np.clip(d2, 1e-7, None)))
    rng = np.random.default_rng(seed)

    def place(base, vals):
        out = np.zeros(base.shape, np.float32)
        out[:n] = vals
        return jnp.asarray(out)

    rot = np.zeros((capacity, 4), np.float32)
    rot[:, 0] = 1.0
    return dataclasses.replace(
        t,
        xyz=place(t.xyz, points),
        features_dc=place(t.features_dc, np.asarray(rgb2sh(colors))[:, None, :]),
        scaling=place(t.scaling, np.repeat(log_scale[:, None], 3, 1)),
        rotation=jnp.asarray(rot),
        opacity=place(t.opacity, np.full((n, 1), float(inverse_sigmoid(0.1)))),
        objects_dc=place(t.objects_dc,
                         np.asarray(rgb2sh(rng.random((n, NUM_OBJECTS))))[:, None, :]),
        active=jnp.asarray(np.arange(capacity) < n),
    )


_PARAM_FIELDS = ("xyz", "features_dc", "features_rest", "scaling", "rotation",
                 "opacity", "objects_dc")


def table_params(table: GaussianTable) -> dict:
    return {f: getattr(table, f) for f in _PARAM_FIELDS}


def with_params(table: GaussianTable, params: dict) -> GaussianTable:
    return dataclasses.replace(table, **params)


def make_optimizer(cfg: OptimizationConfig, spatial_lr_scale: float):
    """Per-group Adam (eps 1e-15) with the Plenoxels xyz schedule
    (training_setup, gaussian_model.py:166-185)."""
    xyz_sched = get_expon_lr_func(
        cfg.position_lr_init * spatial_lr_scale,
        cfg.position_lr_final * spatial_lr_scale,
        lr_delay_mult=cfg.position_lr_delay_mult,
        max_steps=cfg.position_lr_max_steps)

    def adam(lr):
        return optax.chain(optax.scale_by_adam(eps=1e-15),
                           optax.scale_by_learning_rate(lr))

    return optax.multi_transform(
        {
            "xyz": adam(lambda step: xyz_sched(step)),
            "f_dc": adam(cfg.feature_lr),
            "f_rest": adam(cfg.feature_lr / 20.0),
            "opacity": adam(cfg.opacity_lr),
            "scaling": adam(cfg.scaling_lr),
            "rotation": adam(cfg.rotation_lr),
            "obj_dc": adam(cfg.feature_lr),
        },
        {"xyz": "xyz", "features_dc": "f_dc", "features_rest": "f_rest",
         "opacity": "opacity", "scaling": "scaling", "rotation": "rotation",
         "objects_dc": "obj_dc"},
    )


def init_state(table: GaussianTable, cfg: OptimizationConfig,
               spatial_lr_scale: float, seed: int = 0,
               optimizers: Optional[Tuple] = None) -> Tuple[TrainState, Any]:
    if optimizers is not None:
        gauss_opt, cls_opt = optimizers
    else:
        gauss_opt = make_optimizer(cfg, spatial_lr_scale)
        cls_opt = optax.adam(cfg.codebook_lr)
    rng = jax.random.PRNGKey(seed)
    # codebook initialized like a conv kernel (train_unified_lift.py:295-297)
    scale = 1.0 / np.sqrt(NUM_OBJECTS)
    code_book = jax.random.uniform(rng, (NUM_CODEBOOK, NUM_OBJECTS),
                                   minval=-scale, maxval=scale)
    state = TrainState(
        table=table,
        opt_state=gauss_opt.init(table_params(table)),
        code_book=code_book,
        cls_opt_state=cls_opt.init(code_book),
        stats=DensifyStats.zero(table.capacity),
        step=jnp.zeros((), jnp.int32),
    )
    return state, (gauss_opt, cls_opt)


def compute_losses(table: GaussianTable, code_book: jax.Array, camera: Camera,
                   gt_image: jax.Array, gt_obj: jax.Array, bg: jax.Array,
                   rng: jax.Array, cfg: OptimizationConfig,
                   offset: jax.Array, raster_kw: dict,
                   shard_logits=None):
    """Loss pipeline for one view; returns (total, aux dict).

    ``shard_logits`` is an optional hook applied to the [NUM_CODEBOOK, ...]
    codebook-logit tensor — the multi-chip path (parallel/train.py) injects a
    tensor-axis sharding constraint here so the 256-row matmul runs
    column-parallel across the mesh."""
    out = render(table, camera, bg, means2d_offset=offset, **raster_kw)
    image, objects = out["render"], out["render_object"]
    num_pairs = out.get("num_pairs")

    ll1 = L.l1_loss(image, gt_image)
    dssim = 1.0 - L.ssim(image, gt_image)

    r1, _ = jax.random.split(rng)
    contrast, reg = L.contrastive_loss(objects, gt_obj, r1)
    # one [P, NUM_CLUSTERS] one-hot shared by the confidence map and the
    # virtual-GT cost matrix (both reduce per mask id over the same labels)
    lab_oh = L._label_onehot(
        jnp.clip(gt_obj.reshape(-1), 0, L.NUM_CLUSTERS - 1))
    conf = L.confidence_map(objects, gt_obj, onehot=lab_oh)

    # codebook logits on detached features (train_unified_lift.py:371)
    obj_flat = jax.lax.stop_gradient(objects.reshape(NUM_OBJECTS, -1))
    logits = (code_book @ obj_flat).reshape(NUM_CODEBOOK, *gt_obj.shape)
    if shard_logits is not None:
        logits = shard_logits(logits)
    vgt = L.virtual_gt_labels(gt_obj, logits, onehot=lab_oh)
    cls_loss = L.gated_classification_loss(logits, vgt, conf, cfg.num_classes)
    clu_loss = L.clustering_loss(objects, vgt, code_book, conf)

    total = ((1.0 - cfg.lambda_dssim) * ll1 + cfg.lambda_dssim * dssim
             + cfg.w_contrastive * contrast + cfg.w_cls * cls_loss
             + cfg.w_clustering * clu_loss + cfg.w_reg * reg)
    aux = {"l1": ll1, "dssim": dssim, "contrastive": contrast, "cls": cls_loss,
           "clustering": clu_loss, "reg": reg, "total": total,
           "radii": out["radii"], "visible": out["visibility_filter"],
           "psnr": L.psnr(image, gt_image)}
    if num_pairs is not None:
        aux["num_pairs"] = num_pairs
    aux["tile_overflow"] = out["tile_overflow"]
    return total, aux


def make_train_step(cfg: OptimizationConfig, optimizers, raster_kw: Optional[dict] = None):
    """Build the jitted single-view train step."""
    gauss_opt, cls_opt = optimizers
    raster_kw = raster_kw or {}

    @jax.jit
    def train_step(state: TrainState, camera: Camera, gt_image: jax.Array,
                   gt_obj: jax.Array, bg: jax.Array, rng: jax.Array):
        params = table_params(state.table)
        offset = jnp.zeros((state.table.capacity, 2))

        def loss_fn(params, code_book, offset):
            t = with_params(state.table, params)
            return compute_losses(t, code_book, camera, gt_image, gt_obj, bg,
                                  rng, cfg, offset, raster_kw)

        (total, aux), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(params, state.code_book, offset)
        g_params, g_cb, g_off = grads

        updates, opt_state = gauss_opt.update(g_params, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        cb_updates, cls_opt_state = cls_opt.update(g_cb, state.cls_opt_state,
                                                   state.code_book)
        new_cb = optax.apply_updates(state.code_book, cb_updates)

        stats = add_stats(state.stats, g_off, aux["visible"], aux["radii"])
        new_state = TrainState(
            table=with_params(state.table, new_params),
            opt_state=opt_state, code_book=new_cb, cls_opt_state=cls_opt_state,
            stats=stats, step=state.step + 1)
        metrics = {k: aux[k] for k in
                   ("l1", "dssim", "contrastive", "cls", "clustering", "reg",
                    "total", "psnr")}
        if "num_pairs" in aux:
            metrics["num_pairs"] = aux["num_pairs"]
        metrics["tile_overflow"] = aux["tile_overflow"]
        return new_state, metrics

    return train_step


_STEP_CACHE: dict = {}


def cached_train_step(cfg: OptimizationConfig, spatial_lr_scale: float,
                      raster_kw: Optional[dict] = None):
    """Memoized (train_step, optimizers) per config.

    Two separately-jitted train steps with identical programs in one process
    trip a runtime buffer-count error in this jax build (the second executable
    loses its hoisted constants: "Execution supplied 47 buffers but compiled
    program expected 49"); reusing one jitted step per config sidesteps that
    and saves the recompile.
    """
    raster_kw = dict(raster_kw or {})
    key = (dataclasses.astuple(cfg), float(spatial_lr_scale),
           tuple(sorted(raster_kw.items())))
    if key not in _STEP_CACHE:
        gauss_opt = make_optimizer(cfg, spatial_lr_scale)
        cls_opt = optax.adam(cfg.codebook_lr)
        opts = (gauss_opt, cls_opt)
        _STEP_CACHE[key] = (make_train_step(cfg, opts, raster_kw), opts)
    return _STEP_CACHE[key]


def one_up_sh_degree(table: GaussianTable) -> GaussianTable:
    """Raise the active SH degree (capped at max) — every 1000 iters in the
    reference (train_unified_lift.py:339-340)."""
    return dataclasses.replace(
        table, active_sh_degree=jnp.minimum(table.active_sh_degree + 1,
                                            table.max_sh_degree))
