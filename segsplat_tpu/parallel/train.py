"""Multi-chip Unified-Lift training: view-batch data parallelism + codebook tensor
parallelism over a (view, tensor) mesh.

The reference trains one view per iteration on one GPU (train_unified_lift.py:341-355).
The TPU-native step renders a *minibatch* of views per iteration:

  * the view batch (cameras, GT images, GT object masks, RNG) is sharded over the
    mesh ``view`` axis; every chip renders + differentiates its own views and XLA
    psum-reduces the parameter gradients over ICI (data parallelism),
  * the 256-row codebook-logit matmul ``code_book @ objects`` (train_unified_lift.py:371)
    carries a sharding constraint splitting the codebook axis over the mesh
    ``tensor`` axis (Megatron-style column parallelism); XLA inserts the gather
    where the Hungarian matching needs full rows,
  * Gaussian parameters, optimizer state, and codebook stay replicated — the
    GaussianTable is small next to activations (a 1M-Gaussian table is ~250 MB;
    one 1168×1752 render's tile activations dominate).

Losses are averaged over the view batch, so a B-view step approximates B reference
iterations with a B×-larger effective batch (the standard DP semantics change,
documented rather than hidden).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from segsplat_tpu.core.types import Camera, GaussianTable
from segsplat_tpu.parallel.mesh import TENSOR_AXIS, VIEW_AXIS, replicated, view_sharding
from segsplat_tpu.train.densify import DensifyStats
from segsplat_tpu.train.trainer import (OptimizationConfig, TrainState,
                                        compute_losses, table_params, with_params)


def make_parallel_train_step(cfg: OptimizationConfig, optimizers, mesh: Mesh,
                             raster_kw: Optional[dict] = None):
    """Build the jitted multi-view train step.

    The returned function takes (state, cameras, gt_images, gt_objs, bg, rngs)
    where cameras is a batched Camera pytree and gt_images/gt_objs/rngs carry a
    leading view-batch axis divisible by mesh.shape[view].
    """
    gauss_opt, cls_opt = optimizers
    raster_kw = raster_kw or {}
    # a second, nearly-identical sharded step in one process can collide with
    # the first program's cached executable ("Execution supplied N buffers
    # but compiled program expected N+2" — the hoisted-constant pitfall of
    # trainer.cached_train_step, which memoization can't cover here because
    # the mesh differs); building a parallel step is a once-per-run event, so
    # drop stale executables instead
    jax.clear_caches()

    def shard_logits(x):
        # [NUM_CODEBOOK, ...] per view (inside vmap): split the codebook axis
        spec = P(*([TENSOR_AXIS] + [None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    batch_sh = view_sharding(mesh)
    repl = replicated(mesh)

    def per_view_loss(params, code_book, offset, camera, gt_image, gt_obj, bg, rng,
                      template: GaussianTable):
        t = with_params(template, params)
        return compute_losses(t, code_book, camera, gt_image, gt_obj, bg, rng,
                              cfg, offset, raster_kw, shard_logits=shard_logits)

    # donation is disabled on the CPU backend: constant-folded outputs there
    # can alias the executable's lifted constants, and donating them back on
    # the next call drops the constants from the supplied buffers ("Execution
    # supplied N buffers but compiled program expected N+2"). TPU keeps
    # donation (in-place state updates matter at scene scale).
    donate = (0,) if jax.default_backend() != "cpu" else ()

    @partial(jax.jit, donate_argnums=donate)
    def train_step(state: TrainState, cameras: Camera, gt_images: jax.Array,
                   gt_objs: jax.Array, bg: jax.Array, rngs: jax.Array):
        params = table_params(state.table)
        offset = jnp.zeros((state.table.capacity, 2))

        def loss_fn(params, code_book, offset):
            totals, auxs = jax.vmap(
                per_view_loss, in_axes=(None, None, None, 0, 0, 0, None, 0, None)
            )(params, code_book, offset, cameras, gt_images, gt_objs, bg, rngs,
              state.table)
            aux = {k: (v if k in ("radii", "visible")
                       # worst view for the cap/overflow warnings
                       else jnp.max(v) if k in ("num_pairs", "tile_overflow")
                       else jnp.mean(v))
                   for k, v in auxs.items()}
            return jnp.mean(totals), aux

        (_, aux), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(params, state.code_book, offset)
        g_params, g_cb, g_off = grads

        updates, opt_state = gauss_opt.update(g_params, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        cb_updates, cls_opt_state = cls_opt.update(g_cb, state.cls_opt_state,
                                                   state.code_book)
        new_cb = optax.apply_updates(state.code_book, cb_updates)

        # densify stats: the loss is a MEAN over the view batch, so autodiff
        # hands us (1/B)·Σ_v g_v — undo the mean so a Gaussian visible in one
        # of B views keeps its full per-view screengrad (the reference
        # accumulates one view per iteration; averaging under-triggered
        # densification by up to B×). The denominator counts per-view
        # visibility like B reference iterations would. Remaining
        # approximation: ‖Σ_v g_v‖ ≤ Σ_v ‖g_v‖ (direction cancellation
        # across views); exact for single-view visibility and B=1.
        B = gt_images.shape[0]
        vis_count = jnp.sum(aux["visible"].astype(jnp.float32), axis=0)
        visible = vis_count > 0
        radii = jnp.max(aux["radii"], axis=0)
        g = jnp.linalg.norm((g_off * B)[:, :2], axis=-1)
        stats = DensifyStats(
            grad_accum=state.stats.grad_accum + g * visible,
            denom=state.stats.denom + vis_count,
            max_radii=jnp.maximum(state.stats.max_radii, radii * visible))
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

    def place_batch(cameras: Camera, gt_images, gt_objs, rngs):
        """Device_put the view batch with view-axis sharding, everything else
        replicated (call once per step; cheap for host-resident batches)."""
        cams = jax.device_put(cameras, batch_sh)
        return (cams, jax.device_put(gt_images, batch_sh),
                jax.device_put(gt_objs, batch_sh), jax.device_put(rngs, batch_sh))

    train_step.place_batch = place_batch
    # materialize fresh unaliased buffers before replicating: deduped/shared
    # leaves (zero-init optimizer moments, stats) break the donated step's
    # buffer-count contract ("Execution supplied N buffers but compiled
    # program expected N+2") — same pitfall as trainer.load_checkpoint
    train_step.replicate = lambda state: jax.device_put(
        jax.tree.map(jnp.array, state), repl)
    return train_step
