"""Unified-Lift training orchestration (stage L3).

Rebuild of train_unified_lift.py:287-586: the per-iteration loop (render +
photometric & identity losses + dual optimizers) is ONE jitted program
(train/trainer.py — incl. the Hungarian virtual-GT matching, solved on device by
ops/assignment instead of a host scipy round-trip per iteration :258-260);
this module orchestrates the host-side schedule around it:

  * random camera order per epoch (:341-345),
  * SH-degree bump every 1000 iters (:339-340),
  * densify/prune every ``densification_interval`` in
    [densify_from_iter, densify_until_iter] with Adam-moment zeroing — the
    optimizer-state surgery of gaussian_model.py:469-604 in mask form,
  * opacity reset every ``opacity_reset_interval``,
  * snapshots ``point_cloud/iteration_N/point_cloud.ply`` + ``classifier.npz``
    (the codebook — the reference's classifier.pth) at test iterations,
  * full resumable checkpoints (table + both optimizer states + codebook) via
    orbax at ``chkpnts/`` (:498-500),
  * metrics stream to ``metrics.jsonl`` (the reference hard-enables wandb
    :569-574; we log locally and attach wandb only if importable+configured).

Multi-view data-parallel training: with ``TrainRunConfig.view_batch`` B > 1,
each iteration renders B distinct views through
parallel/train.make_parallel_train_step over a (view, tensor) device mesh
(view axis = all divisible devices by default) — gradients psum over ICI and
losses average over the batch, so one step approximates B reference
iterations with a B×-larger effective batch. ``view_batch=1`` keeps the
reference's exact one-view-per-iteration semantics on a single chip.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional, Sequence

import numpy as np

from segsplat_tpu.scene import Scene, save_gaussian_table, to_device_camera
from segsplat_tpu.train.densify import (densify_and_prune, reset_opacity,
                                        zero_adam_rows)
from segsplat_tpu.train.trainer import (OptimizationConfig, TrainState,
                                        cached_train_step, init_state,
                                        one_up_sh_degree)
from segsplat_tpu.utils.system import mkdir_p


@dataclasses.dataclass
class TrainRunConfig:
    iterations: int = 30_000
    test_iterations: tuple = (7_000, 30_000)
    save_iterations: tuple = (7_000, 30_000)
    checkpoint_iterations: tuple = (30_000,)
    white_background: bool = False
    resolution: int = -1
    num_classes: int = 256
    sh_up_every: int = 1_000
    log_every: int = 10
    seed: int = 0
    raster_max_tiles_per_axis: int = 8
    raster_max_per_tile: int = 256  # 0 → auto-size from measured per-tile
    #                                 pair depth (see _resolve_auto_max_per_tile)
    raster_tile_chunk: int = 64
    raster_backend: str = "auto"   # auto → pallas custom-VJP kernel on TPU,
    #                                differentiable XLA blend elsewhere
    raster_pair_cap: int = 0       # >0: cap sorted raster pairs (speed knob;
    #                                num_pairs is logged, overflow warns)
    view_batch: int = 1            # views per iteration; >1 → SPMD data-parallel
    mesh_tensor: int = 1           # tensor-axis size for the codebook sharding
    mesh_view: int = 0             # view-axis size (0 = auto: largest device
    #                                count dividing view_batch)


def _resolve_auto_max_per_tile(scene, table, run, n_probe: int = 3,
                               coverage: float = 0.995,
                               densify_margin: float = 2.0,
                               lo: int = 256, hi: int = 4096) -> int:
    """Auto-size the per-tile blend K from MEASURED binning statistics
    (VERDICT r4 #2; the reference blends unbounded per-tile lists,
    gaussian_renderer/__init__.py:85-120, so it has no such knob).

    Probes ``n_probe`` evenly-spaced training views of the INITIAL table
    with ops/rasterize.tile_depth_counts and takes the smallest K whose
    truncation keeps ``coverage`` of all pairs, then multiplies by
    ``densify_margin`` (densification deepens dense tiles over training —
    the hard scene's overflow only appears after the densify phase),
    rounds up to the 128-lane Pallas quantum and clips to [lo, hi]. The
    per-iteration overflow warning still fires if training outgrows the
    probe, so the cap is measured at start AND observed throughout."""
    from segsplat_tpu.io.dataset import resolution_scale_for
    from segsplat_tpu.ops.rasterize import tile_depth_counts

    cams = scene.get_train_cameras()
    if not cams:
        return lo
    scale = resolution_scale_for(cams[0].width, cams[0].height,
                                 run.resolution)
    idx = np.unique(np.linspace(0, len(cams) - 1,
                                min(n_probe, len(cams))).astype(int))
    k_needed = 1
    for i in idx:
        dc = to_device_camera(cams[i], scale)
        K = dc.intrinsics()
        counts = np.asarray(tile_depth_counts(
            table.xyz, table.get_scaling(), table.get_rotation(),
            dc.world_view_transform(), K[0, 0], K[1, 1], K[0, 2], K[1, 2],
            dc.width, dc.height, run.raster_max_tiles_per_axis))
        total = int(counts.sum())
        if total == 0:
            continue
        ks = np.unique(counts)
        kept = np.minimum(counts[None, :], ks[:, None]).sum(axis=1)
        k_view = int(ks[np.searchsorted(kept, coverage * total)])
        k_needed = max(k_needed, k_view)
    cap = int(np.ceil(k_needed * densify_margin / 128.0)) * 128
    return int(min(max(cap, lo), hi))


def train(source_path: str, model_path: str,
          opt: Optional[OptimizationConfig] = None,
          run: Optional[TrainRunConfig] = None,
          images: str = "images", object_dir: str = "object_mask",
          eval_split: bool = False, capacity: Optional[int] = None,
          start_checkpoint: Optional[str] = None,
          progress_cb=None, gui=None) -> TrainState:
    import jax
    import jax.numpy as jnp

    opt = opt or OptimizationConfig()
    run = run or TrainRunConfig()
    if run.num_classes != opt.num_classes:
        # run config wins, but never mutate the caller's dataclass in place
        # (a shared opt instance is also the cached_train_step key)
        import dataclasses as _dc
        opt = _dc.replace(opt, num_classes=run.num_classes)

    scene = Scene(source_path, model_path, images=images, object_dir=object_dir,
                  eval_split=eval_split, capacity=capacity, seed=run.seed)
    table = scene.gaussians
    if run.raster_max_per_tile <= 0:
        cap = _resolve_auto_max_per_tile(scene, table, run)
        print(f"[INFO] auto max_per_tile={cap} (probed per-tile pair depth "
              f"x densify margin; overflow warnings still surface)")
        run = dataclasses.replace(run, raster_max_per_tile=cap)
    backend = run.raster_backend
    if backend == "auto":
        import jax as _jax
        backend = "xla" if _jax.default_backend() == "cpu" else "pallas"
        if backend == "pallas" and run.raster_max_per_tile % 128 != 0:
            backend = "xla"
    raster_kw = dict(max_tiles_per_axis=run.raster_max_tiles_per_axis,
                     max_per_tile=run.raster_max_per_tile,
                     tile_chunk=run.raster_tile_chunk, backend=backend)
    if run.raster_pair_cap and backend == "pallas":
        # static truncation of the sorted pair list — exact while it covers
        # the frame's real pair count (logged per step as num_pairs; a cap
        # below it silently drops the deepest pairs AND their gradients, so
        # the loop warns). ~25% step speedup at officescene scale (228→182ms)
        raster_kw["pair_cap"] = run.raster_pair_cap
    step_fn, optimizers = cached_train_step(opt, scene.cameras_extent, raster_kw)
    state, _ = init_state(table, opt, spatial_lr_scale=scene.cameras_extent,
                          seed=run.seed, optimizers=optimizers)

    parallel_step = None
    if run.view_batch > 1:
        from segsplat_tpu.parallel.mesh import make_mesh
        from segsplat_tpu.parallel.train import make_parallel_train_step
        n_dev = len(jax.devices()) // run.mesh_tensor
        # largest device count that divides the view batch
        n_view = run.mesh_view or next(
            d for d in range(n_dev, 0, -1) if run.view_batch % d == 0)
        mesh = make_mesh(n_view=n_view, n_tensor=run.mesh_tensor,
                         devices=jax.devices()[:n_view * run.mesh_tensor])
        parallel_step = make_parallel_train_step(opt, optimizers, mesh,
                                                 raster_kw)
        print(f"[INFO] data-parallel training: view_batch={run.view_batch} "
              f"over mesh view={n_view} tensor={run.mesh_tensor}")

    if start_checkpoint:
        state = load_checkpoint(start_checkpoint, state)
        print(f"[INFO] resumed from {start_checkpoint} at step {int(state.step)}")

    cams = scene.get_train_cameras()
    if not cams:
        raise RuntimeError("no training cameras")
    # preload GT images/masks once (host RAM), device cameras per resolution
    from segsplat_tpu.io.dataset import resolution_scale_for
    scale = resolution_scale_for(cams[0].width, cams[0].height, run.resolution)
    gt_images, gt_objs, device_cams = [], [], []
    for c in cams:
        img = c.load_image(scale)                          # [H,W,3]
        gt_images.append(np.transpose(img, (2, 0, 1)))
        obj = c.load_objects(scale)
        gt_objs.append(obj if obj is not None
                       else np.zeros(img.shape[:2], np.int32))
        device_cams.append(to_device_camera(c, scale))

    if parallel_step is not None and len({g.shape for g in gt_images}) > 1:
        print("[WARN] view_batch>1 requires uniform camera resolutions; "
              "falling back to single-view steps")
        parallel_step = None

    bg = jnp.ones((3,)) if run.white_background else jnp.zeros((3,))
    if parallel_step is not None:
        # replicate ONLY once we know the parallel step survives the
        # uniform-resolution check — a mesh-committed state fed to the
        # single-view step_fn raises 'incompatible devices'. Covers both the
        # fresh init and a loaded checkpoint's uncommitted leaves (feeding
        # those to the donated SPMD step would let GSPMD pick shardings).
        state = parallel_step.replicate(state)
        # commit bg replicated: left uncommitted, GSPMD may choose a padded
        # view-partition of the 3-vector that the second call's argument
        # resharding path cannot represent (mesh-divisibility ValueError)
        bg = parallel_step.replicate(bg)
    key = jax.random.PRNGKey(run.seed)
    rng_np = np.random.default_rng(run.seed)

    mkdir_p(model_path)
    metrics_f = open(os.path.join(model_path, "metrics.jsonl"), "a")
    wandb_run = _maybe_init_wandb(model_path)
    order = rng_np.permutation(len(cams))
    cursor = 0
    t_start = time.perf_counter()

    batch_views = run.view_batch if parallel_step is not None else 1
    first_iter = int(state.step)
    for it in range(first_iter + 1, run.iterations + 1):
        cis = []
        for _ in range(batch_views):
            if cursor >= len(order):
                order = rng_np.permutation(len(cams))
                cursor = 0
            cis.append(int(order[cursor]))
            cursor += 1
        ci = cis[0]

        if gui is not None:
            # SIBR viewer poll (train_unified_lift.py:319-332)
            gui.poll_and_render(state.table, True, source_path, bg=bg)

        if it % run.sh_up_every == 0:
            state = state._replace(table=one_up_sh_degree(state.table))

        key, sub = jax.random.split(key)
        if parallel_step is not None:
            from segsplat_tpu.core.types import stack_cameras
            cams_b = stack_cameras([device_cams[i] for i in cis])
            gti = jnp.asarray(np.stack([gt_images[i] for i in cis]))
            gto = jnp.asarray(np.stack([gt_objs[i] for i in cis]))
            rngs = jax.random.split(sub, len(cis))
            cams_b, gti, gto, rngs = parallel_step.place_batch(
                cams_b, gti, gto, rngs)
            state, metrics = parallel_step(state, cams_b, gti, gto, bg, rngs)
        else:
            state, metrics = step_fn(state, device_cams[ci],
                                     jnp.asarray(gt_images[ci]),
                                     jnp.asarray(gt_objs[ci]), bg, sub)

        # densification schedule (train_unified_lift.py:462-477) — strict
        # bounds exactly as the reference: first densify AFTER from_iter,
        # none at until_iter
        if (opt.densify_from_iter < it < opt.densify_until_iter
                and it % opt.densification_interval == 0):
            key, sub = jax.random.split(key)
            new_table, stats, changed, overflow = densify_and_prune(
                state.table, state.stats, sub, opt.densify_grad_threshold,
                opt.min_opacity, scene.cameras_extent, opt.percent_dense,
                max_screen_size_on=(it > opt.opacity_reset_interval))
            opt_state = zero_adam_rows(state.opt_state, changed,
                                       state.table.capacity)
            state = state._replace(table=new_table, opt_state=opt_state,
                                   stats=stats)
            if parallel_step is not None:   # restore replicated placement
                state = parallel_step.replicate(state)
            if int(overflow) > 0:
                print(f"[WARN] densify overflow: {int(overflow)} children "
                      f"dropped (capacity {state.table.capacity})")

        # opacity reset lives INSIDE the densification window in the
        # reference (train_unified_lift.py:462,471-473): no resets after
        # densify_until_iter — an ungated reset at the final iteration
        # would ship a model with every opacity clamped to 0.01. Only the
        # opacity group's Adam moments are zeroed
        # (replace_tensor_to_optimizer(…, "opacity"), gaussian_model.py:454).
        if it < opt.densify_until_iter and (
                it % opt.opacity_reset_interval == 0 or
                (run.white_background and it == opt.densify_from_iter)):
            new_table, changed = reset_opacity(state.table)
            opt_state = zero_adam_rows(state.opt_state, changed,
                                       state.table.capacity,
                                       fields=("opacity",))
            state = state._replace(table=new_table, opt_state=opt_state)
            if parallel_step is not None:
                state = parallel_step.replicate(state)

        if it % run.log_every == 0:
            rec = {"iter": it,
                   **{k: float(v) for k, v in metrics.items()},
                   "num_gaussians": int(np.asarray(state.table.active).sum()),
                   "elapsed_s": time.perf_counter() - t_start}
            cap = raster_kw.get("pair_cap")
            if cap and rec.get("num_pairs", 0) > cap:
                print(f"[WARN] raster pair_cap {cap} < real pairs "
                      f"{int(rec['num_pairs'])} at iter {it} — deepest pairs "
                      f"(and their gradients) are being dropped; raise "
                      f"--pair_cap")
            if rec.get("tile_overflow", 0) > 0:
                print(f"[WARN] {int(rec['tile_overflow'])} pairs beyond the "
                      f"per-tile K cap at iter {it} — deepest Gaussians (and "
                      f"their gradients) in dense tiles are being dropped; "
                      f"raise max_per_tile (reference blends unbounded tiles)")
            # fail-fast numerics guard (SURVEY §5.2 — the TPU equivalent of the
            # reference's _DEBUG sync-and-check): a non-finite loss aborts with
            # the full loss breakdown instead of silently corrupting the table
            bad = [k for k, v in rec.items()
                   if isinstance(v, float) and not np.isfinite(v)]
            if bad:
                metrics_f.write(json.dumps({**rec, "error": "non-finite"})
                                + "\n")
                metrics_f.flush()
                raise FloatingPointError(
                    f"non-finite loss at iteration {it}: {bad}; "
                    f"breakdown: {rec}")
            metrics_f.write(json.dumps(rec) + "\n")
            metrics_f.flush()
            if wandb_run is not None:
                wandb_run.log(rec, step=it)
            if progress_cb:
                progress_cb(rec)

        if it in run.test_iterations:
            rec = _evaluate(state.table, scene, scale, bg, raster_kw, it)
            metrics_f.write(json.dumps(rec) + "\n")
            metrics_f.flush()
            print(f"[ITER {it}] eval: " + ", ".join(
                f"{k}={v:.3f}" for k, v in rec.items()
                if isinstance(v, float)))

        if it in run.save_iterations:
            print(f"[ITER {it}] saving point cloud + classifier")
            scene.save(it, state.table)
            np.savez(os.path.join(model_path, "point_cloud",
                                  f"iteration_{it}", "classifier.npz"),
                     code_book=np.asarray(state.code_book))
        if it in run.checkpoint_iterations:
            save_checkpoint(os.path.join(model_path, "chkpnts",
                                         f"chkpnt{it}"), state)

    metrics_f.close()
    return state


def _maybe_init_wandb(model_path: str):
    """Opt-in wandb logging (SEGSPLAT_WANDB=1) — the reference hard-enables
    wandb (train_unified_lift.py:569-574, project 'Unifed_Lift' [sic]); local
    metrics.jsonl is always written either way."""
    if os.environ.get("SEGSPLAT_WANDB") != "1":
        return None
    try:
        import wandb

        return wandb.init(project=os.environ.get("SEGSPLAT_WANDB_PROJECT",
                                                 "segsplat_tpu"),
                          name=os.path.basename(model_path) or None)
    except Exception as e:  # pragma: no cover
        print(f"[WARN] wandb unavailable ({e}); metrics.jsonl only")
        return None


def _evaluate(table, scene, scale, bg, raster_kw, it,
              max_views: Optional[int] = None) -> dict:
    """Test-time L1 + PSNR over the FULL held-out split (or a small train
    subset when no test split exists) — the reference's training_report
    (train_unified_lift.py test_iterations evaluates both fixed camera sets
    with l1_loss and psnr)."""
    from segsplat_tpu.eval.metrics import psnr_np
    from segsplat_tpu.render import render
    from segsplat_tpu.scene import to_device_camera

    cams = scene.get_test_cameras()
    split = "test"
    if not cams:
        cams = scene.get_train_cameras()[:max_views or 5]
        split = "train"
    if max_views:
        cams = cams[:max_views]
    psnrs, l1s = [], []
    for c in cams:
        out = render(table, to_device_camera(c, scale), bg, **raster_kw)
        img = np.clip(np.asarray(out["render"]), 0, 1)
        gt = np.transpose(c.load_image(scale), (2, 0, 1))
        psnrs.append(psnr_np(img, gt))
        l1s.append(float(np.abs(img - gt).mean()))
    return {"iter": it, "eval_split": split,
            "eval_psnr": float(np.mean(psnrs)),
            "eval_l1": float(np.mean(l1s)), "eval_views": len(cams)}


# ───────────────────────── checkpointing (orbax) ─────────────────────────

def save_checkpoint(path: str, state: TrainState) -> None:
    """Full resumable checkpoint — the reference's (capture(), iteration) torch
    dump (train_unified_lift.py:498-500)."""
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), state, force=True)
    ckpt.wait_until_finished()


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(os.path.abspath(path), template)
    # materialize fresh, unaliased device arrays with the template's exact dtypes
    # (orbax may hand back host numpy views; aliased/deduped buffers break the
    # compiled step's buffer-count contract)
    return jax.tree.map(lambda t, r: jnp.array(r, dtype=t.dtype), template,
                        restored)
