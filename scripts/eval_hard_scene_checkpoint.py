"""Score a mid-train point-cloud snapshot of a pseudo-label-loop run.

`scripts/pseudo_label_loop.py --save_at 1200,1600` makes training write the
reference's own artifact pair (`point_cloud/iteration_N/point_cloud.ply` +
`classifier.npz`) mid-run.  This script re-scores such a snapshot without the
run having to finish: the synthetic hard scene is DETERMINISTIC given
(seed, frames, size, n_objects, layout, textured), so cameras and GT instance
maps are regenerated bit-exactly, the table+codebook are reloaded from the
PLY (obj_dc_* identity features round-trip — scene.load_gaussian_table), and
the same eval stack runs: identity-map prediction, grouped + strict-1-1 mIoU,
post-train class consolidation, and the LERF-protocol rows.  It also writes
`merge_debug_iter{N}.npz` in the run root so `eval_hard_scene_offline.py`
and `tune_class_merge.py` work on the snapshot unchanged.

Why: multi-hour hard-scene runs on this box's single CPU core die to
wall-clock budgets (timeouts), not bugs — a killed run with one snapshot is
a measurement, not a loss.  Mirrors the reference's offline split where
training writes artifacts and eval scripts re-read them
(script/eval_scannetpp_unified_lift.py).
"""

from __future__ import annotations

import json
import os
import sys
from argparse import ArgumentParser
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def eval_checkpoint(root: str, iteration: int, frames: int, size: int,
                    n_objects: int, layout: str, textured: bool, seed: int,
                    max_per_tile: int, capacity: int) -> dict:
    import jax
    import jax.numpy as jnp

    from scripts.eval_hard_scene_offline import rescore
    from scripts.pseudo_label_loop import (build_objects, lerf_protocol_eval,
                                           orbit_cameras,
                                           predict_identity_maps,
                                           render_sweep)
    from segsplat_tpu.scene import load_gaussian_table

    H = W = size
    rng = np.random.default_rng(seed)
    g = build_objects(rng, n_objects=n_objects, layout=layout,
                      textured=textured)
    Rs, ts, fx, fy = orbit_cameras(frames, H, W)
    _, gts = render_sweep(g, Rs, ts, fx, fy, H, W, max_per_tile=max_per_tile)

    it_dir = os.path.join(root, "model", "point_cloud",
                          f"iteration_{iteration}")
    table = load_gaussian_table(os.path.join(it_dir, "point_cloud.ply"),
                                capacity=capacity)
    code_book = jnp.asarray(
        np.load(os.path.join(it_dir, "classifier.npz"))["code_book"])
    state = SimpleNamespace(table=table, code_book=code_book)

    raster_kw = dict(max_tiles_per_axis=6, max_per_tile=max_per_tile,
                     tile_chunk=16,
                     backend="xla" if jax.default_backend() == "cpu"
                     else "pallas")
    preds, _, logit_maps, alphas = predict_identity_maps(
        state, Rs, ts, fx, fy, H, W, raster_kw)

    npz_path = os.path.join(root, f"merge_debug_iter{iteration}.npz")
    np.savez_compressed(
        npz_path,
        objects_dc=np.asarray(table.objects_dc).reshape(table.capacity, -1),
        code_book=np.asarray(code_book),
        xyz=np.asarray(table.xyz),
        active=np.asarray(table.active),
        preds=np.stack(preds), gts=np.stack(gts))

    result = rescore(npz_path, n_objects)
    result["iteration"] = iteration
    result["lerf"] = {k: round(v, 4) if isinstance(v, float) else v
                      for k, v in lerf_protocol_eval(
                          logit_maps, gts, alphas, seed=seed,
                          n_objects=n_objects).items()}
    return result


def main(argv=None):
    import jax
    jax.config.update("jax_platforms", "cpu")

    p = ArgumentParser()
    p.add_argument("root", help="pseudo_label_loop run root")
    p.add_argument("--iteration", type=int, required=True)
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--n_objects", type=int, default=20)
    p.add_argument("--layout", default="random")
    p.add_argument("--textured", action="store_true", default=True)
    p.add_argument("--no-textured", dest="textured", action="store_false")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_per_tile", type=int, default=512)
    p.add_argument("--capacity", type=int, default=8192)
    args = p.parse_args(argv)

    print(json.dumps(eval_checkpoint(
        args.root, args.iteration, args.frames, args.size, args.n_objects,
        args.layout, args.textured, args.seed, args.max_per_tile,
        args.capacity)))


if __name__ == "__main__":
    main()
