#!/usr/bin/env python
"""Single-view feature projection — compat shim for the reference's kernel
driver cuda_project_image_to_sparse_voxel/debug_project_features.py (:140-258):
loads a tensor_data .pt, runs the first-hit projection for each packed view, and
writes proj_output.pt {projected_feats fp16, projected_indices (z,y,x) int}.

Runs the splat kernel by default; --method dda uses the exact transcription."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from argparse import ArgumentParser

import numpy as np


def main(argv=None):
    p = ArgumentParser()
    p.add_argument("--tensor_data", required=True)
    p.add_argument("--output", default="proj_output.pt")
    p.add_argument("--depth_min", type=float, default=0.01)
    p.add_argument("--depth_max", type=float, default=10.0)
    p.add_argument("--method", default="splat", choices=["splat", "dda"])
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import torch

    from segsplat_tpu.ops.lift import (default_max_steps, first_hit_voxels,
                                       scatter_features)
    from segsplat_tpu.ops.lift_splat import first_hit_voxels_splat

    td = torch.load(args.tensor_data, map_location="cpu", weights_only=False)
    feats = td["encoded_2d_features"].numpy()[0]         # [V, H, W, C]
    occ = td["occupancy_3D"].numpy().astype(np.int32)
    intr = td["intrinsicParams"].numpy()[0]              # [V, 4]
    c2ws = td["viewMatrixInv"].numpy()[0]                # [V, 4, 4]
    origin = np.asarray(td["grid_origin"], np.float32)
    vs = float(td["voxel_size"])

    V, H, W, C = feats.shape
    inc = vs * 0.5
    num_ids = int(occ.max()) + 1
    # reverse map id → (z, y, x) (debug_project_features.py:33-46)
    zyx = np.zeros((num_ids, 3), np.int64)
    nz = np.argwhere(occ > 0)
    zyx[occ[nz[:, 0], nz[:, 1], nz[:, 2]]] = nz

    sums = jnp.zeros((num_ids, C), jnp.float32)
    counts = jnp.zeros((num_ids,), jnp.int32)
    for v in range(V):
        if args.method == "splat":
            centers = (nz[:, ::-1].astype(np.float32) * vs + origin)
            ids = occ[nz[:, 0], nz[:, 1], nz[:, 2]].astype(np.int32)
            hits = first_hit_voxels_splat(
                jnp.asarray(centers), jnp.asarray(ids), jnp.asarray(c2ws[v]),
                jnp.asarray(intr[v]), jnp.asarray(vs, jnp.float32),
                args.depth_min, args.depth_max, jnp.asarray(inc, jnp.float32),
                W, H)
        else:
            steps = default_max_steps(W, H, float(intr[v][0]), float(intr[v][1]),
                                      args.depth_min, args.depth_max, inc,
                                      cx=float(intr[v][2]),
                                      cy=float(intr[v][3]))
            hits = first_hit_voxels(
                jnp.asarray(occ), jnp.asarray(c2ws[v]), jnp.asarray(intr[v]),
                jnp.asarray(origin), jnp.asarray(vs, jnp.float32),
                args.depth_min, args.depth_max, jnp.asarray(inc, jnp.float32),
                W, H, steps)
        s, c = scatter_features(jnp.asarray(feats[v]), hits, num_ids)
        sums, counts = sums + s, counts + c

    s = np.asarray(sums)
    c = np.asarray(counts)
    hit = np.flatnonzero(c[1:] > 0) + 1
    mean = s[hit] / c[hit, None]
    torch.save({"projected_feats": torch.from_numpy(mean.astype(np.float16)),
                "projected_indices": torch.from_numpy(zyx[hit])}, args.output)
    print(f"[DONE] {len(hit)} voxels hit ({int(c.sum())} pixel hits) "
          f"→ {args.output}")


if __name__ == "__main__":
    main()
