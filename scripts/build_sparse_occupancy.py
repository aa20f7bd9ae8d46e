#!/usr/bin/env python
"""Voxel-grid PLY → dense occupancy tensor — drop-in for the reference's
cuda_project_image_to_sparse_voxel/build_sparse_occupancy.py (:32-53: 1-based
unique IDs at round((p-origin)/voxel_size), negative-coord shift warning)."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from argparse import ArgumentParser

import numpy as np


def main(argv=None):
    p = ArgumentParser()
    p.add_argument("--voxel_ply", required=True)
    p.add_argument("--output", default="ALL_occupancy.pt")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from segsplat_tpu.core.types import VoxelGrid
    from segsplat_tpu.io.ply import read_voxel_grid_ply
    from segsplat_tpu.ops.voxelize import occupancy_from_grid

    centers, _colors, vs, origin, shape = read_voxel_grid_ply(args.voxel_ply)
    if vs is None:
        raise RuntimeError("missing voxel_size header comment")
    grid = VoxelGrid(
        coords=jnp.asarray(np.round((centers - origin) / vs).astype(np.int32)),
        origin=jnp.asarray(origin, jnp.float32),
        voxel_size=jnp.asarray(vs, jnp.float32), shape=shape or ())
    occ, occ_origin, occ_shape = occupancy_from_grid(grid)
    occ_np = np.asarray(occ)
    if args.output.endswith(".pt"):
        import torch
        torch.save({"occupancy_3D": torch.from_numpy(occ_np),
                    "grid_origin": torch.from_numpy(occ_origin),
                    "voxel_size": float(vs)}, args.output)
    else:
        np.savez(args.output, occupancy_3D=occ_np, grid_origin=occ_origin,
                 voxel_size=float(vs))
    print(f"[DONE] occupancy {occ_shape}, {int((occ_np > 0).sum())} occupied "
          f"→ {args.output}")


if __name__ == "__main__":
    main()
