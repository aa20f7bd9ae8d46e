#!/usr/bin/env python
"""Gaussian pre-filter: keep Gaussians within max_dist of a voxel/mesh point set —
drop-in for the reference's betterGaussians/dist_to_mesh_filter.py (:16-40)."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from argparse import ArgumentParser

import numpy as np
from scipy.spatial import cKDTree

from segsplat_tpu.io.ply import read_ply, write_ply


def main(argv=None):
    p = ArgumentParser()
    p.add_argument("--ply", required=True, help="Gaussian checkpoint PLY")
    p.add_argument("--ref_ply", required=True, help="voxel/mesh point set PLY")
    p.add_argument("--out", required=True)
    p.add_argument("--max_dist", type=float, default=0.05)
    args = p.parse_args(argv)

    c = read_ply(args.ply)
    ref = read_ply(args.ref_ply).xyz()
    d, _ = cKDTree(ref).query(c.xyz(), k=1)
    mask = d <= args.max_dist
    write_ply(args.out, c.vertex[mask], binary=True)
    print(f"[DONE] kept {mask.sum()} / {len(c.vertex)} gaussians → {args.out}")


if __name__ == "__main__":
    main()
