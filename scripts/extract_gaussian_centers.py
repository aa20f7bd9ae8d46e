#!/usr/bin/env python
"""Gaussian checkpoint PLY → centers .npy/.npz — drop-in for the reference's
voxel_to_gaussian/extract_gaussian_centers.py (:15-50)."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from argparse import ArgumentParser

from segsplat_tpu.pipeline.query import extract_gaussian_centers


def main(argv=None):
    p = ArgumentParser()
    p.add_argument("--ply", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    mu = extract_gaussian_centers(args.ply, args.out)
    print(f"[DONE] {mu.shape[0]} centers → {args.out}")


if __name__ == "__main__":
    main()
