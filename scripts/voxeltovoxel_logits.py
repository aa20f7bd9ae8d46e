#!/usr/bin/env python
"""Voxel-level open-vocab query — drop-in for the reference's
voxel_to_gaussian/voxeltovoxel_logits.py (:138-291): labels stay on voxels."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from argparse import ArgumentParser

from segsplat_tpu.pipeline.query import query_voxels


def main(argv=None):
    p = ArgumentParser()
    p.add_argument("--vox", required=True)
    p.add_argument("--prompt", type=str, nargs="+", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--allow_random_weights", action="store_true",
                   help="accept voxel features tainted weights_source=random")
    p.add_argument("--require_provenance", action="store_true",
                   help="strict mode: also reject UNSTAMPED voxel features")
    args = p.parse_args(argv)
    out = query_voxels(args.vox, args.prompt, args.out,
                       allow_random_weights=args.allow_random_weights,
                       require_provenance=args.require_provenance)
    import numpy as np
    labels = out["labels"]
    print("[INFO] label histogram:",
          dict(zip(*[x.tolist() for x in np.unique(labels, return_counts=True)])))


if __name__ == "__main__":
    main()
