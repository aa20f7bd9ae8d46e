#!/usr/bin/env python
"""Voxel→Gaussian open-vocab query CLI — drop-in for the reference's
voxel_to_gaussian/voxeltoGaussian_logits.py subcommands (:350-384)."""

from __future__ import annotations

import pathlib
from argparse import ArgumentParser

from segsplat_tpu.pipeline import query as Q


def main(argv=None):
    p = ArgumentParser(description="voxel→Gaussian semantic transfer + CLIP query")
    sp = p.add_subparsers(dest="cmd", required=True)

    cvt = sp.add_parser("convert", help=".pt/.pth → .npz (voxels)")
    cvt.add_argument("--pt", type=pathlib.Path, required=True)
    cvt.add_argument("--out", type=pathlib.Path, required=True)

    bld = sp.add_parser("build_map", help="Gaussian → voxel 1-NN index map")
    bld.add_argument("--vox", type=pathlib.Path, required=True)
    bld.add_argument("--gauss", type=pathlib.Path, required=True)
    bld.add_argument("--out", type=pathlib.Path, required=True)
    bld.add_argument("--batch", type=int, default=200_000)

    qry = sp.add_parser("query", help="Prompt → per-Gaussian labels")
    qry.add_argument("--vox", type=pathlib.Path, required=True)
    qry.add_argument("--map", type=pathlib.Path, required=True)
    qry.add_argument("--gauss", type=pathlib.Path, required=True)
    qry.add_argument("--prompt", type=str, nargs="+", required=True)
    qry.add_argument("--out", type=pathlib.Path, required=True)
    qry.add_argument("--device", type=str, default="tpu",
                     help="accepted for reference-CLI compatibility")
    qry.add_argument("--allow_random_weights", action="store_true",
                     help="accept voxel features tainted weights_source=random")
    qry.add_argument("--require_provenance", action="store_true",
                     help="strict mode: also reject UNSTAMPED voxel features")

    args = p.parse_args(argv)
    if args.cmd == "convert":
        Q.convert_pt_to_npz(str(args.pt), str(args.out))
    elif args.cmd == "build_map":
        Q.build_map(str(args.vox), str(args.gauss), str(args.out),
                    batch=args.batch)
    else:
        out = Q.query(str(args.vox), str(args.map), str(args.gauss),
                      args.prompt, str(args.out),
                      allow_random_weights=args.allow_random_weights,
                      require_provenance=args.require_provenance)
        import numpy as np
        labels = out["labels"]
        print("[INFO] label histogram:",
              dict(zip(*[x.tolist() for x in np.unique(labels,
                                                       return_counts=True)])))


if __name__ == "__main__":
    main()
