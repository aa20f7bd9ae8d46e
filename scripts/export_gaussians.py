#!/usr/bin/env python
"""Checkpoint/stat export tools — the reference's export_gaussians/ CLIs
(export_gaussian.py:11-70 checkpoint→PLY; point counters; property dumps)."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from argparse import ArgumentParser

import numpy as np

from segsplat_tpu.io.ply import read_ply


def main(argv=None):
    p = ArgumentParser()
    sp = p.add_subparsers(dest="cmd", required=True)

    st = sp.add_parser("stats", help="print Gaussian PLY property statistics")
    st.add_argument("--ply", required=True)

    cnt = sp.add_parser("count", help="count points in a PLY")
    cnt.add_argument("--ply", required=True)

    ck = sp.add_parser("from_checkpoint", help="orbax train checkpoint → PLY")
    ck.add_argument("--checkpoint", required=True)
    ck.add_argument("--out", required=True)

    args = p.parse_args(argv)
    if args.cmd == "count":
        print(len(read_ply(args.ply).vertex))
    elif args.cmd == "stats":
        c = read_ply(args.ply)
        for name in c.names:
            v = np.asarray(c[name], np.float64)
            print(f"{name:16s} min={v.min():+.4f} max={v.max():+.4f} "
                  f"mean={v.mean():+.4f} std={v.std():.4f}")
        if "opacity" in c.names:
            op = 1 / (1 + np.exp(-np.asarray(c["opacity"], np.float64)))
            print(f"{'sigmoid(opacity)':16s} min={op.min():.4f} max={op.max():.4f} "
                  f"mean={op.mean():.4f}")
    else:
        import jax

        from segsplat_tpu.scene import save_gaussian_table
        from segsplat_tpu.train.trainer import OptimizationConfig, init_state, \
            init_table_from_pcd

        # restore into a shape-compatible template discovered from the checkpoint
        import orbax.checkpoint as ocp
        ckpt = ocp.StandardCheckpointer()
        import os
        raw = ckpt.restore(os.path.abspath(args.checkpoint))
        table_arrays = raw["table"] if isinstance(raw, dict) else raw.table
        from segsplat_tpu.core.types import GaussianTable
        table = GaussianTable(**{k: np.asarray(v)
                                 for k, v in dict(table_arrays).items()
                                 if k != "max_sh_degree"})
        save_gaussian_table(args.out, table)
        print(f"[DONE] → {args.out}")


if __name__ == "__main__":
    main()
