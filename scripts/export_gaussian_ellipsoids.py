#!/usr/bin/env python
"""Gaussian → ellipsoid-mesh export — drop-in for the reference's
export_gaussian_ellipsoids.py (root): emit a triangle-mesh PLY with one scaled,
rotated icosphere per (top-opacity) Gaussian."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from argparse import ArgumentParser

import numpy as np

from segsplat_tpu.core.transforms import qvec2rotmat
from segsplat_tpu.io.ply import read_ply


def unit_icosphere():
    """Icosahedron vertices/faces (subdivision 0 keeps exports small)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                  [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                  [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                  [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
                 np.int32)
    return v, f


def main(argv=None):
    p = ArgumentParser()
    p.add_argument("--ply", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--max_gaussians", type=int, default=20_000)
    p.add_argument("--scale_mult", type=float, default=1.0)
    args = p.parse_args(argv)

    c = read_ply(args.ply)
    xyz = c.xyz()
    names = c.names
    scales = np.exp(np.stack([c[f"scale_{i}"] for i in range(3)], axis=1))
    quats = np.stack([c[f"rot_{i}"] for i in range(4)], axis=1)
    opac = 1 / (1 + np.exp(-np.asarray(c["opacity"])))
    if all(f"f_dc_{i}" in names for i in range(3)):
        cols = np.clip(np.stack([c[f"f_dc_{i}"] for i in range(3)], 1) * 0.2821
                       + 0.5, 0, 1)
    else:
        cols = np.full((len(xyz), 3), 0.5)

    keep = np.argsort(-opac)[:args.max_gaussians]
    sv, sf = unit_icosphere()
    n_v, n_f = len(sv), len(sf)
    verts = np.zeros((len(keep) * n_v, 6), np.float32)
    faces = np.zeros((len(keep) * n_f, 3), np.int32)
    for k, gi in enumerate(keep):
        R = qvec2rotmat(quats[gi] / (np.linalg.norm(quats[gi]) + 1e-12))
        pts = (sv * scales[gi] * args.scale_mult) @ R.T + xyz[gi]
        verts[k * n_v:(k + 1) * n_v, :3] = pts
        verts[k * n_v:(k + 1) * n_v, 3:] = cols[gi]
        faces[k * n_f:(k + 1) * n_f] = sf + k * n_v

    _write_mesh(args.out, verts, faces)
    print(f"[DONE] {len(keep)} ellipsoids ({len(verts)} verts) → {args.out}")


def _write_mesh(path, verts, faces):
    import os
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        hdr = (f"ply\nformat binary_little_endian 1.0\n"
               f"element vertex {len(verts)}\n"
               "property float x\nproperty float y\nproperty float z\n"
               "property uchar red\nproperty uchar green\nproperty uchar blue\n"
               f"element face {len(faces)}\n"
               "property list uchar int vertex_indices\nend_header\n")
        f.write(hdr.encode("ascii"))
        vdt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                        ("r", "u1"), ("g", "u1"), ("b", "u1")])
        v = np.zeros(len(verts), vdt)
        v["x"], v["y"], v["z"] = verts[:, 0], verts[:, 1], verts[:, 2]
        rgb = (verts[:, 3:] * 255).astype(np.uint8)
        v["r"], v["g"], v["b"] = rgb[:, 0], rgb[:, 1], rgb[:, 2]
        f.write(v.tobytes())
        fdt = np.dtype([("n", "u1"), ("a", "<i4"), ("b", "<i4"), ("c", "<i4")])
        fa = np.zeros(len(faces), fdt)
        fa["n"] = 3
        fa["a"], fa["b"], fa["c"] = faces[:, 0], faces[:, 1], faces[:, 2]
        f.write(fa.tobytes())


if __name__ == "__main__":
    main()
