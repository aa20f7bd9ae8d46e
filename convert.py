#!/usr/bin/env python
"""COLMAP preprocessing wrapper — drop-in for the reference's convert.py
(:31-124): feature_extractor → matcher → mapper → image_undistorter, plus the
1/2/4/8 image pyramid. Requires the ``colmap`` (and optionally ``magick``)
binaries on PATH; exits with a clear message when absent."""

from __future__ import annotations

import os
import shutil
import subprocess
from argparse import ArgumentParser


def run(cmd):
    print("+", " ".join(cmd))
    r = subprocess.run(cmd)
    if r.returncode != 0:
        raise SystemExit(f"command failed ({r.returncode}): {' '.join(cmd)}")


def main(argv=None):
    p = ArgumentParser()
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--camera", default="OPENCV")
    p.add_argument("--no_gpu", action="store_true")
    p.add_argument("--skip_matching", action="store_true")
    p.add_argument("--resize", action="store_true",
                   help="build the 1/2, 1/4, 1/8 image pyramid")
    p.add_argument("--colmap_executable", default="colmap")
    p.add_argument("--magick_executable", default="magick")
    args = p.parse_args(argv)

    colmap = args.colmap_executable
    if shutil.which(colmap) is None:
        raise SystemExit("colmap binary not found on PATH — install COLMAP or "
                         "pass --colmap_executable")
    use_gpu = "0" if args.no_gpu else "1"
    src = args.source_path

    if not args.skip_matching:
        os.makedirs(os.path.join(src, "distorted", "sparse"), exist_ok=True)
        run([colmap, "feature_extractor",
             "--database_path", f"{src}/distorted/database.db",
             "--image_path", f"{src}/input",
             "--ImageReader.single_camera", "1",
             "--ImageReader.camera_model", args.camera,
             "--SiftExtraction.use_gpu", use_gpu])
        run([colmap, "exhaustive_matcher",
             "--database_path", f"{src}/distorted/database.db",
             "--SiftMatching.use_gpu", use_gpu])
        run([colmap, "mapper",
             "--database_path", f"{src}/distorted/database.db",
             "--image_path", f"{src}/input",
             "--output_path", f"{src}/distorted/sparse",
             "--Mapper.ba_global_function_tolerance=0.000001"])

    run([colmap, "image_undistorter",
         "--image_path", f"{src}/input",
         "--input_path", f"{src}/distorted/sparse/0",
         "--output_path", src, "--output_type", "COLMAP"])

    os.makedirs(os.path.join(src, "sparse", "0"), exist_ok=True)
    for f in os.listdir(os.path.join(src, "sparse")):
        full = os.path.join(src, "sparse", f)
        if os.path.isfile(full):
            shutil.move(full, os.path.join(src, "sparse", "0", f))

    if args.resize:
        from PIL import Image
        for denom, name in ((2, "images_2"), (4, "images_4"), (8, "images_8")):
            out = os.path.join(src, name)
            os.makedirs(out, exist_ok=True)
            for f in os.listdir(os.path.join(src, "images")):
                im = Image.open(os.path.join(src, "images", f))
                im = im.resize((im.width // denom, im.height // denom),
                               Image.LANCZOS)
                im.save(os.path.join(out, f))
    print("Done.")


if __name__ == "__main__":
    main()
