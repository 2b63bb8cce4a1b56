#!/usr/bin/env python
"""COLMAP SfM wrapper (reference: convert.py — itself based on the MipNeRF360
converter): feature extraction -> exhaustive matching -> mapper -> undistort,
plus optional 2x/4x/8x image resizes. Requires the `colmap` binary on PATH
(not bundled in this image — the script degrades with a clear error).
Resizes use PIL instead of ImageMagick."""

import logging
import os
import shutil
import subprocess
import sys
from argparse import ArgumentParser


def run(cmd: list, step: str) -> None:
    logging.info("%s: %s", step, " ".join(cmd))
    code = subprocess.call(cmd)
    if code != 0:
        logging.error("%s failed with code %d. Exiting.", step, code)
        sys.exit(code)


def main(argv=None):
    parser = ArgumentParser("Colmap converter")
    parser.add_argument("--no_gpu", action="store_true")
    parser.add_argument("--skip_matching", action="store_true")
    parser.add_argument("--source_path", "-s", required=True, type=str)
    parser.add_argument("--camera", default="OPENCV", type=str)
    parser.add_argument("--colmap_executable", default="colmap", type=str)
    parser.add_argument("--resize", action="store_true")
    parser.add_argument("--magick_executable", default="", type=str,
                        help="accepted for reference-CLI compatibility "
                             "(convert.py:25); resizes are computed with "
                             "PIL, producing the same images_{2,4,8} tree")
    args = parser.parse_args(argv)
    colmap = args.colmap_executable
    if shutil.which(colmap) is None:
        sys.exit(f"colmap executable {colmap!r} not found on PATH; install "
                 "COLMAP or pass --colmap_executable")
    use_gpu = "0" if args.no_gpu else "1"
    src = args.source_path

    if not args.skip_matching:
        os.makedirs(os.path.join(src, "distorted", "sparse"), exist_ok=True)
        db = os.path.join(src, "distorted", "database.db")
        run([colmap, "feature_extractor", "--database_path", db,
             "--image_path", os.path.join(src, "input"),
             "--ImageReader.single_camera", "1",
             "--ImageReader.camera_model", args.camera,
             "--SiftExtraction.use_gpu", use_gpu], "feature extraction")
        run([colmap, "exhaustive_matcher", "--database_path", db,
             "--SiftMatching.use_gpu", use_gpu], "feature matching")
        run([colmap, "mapper", "--database_path", db,
             "--image_path", os.path.join(src, "input"),
             "--output_path", os.path.join(src, "distorted", "sparse"),
             "--Mapper.ba_global_function_tolerance=0.000001"],
            "bundle adjustment")

    run([colmap, "image_undistorter",
         "--image_path", os.path.join(src, "input"),
         "--input_path", os.path.join(src, "distorted", "sparse", "0"),
         "--output_path", src, "--output_type", "COLMAP"], "undistortion")

    # sparse/* -> sparse/0/* (reference convert.py:94-105)
    sparse = os.path.join(src, "sparse")
    os.makedirs(os.path.join(sparse, "0"), exist_ok=True)
    for f in os.listdir(sparse):
        if f != "0":
            shutil.move(os.path.join(sparse, f),
                        os.path.join(sparse, "0", f))

    if args.resize:
        from PIL import Image

        for factor in (2, 4, 8):
            out_dir = os.path.join(src, f"images_{factor}")
            os.makedirs(out_dir, exist_ok=True)
            for name in os.listdir(os.path.join(src, "images")):
                with Image.open(os.path.join(src, "images", name)) as im:
                    im.resize((im.width // factor,
                               im.height // factor)).save(
                        os.path.join(out_dir, name))
    print("Done.")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
