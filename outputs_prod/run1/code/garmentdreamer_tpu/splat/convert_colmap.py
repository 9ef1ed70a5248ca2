"""COLMAP scene-conversion CLI for the vanilla-3DGS workflow.

Rebuild of the reference converter (reference: gaussiansplatting/convert.py):
``input/`` photos -> COLMAP feature extraction / exhaustive matching /
mapping -> undistortion into the ``images/ + sparse/0/`` layout that
:mod:`garmentdreamer_tpu.splat.scene` loads, with optional 1/2 1/4 1/8
multi-resolution copies (the reference shells out to ImageMagick; cv2 is
used here when available -- it ships with this environment, magick may not).

The COLMAP binaries themselves are external, exactly as in the reference;
a missing binary fails with a clear message instead of a shell error.

Usage: python -m garmentdreamer_tpu.splat.convert_colmap -s <scene_dir>
       [--no_gpu] [--skip_matching] [--camera OPENCV] [--resize]
       [--colmap_executable path] [--magick_executable path]
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

__all__ = ["convert", "main"]


def _run(cmd, what: str):
    exe = cmd[0]
    if shutil.which(exe) is None and not os.path.isfile(exe):
        raise FileNotFoundError(
            f"{what}: '{exe}' not found on PATH -- install COLMAP or pass "
            "--colmap_executable (reference workflow: convert.py)"
        )
    print("[convert]", " ".join(cmd), flush=True)
    rc = subprocess.call(cmd)
    if rc != 0:
        raise RuntimeError(f"{what} failed with code {rc}")


def convert(
    source_path: str,
    camera: str = "OPENCV",
    no_gpu: bool = False,
    skip_matching: bool = False,
    resize: bool = False,
    colmap_executable: str = "",
    magick_executable: str = "",
) -> str:
    colmap = colmap_executable or "colmap"
    use_gpu = "0" if no_gpu else "1"

    if not skip_matching:
        os.makedirs(os.path.join(source_path, "distorted", "sparse"), exist_ok=True)
        db = os.path.join(source_path, "distorted", "database.db")
        _run(
            [colmap, "feature_extractor",
             "--database_path", db,
             "--image_path", os.path.join(source_path, "input"),
             "--ImageReader.single_camera", "1",
             "--ImageReader.camera_model", camera,
             "--SiftExtraction.use_gpu", use_gpu],
            "feature extraction",
        )
        _run(
            [colmap, "exhaustive_matcher",
             "--database_path", db,
             "--SiftMatching.use_gpu", use_gpu],
            "feature matching",
        )
        # tightened BA tolerance like the reference (speeds up mapping)
        _run(
            [colmap, "mapper",
             "--database_path", db,
             "--image_path", os.path.join(source_path, "input"),
             "--output_path", os.path.join(source_path, "distorted", "sparse"),
             "--Mapper.ba_global_function_tolerance=0.000001"],
            "mapping",
        )

    _run(
        [colmap, "image_undistorter",
         "--image_path", os.path.join(source_path, "input"),
         "--input_path", os.path.join(source_path, "distorted", "sparse", "0"),
         "--output_path", source_path,
         "--output_type", "COLMAP"],
        "undistortion",
    )

    # sparse/* -> sparse/0/* (the loader's expected layout)
    sparse = os.path.join(source_path, "sparse")
    os.makedirs(os.path.join(sparse, "0"), exist_ok=True)
    for f in os.listdir(sparse):
        if f != "0":
            shutil.move(os.path.join(sparse, f), os.path.join(sparse, "0", f))

    if resize:
        _make_resized(source_path, magick_executable)
    return source_path


def _make_resized(source_path: str, magick_executable: str = ""):
    """images_2 / images_4 / images_8 pyramids (reference uses ImageMagick
    50%/25%/12.5%; cv2 INTER_AREA here unless a magick binary is given)."""
    src_dir = os.path.join(source_path, "images")
    files = sorted(os.listdir(src_dir))
    for denom, sub in ((2, "images_2"), (4, "images_4"), (8, "images_8")):
        os.makedirs(os.path.join(source_path, sub), exist_ok=True)
        for f in files:
            dst = os.path.join(source_path, sub, f)
            if magick_executable:
                shutil.copy2(os.path.join(src_dir, f), dst)
                _run([magick_executable, "mogrify", "-resize",
                      f"{100.0 / denom}%", dst], "resize")
            else:
                import cv2

                im = cv2.imread(os.path.join(src_dir, f), cv2.IMREAD_UNCHANGED)
                h, w = im.shape[:2]
                cv2.imwrite(dst, cv2.resize(
                    im, (w // denom, h // denom), interpolation=cv2.INTER_AREA
                ))


def main(argv=None):
    p = argparse.ArgumentParser("Colmap converter")
    p.add_argument("--no_gpu", action="store_true")
    p.add_argument("--skip_matching", action="store_true")
    p.add_argument("--source_path", "-s", required=True, type=str)
    p.add_argument("--camera", default="OPENCV", type=str)
    p.add_argument("--colmap_executable", default="", type=str)
    p.add_argument("--resize", action="store_true")
    p.add_argument("--magick_executable", default="", type=str)
    a = p.parse_args(argv)
    try:
        convert(
            a.source_path, camera=a.camera, no_gpu=a.no_gpu,
            skip_matching=a.skip_matching, resize=a.resize,
            colmap_executable=a.colmap_executable,
            magick_executable=a.magick_executable,
        )
    except (FileNotFoundError, RuntimeError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
