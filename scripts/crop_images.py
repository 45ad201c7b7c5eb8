#!/usr/bin/env python
"""Batch image ROI cropper — the `ImageCropper` node analog (reference
core/image_cropper/image_cropper.{h,cpp}: N-camera ROI cropping republished
per camera).

  python scripts/crop_images.py --in raw/cam0 --out cropped/cam0 \\
      --roi 0 100 1241 276
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--in", dest="inp", required=True, action="append",
                   help="input dir (repeat for multiple cameras)")
    p.add_argument("--out", required=True, action="append",
                   help="output dir (one per --in)")
    p.add_argument("--roi", nargs=4, type=int, required=True, metavar=("U0", "V0", "W", "H"))
    args = p.parse_args(argv)
    if len(args.inp) != len(args.out):
        raise SystemExit("--in/--out count mismatch")

    from PIL import Image

    u0, v0, w, h = args.roi
    total = 0
    for src, dst in zip(args.inp, args.out):
        os.makedirs(dst, exist_ok=True)
        for n in sorted(os.listdir(src)):
            with Image.open(os.path.join(src, n)) as im:
                arr = np.asarray(im)
            if v0 + h > arr.shape[0] or u0 + w > arr.shape[1]:
                raise SystemExit(f"ROI exceeds image bounds for {n} ({arr.shape})")
            Image.fromarray(arr[v0 : v0 + h, u0 : u0 + w]).save(os.path.join(dst, n))
            total += 1
    print(f"cropped {total} images to roi=({u0},{v0},{w},{h})")


if __name__ == "__main__":
    main()
