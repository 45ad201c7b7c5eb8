#!/usr/bin/env python
"""Standalone stereo rectification tool — the `StereoRectifier` node analog
(reference ros1/stereo_rectifier/stereo_rectifier.cpp:3-98): consumes a raw
stereo stream (directories of images), writes rectified grayscale images.

  python scripts/rectify_stereo.py --config cfg.yaml --left raw/left \\
      --right raw/right --out rect/
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True, help="reference-format stereo YAML")
    p.add_argument("--left", required=True)
    p.add_argument("--right", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    from PIL import Image

    from visual_odometry_ros_tpu import camera as cam_mod
    from visual_odometry_ros_tpu.config import load_yaml
    from visual_odometry_ros_tpu.io.datasets import load_gray

    cfg = load_yaml(args.config, stereo=True)
    c, cr = cfg.cam, cfg.cam_right
    left = cam_mod.make_camera(c.fx, c.fy, c.cx, c.cy, c.dist, c.width, c.height)
    right = cam_mod.make_camera(cr.fx, cr.fy, cr.cx, cr.cy, cr.dist, cr.width, cr.height)
    stereo = cam_mod.make_stereo_camera(left, right, jnp.asarray(cfg.T_lr))

    os.makedirs(os.path.join(args.out, "left"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "right"), exist_ok=True)
    names = sorted(os.listdir(args.left))
    for n in names:
        il = load_gray(os.path.join(args.left, n))
        ir = load_gray(os.path.join(args.right, n))
        rl, rr = cam_mod.rectify_stereo_images(stereo, jnp.asarray(il), jnp.asarray(ir))
        Image.fromarray(np.clip(np.asarray(rl), 0, 255).astype(np.uint8)).save(
            os.path.join(args.out, "left", n)
        )
        Image.fromarray(np.clip(np.asarray(rr), 0, 255).astype(np.uint8)).save(
            os.path.join(args.out, "right", n)
        )
    rect = stereo.rect
    print(
        f"rectified {len(names)} pairs; K_rect: fx={float(rect.fx):.2f} "
        f"cx={float(rect.cx):.2f} cy={float(rect.cy):.2f} baseline={float(stereo.baseline):.4f}"
    )


if __name__ == "__main__":
    main()
