"""Dense ZNCC disparity tests on the synthetic plane world (exact GT depth)."""

import numpy as np
import jax.numpy as jnp

from visual_odometry_ros_tpu.io.synthetic import PlaneSequence
from visual_odometry_ros_tpu.ops import stereo_disparity as SD


def test_dense_disparity_on_plane_world():
    world = PlaneSequence(width=320, height=240, fx=300.0, fy=300.0, cx=160.0, cy=120.0,
                          baseline=0.4, z0=6.0, sx=0.25, sy=0.1)
    T_wc = np.eye(4)
    left, right = world.stereo_pair(T_wc)
    depth_gt = world.depth(np.linalg.inv(T_wc))
    fxb = 300.0 * 0.4
    disp_gt = fxb / depth_gt

    res = SD.zncc_disparity(jnp.asarray(left), jnp.asarray(right), max_disp=48, radius=4, fxb=fxb)
    disp = np.asarray(res.disparity)
    valid = np.asarray(res.valid)

    # Interior region (avoid border effects).
    inner = np.zeros_like(valid)
    inner[20:-20, 60:-20] = True
    v = valid & inner
    assert v.mean() > 0.3  # dense coverage on textured plane
    err = np.abs(disp[v] - disp_gt[v])
    assert np.median(err) < 0.3  # subpixel accuracy
    # Depth conversion consistent.
    z = np.asarray(SD.disparity_to_depth(res, fxb))
    zerr = np.abs(z[v] - depth_gt[v]) / depth_gt[v]
    assert np.median(zerr) < 0.05


def test_textureless_rejected():
    left = np.full((120, 160), 100.0, np.float32)
    right = np.full((120, 160), 100.0, np.float32)
    res = SD.zncc_disparity(jnp.asarray(left), jnp.asarray(right), max_disp=32)
    assert not np.asarray(res.valid).any()
