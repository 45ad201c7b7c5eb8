"""Camera model + triangulation tests."""

import numpy as np
import jax.numpy as jnp

from visual_odometry_ros_tpu import camera as cam_mod
from visual_odometry_ros_tpu.ops import triangulate as tri
from visual_odometry_ros_tpu.utils import geometry as geo


def _kitti_cam():
    return cam_mod.make_camera(718.856, 718.856, 607.1928, 185.2157, width=1241, height=376)


def test_project_backproject_roundtrip(rng):
    cam = _kitti_cam()
    X = np.stack(
        [
            rng.uniform(-10, 10, 100),
            rng.uniform(-5, 5, 100),
            rng.uniform(2, 50, 100),
        ],
        axis=-1,
    ).astype(np.float32)
    p = cam_mod.project_to_pixel(cam, jnp.asarray(X))
    xn = np.asarray(cam_mod.pixel_to_normalized(cam, p))
    expect = X[:, :2] / X[:, 2:3]
    np.testing.assert_allclose(xn, expect, atol=1e-5)


def test_distort_undistort_roundtrip(rng):
    cam = cam_mod.make_camera(458.0, 457.0, 367.0, 248.0, dist=[-0.28, 0.07, 1e-4, -2e-5, 0.0], width=752, height=480)
    xn = rng.uniform(-0.5, 0.5, (200, 2)).astype(np.float32)
    xd = cam_mod.distort_normalized(cam, jnp.asarray(xn))
    xn2 = np.asarray(cam_mod.undistort_normalized(cam, xd, iters=30))
    np.testing.assert_allclose(xn2, xn, atol=1e-5)


def test_image_undistort_maps_zero_distortion():
    cam = _kitti_cam()
    maps = np.asarray(cam_mod.image_undistort_maps(cam))
    uu, vv = np.meshgrid(np.arange(1241, dtype=np.float32), np.arange(376, dtype=np.float32))
    np.testing.assert_allclose(maps[..., 0], uu, atol=1e-3)
    np.testing.assert_allclose(maps[..., 1], vv, atol=1e-3)


def test_in_image_border():
    cam = _kitti_cam()
    p = jnp.asarray([[2.0, 100.0], [100.0, 100.0], [1239.0, 100.0], [100.0, 374.0]])
    m = np.asarray(cam_mod.in_image(cam, p, border=3.0))
    assert list(m) == [False, True, False, False]


def test_triangulate_exact(rng):
    # Ground-truth points + two known camera poses; triangulation must recover.
    X_w = np.stack(
        [rng.uniform(-5, 5, 64), rng.uniform(-3, 3, 64), rng.uniform(4, 40, 64)], axis=-1
    ).astype(np.float32)
    xi = np.array([0.5, 0.02, 0.01, 0.01, 0.2, 0.005], np.float32)  # cam1 motion
    T_10 = geo.se3_exp(jnp.asarray(xi))  # frame0 -> frame1
    X0 = jnp.asarray(X_w)
    X1 = geo.transform_points(T_10, X0)
    xn0 = np.asarray(X0[:, :2] / X0[:, 2:3])
    xn1 = np.asarray(X1[:, :2] / X1[:, 2:3])
    Xa, Xb = tri.triangulate(jnp.asarray(xn0), jnp.asarray(xn1), T_10)
    np.testing.assert_allclose(np.asarray(Xa), X_w, atol=2e-2)
    np.testing.assert_allclose(np.asarray(Xb), np.asarray(X1), atol=2e-2)


def test_triangulate_noisy_reasonable(rng):
    X_w = np.stack(
        [rng.uniform(-5, 5, 256), rng.uniform(-3, 3, 256), rng.uniform(4, 20, 256)], axis=-1
    ).astype(np.float32)
    T_10 = geo.se3_exp(jnp.asarray(np.array([0.5, 0, 0, 0, 0.1, 0], np.float32)))
    X0 = jnp.asarray(X_w)
    X1 = geo.transform_points(T_10, X0)
    xn0 = np.asarray(X0[:, :2] / X0[:, 2:3]) + rng.normal(0, 5e-4, (256, 2))
    xn1 = np.asarray(X1[:, :2] / X1[:, 2:3]) + rng.normal(0, 5e-4, (256, 2))
    Xa, _ = tri.triangulate(jnp.asarray(xn0, dtype=jnp.float32), jnp.asarray(xn1, dtype=jnp.float32), T_10)
    err = np.linalg.norm(np.asarray(Xa) - X_w, axis=-1)
    assert np.median(err) < 0.5


def test_stereo_depth():
    z, valid = tri.stereo_depth_from_disparity(jnp.asarray(718.0), jnp.asarray(0.54), jnp.asarray([38.772, 0.0]))
    assert valid[0] and not valid[1]
    np.testing.assert_allclose(z[0], 718.0 * 0.54 / 38.772, rtol=1e-5)


def test_stereo_rectification_identity_case():
    # Pure-baseline stereo with identical distortion-free cameras: rectification
    # must be (nearly) a no-op up to the principal-point recentring.
    left = cam_mod.make_camera(700.0, 700.0, 320.0, 240.0, width=640, height=480)
    right = cam_mod.make_camera(700.0, 700.0, 320.0, 240.0, width=640, height=480)
    T_lr = np.eye(4, dtype=np.float32)
    T_lr[0, 3] = 0.5
    stereo = cam_mod.make_stereo_camera(left, right, jnp.asarray(T_lr))
    np.testing.assert_allclose(float(stereo.baseline), 0.5, rtol=1e-6)
    # rect K: f = 700, c = image center
    assert float(stereo.rect.fx) == 700.0
    assert float(stereo.rect.cx) == 320.0
    # Identity rotation -> maps equal the pixel grid
    uu, vv = np.meshgrid(np.arange(640, dtype=np.float32), np.arange(480, dtype=np.float32))
    np.testing.assert_allclose(np.asarray(stereo.map_left[..., 0]), uu, atol=1e-3)
    np.testing.assert_allclose(np.asarray(stereo.map_left[..., 1]), vv, atol=1e-3)
    np.testing.assert_allclose(np.asarray(stereo.map_right[..., 1]), vv, atol=1e-3)
    # Rectified extrinsic rotation is identity
    np.testing.assert_allclose(np.asarray(stereo.T_lr_rect)[:3, :3], np.eye(3), atol=1e-6)


def test_stereo_rectification_rotated_right_cam(rng):
    # Right camera slightly rotated: rectified rays must land on the same
    # epipolar row (v equal for left/right projections of one 3D point).
    left = cam_mod.make_camera(700.0, 700.0, 320.0, 240.0, width=640, height=480)
    right = cam_mod.make_camera(705.0, 702.0, 318.0, 242.0, width=640, height=480)
    w = np.array([0.01, -0.02, 0.005], np.float32)
    R_lr = np.asarray(geo.so3_exp(jnp.asarray(w)))
    T_lr = np.eye(4, dtype=np.float32)
    T_lr[:3, :3] = R_lr
    T_lr[:3, 3] = [0.5, 0.002, -0.001]
    stereo = cam_mod.make_stereo_camera(left, right, jnp.asarray(T_lr))
    # Project random 3D points through both *rectified* cameras: v must match.
    X_l = np.stack([rng.uniform(-3, 3, 64), rng.uniform(-2, 2, 64), rng.uniform(5, 30, 64)], -1).astype(np.float32)
    # rectified frame: X_n = R_0n^T X_l ; but T_lr_rect has identity rotation so
    # v-coords of the two projections must agree.
    T_rl_rect = np.asarray(geo.se3_inverse(stereo.T_lr_rect))
    Xl = jnp.asarray(X_l)
    Xr = geo.transform_points(jnp.asarray(T_rl_rect), Xl)
    pl = np.asarray(cam_mod.project_to_pixel(stereo.rect, Xl))
    pr = np.asarray(cam_mod.project_to_pixel(stereo.rect, Xr))
    np.testing.assert_allclose(pl[:, 1], pr[:, 1], atol=1e-3)
    # Disparity consistent with depth
    disp = pl[:, 0] - pr[:, 0]
    z = float(stereo.rect.fx) * float(stereo.baseline) / disp
    np.testing.assert_allclose(z, X_l[:, 2], rtol=1e-4)
