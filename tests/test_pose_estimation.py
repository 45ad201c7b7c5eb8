"""Pose-only GN and essential-matrix RANSAC tests on synthetic geometry."""

import numpy as np
import jax
import jax.numpy as jnp

from visual_odometry_ros_tpu.ops import pose_gn, epipolar
from visual_odometry_ros_tpu.utils import geometry as geo

FX = FY = 700.0
CX, CY = 320.0, 240.0


def _scene(rng, n=256, depth=(4, 40)):
    X = np.stack(
        [rng.uniform(-6, 6, n), rng.uniform(-4, 4, n), rng.uniform(*depth, n)], axis=-1
    ).astype(np.float32)
    return X


def _project(X):
    return np.stack([X[:, 0] / X[:, 2] * FX + CX, X[:, 1] / X[:, 2] * FY + CY], -1).astype(np.float32)


def test_pose_gn_mono_recovers_motion(rng):
    X0 = _scene(rng)
    xi_true = np.array([0.3, -0.1, 0.05, 0.01, 0.03, -0.005], np.float32)
    T_true = geo.se3_exp(jnp.asarray(xi_true))
    X1 = np.asarray(geo.transform_points(T_true, jnp.asarray(X0)))
    pts1 = _project(X1) + rng.normal(0, 0.2, (len(X0), 2)).astype(np.float32)
    valid = np.ones(len(X0), bool)

    res = pose_gn.pose_only_gn_mono(
        jnp.asarray(X0), jnp.asarray(pts1), jnp.asarray(valid), FX, FY, CX, CY, jnp.eye(4)
    )
    assert bool(res.ok)
    xi_est = np.asarray(geo.se3_log(res.T10))
    np.testing.assert_allclose(xi_est, xi_true, atol=5e-3)
    assert float(res.mean_err) < 0.5
    assert np.asarray(res.inliers).mean() > 0.9


def test_pose_gn_mono_with_outliers(rng):
    X0 = _scene(rng)
    xi_true = np.array([0.2, 0.05, -0.02, -0.02, 0.01, 0.01], np.float32)
    T_true = geo.se3_exp(jnp.asarray(xi_true))
    X1 = np.asarray(geo.transform_points(T_true, jnp.asarray(X0)))
    pts1 = _project(X1) + rng.normal(0, 0.2, (len(X0), 2)).astype(np.float32)
    # 15% gross outliers
    n_out = int(0.15 * len(X0))
    out_idx = rng.choice(len(X0), n_out, replace=False)
    pts1[out_idx] += rng.uniform(20, 80, (n_out, 2)).astype(np.float32)
    valid = np.ones(len(X0), bool)

    res = pose_gn.pose_only_gn_mono(
        jnp.asarray(X0), jnp.asarray(pts1), jnp.asarray(valid), FX, FY, CX, CY, jnp.eye(4)
    )
    xi_est = np.asarray(geo.se3_log(res.T10))
    np.testing.assert_allclose(xi_est, xi_true, atol=2e-2)
    inl = np.asarray(res.inliers)
    assert not inl[out_idx].any()


def test_pose_gn_mono_prior_seed(rng):
    """Constant-velocity-prior seeding: large motion converges when seeded."""
    X0 = _scene(rng)
    xi_true = np.array([1.5, 0.2, 0.1, 0.05, 0.3, 0.02], np.float32)
    T_true = geo.se3_exp(jnp.asarray(xi_true))
    X1 = np.asarray(geo.transform_points(T_true, jnp.asarray(X0)))
    pts1 = _project(X1).astype(np.float32)
    keep = (X1[:, 2] > 0.5) & (np.abs(pts1[:, 0] - CX) < 400) & (np.abs(pts1[:, 1] - CY) < 300)
    valid = keep

    prior = geo.se3_exp(jnp.asarray(xi_true * 0.9))
    res = pose_gn.pose_only_gn_mono(
        jnp.asarray(X0), jnp.asarray(pts1), jnp.asarray(valid), FX, FY, CX, CY, prior
    )
    xi_est = np.asarray(geo.se3_log(res.T10))
    np.testing.assert_allclose(xi_est, xi_true, atol=1e-2)


def test_pose_gn_stereo_metric(rng):
    X0 = _scene(rng)
    baseline = 0.54
    T_rl = np.eye(4, dtype=np.float32)
    T_rl[0, 3] = -baseline  # right cam sees left points shifted
    xi_true = np.array([0.8, 0.0, 0.02, 0.0, 0.05, 0.0], np.float32)
    T_true = geo.se3_exp(jnp.asarray(xi_true))
    Xl1 = np.asarray(geo.transform_points(T_true, jnp.asarray(X0)))
    Xr1 = np.asarray(geo.transform_points(jnp.asarray(T_rl), jnp.asarray(Xl1)))
    pts_l1 = _project(Xl1) + rng.normal(0, 0.15, (len(X0), 2)).astype(np.float32)
    pts_r1 = _project(Xr1) + rng.normal(0, 0.15, (len(X0), 2)).astype(np.float32)
    valid = np.ones(len(X0), bool)
    # Drop right observations for 30% of points; left-only still constrains.
    vr = valid.copy()
    vr[rng.choice(len(X0), int(0.3 * len(X0)), replace=False)] = False

    res = pose_gn.pose_only_gn_stereo(
        jnp.asarray(X0),
        jnp.asarray(pts_l1),
        jnp.asarray(pts_r1),
        jnp.asarray(valid),
        jnp.asarray(vr),
        FX,
        FY,
        CX,
        CY,
        jnp.asarray(T_rl),
        jnp.eye(4),
    )
    assert bool(res.ok)
    xi_est = np.asarray(geo.se3_log(res.T10))
    np.testing.assert_allclose(xi_est, xi_true, atol=5e-3)


def test_essential_ransac_recovers_motion(rng):
    X0 = _scene(rng, n=512)
    t_true = np.array([0.5, 0.1, 0.05], np.float32)
    w_true = np.array([0.02, -0.04, 0.01], np.float32)
    R_true = np.asarray(geo.so3_exp(jnp.asarray(w_true)))
    X1 = X0 @ R_true.T + t_true
    xn0 = (X0[:, :2] / X0[:, 2:3]).astype(np.float32)
    xn1 = (X1[:, :2] / X1[:, 2:3]).astype(np.float32)
    # noise + 20% outliers
    xn0 += rng.normal(0, 0.3 / FX, xn0.shape).astype(np.float32)
    xn1 += rng.normal(0, 0.3 / FX, xn1.shape).astype(np.float32)
    n_out = int(0.2 * len(X0))
    out_idx = rng.choice(len(X0), n_out, replace=False)
    xn1[out_idx] += rng.uniform(0.05, 0.3, (n_out, 2)).astype(np.float32)
    valid = np.ones(len(X0), bool)

    res = epipolar.estimate_essential_ransac(
        jnp.asarray(xn0), jnp.asarray(xn1), jnp.asarray(valid), jax.random.key(0), thresh_px=1.5, focal=FX
    )
    assert bool(res.ok)
    # Rotation error
    dR = np.asarray(res.R_10) @ R_true.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.5
    # Translation direction error
    t_est = np.asarray(res.t_10)
    cos = abs(np.dot(t_est, t_true) / (np.linalg.norm(t_est) * np.linalg.norm(t_true)))
    assert cos > 0.995
    # Outliers flagged
    inl = np.asarray(res.inliers)
    assert inl[out_idx].mean() < 0.2
    assert inl.mean() > 0.5


def test_sampson_distance_zero_for_exact(rng):
    X0 = _scene(rng, n=64)
    t = np.array([0.3, 0.0, 0.1], np.float32)
    R = np.asarray(geo.so3_exp(jnp.asarray(np.array([0.01, 0.02, -0.01], np.float32))))
    X1 = X0 @ R.T + t
    xn0 = jnp.asarray((X0[:, :2] / X0[:, 2:3]).astype(np.float32))
    xn1 = jnp.asarray((X1[:, :2] / X1[:, 2:3]).astype(np.float32))
    E = epipolar.essential_from_rt(jnp.asarray(R), jnp.asarray(t))
    d = np.asarray(epipolar.sampson_distance(E, xn0, xn1))
    assert np.max(d) < 1e-8


def test_steering_angle_histogram(rng):
    # Pure planar motion: forward + yaw. All pairs vote the same angle.
    X0 = _scene(rng, n=256)
    yaw = 0.06
    R = np.asarray(geo.so3_exp(jnp.asarray(np.array([0.0, yaw, 0.0], np.float32))))
    t = np.array([np.sin(yaw / 2), 0.0, np.cos(yaw / 2)], np.float32) * 0.4
    X1 = X0 @ R.T + t  # NOTE: circle-arc model
    xn0 = jnp.asarray((X0[:, :2] / X0[:, 2:3]).astype(np.float32))
    xn1 = jnp.asarray((X1[:, :2] / X1[:, 2:3]).astype(np.float32))
    med, psi = epipolar.steering_angle_histogram(xn0, xn1, jnp.ones(256, bool))
    assert np.isfinite(float(med))


def test_one_point_pose_recovers_yaw_and_gates_outliers(rng):
    # Circle-arc planar motion (the 1-point model): R = R_y(th), t ~ [sin(th/2), 0, cos(th/2)].
    fx = fy = 500.0
    cx, cy = 320.0, 240.0
    th = 0.08
    X0 = _scene(rng, n=256)
    R = np.asarray(epipolar.geo.so3_exp(jnp.asarray(np.array([0.0, th, 0.0], np.float32))))
    t = np.array([np.sin(th / 2), 0.0, np.cos(th / 2)], np.float32) * 0.5
    X1 = X0 @ R.T + t
    p0 = (X0[:, :2] / X0[:, 2:3]) * np.array([fx, fy]) + np.array([cx, cy])
    p1 = (X1[:, :2] / X1[:, 2:3]) * np.array([fx, fy]) + np.array([cx, cy])
    # Corrupt a third of the matches far off the epipolar line.
    n_bad = 80
    p1_bad = p1.copy()
    p1_bad[:n_bad] += rng.uniform(60, 120, (n_bad, 2)) * np.sign(rng.standard_normal((n_bad, 2)))
    res = epipolar.one_point_pose(
        jnp.asarray(p0, jnp.float32),
        jnp.asarray(p1_bad, jnp.float32),
        jnp.ones(256, bool),
        fx, fy, cx, cy,
        thres_px=3.0,
    )
    # Median angle within one 400-bin width of truth despite 31% outliers.
    assert abs(float(res.theta) - th) < 2 * (1.0 / 400)
    inl = np.asarray(res.inliers)
    assert inl[n_bad:].mean() > 0.95  # clean matches kept
    assert inl[:n_bad].mean() < 0.2  # corrupted matches rejected
    # R_10 is the yaw rotation it claims to be.
    R_expect = np.asarray(epipolar.geo.so3_exp(jnp.asarray(np.array([0.0, float(res.theta), 0.0], np.float32))))
    assert np.allclose(np.asarray(res.R_10), R_expect, atol=1e-5)
