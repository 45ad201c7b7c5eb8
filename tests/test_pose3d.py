"""Pose3d/Rotation3 drift + composition tests (reference test_pose3d parity:
100k small-rotation composes must keep det(R)=1 — test/test_pose3d.cpp:58-84;
we run 10k which exposes the same drift without the renormalize guard)."""

import numpy as np
import jax.numpy as jnp

from visual_odometry_ros_tpu.utils.pose3d import Pose3d, Rotation3
from visual_odometry_ros_tpu.utils import geometry as geo


def test_rotation_drift_stays_normalized():
    dq = Rotation3.from_rotvec(np.array([1e-4, -2e-4, 3e-4], np.float32))
    r = Rotation3()
    for _ in range(10_000):
        r = r * dq
    R = np.asarray(r.R)
    assert abs(np.linalg.det(R) - 1.0) < 1e-5
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert abs(float(jnp.linalg.norm(r.q)) - 1.0) < 1e-6


def test_pose_compose_matches_matrix(rng):
    xa = rng.normal(0, 0.5, 6).astype(np.float32)
    xb = rng.normal(0, 0.5, 6).astype(np.float32)
    A, B = Pose3d.from_se3(xa), Pose3d.from_se3(xb)
    T_ab = np.asarray((A * B).T)
    expect = np.asarray(geo.se3_exp(jnp.asarray(xa))) @ np.asarray(geo.se3_exp(jnp.asarray(xb)))
    np.testing.assert_allclose(T_ab, expect, atol=1e-5)


def test_pose_inverse_and_point_map(rng):
    x = rng.normal(0, 0.5, 6).astype(np.float32)
    P = Pose3d.from_se3(x)
    p = rng.normal(0, 2.0, 3).astype(np.float32)
    q = P * p
    back = np.asarray(P.inverse() * q)
    np.testing.assert_allclose(back, p, atol=1e-5)
    ident = np.asarray((P * P.inverse()).T)
    np.testing.assert_allclose(ident, np.eye(4), atol=1e-5)
