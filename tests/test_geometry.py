"""L0 geometry unit tests against NumPy/SciPy-style oracles."""

import numpy as np
import jax.numpy as jnp

from visual_odometry_ros_tpu.utils import geometry as geo


def _rand_rotvec(rng, n, scale=1.0):
    return (rng.standard_normal((n, 3)) * scale).astype(np.float32)


def _rodrigues_np(w):
    theta = np.linalg.norm(w)
    if theta < 1e-10:
        return np.eye(3)
    k = w / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K


def test_so3_exp_matches_rodrigues(rng):
    ws = _rand_rotvec(rng, 32)
    R = np.asarray(geo.so3_exp(jnp.asarray(ws)))
    for i in range(32):
        np.testing.assert_allclose(R[i], _rodrigues_np(ws[i]), atol=1e-5)


def test_so3_exp_log_roundtrip(rng):
    ws = _rand_rotvec(rng, 64, scale=0.8)
    w2 = np.asarray(geo.so3_log(geo.so3_exp(jnp.asarray(ws))))
    np.testing.assert_allclose(w2, ws, atol=1e-4)


def test_so3_exp_small_angle(rng):
    ws = _rand_rotvec(rng, 8, scale=1e-8)
    R = np.asarray(geo.so3_exp(jnp.asarray(ws)))
    for i in range(8):
        np.testing.assert_allclose(R[i], np.eye(3), atol=1e-6)
    w2 = np.asarray(geo.so3_log(geo.so3_exp(jnp.asarray(ws))))
    assert np.all(np.isfinite(w2))


def test_se3_exp_log_roundtrip(rng):
    xi = (rng.standard_normal((32, 6)) * 0.5).astype(np.float32)
    T = geo.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(geo.se3_log(T))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_se3_inverse(rng):
    xi = (rng.standard_normal((16, 6)) * 0.5).astype(np.float32)
    T = geo.se3_exp(jnp.asarray(xi))
    I = np.asarray(T @ geo.se3_inverse(T))
    np.testing.assert_allclose(I, np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-5)


def test_se3_exp_is_valid_transform(rng):
    xi = (rng.standard_normal((16, 6))).astype(np.float32)
    T = np.asarray(geo.se3_exp(jnp.asarray(xi)))
    R = T[:, :3, :3]
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(16), atol=1e-5)
    np.testing.assert_allclose(T[:, 3], np.broadcast_to(np.array([0, 0, 0, 1.0]), (16, 4)), atol=0)


def test_add_front_se3(rng):
    xi = (rng.standard_normal((6,)) * 0.1).astype(np.float32)
    T = geo.se3_exp(jnp.asarray((rng.standard_normal((6,)) * 0.5).astype(np.float32)))
    out = geo.add_front_se3(T, jnp.asarray(xi))
    expect = np.asarray(geo.se3_exp(jnp.asarray(xi))) @ np.asarray(T)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_quat_rotation_roundtrip(rng):
    ws = _rand_rotvec(rng, 64)
    R = geo.so3_exp(jnp.asarray(ws))
    q = geo.rotation_to_quat(R)
    R2 = np.asarray(geo.quat_to_rotation(q))
    np.testing.assert_allclose(R2, np.asarray(R), atol=1e-5)


def test_quat_multiply_matches_rotation_compose(rng):
    w1 = jnp.asarray(_rand_rotvec(rng, 16))
    w2 = jnp.asarray(_rand_rotvec(rng, 16))
    q1, q2 = geo.rotvec_to_quat(w1), geo.rotvec_to_quat(w2)
    R12 = np.asarray(geo.quat_to_rotation(geo.quat_multiply(q1, q2)))
    expect = np.asarray(geo.so3_exp(w1)) @ np.asarray(geo.so3_exp(w2))
    np.testing.assert_allclose(R12, expect, atol=1e-5)


def test_transform_points(rng):
    xi = (rng.standard_normal((6,)) * 0.5).astype(np.float32)
    T = geo.se3_exp(jnp.asarray(xi))
    X = rng.standard_normal((10, 3)).astype(np.float32)
    out = np.asarray(geo.transform_points(T, jnp.asarray(X)))
    Tn = np.asarray(T)
    expect = (Tn[:3, :3] @ X.T).T + Tn[:3, 3]
    np.testing.assert_allclose(out, expect, atol=1e-5)
