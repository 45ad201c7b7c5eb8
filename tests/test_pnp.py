"""PnP RANSAC tests on synthetic 3D-2D correspondences."""

import numpy as np
import jax
import jax.numpy as jnp

from visual_odometry_ros_tpu.ops import pnp
from visual_odometry_ros_tpu.utils import geometry as geo

FX = FY = 700.0
CX, CY = 320.0, 240.0


def _problem(rng, n=256, outlier_frac=0.0, noise=0.3):
    Xw = np.stack([rng.uniform(-6, 6, n), rng.uniform(-4, 4, n), rng.uniform(4, 30, n)], -1).astype(np.float32)
    xi = np.array([0.4, -0.15, 0.2, 0.03, 0.08, -0.02], np.float32)
    T_cw = np.asarray(geo.se3_exp(jnp.asarray(xi)))
    Xc = Xw @ T_cw[:3, :3].T + T_cw[:3, 3]
    pts = np.stack([Xc[:, 0] / Xc[:, 2] * FX + CX, Xc[:, 1] / Xc[:, 2] * FY + CY], -1).astype(np.float32)
    pts += rng.normal(0, noise, pts.shape).astype(np.float32)
    n_out = int(outlier_frac * n)
    out_idx = rng.choice(n, n_out, replace=False)
    pts[out_idx] += rng.uniform(25, 90, (n_out, 2)).astype(np.float32)
    return Xw, pts, T_cw, out_idx


def _errors(T_est, T_gt):
    dT = np.asarray(geo.se3_inverse(jnp.asarray(T_est))) @ T_gt
    et = np.linalg.norm(dT[:3, 3])
    er = np.degrees(np.arccos(np.clip((np.trace(dT[:3, :3]) - 1) / 2, -1, 1)))
    return et, er


def test_pnp_clean(rng):
    Xw, pts, T_gt, _ = _problem(rng)
    res = pnp.pnp_ransac(
        jnp.asarray(Xw), jnp.asarray(pts), jnp.ones(len(Xw), bool), jax.random.key(1), FX, FY, CX, CY
    )
    assert bool(res.ok)
    et, er = _errors(res.T_cw, T_gt)
    assert et < 5e-3 and er < 0.05
    assert int(res.n_inliers) > 0.95 * len(Xw)


def test_pnp_with_outliers(rng):
    Xw, pts, T_gt, out_idx = _problem(rng, outlier_frac=0.3)
    res = pnp.pnp_ransac(
        jnp.asarray(Xw), jnp.asarray(pts), jnp.ones(len(Xw), bool), jax.random.key(2), FX, FY, CX, CY
    )
    assert bool(res.ok) or int(res.n_inliers) > 0.6 * len(Xw)
    et, er = _errors(res.T_cw, T_gt)
    assert et < 1e-2 and er < 0.1
    inl = np.asarray(res.inliers)
    assert inl[out_idx].mean() < 0.05


def test_pnp_rejects_garbage(rng):
    """Random uncorrelated observations: ok must be False."""
    Xw = rng.uniform(-5, 5, (128, 3)).astype(np.float32)
    Xw[:, 2] += 10
    pts = rng.uniform(0, 640, (128, 2)).astype(np.float32)
    res = pnp.pnp_ransac(
        jnp.asarray(Xw), jnp.asarray(pts), jnp.ones(128, bool), jax.random.key(3), FX, FY, CX, CY
    )
    assert not bool(res.ok)
