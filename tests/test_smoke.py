"""Fast smoke tier (<60 s): tiny-frame end-to-end sanity for stereo + mono.

Purpose (r3 post-mortem / VERDICT #6): the full suite takes ~8 minutes, so
it was skipped before the round-3 snapshot — which shipped a stereo pipeline
that estimated zero motion. This tier compiles in seconds (160x120 frames,
tiny capacities) and fails loudly on exactly that class of regression:
  - stereo must recover metric forward motion (not zero, right scale),
  - mono must bootstrap and track up-to-scale,
  - pose GN and the 8-point essential must solve clean synthetic problems.

Run it (plus bench.py) before every end-of-round commit:
    python -m pytest tests/test_smoke.py -q
"""

import numpy as np
import jax.numpy as jnp
import pytest

from visual_odometry_ros_tpu.config import VOConfig
from visual_odometry_ros_tpu.io.synthetic import PlaneSequence, TwoPlaneSequence, forward_trajectory
from visual_odometry_ros_tpu.io.trajectory import ate_rmse


def _tiny_cfg(mono=False):
    cfg = VOConfig()
    cfg.cam.fx = cfg.cam.fy = 120.0
    cfg.cam.cx, cfg.cam.cy = 80.0, 60.0
    cfg.cam.width, cfg.cam.height = 160, 120
    cfg.cam_right = cfg.cam
    cfg.T_lr = np.eye(4, dtype=np.float32)
    cfg.T_lr[0, 3] = 0.5
    cfg.flagDoUndistortion = False
    cfg.extractor.n_features = 128
    cfg.extractor.n_bins_u = 8
    cfg.extractor.n_bins_v = 6
    cfg.extractor.score_min = 8.0
    cfg.extractor.thres_fastscore = 6.0
    cfg.map.landmark_capacity = 512
    cfg.keyframe.n_max_keyframes_in_window = 4
    cfg.keyframe.thres_translation = 0.8
    cfg.tracker.max_level = 2
    cfg.tracker.max_iter = 12
    cfg.tracker.window_size = 15
    if mono:
        cfg.map.thres_parallax = 0.4
        cfg.keyframe.thres_translation = 1e9
        cfg.keyframe.thres_overlap_ratio = 0.75
    return cfg


def test_smoke_stereo_moves_with_metric_scale():
    world = PlaneSequence(
        width=160, height=120, fx=120.0, fy=120.0, cx=80.0, cy=60.0,
        z0=10.0, sx=0.3, sy=0.15, baseline=0.5, tex_scale=12.0,
    )
    poses = forward_trajectory(8, step=0.22, yaw_rate=0.0)
    frames = [world.stereo_pair(T.astype(np.float64)) for T in poses]

    from visual_odometry_ros_tpu.models.stereo_vo import StereoVO

    vo = StereoVO(_tiny_cfg())
    il = np.stack([l for l, _ in frames])
    ir = np.stack([r for _, r in frames])
    vo.track_stereo_batch(il, ir)
    traj = np.stack(vo.trajectory)
    gt_fwd = float(poses[-1][2, 3])
    est_fwd = float(traj[-1][2, 3])
    # The r3 regression: est_fwd was 0.0. Demand metric scale within 15%.
    assert est_fwd > 0.5 * gt_fwd, f"stereo barely moved: {est_fwd} vs {gt_fwd}"
    assert abs(est_fwd - gt_fwd) < 0.15 * gt_fwd
    assert ate_rmse(traj, poses, align="none") < 0.10 * gt_fwd
    assert sum(1 for s in vo.stats_log if s.get("pose_ok") is False) <= 1


def test_smoke_mono_bootstraps_and_tracks():
    world = TwoPlaneSequence(
        width=160, height=120, fx=120.0, fy=120.0, cx=80.0, cy=60.0,
        z0_a=8.0, z0_b=16.0, tex_scale=12.0,
    )
    poses = forward_trajectory(10, step=0.25, yaw_rate=0.002, lateral=0.1)
    imgs = [world.stereo_pair(T.astype(np.float64))[0] for T in poses]

    from visual_odometry_ros_tpu.models.mono_vo import MonoVO

    vo = MonoVO(_tiny_cfg(mono=True))
    for im in imgs:
        vo.track_image(im)
    assert vo.phase == 2, "mono never bootstrapped"
    traj = np.stack(vo.trajectory)
    assert float(np.linalg.norm(traj[-1][:3, 3])) > 1e-3, "mono never moved"
    b = vo.kf_trajectory[0][0]
    err = ate_rmse(traj[b:], poses[b: len(traj)], align="sim3")
    assert err < 0.25, f"mono post-init ATE {err}"


def test_smoke_pose_gn_stereo():
    from visual_odometry_ros_tpu.ops import pose_gn as PG
    from visual_odometry_ros_tpu.utils import geometry as geo

    rng = np.random.default_rng(0)
    N = 96
    X0 = np.stack(
        [rng.uniform(-4, 4, N), rng.uniform(-2, 2, N), rng.uniform(4, 20, N)], -1
    ).astype(np.float32)
    xi = np.array([0.05, -0.02, 0.3, 0.01, -0.02, 0.005], np.float32)
    T10 = np.asarray(geo.se3_exp(jnp.asarray(xi)))
    fx = fy = 120.0
    cx, cy = 80.0, 60.0
    T_rl = np.eye(4, dtype=np.float32)
    T_rl[0, 3] = -0.5

    def proj(T, X):
        Xc = X @ T[:3, :3].T + T[:3, 3]
        return np.stack([Xc[:, 0] / Xc[:, 2] * fx + cx, Xc[:, 1] / Xc[:, 2] * fy + cy], -1)

    pts_l = proj(T10, X0) + rng.normal(0, 0.1, (N, 2))
    pts_r = proj(T_rl @ T10, X0) + rng.normal(0, 0.1, (N, 2))
    res, _err = PG.pose_only_gn_stereo_robust(
        jnp.asarray(X0), jnp.asarray(pts_l, jnp.float32), jnp.asarray(pts_r, jnp.float32),
        jnp.ones(N, bool), jnp.ones(N, bool), fx, fy, cx, cy,
        jnp.asarray(T_rl), jnp.eye(4, dtype=jnp.float32),
    )
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.T10)[:3, 3], T10[:3, 3], atol=0.02)


def test_smoke_essential_8pt():
    from visual_odometry_ros_tpu.ops import epipolar as EP
    from visual_odometry_ros_tpu.utils import geometry as geo
    import jax

    rng = np.random.default_rng(1)
    N = 128
    X = np.stack(
        [rng.uniform(-4, 4, N), rng.uniform(-2, 2, N), rng.uniform(4, 20, N)], -1
    ).astype(np.float32)
    xi = np.array([0.2, 0.05, 0.1, 0.01, -0.03, 0.01], np.float32)
    T10 = np.asarray(geo.se3_exp(jnp.asarray(xi)))
    xn0 = (X[:, :2] / X[:, 2:3]).astype(np.float32)
    X1 = X @ T10[:3, :3].T + T10[:3, 3]
    xn1 = (X1[:, :2] / X1[:, 2:3]).astype(np.float32)
    res = EP.estimate_essential_ransac(
        jnp.asarray(xn0), jnp.asarray(xn1), jnp.ones(N, bool),
        jax.random.key(0), thresh_px=1.0, focal=120.0,
    )
    assert bool(res.ok)
    t_est = np.asarray(res.t_10)
    t_true = T10[:3, 3] / np.linalg.norm(T10[:3, 3])
    assert abs(float(np.dot(t_est, t_true))) > 0.99
