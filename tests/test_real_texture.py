"""End-to-end VO on a REAL-photograph-textured world (r4 VERDICT #7).

Every ZNCC/KLT/BA threshold in this repo was tuned on procedural noise
textures; these tests run the standard pipeline configs over a corridor
whose every surface carries crops of a real photograph
(tests/fixtures/real_texture.png — a grayscale photo with natural image
statistics: smooth regions, strong edges, directional gradients, low-texture
patches). Passing here with the SAME config as the synthetic e2e tests
de-risks the thresholds against natural imagery before real KITTI appears.
"""

import os

import numpy as np
import pytest

from visual_odometry_ros_tpu.config import VOConfig
from visual_odometry_ros_tpu.io.synthetic import photo_corridor, forward_trajectory
from visual_odometry_ros_tpu.io.trajectory import ate_rmse
from visual_odometry_ros_tpu.models.stereo_vo import StereoVO

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "real_texture.png")


def _cfg():
    # Same parameter surface as tests/test_stereo_vo_pipeline._small_cfg —
    # the point is that the synthetic-tuned config transfers unchanged.
    cfg = VOConfig()
    cfg.cam.fx = cfg.cam.fy = 500.0
    cfg.cam.cx, cfg.cam.cy = 320.0, 240.0
    cfg.cam.width, cfg.cam.height = 640, 480
    cfg.cam_right = cfg.cam
    cfg.T_lr = np.eye(4, dtype=np.float32)
    cfg.T_lr[0, 3] = 0.5
    cfg.flagDoUndistortion = False
    cfg.extractor.n_features = 384
    cfg.extractor.n_bins_u = 16
    cfg.extractor.n_bins_v = 10
    cfg.extractor.score_min = 10.0
    cfg.extractor.thres_fastscore = 8.0
    cfg.map.landmark_capacity = 2048
    cfg.keyframe.n_max_keyframes_in_window = 5
    cfg.keyframe.thres_translation = 1.0
    cfg.tracker.max_level = 3
    cfg.tracker.max_iter = 15
    return cfg


def _load_photo():
    from PIL import Image

    return np.asarray(Image.open(FIXTURE).convert("L"), np.float32)


@pytest.fixture(scope="module")
def photo_seq():
    photo = _load_photo()
    poses = forward_trajectory(14, step=0.25, yaw_rate=0.002)
    world = photo_corridor(
        photo, width=640, height=480, baseline=0.5, length=30.0
    )
    frames = [world.stereo_pair(T.astype(np.float64)) for T in poses]
    return world, poses, frames


def test_fixture_is_a_real_photo():
    """Guard the fixture itself: natural-image statistics, not noise —
    a photograph's gradient-magnitude distribution is heavy-tailed (most
    pixels smooth, few strong edges), procedural smoothed noise is not."""
    photo = _load_photo()
    gy, gx = np.gradient(photo)
    mag = np.hypot(gx, gy)
    # kurtosis of gradient magnitudes: natural images >> Gaussian noise (~3)
    m = mag - mag.mean()
    kurt = (m**4).mean() / (m**2).mean() ** 2
    assert kurt > 6.0, f"fixture gradient kurtosis {kurt:.1f} looks procedural"
    assert photo.shape[0] >= 256 and photo.shape[1] >= 256


def test_stereo_vo_on_real_texture(photo_seq):
    world, poses_gt, frames = photo_seq
    vo = StereoVO(_cfg())
    for il, ir in frames:
        vo.track_stereo_images(il, ir)
    traj = np.stack(vo.trajectory)
    ate = float(ate_rmse(traj, poses_gt, align="none"))
    dist = float(np.sum(np.linalg.norm(np.diff(poses_gt[:, :3, 3], axis=0), axis=-1)))
    # Same drift contract as the synthetic e2e: small absolute drift over
    # ~3.3 m of travel, metric scale recovered from stereo.
    assert ate < 0.05, f"stereo ATE {ate:.4f} m over {dist:.1f} m on real texture"
    n_fail = sum(1 for s in vo.stats_log if s.get("pose_ok") is False)
    assert n_fail <= 2, f"{n_fail} pose failures on real texture"


def test_mono_vo_on_real_texture(photo_seq):
    from visual_odometry_ros_tpu.models.mono_vo import MonoVO

    world, poses_gt, frames = photo_seq
    vo = MonoVO(_cfg())
    for il, _ in frames:
        vo.track_image(il)
    traj = np.stack(vo.trajectory)
    assert vo.phase == 2, "mono never bootstrapped on real texture"
    b = vo.kf_trajectory[0][0] if vo.kf_trajectory else 0
    ate = float(ate_rmse(traj[b:], poses_gt[b : len(traj)], align="sim3"))
    assert ate < 0.08, f"mono sim3 ATE {ate:.4f} m on real texture"
