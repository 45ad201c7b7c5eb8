"""Device-resident multi-frame scan vs sequential per-frame driver equality."""

import numpy as np

from visual_odometry_ros_tpu.io.synthetic import PlaneSequence, forward_trajectory
from visual_odometry_ros_tpu.models.stereo_vo import StereoVO

import importlib.util as _ilu

_spec = _ilu.spec_from_file_location("svt", __file__.replace("test_scan_batch.py", "test_stereo_vo_pipeline.py"))
_svt = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_svt)


def test_scan_batch_matches_sequential():
    world = PlaneSequence(z0=14.0, sx=0.3, sy=0.15, baseline=0.5)
    poses = forward_trajectory(9, step=0.22, yaw_rate=0.0015)
    frames = [world.stereo_pair(T.astype(np.float64)) for T in poses]
    ils = np.stack([f[0] for f in frames])
    irs = np.stack([f[1] for f in frames])

    vo_seq = StereoVO(_svt._small_cfg())
    for il, ir in frames:
        vo_seq.track_stereo_images(il, ir)

    vo_scan = StereoVO(_svt._small_cfg())
    vo_scan.track_stereo_batch(ils[:5], irs[:5])  # includes frame-0 bootstrap
    vo_scan.track_stereo_batch(ils[5:], irs[5:])

    t_seq = np.stack(vo_seq.trajectory)
    t_scan = np.stack(vo_scan.trajectory)
    assert t_seq.shape == t_scan.shape
    np.testing.assert_allclose(t_scan, t_seq, atol=1e-4)

    kf_seq = [s["keyframe"] for s in vo_seq.stats_log]
    kf_scan = [s["keyframe"] for s in vo_scan.stats_log]
    assert kf_seq == kf_scan
