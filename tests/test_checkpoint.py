"""Checkpoint/resume: bit-exact state roundtrip and resumed tracking."""

import numpy as np
import jax
import pytest

from visual_odometry_ros_tpu.io import checkpoint as CK
from visual_odometry_ros_tpu.io.synthetic import PlaneSequence, forward_trajectory
from visual_odometry_ros_tpu.models.stereo_vo import StereoVO

import importlib.util as _ilu

_spec = _ilu.spec_from_file_location("svt", __file__.replace("test_checkpoint.py", "test_stereo_vo_pipeline.py"))
_svt = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_svt)


@pytest.fixture(scope="module")
def frames():
    world = PlaneSequence(z0=14.0, sx=0.3, sy=0.15, baseline=0.5)
    poses = forward_trajectory(10, step=0.22, yaw_rate=0.0015)
    return [world.stereo_pair(T.astype(np.float64)) for T in poses]


def test_checkpoint_roundtrip_and_resume(tmp_path, frames):
    vo = StereoVO(_svt._small_cfg())
    for il, ir in frames[:6]:
        vo.track_stereo_images(il, ir)
    CK.save_vo(str(tmp_path / "ck"), vo)
    # Continue the original.
    for il, ir in frames[6:]:
        vo.track_stereo_images(il, ir)
    ref_traj = np.stack(vo.trajectory)

    # Resume a fresh driver from the checkpoint and replay the tail.
    vo2 = StereoVO(_svt._small_cfg())
    CK.load_vo(str(tmp_path / "ck"), vo2)
    assert len(vo2.trajectory) == 6
    for il, ir in frames[6:]:
        vo2.track_stereo_images(il, ir)
    traj2 = np.stack(vo2.trajectory)
    np.testing.assert_allclose(traj2, ref_traj, atol=1e-5)


def test_state_leaf_roundtrip(tmp_path, frames):
    vo = StereoVO(_svt._small_cfg())
    il, ir = frames[0]
    vo.track_stereo_images(il, ir)
    CK.save_state(str(tmp_path / "s.npz"), vo.state)
    loaded = CK.load_state(str(tmp_path / "s.npz"), vo.state)
    for a, b in zip(jax.tree_util.tree_leaves(vo.state), jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_rejects_shape_mismatch(tmp_path, frames):
    vo = StereoVO(_svt._small_cfg())
    il, ir = frames[0]
    vo.track_stereo_images(il, ir)
    CK.save_state(str(tmp_path / "s.npz"), vo.state)
    cfg2 = _svt._small_cfg()
    cfg2.extractor.n_features = 128  # different capacity
    vo2 = StereoVO(cfg2)
    vo2.track_stereo_images(il, ir)
    with pytest.raises((ValueError, KeyError)):
        CK.load_state(str(tmp_path / "s.npz"), vo2.state)
