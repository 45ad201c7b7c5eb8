"""Dataset reader + trajectory IO tests on fabricated tiny layouts."""

import os

import numpy as np

from visual_odometry_ros_tpu.io import datasets as DS
from visual_odometry_ros_tpu.io import trajectory as TJ


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr.astype(np.uint8)).save(path)


def _make_kitti(tmp_path, n=3):
    seq = tmp_path / "sequences" / "00"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.uniform(0, 255, (64, 96)).astype(np.uint8)
        _write_png(seq / "image_0" / f"{i:06d}.png", img)
        _write_png(seq / "image_1" / f"{i:06d}.png", img)
    (seq / "times.txt").write_text("".join(f"{i*0.1:.6f}\n" for i in range(n)))
    (seq / "calib.txt").write_text(
        "P0: 718.856 0 607.1928 0 0 718.856 185.2157 0 0 0 1 0\n"
        "P1: 718.856 0 607.1928 -386.1448 0 718.856 185.2157 0 0 0 1 0\n"
    )
    poses = tmp_path / "poses"
    poses.mkdir()
    lines = []
    for i in range(n):
        T = np.eye(4)
        T[2, 3] = i * 0.5
        lines.append(" ".join(str(v) for v in T[:3, :4].reshape(-1)))
    (poses / "00.txt").write_text("\n".join(lines))
    return tmp_path


def test_kitti_reader(tmp_path):
    root = _make_kitti(tmp_path)
    ds = DS.KittiOdometry(str(root), "00")
    assert len(ds) == 3
    cfg = ds.config()
    assert abs(cfg.cam.fx - 718.856) < 1e-6
    assert abs(float(cfg.T_lr[0, 3]) - 386.1448 / 718.856) < 1e-5
    assert cfg.cam.width == 96 and cfg.cam.height == 64
    frames = list(ds)
    assert len(frames) == 3
    t, l, r = frames[1]
    assert abs(t - 0.1) < 1e-9
    assert l.shape == (64, 96) and l.dtype == np.float32
    assert ds.gt_poses is not None and ds.gt_poses.shape == (3, 4, 4)
    assert abs(ds.gt_poses[2][2, 3] - 1.0) < 1e-9


def _make_euroc(tmp_path, n=3):
    rng = np.random.default_rng(0)
    for cam in ("cam0", "cam1"):
        d = tmp_path / "mav0" / cam / "data"
        d.mkdir(parents=True)
        rows = ["#timestamp [ns],filename"]
        for i in range(n):
            t = 1403636579763555584 + i * 50_000_000
            name = f"{t}.png"
            _write_png(d / name, rng.uniform(0, 255, (48, 64)).astype(np.uint8))
            rows.append(f"{t},{name}")
        (tmp_path / "mav0" / cam / "data.csv").write_text("\n".join(rows))
    gt_dir = tmp_path / "mav0" / "state_groundtruth_estimate0"
    gt_dir.mkdir(parents=True)
    rows = ["#t,px,py,pz,qw,qx,qy,qz"]
    for i in range(n):
        t = 1403636579763555584 + i * 50_000_000
        rows.append(f"{t},{0.1*i},0,0,1,0,0,0")
    (gt_dir / "data.csv").write_text("\n".join(rows))
    return tmp_path


def test_euroc_reader(tmp_path):
    root = _make_euroc(tmp_path)
    ds = DS.EurocMav(str(root))
    assert ds.stereo and len(ds) == 3
    frames = list(ds)
    t, l, r = frames[0]
    assert l.shape == (48, 64) and r.shape == (48, 64)
    ts, poses = ds.gt
    assert poses.shape == (3, 4, 4)


def test_prefetcher_order():
    items = list(range(20))
    out = list(DS.Prefetcher(iter(items), depth=3))
    assert out == items


def test_trajectory_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    poses = []
    for i in range(5):
        T = np.eye(4)
        T[:3, 3] = rng.normal(0, 1, 3)
        poses.append(T)
    path = str(tmp_path / "traj.txt")
    TJ.save_kitti_trajectory(path, poses)
    ids, loaded = TJ.load_kitti_trajectory(path)
    assert list(ids) == list(range(5))
    np.testing.assert_allclose(loaded, np.stack(poses), atol=1e-8)


def test_ate_alignment_invariance(rng):
    # A rigidly transformed trajectory has zero ATE under se3 alignment.
    poses = []
    for i in range(10):
        T = np.eye(4)
        T[:3, 3] = [0.1 * i, np.sin(i * 0.2), 0.05 * i * i]
        poses.append(T)
    gt = np.stack(poses)
    R = TJ.umeyama_alignment(rng.normal(0, 1, (4, 3)), rng.normal(0, 1, (4, 3)))[1]
    est = gt.copy()
    for i in range(10):
        est[i] = np.block([[R, np.array([[1.0], [2.0], [3.0]])], [np.zeros((1, 3)), 1]]) @ gt[i]
    assert TJ.ate_rmse(est, gt, align="se3") < 1e-6
    # With scale corruption, sim3 fixes it but se3 does not.
    est_s = est.copy()
    est_s[:, :3, 3] *= 2.0
    assert TJ.ate_rmse(est_s, gt, align="sim3") < 1e-5
    assert TJ.ate_rmse(est_s, gt, align="se3") > 0.1
