"""KLT quality parity vs OpenCV's pyramidal LK (the reference's tracker core).

The reference delegates to cv::calcOpticalFlowPyrLK (feature_tracker.cpp:13-37);
these tests hold our batched IC-KLT to the same tracks OpenCV finds on the
same imagery. cv2 is a test-only oracle — the compute path never imports it.
"""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from visual_odometry_ros_tpu.ops import klt

import importlib.util as _ilu

_spec = _ilu.spec_from_file_location("kltfix", __file__.replace("test_klt_opencv_parity.py", "test_klt.py"))
_k = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_k)


def _cv_track(img0, img1, p0):
    p1, st, err = cv2.calcOpticalFlowPyrLK(
        img0.astype(np.uint8),
        img1.astype(np.uint8),
        p0.reshape(-1, 1, 2).astype(np.float32),
        None,
        winSize=(21, 21),
        maxLevel=3,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01),
    )
    return p1.reshape(-1, 2), st.reshape(-1).astype(bool)


def test_matches_opencv_on_shift(rng):
    img0 = _k._textured_image(rng)
    img1 = _k._shift_image(img0, 6.4, -3.7)
    p0 = _k._grid_points(*img0.shape)

    cv_p1, cv_ok = _cv_track(img0, img1, p0)
    params = klt.KLTParams(levels=4, iters=20)
    our_p1, our_ok = klt.track(
        jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(p0), jnp.ones(len(p0), bool), params
    )
    our_p1, our_ok = np.asarray(our_p1), np.asarray(our_ok)

    both = cv_ok & our_ok
    assert both.mean() > 0.7
    d = np.linalg.norm(our_p1[both] - cv_p1[both], axis=-1)
    # Same tracks to within a tenth of a pixel at the median.
    assert np.median(d) < 0.1
    assert np.percentile(d, 90) < 0.5


def test_matches_opencv_on_projective_warp(rng):
    """Non-translational motion: warp img0 by a mild homography."""
    img0 = _k._textured_image(rng, H=300, W=400, smooth=5)
    H_mat = np.array(
        [[1.02, 0.01, -4.0], [-0.008, 0.99, 3.0], [1e-5, -2e-5, 1.0]], np.float64
    )
    img1 = cv2.warpPerspective(img0, H_mat, (400, 300))
    p0 = _k._grid_points(300, 400, margin=50, step=30)

    cv_p1, cv_ok = _cv_track(img0, img1, p0)
    params = klt.KLTParams(levels=3, iters=20)
    our_p1, our_ok = klt.track(
        jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(p0), jnp.ones(len(p0), bool), params
    )
    our_p1, our_ok = np.asarray(our_p1), np.asarray(our_ok)
    both = cv_ok & our_ok
    assert both.mean() > 0.6
    d = np.linalg.norm(our_p1[both] - cv_p1[both], axis=-1)
    assert np.median(d) < 0.15
