"""Pallas KLT level kernel vs the jnp reference implementation (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from visual_odometry_ros_tpu.ops import klt
from visual_odometry_ros_tpu.ops.klt_pallas import track_level_pallas
from visual_odometry_ros_tpu.ops.pyramid import scharr_gradients

import importlib.util as _ilu

_spec = _ilu.spec_from_file_location("kltfix", __file__.replace("test_klt_pallas.py", "test_klt.py"))
_k = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_k)


def test_pallas_level_matches_jnp(rng):
    img0 = _k._textured_image(rng)
    dx, dy = 2.7, -1.9
    img1 = _k._shift_image(img0, dx, dy)
    p0 = _k._grid_points(*img0.shape)
    valid = np.ones(len(p0), bool)

    gx, gy = scharr_gradients(jnp.asarray(img0))
    r, iters = 10, 12

    p1_p, live_p, err_p = track_level_pallas(
        jnp.asarray(img0), gx, gy, jnp.asarray(img1),
        jnp.asarray(p0), jnp.asarray(p0), jnp.asarray(valid),
        radius=r, iters=iters, interpret=True,
    )

    offsets = klt._patch_offsets(r)
    p1_j, live_j, err_j = klt._track_one_level(
        jnp.asarray(img0), gx, gy, jnp.asarray(img1),
        jnp.asarray(p0), jnp.asarray(p0), jnp.asarray(valid),
        offsets, iters, 0.03, 1e-4,
    )

    p1_p, p1_j = np.asarray(p1_p), np.asarray(p1_j)
    live_p, live_j = np.asarray(live_p), np.asarray(live_j)
    both = live_p & live_j
    assert both.mean() > 0.8
    # Same math, same convergence: sub-0.05px agreement on live tracks.
    d = np.linalg.norm(p1_p[both] - p1_j[both], axis=-1)
    assert np.median(d) < 0.05
    # And both recover the true shift.
    e = np.linalg.norm(p1_p[both] - (p0[both] + [dx, dy]), axis=-1)
    assert np.median(e) < 0.25


def test_pallas_level_border_rejected(rng):
    img0 = _k._textured_image(rng)
    img1 = img0.copy()
    p0 = np.array([[3.0, 3.0], [150.0, 120.0]], np.float32)  # first is at border
    gx, gy = scharr_gradients(jnp.asarray(img0))
    p1, live, err = track_level_pallas(
        jnp.asarray(img0), gx, gy, jnp.asarray(img1),
        jnp.asarray(p0), jnp.asarray(p0), jnp.ones(2, bool),
        radius=10, iters=5, interpret=True,
    )
    live = np.asarray(live)
    assert not live[0] and live[1]


def test_scale_pallas_matches_jnp(rng):
    from visual_odometry_ros_tpu.ops.klt_pallas import track_scale_pallas

    img0 = _k._textured_image(rng)
    dx, dy = 1.6, -1.1
    img1 = _k._shift_image(img0, dx, dy)
    p0 = _k._grid_points(*img0.shape)
    N = len(p0)
    valid = np.ones(N, bool)
    scale = np.clip(rng.normal(1.0, 0.1, N), 0.8, 1.25).astype(np.float32)

    gx, gy = scharr_gradients(jnp.asarray(img0))
    p1_p, err_p, ok_p = track_scale_pallas(
        jnp.asarray(img0), gx, gy, jnp.asarray(img1),
        jnp.asarray(p0), jnp.asarray(p0), jnp.asarray(scale), jnp.asarray(valid),
        radius=11, iters=20, interpret=True,
    )
    p1_j, ok_j = klt.track_with_scale(
        jnp.asarray(img0), gx, gy, jnp.asarray(img1),
        jnp.asarray(p0), jnp.asarray(p0), jnp.asarray(scale), jnp.asarray(valid),
        radius=11, iters=20,
    )
    ok_p = np.asarray(ok_p)
    ok_j = np.asarray(ok_j)
    both = ok_p & ok_j
    assert both.sum() > 0.6 * N
    # Both implementations recover the shift (checkerboard vs full patch
    # differ slightly; each must land on the true flow).
    d_p = np.asarray(p1_p)[both] - p0[both]
    np.testing.assert_allclose(np.median(d_p, 0), [dx, dy], atol=0.25)
    d_j = np.asarray(p1_j)[both] - p0[both]
    np.testing.assert_allclose(np.median(d_p, 0), np.median(d_j, 0), atol=0.2)


# ---------------------------------------------------------------------------
# Feature-parallel kernel (klt_pallas_fp)
# ---------------------------------------------------------------------------


def test_fp_level_matches_jnp(rng):
    from visual_odometry_ros_tpu.ops.klt_pallas_fp import track_level_fp

    img0 = _k._textured_image(rng)
    dx, dy = 2.7, -1.9
    img1 = _k._shift_image(img0, dx, dy)
    p0 = _k._grid_points(*img0.shape)
    valid = np.ones(len(p0), bool)
    r, iters = 10, 12

    p1_p, live_p, err_p, proc = track_level_fp(
        jnp.asarray(img0), jnp.asarray(img1),
        jnp.asarray(p0), jnp.asarray(p0), jnp.asarray(valid),
        radius=r, iters=iters, interpret=True,
    )
    gx, gy = scharr_gradients(jnp.asarray(img0))
    offsets = klt._patch_offsets(r)
    p1_j, live_j, err_j = klt._track_one_level(
        jnp.asarray(img0), gx, gy, jnp.asarray(img1),
        jnp.asarray(p0), jnp.asarray(p0), jnp.asarray(valid),
        offsets, iters, 0.03, 1e-4,
    )
    p1_p, p1_j = np.asarray(p1_p), np.asarray(p1_j)
    both = np.asarray(live_p) & np.asarray(live_j)
    assert both.mean() > 0.8
    d = np.linalg.norm(p1_p[both] - p1_j[both], axis=-1)
    assert np.median(d) < 0.05
    e = np.linalg.norm(p1_p[both] - (p0[both] + [dx, dy]), axis=-1)
    assert np.median(e) < 0.25


def test_fp_level_border_rejected(rng):
    from visual_odometry_ros_tpu.ops.klt_pallas_fp import track_level_fp

    img0 = _k._textured_image(rng)
    p0 = np.array([[3.0, 3.0], [150.0, 120.0]], np.float32)
    p1, live, err, proc = track_level_fp(
        jnp.asarray(img0), jnp.asarray(img0),
        jnp.asarray(p0), jnp.asarray(p0), jnp.ones(2, bool),
        radius=10, iters=5, interpret=True,
    )
    live = np.asarray(live)
    assert not live[0] and live[1]


def test_fp_scale_matches_jnp(rng):
    """Feature-parallel trackWithScale kernel vs the jnp reference path."""
    from visual_odometry_ros_tpu.ops.klt_pallas_fp import track_scale_fp

    img0 = _k._textured_image(rng)
    dx, dy = 1.6, -1.1
    img1 = _k._shift_image(img0, dx, dy)
    p0 = _k._grid_points(*img0.shape)
    N = len(p0)
    valid = np.ones(N, bool)
    scale = np.clip(rng.normal(1.0, 0.1, N), 0.8, 1.25).astype(np.float32)

    p1_p, err_p, ok_p = track_scale_fp(
        jnp.asarray(img0), jnp.asarray(img1),
        jnp.asarray(p0), jnp.asarray(p0), jnp.asarray(scale), jnp.asarray(valid),
        radius=11, iters=20, interpret=True,
    )
    gx, gy = scharr_gradients(jnp.asarray(img0))
    p1_j, ok_j = klt.track_with_scale(
        jnp.asarray(img0), gx, gy, jnp.asarray(img1),
        jnp.asarray(p0), jnp.asarray(p0), jnp.asarray(scale), jnp.asarray(valid),
        radius=11, iters=20,
    )
    ok_p = np.asarray(ok_p)
    ok_j = np.asarray(ok_j)
    both = ok_p & ok_j
    assert both.sum() > 0.6 * N
    d_p = np.asarray(p1_p)[both] - p0[both]
    np.testing.assert_allclose(np.median(d_p, 0), [dx, dy], atol=0.25)
    d_j = np.asarray(p1_j)[both] - p0[both]
    np.testing.assert_allclose(np.median(d_p, 0), np.median(d_j, 0), atol=0.2)


def test_fp_scale_nonunit_scale_still_tracks(rng):
    """A genuinely scaled template (s != 1) must still recover the flow —
    exercises the Phase-A hat-matrix resample at non-unit spacing."""
    from visual_odometry_ros_tpu.ops.klt_pallas_fp import track_scale_fp

    img0 = _k._textured_image(rng, smooth=5)
    dx, dy = 2.0, 1.3
    # Target = shifted AND 1.25x-zoomed-out template around each point is a
    # harder global transform; use a plain shift but force the patch scale.
    img1 = _k._shift_image(img0, dx, dy)
    p0 = _k._grid_points(*img0.shape)
    N = len(p0)
    scale = np.full(N, 1.4, np.float32)
    p1, err, ok = track_scale_fp(
        jnp.asarray(img0), jnp.asarray(img1),
        jnp.asarray(p0), jnp.asarray(p0), jnp.asarray(scale), np.ones(N, bool),
        radius=11, iters=20, interpret=True,
    )
    ok = np.asarray(ok)
    assert ok.mean() > 0.6
    d = np.asarray(p1)[ok] - p0[ok]
    np.testing.assert_allclose(np.median(d, 0), [dx, dy], atol=0.3)


def test_fp_level_drift_clamp_not_silently_good(rng):
    """A prior more than M+1 px off cannot be recovered at one level (the
    drift window clamps); such features must come back dead OR with a large
    residual — never live-and-confident (the pyramid supplies the range)."""
    from visual_odometry_ros_tpu.ops.klt_pallas_fp import track_level_fp

    img0 = _k._textured_image(rng)
    img1 = _k._shift_image(img0, 9.0, 0.0)  # true flow far beyond the margin
    p0 = _k._grid_points(*img0.shape)
    p1, live, err, proc = track_level_fp(
        jnp.asarray(img0), jnp.asarray(img1),
        jnp.asarray(p0), jnp.asarray(p0), jnp.ones(len(p0), bool),
        radius=10, iters=12, interpret=True,
    )
    confident = np.asarray(live) & (np.asarray(err) < 5.0)
    assert confident.mean() < 0.2
