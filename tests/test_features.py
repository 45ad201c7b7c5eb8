"""Feature detection / ORB descriptor / matching tests."""

import numpy as np
import jax.numpy as jnp

from visual_odometry_ros_tpu.ops import features as F


def _checker_corners(H=240, W=320, cell=40):
    """Grid of bright squares on dark background: every square corner is a
    FAST corner (3/4 of the ring darker)."""
    img = np.full((H, W), 40.0, np.float32)
    for v0 in range(20, H - cell // 2, cell):
        for u0 in range(20, W - cell // 2, cell):
            img[v0 : v0 + cell // 2, u0 : u0 + cell // 2] = 200.0
    return img


def test_fast_detects_square_corners():
    img = _checker_corners()
    mask = np.asarray(F.fast_corner_mask(jnp.asarray(img), thresh=30.0))
    # Square corners must fire (within a small neighborhood); flat regions not.
    corners = [(v0, u0) for v0 in range(20, 200, 40) for u0 in range(20, 280, 40)]
    hits = sum(1 for (v, u) in corners if mask[v - 4 : v + 5, u - 4 : u + 5].any())
    assert hits >= len(corners) * 0.9
    assert not mask[:10, :10].any()  # flat background
    assert not mask[25:32, 25:32].any()  # flat square interior


def test_detect_features_buckets_and_border():
    img = _checker_corners()
    no_pts = jnp.zeros((1, 2), jnp.float32)
    no_valid = jnp.zeros((1,), bool)
    pts, valid = F.detect_features(jnp.asarray(img), no_pts, no_valid, gh=6, gw=8, n_max=64)
    pts, valid = np.asarray(pts), np.asarray(valid)
    assert valid.sum() >= 10
    p = pts[valid]
    assert (p[:, 0] >= 8).all() and (p[:, 0] < 320 - 8).all()
    assert (p[:, 1] >= 8).all() and (p[:, 1] < 240 - 8).all()
    # Each selected point near a square corner (u,v in {20+40k, 39+40k} +- tol)
    corner_1d = np.concatenate([[20 + 40 * k, 39 + 40 * k] for k in range(7)])
    for u, v in p:
        assert np.min(np.abs(corner_1d - u)) < 6
        assert np.min(np.abs(corner_1d - v)) < 6


def test_occupied_bins_suppressed():
    img = _checker_corners()
    # Mark every bin occupied -> nothing selected.
    gh, gw = 6, 8
    us = (np.arange(gw) + 0.5) * (320 / gw)
    vs = (np.arange(gh) + 0.5) * (240 / gh)
    uu, vv = np.meshgrid(us, vs)
    occ_pts = jnp.asarray(np.stack([uu.reshape(-1), vv.reshape(-1)], -1).astype(np.float32))
    occ_valid = jnp.ones((gh * gw,), bool)
    _, valid = F.detect_features(jnp.asarray(img), occ_pts, occ_valid, gh=gh, gw=gw, n_max=64)
    assert not np.asarray(valid).any()


def test_orb_descriptor_rotation_invariance(rng):
    """Descriptor of a pattern and its 90-degree rotation should be close."""
    base = rng.uniform(0, 80, (64, 64)).astype(np.float32)
    k = np.ones(3) / 3
    for _ in range(2):
        base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
        base = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, base)
    # Strong asymmetric ramp so the intensity centroid (orientation) is
    # unambiguous — rotation invariance is only defined up to a stable theta.
    base = base + np.linspace(0, 150, 64, dtype=np.float32)[None, :]
    img = np.zeros((200, 200), np.float32) + 100.0
    img[68:132, 68:132] = base
    rot = np.zeros_like(img) + 100.0
    rot[68:132, 68:132] = np.rot90(base)

    center = jnp.asarray([[100.0, 100.0]])
    d0, v0 = F.orb_descriptors(jnp.asarray(img), center)
    d1, v1 = F.orb_descriptors(jnp.asarray(rot), center)
    assert bool(v0[0]) and bool(v1[0])
    dist = int(F.hamming_distance_matrix(d0, d1)[0, 0])
    assert dist < 80  # random pairs would average 128

    # Distance to a different location's descriptor must be larger.
    d2, _ = F.orb_descriptors(jnp.asarray(img), jnp.asarray([[40.0, 150.0]]))
    dist_rand = int(F.hamming_distance_matrix(d0, d2)[0, 0])
    assert dist < dist_rand


def test_match_descriptors_shifted_image(rng):
    img0 = rng.uniform(0, 255, (240, 320)).astype(np.float32)
    k = np.ones(5) / 5
    for _ in range(2):
        img0 = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img0)
        img0 = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, img0)
    img1 = np.roll(img0, shift=(0, 5), axis=(0, 1))  # shift right 5 px

    us = np.arange(40, 280, 24, dtype=np.float32)
    vs = np.arange(40, 200, 24, dtype=np.float32)
    uu, vv = np.meshgrid(us, vs)
    pts0 = np.stack([uu.reshape(-1), vv.reshape(-1)], -1)
    pts1 = pts0 + np.array([5.0, 0.0], np.float32)

    da, va = F.orb_descriptors(jnp.asarray(img0), jnp.asarray(pts0))
    db, vb = F.orb_descriptors(jnp.asarray(img1), jnp.asarray(pts1))
    idx, ok = F.match_descriptors(da, va, db, vb)
    idx, ok = np.asarray(idx), np.asarray(ok)
    assert ok.mean() > 0.7
    # Correct match is identity permutation.
    assert (idx[ok] == np.arange(len(pts0))[ok]).mean() > 0.95
