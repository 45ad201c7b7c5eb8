"""Arena slot allocation, keyframe ring, BA gather, depth-filter tests."""

import numpy as np
import jax.numpy as jnp

from visual_odometry_ros_tpu.mapping import arena as A
from visual_odometry_ros_tpu.ops import depth_filter as DF


def test_allocate_slots_basic():
    free = jnp.asarray(np.array([0, 1, 1, 0, 1, 0, 1, 1], bool))
    slots, ok = A.allocate_slots(free, 3)
    assert list(np.asarray(slots)) == [1, 2, 4]
    assert list(np.asarray(ok)) == [True, True, True]


def test_allocate_slots_exhausted():
    free = jnp.asarray(np.array([0, 1, 0, 0, 1, 0, 0, 0], bool))
    slots, ok = A.allocate_slots(free, 4)
    s, o = np.asarray(slots), np.asarray(ok)
    assert list(s[:2]) == [1, 4]
    assert list(o) == [True, True, False, False]


def test_ring_push_evicts_oldest():
    K, N = 3, 4
    ring = A.make_ring(K, N)
    for i in range(5):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = float(i)
        pts = jnp.full((N, 2), float(i))
        ring = A.ring_push(
            ring, jnp.asarray(T), i, pts, pts, jnp.arange(N, dtype=jnp.int32),
            jnp.ones((N,), bool), jnp.zeros((N,), bool),
        )
    assert int(ring.count) == 3
    order = np.asarray(A.ring_order(ring))
    ids = np.asarray(ring.frame_id)[order]
    assert list(ids) == [2, 3, 4]  # oldest -> newest, frames 0,1 evicted


def test_gather_ba_problem_scatter():
    K, N, M = 3, 4, 16
    ring = A.make_ring(K, N)
    ar = A.make_arena(M)
    ar = ar._replace(
        alive=ar.alive.at[jnp.asarray([2, 5, 7, 11])].set(True),
        triangulated=ar.triangulated.at[jnp.asarray([2, 5, 7, 11])].set(True),
    )
    # KF0 observes lm 2,5; KF1 observes lm 5,7,11
    lm0 = jnp.asarray([2, 5, -1, -1], jnp.int32)
    ov0 = jnp.asarray([1, 1, 0, 0], bool)
    pts0 = jnp.asarray([[10.0, 11], [20, 21], [0, 0], [0, 0]])
    ring = A.ring_push(ring, jnp.eye(4), 0, pts0, pts0, lm0, ov0, jnp.zeros(4, bool))
    lm1 = jnp.asarray([5, 7, 11, -1], jnp.int32)
    ov1 = jnp.asarray([1, 1, 1, 0], bool)
    pts1 = jnp.asarray([[30.0, 31], [40, 41], [50, 51], [0, 0]])
    ring = A.ring_push(ring, jnp.eye(4), 1, pts1, pts1, lm1, ov1, ov1)

    prob = A.gather_ba_problem(ring, ar)
    mask = np.asarray(prob["mask"])
    pts = np.asarray(prob["pts"])
    assert mask[2, 0] and mask[5, 0] and not mask[7, 0]
    assert mask[5, 1] and mask[7, 1] and mask[11, 1]
    np.testing.assert_allclose(pts[5, 0], [20, 21])
    np.testing.assert_allclose(pts[5, 1], [30, 31])
    np.testing.assert_allclose(pts[11, 1], [50, 51])
    # right obs only for KF1
    mask_r = np.asarray(prob["mask_r"])
    assert not mask_r[:, 0].any() and mask_r[5, 1]
    # kf_valid: 2 live slots
    assert np.asarray(prob["kf_valid"]).sum() == 2


def test_depth_filter_converges(rng):
    M = 64
    z_true = rng.uniform(3, 20, M).astype(np.float32)
    seeds = DF.init_seeds(jnp.full((M,), 8.0), depth_min=0.5)
    fx, baseline = 700.0, 0.5
    for _ in range(30):
        z_meas = z_true * (1 + rng.normal(0, 0.01, M)).astype(np.float32)
        tau2 = DF.measurement_tau2(jnp.asarray(z_meas), jnp.asarray(baseline), fx)
        seeds = DF.update_seeds(seeds, 1.0 / jnp.asarray(z_meas), tau2, jnp.ones(M, bool))
    z_est = 1.0 / np.asarray(seeds.mu)
    assert np.median(np.abs(z_est - z_true) / z_true) < 0.02
    assert np.asarray(DF.inlier_probability(seeds)).mean() > 0.7


def test_depth_filter_rejects_outliers(rng):
    M = 32
    z_true = np.full(M, 10.0, np.float32)
    seeds = DF.init_seeds(jnp.full((M,), 8.0), depth_min=0.5)
    fx, baseline = 700.0, 0.5
    for i in range(40):
        if i % 3 == 0:  # 1/3 outlier measurements
            z_meas = rng.uniform(1, 30, M).astype(np.float32)
        else:
            z_meas = z_true * (1 + rng.normal(0, 0.01, M)).astype(np.float32)
        tau2 = DF.measurement_tau2(jnp.asarray(z_meas), jnp.asarray(baseline), fx)
        seeds = DF.update_seeds(seeds, 1.0 / jnp.asarray(z_meas), tau2, jnp.ones(M, bool))
    z_est = 1.0 / np.asarray(seeds.mu)
    # Mixture model shrugs off the outlier third.
    assert np.median(np.abs(z_est - 10.0) / 10.0) < 0.05
    # Inlier ratio estimate reflects contamination (< clean-case value).
    assert np.asarray(DF.inlier_probability(seeds)).mean() < 0.95


def test_depth_filter_gaussian_fusion():
    mu, s2 = DF.update_gaussian(jnp.asarray(0.1), jnp.asarray(0.04), jnp.asarray(0.2), jnp.asarray(0.04))
    np.testing.assert_allclose(float(mu), 0.15, atol=1e-6)
    np.testing.assert_allclose(float(s2), 0.02, atol=1e-6)


def test_seed_convergence_flag():
    seeds = DF.init_seeds(jnp.full((4,), 10.0))
    assert not np.asarray(DF.converged(seeds)).any()
    tight = seeds._replace(sigma2=jnp.full((4,), 1e-8))
    assert np.asarray(DF.converged(tight)).all()
