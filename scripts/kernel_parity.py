"""Hardware parity harness: Pallas KLT kernels on the REAL chip vs the jnp
oracle on the same inputs (VERDICT r4 next-steps #1/#4).

Interpret-mode tests (tests/test_klt_pallas_fp.py) pin the math but cannot
catch Mosaic hardware semantics (dynamic-roll wrap, MXU rounding, scf loop
lowering). This harness runs every interpret-suite scenario — plus
production-shape corridor crops — with interpret=False on the default
backend and diffs p1/ok/err against the pure-jnp `_track_one_level` path.

Usage: python scripts/kernel_parity.py [--out KERNELPARITY_r05.json]
Emits one JSON artifact with per-case max |dp1|, ok-agreement, and a global
pass/fail (pass = every case within the same tolerances the interpret suite
asserts).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from visual_odometry_ros_tpu.ops import klt as KLT
from visual_odometry_ros_tpu.ops.klt_pallas_fp import track_level_fp, track_scale_fp
from visual_odometry_ros_tpu.ops.klt import _patch_offsets, _track_one_level
from visual_odometry_ros_tpu.ops.pyramid import scharr_gradients
from visual_odometry_ros_tpu.utils.interp import bilinear_sample


def smooth_noise(H, W, seed=0, smooth=3):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (H, W)).astype(np.float32)
    k = np.ones(2 * smooth + 1, np.float32) / (2 * smooth + 1)
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
    img = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, img)
    return img


def shifted_pair(H=120, W=160, shift=(2.3, -1.7), seed=0):
    base = smooth_noise(H + 16, W + 16, seed)
    uu, vv = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    pts0 = jnp.stack([jnp.asarray(uu + 8.0), jnp.asarray(vv + 8.0)], -1)
    img0, _ = bilinear_sample(jnp.asarray(base), pts0)
    pts1 = jnp.stack(
        [jnp.asarray(uu + 8.0 - shift[0]), jnp.asarray(vv + 8.0 - shift[1])], -1
    )
    img1, _ = bilinear_sample(jnp.asarray(base), pts1)
    return np.asarray(img0), np.asarray(img1)


def grid_features(H, W, margin=20, n=6):
    us = np.linspace(margin, W - margin, n)
    vs = np.linspace(margin, H - margin, n)
    uu, vv = np.meshgrid(us, vs)
    return np.stack([uu.ravel(), vv.ravel()], -1).astype(np.float32)


def corridor_pair(frame=40):
    """Production pair from the adversarial corridor world — the same
    generator + trajectory eval_accuracy uses (640x480, exposure drift,
    occluder, repeated texture)."""
    from visual_odometry_ros_tpu.io.synthetic import HardSequence, varied_trajectory

    poses = varied_trajectory(frame + 2, step=0.3)
    world = HardSequence(poses_T_wc=poses, baseline=0.5)
    l0, _ = world.stereo_pair(poses[frame].astype(np.float64), frame=frame)
    l1, _ = world.stereo_pair(poses[frame + 1].astype(np.float64), frame=frame + 1)
    return np.asarray(l0, np.float32), np.asarray(l1, np.float32)


def run_level_case(name, img0, img1, p0, p1_init, radius, iters, epi1d=False):
    img0j, img1j = jnp.asarray(img0), jnp.asarray(img1)
    p0j, p1j = jnp.asarray(p0), jnp.asarray(p1_init)
    valid = jnp.ones(p0.shape[0], bool)

    p1_hw, live_hw, err_hw, proc = track_level_fp(
        img0j, img1j, p0j, p1j, valid, radius=radius, iters=iters,
        interpret=False, epi1d=epi1d,
    )
    gx, gy = scharr_gradients(img0j)
    p1_ref, live_ref, err_ref = _track_one_level(
        img0j, gx, gy, img1j, p0j, p1j, valid, _patch_offsets(radius),
        iters, 0.03, 1e-4, epi1d=epi1d,
    )
    p1_hw, live_hw, err_hw, proc, p1_ref, live_ref, err_ref = jax.device_get(
        (p1_hw, live_hw, err_hw, proc, p1_ref, live_ref, err_ref)
    )
    m = live_hw & live_ref & proc
    dp = np.abs(p1_hw - p1_ref)
    case = {
        "case": name,
        "n": int(p0.shape[0]),
        "n_both_ok": int(m.sum()),
        "n_hw_ok": int((live_hw & proc).sum()),
        "n_ref_ok": int(live_ref.sum()),
        "max_dp_px": float(dp[m].max()) if m.any() else None,
        "mean_dp_px": float(dp[m].mean()) if m.any() else None,
        "ok_agree_frac": float((live_hw[proc] == live_ref[proc]).mean()) if proc.any() else None,
    }
    case["pass"] = bool(
        m.sum() >= 0.5 * p0.shape[0]
        and case["max_dp_px"] is not None
        and case["max_dp_px"] < 0.2
    )
    return case


def run_pyramid_case(name, img0, img1, p0, prior, epi1d=False):
    """Full coarse-to-fine track, pallas leg vs jnp leg (production path)."""
    from visual_odometry_ros_tpu.ops.klt import KLTParams, track_with_prior_pyr
    from visual_odometry_ros_tpu.ops.pyramid import build_pyramid_with_gradients

    pyr0 = build_pyramid_with_gradients(jnp.asarray(img0), 3)
    pyr1 = build_pyramid_with_gradients(jnp.asarray(img1), 3)
    valid = jnp.ones(p0.shape[0], bool)
    legs = {}
    for leg, up in (("jnp", False), ("pallas", True)):
        params = KLTParams(window_radius=10, levels=3, iters=15, use_pallas=up)
        p1, ok = track_with_prior_pyr(
            pyr0, pyr1, jnp.asarray(p0), jnp.asarray(prior), valid, params, epi1d=epi1d
        )
        legs[leg] = jax.device_get((p1, ok))
    pj, oj = legs["jnp"]
    pp, op = legs["pallas"]
    m = oj & op
    dp = np.linalg.norm(pj - pp, axis=-1)
    n_div = int((dp[m] > 0.5).sum())
    case = {
        "case": name,
        "n": int(p0.shape[0]),
        "n_jnp_ok": int(oj.sum()),
        "n_pallas_ok": int(op.sum()),
        "n_both_ok": int(m.sum()),
        "median_dp_px": float(np.median(dp[m])) if m.any() else None,
        "n_divergent_gt_half_px": n_div,
    }
    # Tolerance 8%: the divergent tail on this world is multi-optimum
    # repeated-texture lock-ons (verified r5: on those features the pallas
    # leg's intensity residual is as often LOWER than jnp's — different
    # optima of equal quality, killed downstream by fb/Sampson/RANSAC).
    case["pass"] = bool(
        m.any()
        and case["n_pallas_ok"] >= 0.9 * max(case["n_jnp_ok"], 1)
        and case["median_dp_px"] < 0.05
        and n_div <= max(2, int(0.08 * m.sum()))
    )
    return case


def run_scale_case(name, img0, img1, p0, p1_init, scale, radius, iters, atol):
    img0j, img1j = jnp.asarray(img0), jnp.asarray(img1)
    p0j, p1j = jnp.asarray(p0), jnp.asarray(p1_init)
    n = p0.shape[0]
    valid = jnp.ones(n, bool)
    sc = jnp.asarray(scale, jnp.float32)

    p1_hw, err_hw, ok_hw = track_scale_fp(
        img0j, img1j, p0j, p1j, sc, valid, radius=radius, iters=iters,
        interpret=False,
    )
    gx, gy = scharr_gradients(img0j)
    p1_ref, ok_ref = KLT.track_with_scale(
        img0j, gx, gy, img1j, p0j, p1j, sc, valid, radius=radius, iters=iters,
        use_pallas=False,
    )
    p1_hw, ok_hw, p1_ref, ok_ref = jax.device_get((p1_hw, ok_hw, p1_ref, ok_ref))
    m = ok_hw & ok_ref
    dp = np.abs(p1_hw - p1_ref)
    dnorm = np.linalg.norm(p1_hw - p1_ref, axis=-1)
    case = {
        "case": name,
        "n": int(n),
        "n_both_ok": int(m.sum()),
        "n_hw_ok": int(ok_hw.sum()),
        "n_ref_ok": int(ok_ref.sum()),
        "max_dp_px": float(dp[m].max()) if m.any() else None,
        "median_dp_px": float(np.median(dnorm[m])) if m.any() else None,
        "n_divergent": int((dnorm[m] > atol).sum()),
    }
    case["pass"] = bool(
        m.any()
        and m.sum() >= 0.85 * max(int(ok_ref.sum()), 1)
        and case["median_dp_px"] < 0.1
        and case["n_divergent"] <= max(2, int(0.05 * m.sum()))
    )
    return case


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="KERNELPARITY_r05.json")
    args = ap.parse_args()

    platform = jax.devices()[0].platform
    cases = []

    # --- interpret-suite scenarios, now on hardware ---
    img0, img1 = shifted_pair(shift=(2.3, -1.7))
    p0 = grid_features(120, 160)
    cases.append(run_level_case("level_subpixel_shift", img0, img1, p0, p0, 7, 20))

    img0, img1 = shifted_pair(shift=(1.4, 2.1), seed=3)
    cases.append(run_level_case("level_jnp_parity", img0, img1, p0, p0, 7, 20))

    img0, img1 = shifted_pair(shift=(3.1, 0.0), seed=5)
    cases.append(run_level_case("level_epi1d", img0, img1, p0, p0, 7, 20, epi1d=True))

    img0, img1 = shifted_pair(shift=(1.8, -0.9), seed=7)
    n = p0.shape[0]
    cases.append(
        run_scale_case("scale_unit", img0, img1, p0, p0, np.ones(n, np.float32), 11, 20, 0.15)
    )

    # --- production contract: full coarse-to-fine pyramid tracking on the
    # adversarial corridor, pallas vs jnp leg (exactly the eval_accuracy
    # split). Criterion is distributional: the corridor's repeated texture +
    # occluder create genuinely ambiguous multi-optimum matches where the two
    # legs may lock different (equally good) optima — those are downstream
    # RANSAC/fb-gate food, not kernel defects. A kernel defect shows up as a
    # systematic survivor deficit or a fat divergence tail (the r5 zero-pad
    # Scharr bug: 17/142 divergent; post-fix: <=5).
    img0, img1 = corridor_pair()
    pts = grid_features(480, 640, margin=30, n=12)
    rng = np.random.default_rng(0)
    for prior_err in (0.5, 5.0):
        prior = pts + rng.uniform(-prior_err, prior_err, pts.shape).astype(np.float32)
        cases.append(
            run_pyramid_case(f"corridor_pyr_prior{prior_err:g}", img0, img1, pts, prior)
        )
    cases.append(run_pyramid_case("corridor_pyr_epi1d", img0, img0, pts, pts, epi1d=True))
    # Scale refinement is seeded by the plain KLT result in production
    # (stereo_vo klt_scale stage) — sub-px from the true target, near-unit
    # scales. Build the seed the same way: jnp pyramid track first.
    from visual_odometry_ros_tpu.ops.klt import KLTParams, track_with_prior_pyr
    from visual_odometry_ros_tpu.ops.pyramid import build_pyramid_with_gradients

    pyr0 = build_pyramid_with_gradients(jnp.asarray(img0), 3)
    pyr1 = build_pyramid_with_gradients(jnp.asarray(img1), 3)
    seed, seed_ok = jax.device_get(
        track_with_prior_pyr(
            pyr0, pyr1, jnp.asarray(pts), jnp.asarray(pts),
            jnp.ones(pts.shape[0], bool), KLTParams(window_radius=10, levels=3, iters=15),
        )
    )
    tracked = np.asarray(pts)[seed_ok]
    seed = np.asarray(seed)[seed_ok]
    sc = rng.uniform(0.9, 1.12, tracked.shape[0]).astype(np.float32)
    cases.append(
        run_scale_case("corridor_scale", img0, img1, tracked, seed, sc, 11, 30, 1.0)
    )

    ok = all(c["pass"] for c in cases)
    artifact = {"platform": platform, "interpret": False, "pass": ok, "cases": cases}
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact, indent=1))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
