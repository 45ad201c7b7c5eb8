#!/usr/bin/env python
"""Per-stage device timing for the stereo pipeline (TPU or CPU).

Times each jitted stage in isolation (post-compile, block_until_ready) so we
know where the frame budget goes — the structured successor of the
reference's tic/toc instrumentation around pipeline stages
(stereo_vo.cpp:531-560 under VERBOSE_STEREO_VO).

  python scripts/profile_stages.py [--platform cpu] [--frames 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, args, n=20, warmup=2, name="", trials=5):
    """min-of-trials: single-trial averages on a remote-attached TPU include
    multi-ms tunnel RPC stalls that swamp sub-ms kernels; the min over a few
    trials is the reproducible device number."""
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / n * 1e3)
    ms = min(ts)
    if name:
        print(f"{name:20s} {ms:9.3f} ms", flush=True)
    return ms


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    p.add_argument("--frames", type=int, default=20)
    p.add_argument("--width", type=int, default=1241)
    p.add_argument("--height", type=int, default=376)
    p.add_argument("--features", type=int, default=1024)
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from bench import build_vo, make_frames
    from visual_odometry_ros_tpu.ops import klt as KLT
    from visual_odometry_ros_tpu.ops import features as F
    from visual_odometry_ros_tpu.ops import pose_gn as PG
    from visual_odometry_ros_tpu.ops.pyramid import build_pyramid_with_gradients, scharr_gradients
    from visual_odometry_ros_tpu.utils import geometry as geo

    vo = build_vo()
    ils, irs = make_frames(3, width=args.width, height=args.height)
    il0, ir0, il1, ir1 = ils[0], irs[0], ils[1], irs[1]
    il0j, il1j, ir1j = (jnp.asarray(x, jnp.float32) for x in (il0, il1, ir1))

    N = args.features
    rng = np.random.default_rng(0)
    pts = jnp.asarray(
        np.stack(
            [rng.uniform(30, args.width - 30, N), rng.uniform(30, args.height - 30, N)], -1
        ).astype(np.float32)
    )
    valid = jnp.ones((N,), bool)

    results = {}
    # Stage: pyramid+gradients
    pyr_fn = jax.jit(lambda im: build_pyramid_with_gradients(im, vo.klt_params.levels))
    results["pyramid_grad"] = timeit(pyr_fn, (il1j,), name="pyramid_grad")
    # Stage: forward KLT
    results["klt_track"] = timeit(
        lambda a, b, p, v: KLT.track_with_prior(a, b, p, p, v, vo.klt_params),
        (il0j, il1j, pts, valid), name="klt_track",
    )
    # Stage: bidirectional KLT (stereo match analog)
    results["klt_bidir"] = timeit(
        lambda a, b, p, v: KLT.track_bidirectional(a, b, p, p, v, vo.klt_params),
        (il1j, ir1j, pts, valid), name="klt_bidir",
    )
    # Stage: scale-compensated refinement
    gx, gy = jax.jit(scharr_gradients)(il0j)
    results["klt_scale"] = timeit(
        lambda a, g1, g2, b, p, v: KLT.track_with_scale(
            a, g1, g2, b, p, p, jnp.ones((N,)), v, use_pallas=vo.klt_params.use_pallas
        ),
        (il0j, gx, gy, il1j, pts, valid), name="klt_scale",
    )
    # Stage: detection
    results["detect"] = timeit(
        lambda im, p, v: F.detect_features(im, p, v, gh=12, gw=24, n_max=N // 2),
        (il1j, pts, valid), name="detect",
    )
    # Stage: pose GN stereo
    X0 = jnp.asarray(
        np.stack(
            [rng.uniform(-10, 10, N), rng.uniform(-3, 3, N), rng.uniform(5, 40, N)], -1
        ).astype(np.float32)
    )
    uv = np.asarray(X0[:, :2] / X0[:, 2:3] * 718.0) + np.asarray([607.0, 185.0])
    pl = jnp.asarray(uv.astype(np.float32))
    results["pose_gn_stereo"] = timeit(
        lambda x, a, b, v: PG.pose_only_gn_stereo(
            x, a, b, v, v, 718.0, 718.0, 607.0, 185.0, jnp.asarray(vo.T_rl), jnp.eye(4), vo.pose_params
        ),
        (X0, pl, pl, valid), name="pose_gn_stereo",
    )
    # Stage: full steady step
    state = vo._first_frame(il0j, jnp.asarray(ir0, jnp.float32))
    results["steady_step_full"] = timeit(lambda s, a, b: vo._steady_step(s, a, b), (state, il1j, ir1j), n=10, name="steady_step_full")
    # Stage: keyframe + BA
    state2, _ = vo._steady_step(state, il1j, ir1j)
    results["keyframe_ba"] = timeit(lambda s: vo._keyframe_step(s), (state2,), n=5, name="keyframe_ba")

    for k, v in results.items():
        print(f"{k:20s} {v:9.3f} ms")
    total = results["steady_step_full"]
    print(f"\nimplied steady fps: {1000.0/total:.1f}")

    import json

    try:
        plat = jax.devices()[0].platform
    except Exception:
        plat = "unknown"
    artifact = {
        "platform": plat,
        "width": args.width,
        "height": args.height,
        "features": args.features,
        "stages_ms": {k: round(v, 4) for k, v in results.items()},
        "implied_steady_fps": round(1000.0 / total, 2),
    }
    out_path = os.path.join(os.path.dirname(__file__), "..", "PROFILE.json")
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {os.path.abspath(out_path)}")
    return results


if __name__ == "__main__":
    main()
