"""Multi-host (multi-process) distributed-BA test.

Spawns 2 worker processes x 4 virtual CPU devices each through
`scripts/bench_scaling.py --multiprocess` (jax.distributed over gRPC
loopback — the same code path as N pod hosts, only the transport differs)
and asserts the cross-process landmark-sharded Schur solve matches the
single-device solver on the identical seed-built problem.

Capability target: SURVEY.md §7 step 7 / BASELINE north star (>= 2 hosts);
the reference has no multi-machine story at all (ROS pub/sub only,
ros1/visual_odometry/stereo_vo_ros1.cpp:14-20).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_multiprocess_ba_matches_single_device(tmp_path):
    out = tmp_path / "mh.npz"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers manage their own device counts
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "scripts", "bench_scaling.py"),
            "--multiprocess", "2",
            "--local-devices", "4",
            "--lm-per-dev", "512",
            "--window", "5",
            "--iters", "5",
            "--reps", "1",
            "--out", str(out),
        ],
        env=env,
        cwd=ROOT,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert rec["processes"] == 2 and rec["devices"] == 8
    got = np.load(out)

    # Single-device reference on the identical seed-built problem.
    sys.path.insert(0, ROOT)
    from scripts.bench_scaling import build_problem_np
    from visual_odometry_ros_tpu.ops import ba as BA

    problem, FX, FY, CX, CY, T_rl = build_problem_np(
        int(got["landmarks"]), int(got["window"])
    )
    res = BA.ba_solve(
        problem, FX, FY, CX, CY, T_rl, BA.BAParams(iters=int(got["iters"]))
    )
    # f32 reduction order differs between the 8-shard psum and the single-
    # device full-axis sums; poses carry ~17 m translations, so 5e-3 abs is
    # ~3e-4 relative.
    np.testing.assert_allclose(
        got["T_cw"], np.asarray(res.T_cw), rtol=0, atol=5e-3
    )
    assert abs(float(got["mean_err_px"]) - float(res.mean_err_px)) < 5e-3
