"""Benchmark: stereo VO frames/s on KITTI-sized synthetic frames (real TPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md); the author's
inline per-stage annotations for the steady-state frame sum to ~59 ms
(KLT 5 ms + scale re-track 50 ms + 5-point 2 ms + ORB 2 ms; mono_vo.cpp:571,
579, 583, 976) on their x86 CPU at KITTI 1241x376 — i.e. ~17 frames/s.
vs_baseline = measured_fps / 17.0 (BASELINE.md north star: >= 5x).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_FPS = 17.0
N_WARMUP = 3
N_FRAMES = 40


def build_vo():
    from visual_odometry_ros_tpu.config import VOConfig
    from visual_odometry_ros_tpu.models.stereo_vo import StereoVO

    cfg = VOConfig()  # KITTI-sized defaults: 1241x376
    cfg.cam_right = cfg.cam
    T_lr = np.eye(4, dtype=np.float32)
    T_lr[0, 3] = 0.5371657
    cfg.T_lr = T_lr
    cfg.flagDoUndistortion = False
    cfg.extractor.n_features = 1024
    cfg.map.landmark_capacity = 4096
    cfg.keyframe.n_max_keyframes_in_window = 9
    cfg.keyframe.thres_translation = 4.0
    cfg.tracker.max_level = 4
    cfg.tracker.max_iter = 15
    return StereoVO(cfg)


def make_frames(n, width=1241, height=376):
    from visual_odometry_ros_tpu.io.synthetic import PlaneSequence, forward_trajectory

    world = PlaneSequence(
        width=width,
        height=height,
        fx=718.856,
        fy=718.856,
        cx=607.1928,
        cy=185.2157,
        baseline=0.5371657,
        z0=15.0,
        sx=0.3,
        sy=0.15,
    )
    poses = forward_trajectory(n, step=0.8, yaw_rate=0.0015)
    return [world.stereo_pair(T.astype(np.float64)) for T in poses]


def main():
    import jax

    vo = build_vo()
    frames = make_frames(N_WARMUP + N_FRAMES)

    # Warmup: first frame + steady + keyframe path all compile here.
    for il, ir in frames[:N_WARMUP]:
        vo.track_stereo_images(il, ir)
    # Force one keyframe compile if none occurred yet.
    if not any(s.get("keyframe") for s in vo.stats_log[1:]):
        vo.state, _ = vo._keyframe_step(vo.state)
    jax.block_until_ready(vo.state.T_wc)

    t0 = time.perf_counter()
    for il, ir in frames[N_WARMUP:]:
        vo.track_stereo_images(il, ir)
    jax.block_until_ready(vo.state.T_wc)
    dt = time.perf_counter() - t0

    fps = N_FRAMES / dt
    n_kf = sum(1 for s in vo.stats_log[N_WARMUP:] if s.get("keyframe"))
    result = {
        "metric": "stereo_vo_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }
    print(json.dumps(result))
    # Diagnostics on stderr-adjacent second line are not allowed; keep state
    # in the JSON only.
    return result


if __name__ == "__main__":
    main()
