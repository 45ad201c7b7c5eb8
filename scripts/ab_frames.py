#!/usr/bin/env python
"""Frame-synced A/B of the two kernel paths (pallas vs jnp) on identical
adversarial frames — the microscope for TPU-leg accuracy divergence.

Runs two StereoVO instances in ONE process (one device client) over the same
HardSequence frames, per-frame logging both paths' track survival, pose-GN
error, and per-frame motion error vs ground truth. Prints the first frame
where the legs' per-frame rotation error separates by > thresh, plus summary
quantiles, and writes AB_FRAMES.json.

  python scripts/ab_frames.py [--frames 120] [--mono]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def rot_deg(R):
    return float(np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--out", default="AB_FRAMES.json")
    args = p.parse_args(argv)

    from scripts.eval_accuracy import build_stereo
    from visual_odometry_ros_tpu.io.synthetic import HardSequence, varied_trajectory

    poses_gt = varied_trajectory(args.frames, step=0.3)
    world = HardSequence(poses_T_wc=poses_gt, baseline=0.5)
    print(f"rendering {args.frames} frames ...", flush=True)
    frames = [world.stereo_pair(T.astype(np.float64), frame=i) for i, T in enumerate(poses_gt)]

    vos = {"jnp": build_stereo(False), "pallas": build_stereo(True)}
    rows = []
    for i, (il, ir) in enumerate(frames):
        row = {"frame": i}
        for name, vo in vos.items():
            _, st = vo.track_stereo_images(il, ir)
            row[name] = {
                "n_tracked": st.get("n_tracked", 0),
                "n_inliers": st.get("n_inliers", 0),
                "pose_ok": st.get("pose_ok", True),
                "err": st.get("mean_reproj_err", 0.0),
                "rec": st.get("recovered", 0),
            }
        # per-frame motion error vs GT for each leg
        if i >= 1:
            dT_gt = np.linalg.inv(poses_gt[i - 1]) @ poses_gt[i]
            for name, vo in vos.items():
                dT = np.linalg.inv(vo.trajectory[-2]) @ vo.trajectory[-1]
                E = np.linalg.inv(dT_gt) @ dT
                row[name]["rot_err_deg"] = rot_deg(E[:3, :3])
                row[name]["t_err"] = float(np.linalg.norm(E[:3, 3]))
        rows.append(row)
        if i >= 1:
            j, k = row["jnp"], row["pallas"]
            flag = "  <-- DIVERGE" if abs(j["rot_err_deg"] - k["rot_err_deg"]) > 0.2 else ""
            print(
                f"f{i:03d} jnp: trk {j['n_tracked']:3d} in {j['n_inliers']:3d} "
                f"err {j['err']:5.2f} rot {j['rot_err_deg']:6.3f} | "
                f"plls: trk {k['n_tracked']:3d} in {k['n_inliers']:3d} "
                f"err {k['err']:5.2f} rot {k['rot_err_deg']:6.3f} ok={k['pose_ok']} rec={k['rec']}{flag}",
                flush=True,
            )

    rj = np.array([r["jnp"]["rot_err_deg"] for r in rows[1:]])
    rp = np.array([r["pallas"]["rot_err_deg"] for r in rows[1:]])
    summary = {
        "frames": args.frames,
        "rot_err_deg_jnp_q50_q90_max": [float(np.median(rj)), float(np.quantile(rj, 0.9)), float(rj.max())],
        "rot_err_deg_pallas_q50_q90_max": [float(np.median(rp)), float(np.quantile(rp, 0.9)), float(rp.max())],
        "first_divergent_frame": next(
            (r["frame"] for r in rows[1:] if abs(r["jnp"]["rot_err_deg"] - r["pallas"]["rot_err_deg"]) > 0.2),
            None,
        ),
    }
    print(json.dumps(summary, indent=1))
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
