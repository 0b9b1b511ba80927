#!/usr/bin/env python
"""Batch trajectory evaluation (scripts/evaluation/evaluate_batch.py role).

Computes the reference's evaluation protocol over a set of sessions:
SE3-aligned ATE RMSE and translational RPE at a configurable delta
(evo_ape/evo_rpe equivalents, evaluate_batch.py:43-55), per-session
trajectory length, and failure counts — aggregated across modes
(e.g. ORB_SLAM vs IV_SLAM runs) like evaluate_batch_postproc.py.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def trajectory_length(poses):
    pts = np.stack([T[:3, 3] for T in poses])
    return float(np.linalg.norm(np.diff(pts, axis=0), axis=1).sum())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--results_root", required=True,
                   help="per-mode dirs containing <session>/Trajectory_KITTI_000.txt")
    p.add_argument("--gt_root", required=True,
                   help="per-session GT files <session>.txt (KITTI format)")
    p.add_argument("--modes", nargs="+", default=["ORB_SLAM", "IV_SLAM"])
    p.add_argument("--sessions", nargs="+", required=True)
    p.add_argument("--rpe_delta", type=int, default=1,
                   help="frame delta for RPE (reference uses metric deltas)")
    p.add_argument("--out", default="evaluation.json")
    args = p.parse_args()

    from iv_slam_tpu.io import trajectory

    report = {}
    for mode in args.modes:
        report[mode] = {}
        for sess in args.sessions:
            d = os.path.join(args.results_root, mode, sess)
            traj_file = os.path.join(d, "Trajectory_KITTI_000.txt")
            if not os.path.exists(traj_file):
                continue
            est = trajectory.load_kitti(traj_file)
            gt = trajectory.load_kitti(
                os.path.join(args.gt_root, sess + ".txt")
            )
            n = min(len(est), len(gt))
            failures = 0
            flog = os.path.join(d, "failure_log.txt")
            if os.path.exists(flog):
                with open(flog) as f:
                    failures = sum(1 for ln in f if ln.strip())
            length = trajectory_length(gt[:n])
            report[mode][sess] = dict(
                ate_rmse=trajectory.ate_rmse(est[:n], gt[:n]),
                rpe_trans=trajectory.rpe(est[:n], gt[:n], args.rpe_delta),
                failures=failures,
                length_m=length,
                mdbf_m=length / max(failures, 1),  # mean distance between failures
                frames=n,
            )
        vals = report[mode].values()
        if vals:
            report[mode]["__aggregate__"] = dict(
                ate_rmse=float(np.mean([v["ate_rmse"] for v in vals])),
                rpe_trans=float(np.mean([v["rpe_trans"] for v in vals])),
                failures=int(np.sum([v["failures"] for v in vals])),
                total_length_m=float(np.sum([v["length_m"] for v in vals])),
            )
    print(json.dumps(report, indent=2))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
