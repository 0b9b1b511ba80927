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
                   help="frame delta for RPE")
    p.add_argument("--rpe_delta_m", type=float, default=None,
                   help="metric delta for RPE along the GT path, overriding "
                        "--rpe_delta (the reference's protocol: 2.0 m Jackal "
                        "/ 20 m AirSim / 1 m EuRoC, evaluate_batch.py:43-55)")
    p.add_argument("--viz", action="store_true",
                   help="also render the evaluate_batch_viz.py figures "
                        "(per-session rot/trans RPE + failure-count bars) "
                        "next to --out")
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
                rpe_trans=trajectory.rpe(est[:n], gt[:n], args.rpe_delta,
                                         "trans", args.rpe_delta_m),
                rpe_rot_deg=trajectory.rpe(est[:n], gt[:n], args.rpe_delta,
                                           "rot", args.rpe_delta_m),
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
                rpe_rot_deg=float(np.mean([v["rpe_rot_deg"] for v in vals])),
                failures=int(np.sum([v["failures"] for v in vals])),
                total_length_m=float(np.sum([v["length_m"] for v in vals])),
            )
    print(json.dumps(report, indent=2))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    if args.viz:
        render_viz(report, args.modes, os.path.dirname(args.out) or ".")


# 2-series categorical slots (validated reference palette, fixed order)
_SERIES = ["#2a78d6", "#eb6834"]
_SURFACE, _INK, _INK2 = "#fcfcfb", "#0b0b0b", "#52514e"


def render_viz(report, modes, out_dir):
    """The evaluate_batch_viz.py figures: per-session grouped bars for
    rot/trans RPE and failure counts, sessions sorted descending by the
    first mode's failure count (SORT_TRAJ, evaluate_batch_viz.py:31-33).
    One measure per figure (no dual axes)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sessions = sorted(
        (s for s in report.get(modes[0], {}) if s != "__aggregate__"),
        key=lambda s: -report[modes[0]][s]["failures"],
    )
    if not sessions:
        return
    panels = [
        ("rpe_trans", "Translational RPE (m, RMSE)", "rpe_trans.png"),
        ("rpe_rot_deg", "Rotational RPE (deg, RMSE)", "rpe_rot.png"),
        ("failures", "Tracking failures per session", "failure_counts.png"),
    ]
    x = np.arange(len(sessions))
    width = 0.8 / len(modes)
    for key, title, fname in panels:
        fig, ax = plt.subplots(figsize=(7, 4))
        fig.patch.set_facecolor(_SURFACE)
        ax.set_facecolor(_SURFACE)
        for mi, mode in enumerate(modes):
            vals = [report.get(mode, {}).get(s, {}).get(key, 0.0)
                    for s in sessions]
            ax.bar(x + (mi - (len(modes) - 1) / 2) * width, vals,
                   width * 0.94, label=mode,
                   color=_SERIES[mi % len(_SERIES)], linewidth=0)
        ax.set_title(title, color=_INK, loc="left", fontsize=11)
        ax.set_xticks(x, sessions, color=_INK2, fontsize=9)
        ax.tick_params(colors=_INK2, length=0)
        ax.grid(axis="y", color="#e4e3df", linewidth=0.75)
        ax.set_axisbelow(True)
        for sp in ax.spines.values():
            sp.set_visible(False)
        if len(modes) > 1:
            ax.legend(frameon=False, labelcolor=_INK2, fontsize=9)
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, fname), dpi=150)
        plt.close(fig)


if __name__ == "__main__":
    main()
