#!/usr/bin/env python3
"""Batch-evaluation visualization (evaluate_batch_viz.py parity).

Consumes the evaluation.json written by examples/evaluate_batch.py and
renders the reference's comparison figures headless
(scripts/evaluation/evaluate_batch_viz.py): per-session RPE bar charts for
each mode pair and the failure-count bar plot, optionally sorted by the
first mode's failure count (SORT_TRAJ).

Usage:
  python examples/evaluate_viz.py --report evaluation.json --out_dir plots
"""

import argparse
import json
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--report", required=True, help="evaluate_batch.py output")
    p.add_argument("--out_dir", default="eval_plots")
    p.add_argument("--sort_traj", action="store_true", default=True,
                   help="sort sessions by the first mode's failure count")
    p.add_argument("--separate_graphs", action="store_true",
                   help="one figure per metric (SAVE_SEPARATE_GRAPHS)")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(args.report) as f:
        report = json.load(f)
    modes = list(report.keys())
    sessions = sorted(
        k for k in report[modes[0]] if k != "__aggregate__"
    )
    if not sessions:
        raise SystemExit("no sessions in report")
    if args.sort_traj:
        sessions.sort(
            key=lambda s: -report[modes[0]][s].get("failures", 0)
        )
    os.makedirs(args.out_dir, exist_ok=True)

    metrics = [
        ("rpe_trans", "RPE translation (m)"),
        ("ate_rmse", "ATE RMSE (m)"),
        ("failures", "failure count"),
    ]
    x = np.arange(len(sessions))
    width = 0.8 / max(len(modes), 1)

    def draw(ax, metric, label):
        for mi, mode in enumerate(modes):
            vals = [report[mode].get(s, {}).get(metric, 0.0)
                    for s in sessions]
            ax.bar(x + mi * width, vals, width, label=mode)
        ax.set_xticks(x + width * (len(modes) - 1) / 2)
        ax.set_xticklabels(sessions, rotation=45, ha="right", fontsize=7)
        ax.set_ylabel(label)
        ax.legend(fontsize=8)

    if args.separate_graphs:
        for metric, label in metrics:
            fig, ax = plt.subplots(figsize=(8, 3.2))
            draw(ax, metric, label)
            fig.tight_layout()
            path = os.path.join(args.out_dir, f"{metric}.png")
            fig.savefig(path, dpi=150)
            plt.close(fig)
            print("wrote", path)
    else:
        fig, axes = plt.subplots(
            len(metrics), 1, figsize=(8, 3.0 * len(metrics))
        )
        for ax, (metric, label) in zip(np.atleast_1d(axes), metrics):
            draw(ax, metric, label)
        fig.tight_layout()
        path = os.path.join(args.out_dir, "evaluation.png")
        fig.savefig(path, dpi=150)
        plt.close(fig)
        print("wrote", path)

    # aggregate table on stdout (evaluate_batch_postproc's summary role)
    for mode in modes:
        agg = report[mode].get("__aggregate__", {})
        print(mode, json.dumps(agg))


if __name__ == "__main__":
    main()
