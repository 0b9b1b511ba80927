"""Trajectory-metric + batch-evaluation protocol tests (host-only).

Covers the reference's evaluation splits: translational AND rotational RPE
(evo_rpe rot_/trans_ prefixes, scripts/evaluation/evaluate_batch.py:43-55,
evaluate_batch_viz.py:28), metric pair deltas (2 m Jackal / 20 m AirSim /
1 m EuRoC), and the evaluate_batch.py CLI incl. the viz figures.
"""

import json
import os
import subprocess
import sys

import numpy as np

from iv_slam_tpu.io import trajectory

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def straight_line(n, step=1.0):
    out = []
    for i in range(n):
        T = np.eye(4, dtype=np.float64)
        T[0, 3] = i * step
        out.append(T)
    return out


def rotz(deg):
    c, s = np.cos(np.radians(deg)), np.sin(np.radians(deg))
    R = np.eye(4)
    R[0, 0], R[0, 1], R[1, 0], R[1, 1] = c, -s, s, c
    return R


def test_rpe_trans_exact():
    gt = straight_line(10)
    est = straight_line(10, step=1.1)  # each unit step off by 0.1 m
    assert abs(trajectory.rpe(est, gt, 1, "trans") - 0.1) < 1e-9
    assert trajectory.rpe(gt, gt, 1, "trans") == 0.0


def test_rpe_rot_exact():
    gt = straight_line(10)
    # constant 2-degree-per-frame yaw drift in the estimate
    est = [rotz(2.0 * i) @ T for i, T in enumerate(gt)]
    assert abs(trajectory.rpe(est, gt, 1, "rot") - 2.0) < 1e-6
    assert trajectory.rpe(gt, gt, 1, "rot") == 0.0


def test_rpe_metric_delta_pairs():
    # GT advances 0.5 m/frame: a 2 m metric delta pairs every 4th frame
    gt = straight_line(13, step=0.5)
    pairs = trajectory._metric_pairs(gt, 2.0)
    assert pairs == [(0, 4), (4, 8), (8, 12)]
    est = straight_line(13, step=0.55)  # 0.2 m error per 2 m segment
    err = trajectory.rpe(est, gt, kind="trans", delta_m=2.0)
    assert abs(err - 0.2) < 1e-9
    # delta longer than the whole path -> no pairs -> defined as 0
    assert trajectory.rpe(est, gt, kind="trans", delta_m=100.0) == 0.0


def test_ate_sim3_alignment_recovers_scale():
    # a mono trajectory off by a global scale factor aligns to ~0 error
    # under Sim3 (evo -as) but not under SE3
    gt = straight_line(10)
    est = straight_line(10, step=0.4)
    assert trajectory.ate_rmse(est, gt, align_scale=True) < 1e-9
    assert trajectory.ate_rmse(est, gt) > 0.5


def test_load_tum_mono(tmp_path):
    from iv_slam_tpu.io import datasets

    (tmp_path / "rgb").mkdir()
    lines = ["# comment line"]
    for i in range(3):
        lines.append(f"{1000.0 + i * 0.1:.4f} rgb/{i:04d}.png")
    (tmp_path / "rgb.txt").write_text("\n".join(lines) + "\n")
    seq = datasets.load_tum_mono(str(tmp_path))
    assert len(seq) == 3
    assert seq.left_paths[1].endswith("rgb/0001.png")
    assert seq.names == ["0000.png", "0001.png", "0002.png"]
    np.testing.assert_allclose(seq.timestamps[2], 1000.2)


def test_evaluate_batch_cli_and_viz(tmp_path):
    gt = straight_line(20, step=0.5)
    est_good = straight_line(20, step=0.5)
    est_bad = [rotz(1.0 * i) @ T for i, T in enumerate(straight_line(20, 0.55))]
    gt_root = tmp_path / "gt"
    gt_root.mkdir()
    trajectory.save_kitti(str(gt_root / "s0.txt"), gt)
    for mode, est in [("IV_SLAM", est_good), ("ORB_SLAM", est_bad)]:
        d = tmp_path / "results" / mode / "s0"
        d.mkdir(parents=True)
        trajectory.save_kitti(str(d / "Trajectory_KITTI_000.txt"), est)
        (d / "failure_log.txt").write_text("1.0\n2.0\n" if mode == "ORB_SLAM"
                                           else "")
    out = tmp_path / "evaluation.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "evaluate_batch.py"),
         "--results_root", str(tmp_path / "results"),
         "--gt_root", str(gt_root),
         "--sessions", "s0",
         "--rpe_delta_m", "2.0", "--viz", "--out", str(out)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    rep = json.loads(out.read_text())
    assert rep["IV_SLAM"]["s0"]["rpe_trans"] < 1e-6
    assert rep["IV_SLAM"]["s0"]["rpe_rot_deg"] < 1e-4
    assert rep["ORB_SLAM"]["s0"]["rpe_trans"] > 0.1
    assert rep["ORB_SLAM"]["s0"]["rpe_rot_deg"] > 1.0
    assert rep["ORB_SLAM"]["s0"]["failures"] == 2
    assert rep["ORB_SLAM"]["s0"]["mdbf_m"] == rep["ORB_SLAM"]["s0"]["length_m"] / 2
    for fname in ("rpe_trans.png", "rpe_rot.png", "failure_counts.png"):
        assert (tmp_path / fname).exists(), fname
