"""Trajectory writers in the reference's output formats
(System::SaveTrajectoryKITTI / SaveTrajectoryTUM, System.cc:614-772)."""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..geometry import se3


def save_kitti(path: str, poses_twc: Sequence[np.ndarray]):
    """One 3x4 row-major Twc per line (KITTI odometry format)."""
    with open(path, "w") as f:
        for T in poses_twc:
            row = T[:3, :4].reshape(-1)
            f.write(" ".join(f"{v:.9e}" for v in row) + "\n")


def save_times(path: str, times: Sequence[float]):
    """Per-frame timestamps (KITTI_time_###.txt companion file)."""
    with open(path, "w") as f:
        for t in times:
            f.write(f"{t:.6e}\n")


def save_tum(path: str, times: Sequence[float], poses_twc: Sequence[np.ndarray]):
    """timestamp tx ty tz qx qy qz qw per line (TUM format)."""
    import jax.numpy as jnp

    with open(path, "w") as f:
        for t, T in zip(times, poses_twc):
            q = np.asarray(se3.rot_to_quat(jnp.asarray(T[:3, :3])))
            tr = T[:3, 3]
            f.write(
                f"{t:.6e} {tr[0]:.9e} {tr[1]:.9e} {tr[2]:.9e} "
                f"{q[0]:.9e} {q[1]:.9e} {q[2]:.9e} {q[3]:.9e}\n"
            )


def load_kitti(path: str) -> List[np.ndarray]:
    out = []
    with open(path) as f:
        for line in f:
            vals = np.array([float(x) for x in line.split()], np.float32)
            T = np.eye(4, dtype=np.float32)
            T[:3, :4] = vals.reshape(3, 4)
            out.append(T)
    return out


def ate_rmse(est: Sequence[np.ndarray], gt: Sequence[np.ndarray]) -> float:
    """Absolute trajectory error after SE3 (Umeyama, no scale) alignment —
    the evo_ape protocol the reference's evaluation scripts use
    (scripts/evaluation/evaluate_batch.py:43-55)."""
    P = np.stack([T[:3, 3] for T in est])
    Q = np.stack([T[:3, 3] for T in gt])
    mu_p, mu_q = P.mean(0), Q.mean(0)
    Pc, Qc = P - mu_p, Q - mu_q
    U, _, Vt = np.linalg.svd(Pc.T @ Qc)
    S = np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vt))])
    R = (U @ S @ Vt).T
    t = mu_q - R @ mu_p
    aligned = P @ R.T + t
    return float(np.sqrt(np.mean(np.sum((aligned - Q) ** 2, axis=1))))


def rpe(est: Sequence[np.ndarray], gt: Sequence[np.ndarray], delta: int = 1):
    """Relative pose error (translation) over frame pairs delta apart."""
    errs = []
    for i in range(len(est) - delta):
        de = np.linalg.inv(est[i]) @ est[i + delta]
        dg = np.linalg.inv(gt[i]) @ gt[i + delta]
        err = np.linalg.inv(dg) @ de
        errs.append(np.linalg.norm(err[:3, 3]))
    return float(np.sqrt(np.mean(np.square(errs))))
