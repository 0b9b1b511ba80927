import numpy as np
import pytest

from iv_slam_tpu.config import Config, CameraConfig, ORBConfig
from iv_slam_tpu.io import trajectory
from iv_slam_tpu.slam.system import System
from iv_slam_tpu.slam.tracking import State

import synth_world


@pytest.fixture(scope="module")
def sequence():
    rng = np.random.default_rng(5)
    return synth_world.make_sequence(rng, n_frames=16, step=0.08)


def make_config():
    cfg = Config()
    cfg.camera = CameraConfig(
        fx=400.0, fy=400.0, cx=160.0, cy=120.0, bf=200.0,
        width=320, height=240, th_depth=35.0, fps=10.0,
    )
    cfg.orb = ORBConfig(n_features=800, n_levels=4, ini_th_fast=12,
                        min_th_fast=7)
    return cfg


def test_stereo_slam_end_to_end(sequence):
    world, frames, gt = sequence
    cfg = make_config()
    sys = System(cfg, 240, 320)
    for i, (left, right) in enumerate(frames):
        sys.track_stereo(left, right, timestamp=i * 0.1)
    assert sys.state == State.OK
    assert sys.failure_count == 0

    est = sys.trajectory_twc()
    assert len(est) == len(gt)
    ate = trajectory.ate_rmse(est, gt)
    # plane at 10 m, baseline 0.5 m: stereo depth noise ~ cm level; the
    # trajectory is 1.2 m long — demand cm-level absolute accuracy
    assert ate < 0.05, ate
    # frame-to-frame jitter is bounded by stereo depth noise at 10 m range
    # (dz = z^2/bf * 0.25px ~ 0.12 m); the aligned ATE above is the real gate
    rpe1 = trajectory.rpe(est, gt, 1)
    assert rpe1 < 0.08, rpe1


def test_trajectory_io_roundtrip(tmp_path, sequence):
    world, frames, gt = sequence
    p = str(tmp_path / "traj.txt")
    trajectory.save_kitti(p, gt)
    loaded = trajectory.load_kitti(p)
    assert len(loaded) == len(gt)
    np.testing.assert_allclose(loaded[3], gt[3], atol=1e-5)
    assert trajectory.ate_rmse(loaded, gt) < 1e-6
