import numpy as np
import pytest

from iv_slam_tpu.config import Config, CameraConfig, ORBConfig
from iv_slam_tpu.io import trajectory
from iv_slam_tpu.slam.system import System
from iv_slam_tpu.slam.tracking import State

import synth_world


def make_config():
    cfg = Config()
    cfg.camera = CameraConfig(
        fx=400.0, fy=400.0, cx=160.0, cy=120.0, bf=200.0,
        width=320, height=240, th_depth=35.0, fps=10.0,
    )
    cfg.orb = ORBConfig(n_features=800, n_levels=4)
    return cfg


@pytest.fixture(scope="module")
def world_and_gt():
    rng = np.random.default_rng(23)
    world = synth_world.TwoPlaneWorld(rng)
    gt = []
    for i in range(14):
        t = np.array([i * 0.25, 0.03 * np.sin(i * 0.5), 0.0], np.float32)
        gt.append(synth_world.camera_pose(t, height=10.0, yaw=0.01 * i))
    return world, gt


@pytest.mark.slow
def test_rgbd_slam_end_to_end(world_and_gt):
    world, gt = world_and_gt
    cfg = make_config()
    cfg.system.sensor = "rgbd"
    sys = System(cfg, 240, 320)
    for i, T in enumerate(gt):
        img = world.render(T)
        depth = world.render_depth(T)
        sys.track_rgbd(img, depth, timestamp=i * 0.1)
    assert sys.state == State.OK
    est = sys.trajectory_twc()
    ate = trajectory.ate_rmse(est, gt)
    assert ate < 0.05, ate


@pytest.mark.slow
def test_mono_slam_initializes_and_tracks(world_and_gt):
    world, gt = world_and_gt
    cfg = make_config()
    cfg.system.sensor = "mono"
    sys = System(cfg, 240, 320)
    states = []
    for i, T in enumerate(gt):
        img = world.render(T)
        sys.track_mono(img, timestamp=i * 0.1)
        states.append(sys.state)
    # monocular init takes a few frames; once OK it should stay OK
    assert State.OK in states, states
    first_ok = states.index(State.OK)
    assert all(s == State.OK for s in states[first_ok:]), states
    # trajectory shape up to scale: compare direction of motion
    est = sys.trajectory_twc()[first_ok - 1:]
    gt_sub = gt[first_ok - 1:]
    if len(est) >= 5:
        d_est = est[-1][:3, 3] - est[0][:3, 3]
        d_gt = gt_sub[-1][:3, 3] - gt_sub[0][:3, 3]
        cos = float(
            d_est @ d_gt / max(np.linalg.norm(d_est) * np.linalg.norm(d_gt),
                               1e-9)
        )
        assert cos > 0.95, cos
