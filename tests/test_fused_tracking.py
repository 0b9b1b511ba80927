import numpy as np
import pytest

from iv_slam_tpu.config import Config, CameraConfig, ORBConfig
from iv_slam_tpu.io import trajectory
from iv_slam_tpu.slam.system import System
from iv_slam_tpu.slam.tracking import State

import synth_world


def make_config(fused: bool):
    cfg = Config()
    cfg.camera = CameraConfig(
        fx=400.0, fy=400.0, cx=160.0, cy=120.0, bf=200.0,
        width=320, height=240, th_depth=35.0, fps=10.0,
    )
    cfg.orb = ORBConfig(n_features=800, n_levels=4)
    cfg.system.fused_tracking = fused
    return cfg


@pytest.mark.slow
def test_fused_tracking_matches_classic(rng):
    world, frames, gt = synth_world.make_sequence(rng, n_frames=12, step=0.08)

    def run(fused):
        sys_ = System(make_config(fused), 240, 320)
        tr = sys_.tracking
        for i, (left, right) in enumerate(frames):
            sys_.track_stereo(left, right, timestamp=i * 0.1)
            # keep the device map fresh after keyframe/BA events
            if fused:
                tr.mark_map_dirty()
        assert sys_.state == State.OK
        assert sys_.failure_count == 0
        return sys_.trajectory_twc()

    est_classic = run(False)
    est_fused = run(True)
    ate_classic = trajectory.ate_rmse(est_classic, gt)
    ate_fused = trajectory.ate_rmse(est_fused, gt)
    assert ate_classic < 0.05, ate_classic
    assert ate_fused < 0.06, ate_fused
    # the fused path must stay close to the classic estimate
    cross = trajectory.ate_rmse(est_fused, est_classic)
    assert cross < 0.05, cross
