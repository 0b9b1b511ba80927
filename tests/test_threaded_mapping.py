"""Threaded LocalMapping (cfg.system.threaded_local_mapping): keyframe
events run on a worker thread — the reference's LocalMapping/LoopClosing
thread architecture (System.cc:172-197) — while tracking continues
against the device-map mirror. The trajectory must stay equivalent to
the synchronous LoopOnce path (staleness only defers map refinement by
at most one event, exactly the reference's threaded semantics).
"""

import numpy as np
import pytest

import synth_world
from iv_slam_tpu.config import CameraConfig, Config, ORBConfig
from iv_slam_tpu.io import trajectory
from iv_slam_tpu.slam.system import System
from iv_slam_tpu.slam.tracking import State


def make_config(threaded: bool):
    cfg = Config()
    cfg.camera = CameraConfig(
        fx=400.0, fy=400.0, cx=160.0, cy=120.0, bf=200.0,
        width=320, height=240, th_depth=35.0, fps=10.0,
    )
    cfg.orb = ORBConfig(n_features=800, n_levels=4)
    cfg.system.fused_tracking = True
    cfg.system.threaded_local_mapping = threaded
    cfg.system.async_local_ba = threaded
    return cfg


def run(threaded, frames):
    sys_ = System(make_config(threaded), 240, 320)
    for i, (left, right) in enumerate(frames):
        sys_.track_stereo(left, right, timestamp=i * 0.1)
    assert sys_.state == State.OK
    assert sys_.failure_count == 0
    est = sys_.trajectory_twc()  # joins the worker
    lm = sys_.tracking.local_mapping
    assert lm.worker_exc is None if threaded else True
    n_kf = int(sys_.tracking.map.kf_alive.sum())
    sys_.shutdown()
    return est, n_kf


@pytest.mark.slow
def test_threaded_matches_sync(rng):
    # step large enough that tracked-inlier decay forces new keyframes
    # (0.35 m/frame at 10 m height: ~2 events over 16 frames) — the
    # worker must actually run triangulation/fuse/BA
    world, frames, gt = synth_world.make_sequence(rng, n_frames=16,
                                                  step=0.35)
    est_sync, kf_sync = run(False, frames)
    est_thr, kf_thr = run(True, frames)
    ate_sync = trajectory.ate_rmse(est_sync, gt)
    ate_thr = trajectory.ate_rmse(est_thr, gt)
    assert ate_sync < 0.30, ate_sync
    assert ate_thr < 0.30, ate_thr
    cross = trajectory.ate_rmse(est_thr, est_sync)
    assert cross < 0.10, cross
    # the worker actually built a map (triangulation/fuse/BA all ran)
    assert kf_thr >= 2 and kf_sync >= 2


def test_worker_lifecycle():
    """start/enqueue/join/stop and reset re-arm the worker cleanly."""
    cfg = make_config(True)
    sys_ = System(cfg, 240, 320)
    lm = sys_.tracking.local_mapping
    assert lm._worker is not None and lm._worker.is_alive()
    assert lm.pending_count() == 0
    lm.join()
    sys_.tracking._reset()
    lm2 = sys_.tracking.local_mapping
    assert lm2 is not lm
    assert lm2._worker is not None and lm2._worker.is_alive()
    assert not lm._worker  # old worker stopped (thread object cleared)
    sys_.shutdown()
    assert lm2._worker is None
