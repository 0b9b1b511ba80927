"""Training-mode bundle-adjustment variants (Optimizer.cc:873-1751).

LocalBundleAdjustmentVis writes per-MAP-POINT qualities from summed
normalized chi2 (Optimizer.cc:1230-1262); ConstrainedLocalBundleAdjustment
pins poses to GT and writes per-KEYPOINT qualities from edge chi2
(Optimizer.cc:1555-1597). Both run through the same vectorized edge
assembly as the standard local BA (solvers/local_ba.py _run_ba).

On clean synthetic data every chi2 sits below the quality windows and all
scores stay at the 1.0 default, so each test corrupts one observation by
25 px: its edge keeps a large chi2 through the robustified BA and the
corresponding quality must drop.
"""

import numpy as np
import pytest

from iv_slam_tpu.config import Config, CameraConfig, ORBConfig
from iv_slam_tpu.slam.system import System
from iv_slam_tpu.slam.tracking import State
from iv_slam_tpu.solvers import local_ba

import synth_world


def _run(rng, ba_mode, with_gt):
    world, frames, gt = synth_world.make_sequence(rng, n_frames=15, step=0.08)
    cfg = Config()
    cfg.camera = CameraConfig(
        fx=400.0, fy=400.0, cx=160.0, cy=120.0, bf=200.0,
        width=320, height=240, th_depth=35.0, fps=10.0,
    )
    cfg.orb = ORBConfig(n_features=800, n_levels=4)
    cfg.iv.ba_mode = ba_mode
    s = System(cfg, 240, 320)
    tr = s.tracking
    for i, (left, right) in enumerate(frames):
        s.track_stereo(
            left, right, timestamp=i * 0.1,
            gt_pose=np.asarray(gt[i], np.float32) if with_gt else None,
        )
        # the easy synthetic motion never trips NeedNewKeyFrame (tracked
        # ratio stays high — correct reference semantics); force keyframes
        # so points gather >= 3 observations and local BA has a window
        if (
            i % 3 == 2 and s.state == State.OK
            and tr.current.frame_id != tr.last_kf_frame_id
        ):
            tr._create_new_keyframe()
    assert s.state == State.OK
    assert s.failure_count == 0
    return s


def _corrupt_one_observation(m, min_obs=3):
    """Shift one well-observed keypoint by 25 px; returns (pid, kf, feat)."""
    for pid in range(m.n_points):
        if m.pt_alive[pid] and len(m.pt_obs[pid]) >= min_obs:
            kf, feat = next(iter(m.pt_obs[pid].items()))
            m.kf_frames[kf].xy[feat] += 25.0
            return pid, kf, feat
    raise AssertionError("no well-observed point found")


@pytest.mark.slow
def test_local_ba_vis_writes_point_quality(rng):
    s = _run(rng, "standard", with_gt=False)
    m = s.tracking.map
    pid, kf, feat = _corrupt_one_observation(m)
    local_ba.local_bundle_adjustment_vis(s.tracking.cfg, m, kf)
    # the corrupted edge's normalized chi2 pushes the point's score off the
    # 1.0 default through 2/(1+scaled)-1 (Optimizer.cc:1230-1262)
    assert m.pt_quality[pid] < 1.0
    q = m.pt_quality[: m.n_points]
    assert (q >= -1.0).all() and (q <= 1.0).all()


@pytest.mark.slow
def test_constrained_ba_writes_keypoint_quality(rng):
    s = _run(rng, "standard", with_gt=True)
    m = s.tracking.map
    pid, kf, feat = _corrupt_one_observation(m)
    local_ba.constrained_local_bundle_adjustment(s.tracking.cfg, m, kf)
    # guided BA labels the corrupted keypoint via the [1.0, 7.815] chi2
    # window (Optimizer.cc:1555-1597)
    assert m.kf_frames[kf].qual_score[feat] < 1.0
    for k in range(m.n_keyframes):
        f = m.kf_frames[k]
        if f is not None:
            qs = f.qual_score[f.map_pt >= 0]
            assert (qs >= -1.0).all() and (qs <= 1.0).all()
