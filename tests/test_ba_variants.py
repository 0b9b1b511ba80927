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


def test_ba_converges_at_reference_iteration_budget(rng):
    """Regression for the LM rho-denominator fix (g2o computeScale uses
    the ORIGINAL gradient, not the Schur-reduced rhs): a displaced
    keyframe 1 m off a clean two-KF stereo problem must be pulled back by
    the reference's own iteration budget optimize(5)+optimize(10), not by
    50 iterations. With the reduced-gradient denominator rho saturates
    ~2/3, lambda never decays, and the same problem stalls ~0.9 m out."""
    import jax
    import jax.numpy as jnp

    from iv_slam_tpu.geometry import camera
    from iv_slam_tpu.solvers.ba_core import BAProblem, ba_solve

    cfg = CameraConfig(fx=400.0, fy=400.0, cx=160.0, cy=120.0, bf=200.0)
    K = camera.Intrinsics.from_config(cfg)
    n_pts = 200
    pts = np.stack([
        rng.uniform(-4, 4, n_pts), rng.uniform(-3, 3, n_pts),
        rng.uniform(8, 14, n_pts),
    ], 1).astype(np.float32)
    T0 = np.eye(4, dtype=np.float32)
    T1_true = np.eye(4, dtype=np.float32)
    T1_true[:3, 3] = [-1.2, 0.0, 0.0]   # camera moved +1.2 m in x
    T1_bad = T1_true.copy()
    T1_bad[:3, 3] = [-0.2, 0.1, -0.2]   # 1 m initialization error

    def obs(T):
        pc = pts @ T[:3, :3].T + T[:3, 3]
        u = 400 * pc[:, 0] / pc[:, 2] + 160
        v = 400 * pc[:, 1] / pc[:, 2] + 120
        ur = u - 200.0 / pc[:, 2]
        return np.stack([u, v, ur], 1).astype(np.float32)

    e_obs = np.concatenate([obs(T0), obs(T1_true)])
    e_kf = np.concatenate([np.zeros(n_pts), np.ones(n_pts)]).astype(np.int32)
    e_pt = np.concatenate([np.arange(n_pts)] * 2).astype(np.int32)
    # perturb the points too — BA must fix both jointly
    pts_bad = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)

    prob = BAProblem(
        kf_pose=jnp.asarray(np.stack([T0, T1_bad])),
        kf_fixed=jnp.asarray(np.array([True, False])),
        pt_pos=jnp.asarray(pts_bad),
        pt_valid=jnp.ones(n_pts, bool),
        e_kf=jnp.asarray(e_kf),
        e_pt=jnp.asarray(e_pt),
        e_obs=jnp.asarray(e_obs),
        e_inv_s2=jnp.ones(2 * n_pts),
        e_qual=jnp.ones(2 * n_pts),
        e_valid=jnp.ones(2 * n_pts, bool),
    )
    res = ba_solve(prob, K, n_iters1=5, n_iters2=10)
    T1_opt = np.asarray(res.kf_pose[1])
    err = np.linalg.norm(T1_opt[:3, 3] - T1_true[:3, 3])
    assert err < 0.01, err

    # ---- segmented solver equivalence: the async worker path drives
    # the SAME iterations as five smaller device programs (ba_segment /
    # ba_midpoint / ba_finalize); fori(0,a)+fori(0,b) with the carry
    # threaded through must equal fori(0,a+b) exactly
    res_seg = local_ba._ba_solve_segmented_driver(
        jax.tree.map(np.asarray, prob), K
    )()
    # same math, different program boundaries: XLA fusion may differ in
    # the last ulp, so tight-but-nonzero tolerances
    np.testing.assert_allclose(
        np.asarray(res_seg.kf_pose), np.asarray(res.kf_pose), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(res_seg.pt_pos), np.asarray(res.pt_pos), atol=1e-4,
    )
    agree = (np.asarray(res_seg.e_inlier)
             == np.asarray(res.e_inlier)).mean()
    assert agree > 0.99, agree
    T1_seg = np.asarray(res_seg.kf_pose[1])
    assert np.linalg.norm(T1_seg[:3, 3] - T1_true[:3, 3]) < 0.01


@pytest.mark.slow
def test_async_local_ba_tracks_like_sync(rng):
    """cfg.system.async_local_ba dispatches local BA without blocking and
    merges when ready / at the next keyframe event (the reference's
    threaded-LocalMapping semantics, LocalMapping.cc run()). The map it
    converges to must be essentially the sync map: same keyframes, poses
    close after the forced trajectory-save join."""

    def run(async_ba):
        r = np.random.default_rng(7)
        world, frames, gt = synth_world.make_sequence(r, n_frames=15,
                                                      step=0.08)
        cfg = Config()
        cfg.camera = CameraConfig(
            fx=400.0, fy=400.0, cx=160.0, cy=120.0, bf=200.0,
            width=320, height=240, th_depth=35.0, fps=10.0,
        )
        cfg.orb = ORBConfig(n_features=800, n_levels=4)
        cfg.system.async_local_ba = async_ba
        s = System(cfg, 240, 320)
        tr = s.tracking
        for i, (left, right) in enumerate(frames):
            s.track_stereo(left, right, timestamp=i * 0.1)
            if (
                i % 3 == 2 and s.state == State.OK
                and tr.current.frame_id != tr.last_kf_frame_id
            ):
                tr._create_new_keyframe()
        assert s.failure_count == 0
        twc = s.trajectory_twc()          # forced async-BA join point
        assert tr.local_mapping._pending_ba is None
        return np.stack(twc), s.tracking.map

    twc_sync, m_sync = run(False)
    twc_async, m_async = run(True)
    assert m_sync.n_keyframes == m_async.n_keyframes
    # trajectories agree closely (merge timing differs — inter-event
    # frames track against pre-BA poses — but the solved window is the
    # same, so divergence stays at the noise floor)
    d = np.linalg.norm(twc_sync[:, :3, 3] - twc_async[:, :3, 3], axis=1)
    # frames tracked between dispatch and merge see pre-BA poses, so a
    # few cm of per-frame timing divergence is inherent; the bulk of the
    # trajectory must sit at the noise floor
    assert d.max() < 5e-2, d.max()
    assert np.median(d) < 5e-3, np.median(d)
