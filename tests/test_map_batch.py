"""Batched MapStore bookkeeping == scalar reference semantics.

compute_distinctive_descriptor_batch / update_normal_and_depth_batch are
the vectorized forms of the per-point MapPoint::ComputeDistinctiveDescriptors
and MapPoint::UpdateNormalAndDepth re-derivations; keyframe events call them
over thousands of points, so they must match the scalar versions bit-for-bit
on ragged observation lists.
"""

from types import SimpleNamespace

import numpy as np

from iv_slam_tpu.slam.map_store import MapStore


def _make_store(rng, n_kf=6, n_feat=50, n_pts=40):
    m = MapStore(max_points=500, max_keyframes=32, n_levels=4)
    for k in range(n_kf):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = rng.normal(0, 1, 3)
        m.kf_pose[k] = T
        m.kf_frames[k] = SimpleNamespace(
            desc=rng.integers(0, 256, (n_feat, 32)).astype(np.uint8),
            octave=rng.integers(0, 4, n_feat).astype(np.int32),
            u_right=rng.uniform(-1, 100, n_feat).astype(np.float32),
            map_pt=np.full(n_feat, -1, np.int64),
            pose=T,
        )
        m.kf_alive[k] = True
    m.n_keyframes = n_kf
    pids = []
    for _ in range(n_pts):
        pid = m.add_point(rng.normal(0, 5, 3).astype(np.float32),
                          int(rng.integers(0, n_kf)))
        # 1-5 ragged observations
        for k in rng.choice(n_kf, rng.integers(1, 6), replace=False):
            m.add_observation(pid, int(k), int(rng.integers(0, n_feat)))
        # ref kf must observe the point for the scale-range update
        ref = int(m.pt_ref_kf[pid])
        if ref not in m.pt_obs[pid]:
            m.pt_obs[pid][ref] = int(rng.integers(0, n_feat))
        pids.append(pid)
    return m, pids


def test_distinctive_descriptor_batch_matches_scalar(rng):
    m, pids = _make_store(rng)
    m2, _ = _make_store(np.random.default_rng(42))  # identical twin
    for p in pids:
        m.compute_distinctive_descriptor(p)
    m2.compute_distinctive_descriptor_batch(pids)
    assert (m.pt_desc[: m.n_points] == m2.pt_desc[: m2.n_points]).all()


def test_normal_and_depth_batch_matches_scalar(rng):
    m, pids = _make_store(rng)
    m2, _ = _make_store(np.random.default_rng(42))
    for p in pids:
        m.update_normal_and_depth(p)
    m2.update_normal_and_depth_batch(pids)
    n = m.n_points
    np.testing.assert_allclose(m.pt_normal[:n], m2.pt_normal[:n],
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(m.pt_min_dist[:n], m2.pt_min_dist[:n],
                               rtol=1e-6)
    np.testing.assert_allclose(m.pt_max_dist[:n], m2.pt_max_dist[:n],
                               rtol=1e-6)


def test_batch_handles_empty_and_dead():
    m = MapStore(max_points=10, max_keyframes=4, n_levels=4)
    m.compute_distinctive_descriptor_batch([])
    m.update_normal_and_depth_batch([])
    pid = m.add_point(np.zeros(3, np.float32), -1)
    # no observations: both must no-op without raising
    m.compute_distinctive_descriptor_batch([pid])
    m.update_normal_and_depth_batch([pid])
