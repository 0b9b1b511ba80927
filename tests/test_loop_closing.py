"""Loop-closing pipeline pieces on a manufactured revisit scenario."""

import numpy as np
import pytest
import jax.numpy as jnp

from iv_slam_tpu.config import Config, CameraConfig, ORBConfig
from iv_slam_tpu.ops.extractor import Keypoints
from iv_slam_tpu.slam.frame import Frame
from iv_slam_tpu.slam.keyframe_db import KeyFrameDatabase
from iv_slam_tpu.slam.loop_closing import LoopClosing
from iv_slam_tpu.slam.map_store import MapStore
from iv_slam_tpu.slam.vocabulary import Vocabulary


def _make_frame(fid, xy, desc, pose, n_cap=256):
    n = len(xy)
    pad = n_cap - n
    xy_f = np.pad(xy.astype(np.float32), ((0, pad), (0, 0)))
    desc_f = np.pad(desc, ((0, pad), (0, 0)))
    valid = np.zeros(n_cap, bool)
    valid[:n] = True
    kp = Keypoints(
        xy=jnp.asarray(xy_f),
        response=jnp.zeros(n_cap),
        octave=jnp.zeros(n_cap, jnp.int32),
        angle=jnp.zeros(n_cap),
        desc=jnp.asarray(desc_f),
        valid=jnp.asarray(valid),
        yx_level=jnp.zeros((n_cap, 2), jnp.int32),
    )
    f = Frame(
        frame_id=fid, timestamp=float(fid), kp=kp,
        u_right=np.full(n_cap, -1.0, np.float32),
        depth=np.full(n_cap, -1.0, np.float32),
        qual_score=np.ones(n_cap, np.float32),
        pose=pose.astype(np.float32),
    )
    return f


def _build_scenario():
    rng = np.random.default_rng(17)
    cfg = Config()
    cfg.camera = CameraConfig(fx=400, fy=400, cx=160, cy=120, bf=200,
                              width=320, height=240)
    cfg.orb = ORBConfig(n_features=256)
    m = MapStore(n_levels=8, scale_factor=1.2)

    # world points in front of the origin
    n_pts = 120
    Xw = np.stack([
        rng.uniform(-4, 4, n_pts), rng.uniform(-3, 3, n_pts),
        rng.uniform(6, 14, n_pts),
    ], 1).astype(np.float32)
    descs = rng.integers(0, 256, (n_pts, 32)).astype(np.uint8)

    def project(T, X):
        pc = X @ T[:3, :3].T + T[:3, 3]
        return np.stack([
            400 * pc[:, 0] / pc[:, 2] + 160,
            400 * pc[:, 1] / pc[:, 2] + 120,
        ], 1), pc

    # keyframe 0 at origin, keyframe 1 revisiting with slight offset
    T0 = np.eye(4, dtype=np.float32)
    T1 = np.eye(4, dtype=np.float32)
    T1[:3, 3] = [0.1, 0.02, 0.05]
    frames = []
    for fid, T in ((0, T0), (1, T1)):
        uv, _ = project(T, Xw)
        f = _make_frame(fid, uv, descs, T)
        frames.append(f)
    # register in the map with DISJOINT point sets (a genuine unrecognized
    # revisit: no covisibility between the two keyframes, duplicate
    # landmarks — exactly what loop closure exists to fuse)
    kf0 = m.add_keyframe(frames[0])
    for i in range(n_pts):
        pid = m.add_point(Xw[i], kf0)
        m.add_observation(pid, kf0, i)
        frames[0].map_pt[i] = pid
        m.pt_desc[pid] = descs[i]
        m.update_normal_and_depth(pid)
    kf1 = m.add_keyframe(frames[1])
    for i in range(n_pts):
        pid = m.add_point(Xw[i] + rng.normal(0, 0.01, 3).astype(np.float32),
                          kf1)
        m.add_observation(pid, kf1, i)
        frames[1].map_pt[i] = pid
        m.pt_desc[pid] = descs[i]
        m.update_normal_and_depth(pid)

    voc = Vocabulary.train(descs, k=6, L=3, seed=3)
    return cfg, m, voc, kf0, kf1


@pytest.fixture(scope="module")
def scenario(tmp_path_factory):
    return _build_scenario()


def test_compute_sim3_finds_relative_pose(scenario):
    cfg, m, voc, kf0, kf1 = scenario
    kfdb = KeyFrameDatabase(voc)
    lc = LoopClosing(cfg, m, voc, kfdb)
    lc._ensure_bow(kf0)
    lc._ensure_bow(kf1)
    match = lc._compute_sim3(kf1, [kf0], fix_scale=True)
    assert match is not None
    loop_kf, (S_rel, scale), matched = match
    assert loop_kf == kf0
    assert abs(scale - 1.0) < 0.05
    # the verified matches pair each current feature with its loop-side
    # duplicate landmark (mvpCurrentMatchedPoints)
    assert len(matched) >= 20
    f0, f1b = m.kf_frames[kf0], m.kf_frames[kf1]
    good = sum(1 for cur_feat, pid in matched.items()
               if int(f0.map_pt[cur_feat]) == pid)
    assert good >= 0.9 * len(matched)
    # relative translation recovered: S_rel maps kf0-cam -> kf1-cam
    t_rel = S_rel[:3, 3] / scale
    expected = m.kf_pose[kf1][:3, 3] - m.kf_pose[kf0][:3, 3]
    np.testing.assert_allclose(t_rel, expected, atol=0.05)


def test_detect_loop_needs_temporal_consistency(scenario):
    cfg, m, voc, kf0, kf1 = scenario
    kfdb = KeyFrameDatabase(voc)
    lc = LoopClosing(cfg, m, voc, kfdb)
    lc._ensure_bow(kf0)
    kfdb.add(kf0, lc.kf_bow[kf0])
    lc._ensure_bow(kf1)
    # first detection: candidate exists but fails the 3-consistent gate
    cands = lc._detect_loop(kf1)
    assert cands == []
    # after repeated consistent detections the gate opens
    for _ in range(3):
        cands = lc._detect_loop(kf1)
    assert kf0 in cands


def test_search_and_fuse_replaces_duplicates():
    """LoopClosing::SearchAndFuse (LoopClosing.cc:547-582): projecting the
    loop side's map points into a corrected keyframe must Replace the
    corrected side's duplicate landmarks with the loop points — the loop
    point wins unconditionally — leaving the two keyframes covisible."""
    cfg, m, voc, kf0, kf1 = _build_scenario()
    kfdb = KeyFrameDatabase(voc)
    lc = LoopClosing(cfg, m, voc, kfdb)

    f1 = m.kf_frames[kf1]
    dup_pids = [int(p) for p in f1.map_pt if p >= 0]
    loop_pids = [int(p) for p in m.kf_frames[kf0].map_pt
                 if p >= 0 and m.pt_alive[p]]
    # the revisit is unrecognized: no covisibility, disjoint landmark sets
    assert not m.covisible_keyframes(kf1)
    assert not (set(dup_pids) & set(loop_pids))

    lc._search_and_fuse([kf1], kf0)

    # the loop points absorbed kf1's duplicates (pRep->Replace(pLoopMP))
    # 98 of the 120 duplicates project in-bounds at kf1's pose; all of
    # those must fuse
    n_fused = sum(1 for p in dup_pids if not m.pt_alive[p])
    assert n_fused > 90, n_fused
    for i, old in enumerate(dup_pids):
        if m.pt_alive[old]:
            continue
        pid = int(f1.map_pt[i])
        assert pid in loop_pids
        assert m.pt_obs[pid][kf1] == i
        assert kf1 in m.pt_obs[pid] and kf0 in m.pt_obs[pid]
    # the fused landmarks make the pair covisible (>= 15 shared points)
    assert kf0 in {k for k, _ in m.covisible_keyframes(kf1)}


def test_essential_graph_distributes_correction():
    """OptimizeEssentialGraph semantics (Optimizer.cc:1753-2016): normal
    edges measured from PRE-correction poses (NonCorrectedSim3), the loop
    edge from the corrected ones, loop KF fixed. A linearly-drifted chain
    whose last keyframe is snapped back to ground truth must spread that
    correction over the middle of the chain — and map points must ride
    their reference keyframe's pose delta."""
    cfg = Config()
    cfg.camera = CameraConfig(fx=400, fy=400, cx=160, cy=120, bf=200,
                              width=320, height=240)
    m = MapStore(n_levels=8, scale_factor=1.2)
    K, d = 12, 0.06

    def tcw(center):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = -np.asarray(center, np.float32)
        return T

    gt_centers = [np.array([k, 0.0, 0.0]) for k in range(K)]
    drift_centers = [c + np.array([0.0, d * k, 0.0]) for k, c in
                     enumerate(gt_centers)]
    frames = []
    pids = []
    for k in range(K):
        f = _make_frame(k, np.zeros((1, 2)), np.zeros((1, 32), np.uint8),
                        tcw(drift_centers[k]))
        kf = m.add_keyframe(f)
        frames.append(f)
        # one landmark per KF, drifted with its keyframe
        pid = m.add_point(
            (drift_centers[k] + np.array([0, 0, 5.0])).astype(np.float32),
            kf)
        m.add_observation(pid, kf, 0)
        pids.append(pid)
    # the "CorrectLoop" state: last KF snapped to ground truth, the rest
    # still drifted; pre-correction pose recorded
    uncorrected = {K - 1: m.kf_pose[K - 1].copy()}
    m.set_kf_pose(K - 1, tcw(gt_centers[K - 1]))

    voc = Vocabulary.train(
        np.random.default_rng(0).integers(0, 256, (40, 32)).astype(np.uint8),
        k=4, L=2, seed=0)
    lc = LoopClosing(cfg, m, voc, KeyFrameDatabase(voc))
    lc._run_essential_graph(K - 1, 0, uncorrected, {}, {})

    def center(k):
        T = m.kf_pose[k]
        return -T[:3, :3].T @ T[:3, 3]

    mid = K // 2
    mid_err = np.linalg.norm(center(mid) - gt_centers[mid])
    end_err = np.linalg.norm(center(K - 1) - gt_centers[K - 1])
    # the Sim3 optimum tilts rotations slightly to satisfy both the
    # odometry and the loop constraint, so the centers don't land exactly
    # on ground truth — but the drift must be substantially distributed
    assert mid_err < 0.45 * d * mid, mid_err   # was d*mid before the EG
    assert end_err < 0.45 * d * (K - 1), end_err  # was snapped, stays near
    # the landmark anchored at the mid KF rode the same delta: it stays
    # 5m in front of (and level with) its corrected keyframe
    rel = m.pt_pos[pids[mid]] - center(mid).astype(np.float32)
    np.testing.assert_allclose(rel, [0, 0, 5.0], atol=1e-2)


def _yaw(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def _lc_with_neighborhood(yaw_nb=0.5):
    """Map: loop KF (0), a current KF (1), and a yaw-differing covisible
    neighbor (2) sharing >= 15 points with the current KF."""
    cfg = Config()
    cfg.camera = CameraConfig(fx=400, fy=400, cx=160, cy=120, bf=200,
                              width=320, height=240)
    m = MapStore(n_levels=8, scale_factor=1.2)
    rng = np.random.default_rng(5)
    descs = rng.integers(0, 256, (40, 32)).astype(np.uint8)

    T_loop = np.eye(4, dtype=np.float32)
    T_cur = np.eye(4, dtype=np.float32)
    T_cur[:3, :3] = _yaw(0.1)
    T_cur[:3, 3] = [0.3, 0.0, 0.2]
    T_nb = np.eye(4, dtype=np.float32)
    T_nb[:3, :3] = _yaw(yaw_nb)
    T_nb[:3, 3] = [0.5, 0.1, -0.2]

    frames = [
        _make_frame(0, np.zeros((40, 2)), descs, T_loop),
        _make_frame(1, np.zeros((40, 2)), descs, T_cur),
        _make_frame(2, np.zeros((40, 2)), descs, T_nb),
    ]
    for f in frames:
        m.add_keyframe(f)
    # shared landmarks between cur (1) and nb (2) -> covisibility
    pts = rng.uniform(-2, 2, (20, 3)).astype(np.float32)
    pts[:, 2] += 8
    for i in range(20):
        pid = m.add_point(pts[i], 2)
        m.add_observation(pid, 1, i)
        m.add_observation(pid, 2, i)
        frames[1].map_pt[i] = pid
        frames[2].map_pt[i] = pid
    voc = Vocabulary.train(descs, k=4, L=2, seed=0)
    lc = LoopClosing(cfg, m, voc, KeyFrameDatabase(voc))
    return lc, m, T_loop, T_cur, T_nb


def test_propagation_preserves_relative_pose():
    """ADVICE r1 (high): g2oCorrectedSiw = g2oSic * mg2oScw
    (LoopClosing.cc:460-464) RIGHT-composes, preserving each covisible
    KF's pose relative to the current KF even when the correction has
    rotation+translation and the neighbor's yaw differs."""
    lc, m, T_loop, T_cur, T_nb = _lc_with_neighborhood(yaw_nb=0.5)
    # a loop correction with both rotation and translation
    S_rel = np.eye(4, dtype=np.float32)
    S_rel[:3, :3] = _yaw(0.2)
    S_rel[:3, 3] = [0.6, 0.0, -0.3]
    rel_before = m.kf_pose[2] @ np.linalg.inv(m.kf_pose[1])
    pt_cam_before = (m.kf_pose[2][:3, :3] @ m.pt_pos[0]
                     + m.kf_pose[2][:3, 3])
    lc._propagate_correction(1, 0, (S_rel, 1.0), fix_scale=True)
    rel_after = m.kf_pose[2] @ np.linalg.inv(m.kf_pose[1])
    np.testing.assert_allclose(rel_after, rel_before, atol=1e-5)
    # corrected current pose = S_rel @ T_loop exactly
    np.testing.assert_allclose(m.kf_pose[1], S_rel @ T_loop, atol=1e-5)
    # the neighbor's points ride with it: same camera-frame position
    pt_cam_after = (m.kf_pose[2][:3, :3] @ m.pt_pos[0]
                    + m.kf_pose[2][:3, 3])
    np.testing.assert_allclose(pt_cam_after, pt_cam_before, atol=1e-4)


def test_mono_loop_scale_propagates():
    """ADVICE r1 (medium): with fix_scale=False the Sim3 scale must reach
    the corrected poses ([R | t/s]) and shrink point depths by 1/s
    (LoopClosing.cc:488-505), instead of being SE3-normalized away."""
    lc, m, T_loop, T_cur, T_nb = _lc_with_neighborhood(yaw_nb=0.3)
    s = 1.5
    S_rel = np.eye(4, dtype=np.float32)
    S_rel[:3, :3] = s * _yaw(0.1)
    S_rel[:3, 3] = [0.2, 0.0, 0.1]
    pt_cam_before = (m.kf_pose[2][:3, :3] @ m.pt_pos[0]
                     + m.kf_pose[2][:3, 3])
    _, _, corrected_sim3, _ = lc._propagate_correction(
        1, 0, (S_rel, s), fix_scale=False)
    # corrected Sim3 of the current KF carries the loop scale
    Rk, tk, sk = corrected_sim3[1]
    assert abs(sk - s) < 1e-4, sk
    # stored SE3 pose = [R | t/s]
    np.testing.assert_allclose(m.kf_pose[1][:3, :3], _yaw(0.1) @ T_loop[:3, :3],
                               atol=1e-5)
    np.testing.assert_allclose(m.kf_pose[1][:3, 3], tk / sk, atol=1e-5)
    # points mapped through the scaled Sim3: camera-frame position (under
    # the stored SE3 pose) shrinks by exactly 1/s
    pt_cam_after = (m.kf_pose[2][:3, :3] @ m.pt_pos[0]
                    + m.kf_pose[2][:3, 3])
    np.testing.assert_allclose(pt_cam_after, pt_cam_before / s, atol=1e-4)


@pytest.mark.slow
def test_loop_closure_end_to_end(rng):
    """Full in-vivo loop closure: an out-and-back rectangle over a
    landmark-stamped world revisits its first leg after ~17 m of travel;
    the system must run DetectLoop -> ComputeSim3 -> CorrectLoop ->
    essential graph -> global BA and land the final pose near ground
    truth. (The BoW TrackReferenceKeyFrame path is load-bearing here: the
    21 px/frame flow exceeds the projection search window, so the first
    post-initialization frame can only be matched windowlessly.)"""
    import cv2
    import jax.numpy as jnp
    import synth_world
    from iv_slam_tpu.config import CameraConfig, ORBConfig
    from iv_slam_tpu.ops.extractor import OrbExtractor
    from iv_slam_tpu.slam.system import System
    from iv_slam_tpu.slam.tracking import State

    wrng = np.random.default_rng(23)
    world = synth_world.TwoPlaneWorld(wrng, height2=2.0)
    # unique high-contrast landmark stamps: repeatable corners -> stable
    # BoW words -> place-distinctive histograms (random noise texture
    # aliases every location and the detector rightly never fires)
    for _ in range(150):
        wx = wrng.uniform(-1.0, 11.0)
        wy = wrng.uniform(-3.0, 6.0)
        tx = int(wx * world.res + world.tex.shape[1] / 2)
        ty = int(wy * world.res + world.tex.shape[0] / 2)
        s = int(wrng.integers(24, 56))
        patt = (wrng.random((wrng.integers(3, 6), wrng.integers(3, 6))) > 0.5)
        patt = cv2.resize(patt.astype(np.uint8) * 255, (s, s),
                          interpolation=cv2.INTER_NEAREST)
        y0, x0 = ty - s // 2, tx - s // 2
        if (0 <= y0 and y0 + s < world.tex.shape[0]
                and 0 <= x0 and x0 + s < world.tex.shape[1]):
            world.tex[y0:y0 + s, x0:x0 + s] = patt

    cfg = Config()
    cfg.camera = CameraConfig(fx=400, fy=400, cx=160, cy=120, bf=200,
                              width=320, height=240, th_depth=35.0, fps=10.0)
    cfg.orb = ORBConfig(n_features=600, n_levels=3)
    cfg.system.use_bow = True
    cfg.system.enable_loop_closing = True
    # keep the number of DISTINCT compiled programs low: this CI's XLA:CPU
    # leaks JIT memory per compilation (see pytest.ini); sparse local BA
    # keeps solver window buckets few
    cfg.iv.tracking_ba_rate = 4

    step, height = 0.32, 6.0
    L1, W1 = 30, 8
    wp = [(k * step, 0.0) for k in range(L1)]
    wp += [(L1 * step, k * step) for k in range(W1)]
    wp += [((L1 - k) * step, W1 * step) for k in range(L1)]
    wp += [(0.0, (W1 - k) * step) for k in range(W1)]
    wp += [(k * step, 0.0) for k in range(L1)]   # revisit leg
    poses = [synth_world.camera_pose(np.array([x, y, 0.0]), height=height)
             for x, y in wp]

    ex = OrbExtractor(cfg.orb, 240, 320)
    descs = []
    for T in poses[: 2 * (L1 + W1) : 2]:
        left, _ = world.render_stereo(T)
        kp = ex(jnp.asarray(left))
        descs.append(np.asarray(kp.desc)[np.asarray(kp.valid)])
    voc = Vocabulary.train(np.concatenate(descs), k=10, L=4, seed=5)

    sys_ = System(cfg, 240, 320)
    sys_.attach_vocabulary(voc)
    for i, T in enumerate(poses):
        left, right = world.render_stereo(T)
        sys_.track_stereo(left, right, i * 0.1, img_name=f"{i:06d}.png")

    assert sys_.state == State.OK
    assert sys_.failure_count == 0
    assert sys_.tracking.loop_closing.n_loops_closed >= 1
    est = sys_.trajectory_twc()
    end_err = np.linalg.norm(est[-1][:3, 3][:2] - np.array(wp[-1]))
    assert end_err < 1.0, end_err


def test_async_gba_merge_back():
    """VERDICT r1 #5: keyframes/points created WHILE a deferred global BA
    runs must be corrected through the spanning tree at merge time
    (RunGlobalBundleAdjustment, LoopClosing.cc:649-745) — the merged map
    must converge to the blocking-GBA result."""
    from iv_slam_tpu.solvers.local_ba import (
        apply_global_ba, global_bundle_adjustment,
        global_bundle_adjustment_async,
    )

    def build_map():
        cfg = Config()
        cfg.camera = CameraConfig(fx=400, fy=400, cx=160, cy=120, bf=200,
                                  width=320, height=240)
        m = MapStore(n_levels=8, scale_factor=1.2)
        rng = np.random.default_rng(9)
        # a drifted 6-KF chain over shared landmarks: GBA must pull the
        # chain onto the (noise-free) observations
        n_pts = 60
        Xw = np.stack([rng.uniform(-4, 4, n_pts), rng.uniform(-3, 3, n_pts),
                       rng.uniform(8, 14, n_pts)], 1).astype(np.float32)
        descs = rng.integers(0, 256, (n_pts, 32)).astype(np.uint8)

        def tcw(x, drift):
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = [-(x + drift), 0, 0]
            return T

        frames = []
        for k in range(6):
            T_true = tcw(0.3 * k, 0.0)
            pc = Xw @ T_true[:3, :3].T + T_true[:3, 3]
            uv = np.stack([400 * pc[:, 0] / pc[:, 2] + 160,
                           400 * pc[:, 1] / pc[:, 2] + 120], 1)
            f = _make_frame(k, uv, descs, tcw(0.3 * k, 0.05 * k))
            f.u_right[:n_pts] = uv[:, 0] - 200.0 / pc[:, 2]
            kf = m.add_keyframe(f)
            frames.append(f)
            if k == 0:
                for i in range(n_pts):
                    pid = m.add_point(Xw[i] .astype(np.float32), kf)
                    m.add_observation(pid, kf, i)
                    f.map_pt[i] = pid
            else:
                for i in range(n_pts):
                    m.add_observation(i, kf, i)
                    f.map_pt[i] = i
        return m, frames, Xw, tcw

    cfg = Config()
    cfg.camera = CameraConfig(fx=400, fy=400, cx=160, cy=120, bf=200,
                              width=320, height=240)

    # blocking baseline on the 6-KF map
    m_block, *_ = build_map()
    global_bundle_adjustment(cfg, m_block, n_iters=20)

    # async: dispatch on the 6-KF map, then grow the map (a 7th KF +
    # fresh points, as tracking would during the GBA), then merge
    m_async, frames, Xw, tcw = build_map()
    handle = global_bundle_adjustment_async(cfg, m_async, n_iters=20)
    assert handle is not None
    rng = np.random.default_rng(3)
    T7_drift = tcw(0.3 * 6, 0.05 * 6)
    descs = rng.integers(0, 256, (20, 32)).astype(np.uint8)
    f7 = _make_frame(6, np.zeros((20, 2)), descs, T7_drift)
    kf7 = m_async.add_keyframe(f7)
    new_pids = []
    for i in range(20):
        # new points triangulated in the drifted frame of KF5/KF6
        p = (Xw[i] + [0.0, 0.0, 0.5]).astype(np.float32)
        pid = m_async.add_point(p, kf7)
        m_async.add_observation(pid, kf7, i)
        m_async.add_observation(pid, 5, i + 20)
        f7.map_pt[i] = pid
        m_async.kf_frames[5].map_pt[i + 20] = pid
        new_pids.append(pid)
    apply_global_ba(handle, m_async)

    # snapshot keyframes converge to the blocking result
    for k in range(6):
        np.testing.assert_allclose(
            m_async.kf_pose[k], m_block.kf_pose[k], atol=1e-4
        )
    # the interim keyframe rode its parent's (KF5) correction: its pose
    # relative to KF5 is preserved
    rel_before = T7_drift @ np.linalg.inv(tcw(0.3 * 5, 0.05 * 5))
    rel_after = m_async.kf_pose[kf7] @ np.linalg.inv(m_async.kf_pose[5])
    np.testing.assert_allclose(rel_after, rel_before, atol=1e-3)
    # interim points rode their reference keyframe's delta: camera-frame
    # position under the (corrected) ref KF equals the pre-merge
    # camera-frame position under the drifted pose
    for pid in new_pids[:5]:
        p_before = (Xw[pid - new_pids[0]] + [0.0, 0.0, 0.5]).astype(
            np.float32)
        pc_before = T7_drift[:3, :3] @ p_before + T7_drift[:3, 3]
        pc_after = (m_async.kf_pose[kf7][:3, :3] @ m_async.pt_pos[pid]
                    + m_async.kf_pose[kf7][:3, 3])
        np.testing.assert_allclose(pc_after, pc_before, atol=1e-3)
    # and the correction was non-trivial (the chain really moved)
    d_kf5 = np.linalg.norm(m_async.kf_pose[5][:3, 3]
                           - tcw(0.3 * 5, 0.05 * 5)[:3, 3])
    assert d_kf5 > 1e-3
