import os

import numpy as np
import pytest

from iv_slam_tpu.config import Config, CameraConfig, ORBConfig
from iv_slam_tpu.slam.system import System
from iv_slam_tpu.slam.tracking import State

import synth_world


def make_config():
    cfg = Config()
    cfg.camera = CameraConfig(
        fx=400.0, fy=400.0, cx=160.0, cy=120.0, bf=200.0,
        width=320, height=240, th_depth=35.0, fps=10.0,
    )
    cfg.orb = ORBConfig(n_features=600, n_levels=4)
    cfg.iv.enabled = True
    cfg.iv.create_dataset = True
    cfg.gp.max_train_points = 256
    return cfg


@pytest.mark.slow
def test_supervised_datagen_end_to_end(tmp_path, rng):
    """Training-data generation over a synthetic GT sequence: heatmaps +
    keypoints.json written in the reference's dataset format."""
    world, frames, gt = synth_world.make_sequence(rng, n_frames=10, step=0.08)
    cfg = make_config()
    sys = System(cfg, 240, 320)
    out = str(tmp_path / "generated_training_data")
    sys.enable_datagen(out)
    for i, (left, right) in enumerate(frames):
        # camera-to-world GT pose (Twc), as the reference feeds TrackStereo
        sys.track_stereo(
            left, right, timestamp=i * 0.1, gt_pose=gt[i],
            img_name=f"{i:06d}.png",
        )
    assert sys.state == State.OK
    sys.tracking.datagen.finalize()

    # heatmaps written for frames deemed good-for-training
    hm_dir = os.path.join(out, "bad_region_heatmap")
    if os.path.isdir(hm_dir):
        import imageio.v3 as iio

        names = os.listdir(hm_dir)
        if names:
            hm = iio.imread(os.path.join(hm_dir, names[0]))
            assert hm.dtype == np.uint8
            assert hm.shape[0] > 100 and hm.shape[1] > 100
    # keypoints/img_names JSON always written at finalize
    assert os.path.exists(os.path.join(out, "keypoints.json"))
    assert os.path.exists(os.path.join(out, "img_names.json"))


def test_map_save_load_roundtrip(tmp_path, rng):
    world, frames, gt = synth_world.make_sequence(rng, n_frames=4, step=0.08)
    cfg = make_config()
    cfg.iv.enabled = False
    sys = System(cfg, 240, 320)
    for i, (left, right) in enumerate(frames):
        sys.track_stereo(left, right, timestamp=i * 0.1)
    m = sys.tracking.map
    n_pts = int(m.pt_alive[: m.n_points].sum())
    assert n_pts > 100
    path = str(tmp_path / "map.npz")
    sys.save_map(path)
    sys.load_map(path)
    m2 = sys.tracking.map
    assert m2.n_points == m.n_points
    assert m2.n_keyframes == m.n_keyframes
    assert int(m2.pt_alive[: m2.n_points].sum()) == n_pts
    np.testing.assert_allclose(
        m2.kf_pose[: m2.n_keyframes], m.kf_pose[: m.n_keyframes]
    )
    kf0 = m2.kf_frames[0]
    assert kf0 is not None and kf0.map_pt.shape == m.kf_frames[0].map_pt.shape


@pytest.mark.slow
def test_training_mode_matrix(tmp_path, rng):
    """All 7 implemented TrainingMode variants (feature_evaluator.h:68-78)
    score the same tracked frame; the two reference-FATAL modes raise."""
    from iv_slam_tpu.introspection import feature_evaluator as fe
    from iv_slam_tpu.introspection.datagen import DataGenerator

    world, frames, gt = synth_world.make_sequence(rng, n_frames=8, step=0.08)
    cfg = make_config()
    sys = System(cfg, 240, 320)
    tracked = []
    for i, (left, right) in enumerate(frames):
        sys.track_stereo(
            left, right, timestamp=i * 0.1, gt_pose=gt[i],
            img_name=f"{i:06d}.png",
        )
        tracked.append(sys.tracking.current)
    assert sys.state == State.OK
    frame, prev = tracked[-1], tracked[-2]

    results = {}
    for mode, spec in fe.TRAINING_MODES.items():
        cfg.iv.training_mode = mode
        gen = DataGenerator(cfg, sys.tracking.map, None)
        if spec is None:
            with pytest.raises(NotImplementedError):
                gen.process_frame_supervised(frame, (240, 320), prev)
            continue
        results[mode] = gen.process_frame_supervised(frame, (240, 320), prev)

    assert len(results) == 7
    for mode, res in results.items():
        assert res is not None, mode
        assert res["n_scored"] > 4, mode
        err = res["norm_err"]
        assert (err[err >= 0] >= 0).all(), mode
        assert res["heatmap"].dtype == np.uint8, mode
    # reprojection errors on a well-tracked synthetic sequence are small
    # in pixels; epipolar-normalized are divided by the 95% bound
    e_norm = results["ref_kf_epipolar_normalized"]["norm_err"]
    e_raw = results["ref_kf_epipolar"]["norm_err"]
    sel = (e_norm >= 0) & (e_raw >= 0)
    assert sel.sum() > 4
    # normalization shrinks the raw epipolar error (factor >= 4)
    assert np.median(e_norm[sel]) <= np.median(e_raw[sel]) + 1e-6


@pytest.mark.slow
def test_gt_depth_sampling_and_gate(rng):
    """AirSim-style GT depth path (stereo_airsim.cc:339-360 + fe.cpp
    GetGTReprojection gate): per-keypoint patch-min GT depth is sampled
    into Frame.kp_gt_depth and the supervised scorer still accepts the
    frame (plane depths ~10 m are far below the 600 m uncertainty cut)."""
    from iv_slam_tpu.introspection.datagen import DataGenerator

    world, frames, gt = synth_world.make_sequence(rng, n_frames=6, step=0.08)
    cfg = make_config()
    sys = System(cfg, 240, 320)
    for i, (left, right) in enumerate(frames):
        sys.track_stereo(
            left, right, timestamp=i * 0.1, gt_pose=gt[i],
            img_name=f"{i:06d}.png",
            gt_depth_map=world.render_depth(gt[i]),
        )
    assert sys.state == State.OK
    frame = sys.tracking.current
    gtd = frame.kp_gt_depth
    assert gtd is not None
    have = gtd[frame.valid & (gtd > 0)]
    assert len(have) > 50
    # looking straight down from 10 m at a ground plane: depth ~ height
    assert 8.0 < np.median(have) < 12.0

    gen = DataGenerator(cfg, sys.tracking.map, None)
    res = gen.process_frame_supervised(frame, (240, 320))
    assert res is not None and res["n_scored"] > 4
