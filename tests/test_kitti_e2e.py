"""KITTI-geometry end-to-end smoke (VERDICT r1 item #9).

One synthetic 1241x376 stereo sequence (the KITTI-00 image geometry,
Examples/Stereo/KITTI00-02.yaml) through the real `examples/run_stereo.py`
driver with EVERYTHING on at once: fused tracking, introspection
(ivslam_enabled), training-dataset generation, and BoW/loop-closing
machinery (vocabulary attached) — asserting trajectory save, the
generated-dataset schema (dataset_creator.cpp layout), and failure-log
plumbing in a single pass.  Mirrors the reference call stack of
SURVEY.md §3.1/§3.2 (stereo_kitti.cc main -> System -> Tracking ->
LocalMapping/LoopClosing -> FeatureEvaluator/DatasetCreator).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import synth_world

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# KITTI-00 camera geometry (KITTI00-02.yaml): 1241x376, fx=718.856,
# bf=386.1448 (0.537 m baseline)
FX = 718.856
CX, CY = 607.19, 185.22
W, H = 1241, 376
BASELINE = 0.537

SETTINGS = f"""%YAML:1.0
Camera.fx: {FX}
Camera.fy: {FX}
Camera.cx: {CX}
Camera.cy: {CY}
Camera.width: {W}
Camera.height: {H}
Camera.fps: 10.0
Camera.bf: {FX * BASELINE}
Camera.RGB: 1
ThDepth: 35
ORBextractor.nFeatures: 1200
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""

N_FRAMES = 14


@pytest.fixture(scope="module")
def kitti_seq(tmp_path_factory):
    import imageio.v3 as iio

    root = tmp_path_factory.mktemp("kitti_e2e") / "00"
    (root / "image_0").mkdir(parents=True)
    (root / "image_1").mkdir()
    rng = np.random.default_rng(5)
    world = synth_world.PlaneWorld(
        rng, tex_size=6144, res=40.0, fx=FX, fy=FX, cx=CX, cy=CY,
        w=W, h=H, baseline=BASELINE,
    )
    gt = []
    noise = np.random.default_rng(99)
    for i in range(N_FRAMES):
        t = np.array([i * 0.25, 0.03 * np.sin(i * 0.5), 0.0], np.float32)
        Twc = synth_world.camera_pose(t, height=10.0, yaw=0.03 * np.sin(i * 0.4))
        left, right = world.render_stereo(Twc)
        # per-frame sensor noise: decorrelates a fraction of descriptors so
        # the supervised datagen gate (5% < bad < 60%,
        # FeatureEvaluator::IsFrameGoodForTraining) actually fires — a
        # noiseless render has ~0 bad matches and writes no training frames
        for img, name in ((left, "image_0"), (right, "image_1")):
            noisy = np.clip(
                img.astype(np.int16)
                + noise.normal(0, 8, img.shape).astype(np.int16),
                0, 255,
            ).astype(np.uint8)
            iio.imwrite(root / name / f"{i:06d}.png", noisy)
        gt.append(Twc)
    np.savetxt(root / "times.txt", np.arange(N_FRAMES) * 0.1)
    gt_file = root.parent / "00_gt.txt"
    np.savetxt(gt_file, np.stack([T[:3, :4].reshape(-1) for T in gt]))
    settings = root.parent / "kitti.yaml"
    settings.write_text(SETTINGS)

    # small ORB vocabulary from two frames of the sequence itself, so the
    # BoW machinery (KeyFrameDatabase funnels + LoopClosing thread logic)
    # is live during the run
    import jax.numpy as jnp

    from iv_slam_tpu.config import Config, CameraConfig, ORBConfig
    from iv_slam_tpu.ops.extractor import OrbExtractor
    from iv_slam_tpu.slam.vocabulary import Vocabulary

    cfg = Config()
    cfg.camera = CameraConfig(fx=FX, fy=FX, cx=CX, cy=CY,
                              bf=FX * BASELINE, width=W, height=H)
    cfg.orb = ORBConfig(n_features=1200, n_levels=4)
    ex = OrbExtractor(cfg.orb, H, W)
    descs = []
    for i in (0, N_FRAMES // 2):
        img = iio.imread(root / "image_0" / f"{i:06d}.png")
        kp = ex(jnp.asarray(img))
        descs.append(np.asarray(kp.desc)[np.asarray(kp.valid)])
    voc = Vocabulary.train(np.concatenate(descs), k=8, L=3, seed=0)
    vocab_path = str(root.parent / "voc.npz")
    voc.save(vocab_path)
    return root, gt_file, settings, vocab_path


@pytest.mark.slow
def test_kitti_geometry_everything_on(kitti_seq, tmp_path):
    root, gt_file, settings, vocab_path = kitti_seq
    out = tmp_path / "out"
    dataset = tmp_path / "generated_training_data"
    # IVT_FAST_COMPILE: XLA:CPU compile time dominates driver tests —
    # exercise the fast-compile hook and cut wall time (ADVICE r2)
    env = dict(os.environ, JAX_PLATFORMS="cpu", IVT_FAST_COMPILE="1")
    res = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "examples", "run_stereo.py"),
            "--dataset", "kitti",
            "--data_path", str(root),
            "--settings_path", str(settings),
            "--ground_truth_path", str(gt_file),
            "--vocab_path", vocab_path,
            "--out_visualization_path", str(out),
            "--out_dataset_path", str(dataset),
            "--fused_tracking",
            "--ivslam_enabled",
            "--create_ivslam_dataset",
            "--run_single_threaded",
        ],
        capture_output=True, text=True, env=env, timeout=3000,
    )
    assert res.returncode == 0, res.stderr[-3000:]

    # trajectory + stats + failure-log plumbing
    stats = json.loads((out / "stats.json").read_text())
    assert stats["frames"] == N_FRAMES
    assert stats["failures"] == 0
    assert stats["ate_rmse"] < 0.5, stats
    traj = np.loadtxt(out / "Trajectory_KITTI_000.txt")
    assert traj.shape == (N_FRAMES, 12)
    assert (out / "KeyFrameTrajectory_TUM_000.txt").exists()
    assert (out / "failure_log.txt").exists()

    # generated-dataset schema (dataset_creator.cpp layout)
    kps = json.loads((dataset / "keypoints.json").read_text())
    assert set(kps) == {"x_coord", "y_coord", "response", "size",
                        "epipolar_err"}
    assert len(kps["x_coord"]) > 100
    names = json.loads((dataset / "img_names.json").read_text())
    assert len(names["img_name"]) >= 1
    assert (dataset / "descriptors.csv").exists()
    assert (dataset / "descriptors_2.csv").exists()
    heatmaps = list((dataset / "bad_region_heatmap").glob("*.png"))
    assert heatmaps, "no training heatmaps emitted"
    import imageio.v3 as iio

    hm = iio.imread(heatmaps[0])
    assert hm.shape[0] == H // 8 or hm.shape[0] > 100  # /8 grid or full-res
