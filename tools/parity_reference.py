"""Trajectory-parity harness vs the reference IV-SLAM build.

Reproduces BASELINE.md's protocol step 1 on synthetic data (no KITTI
download in this environment): render `tests/synth_world.py` sequences to
the KITTI directory layout both systems consume, train an ORB vocabulary
from the sequence itself (written both as .npz and DBoW2 text so the
reference's TemplatedVocabulary::loadFromTextFile can read it), run this
framework's `examples/run_stereo.py`, optionally run the reference's
`stereo_kitti` binary (built headless: Pangolin stubbed, glog/gflags/
jsoncpp/boost shimmed, Eigen from tensorflow's vendored copy — recipe in
PARITY_ATE.md), and report ATE RMSE for both against exact ground truth
via the evo_ape-equivalent `io/trajectory.ate_rmse` (SE3 Umeyama, the
protocol of scripts/evaluation/evaluate_batch.py:43-55).

Usage:
  python tools/parity_reference.py --work /tmp/parity \
      [--reference_bin /tmp/refbuild/build/stereo_kitti] [--skip_ours]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SETTINGS_YAML = """%YAML:1.0
Camera.fx: 400.0
Camera.fy: 400.0
Camera.cx: 160.0
Camera.cy: 120.0
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: 320
Camera.height: 240
Camera.fps: 10.0
Camera.bf: 200.0
Camera.RGB: 1
ThDepth: 35

ORBextractor.nFeatures: 800
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
ORBextractor.enableIntrospection: 0

ORBMatcher.NNRatioMultiplier: 1.0
ORBMatcher.SearchWindowMultiplier: 1.0

IVSLAM.unsupervisedLearning: 0
Viewer.HeadlessMode: 1
"""

SEQUENCES = (("seqA", 7, 100), ("seqB", 23, 100))


def generate(work: str):
    import cv2

    sys.path.insert(0, os.path.join(REPO, "tests"))
    import synth_world

    for name, seed, n in SEQUENCES:
        out = os.path.join(work, name)
        if os.path.exists(os.path.join(out, "gt_twc.npy")):
            continue
        os.makedirs(out + "/image_0", exist_ok=True)
        os.makedirs(out + "/image_1", exist_ok=True)
        world, frames, gt = synth_world.make_sequence(
            np.random.default_rng(seed), n_frames=n, step=0.12
        )
        for i, (L, R) in enumerate(frames):
            cv2.imwrite(f"{out}/image_0/{i:06d}.png", L)
            cv2.imwrite(f"{out}/image_1/{i:06d}.png", R)
        np.savetxt(f"{out}/times.txt", [i * 0.1 for i in range(n)],
                   fmt="%.6f")
        np.save(f"{out}/gt_twc.npy", np.stack(gt))
    with open(os.path.join(work, "settings.yaml"), "w") as f:
        f.write(SETTINGS_YAML)


def train_vocab(work: str):
    """Vocabulary from every 4th frame of seqA (k=9, L=4, seed 0)."""
    import cv2
    import jax.numpy as jnp

    from iv_slam_tpu.config import Config, CameraConfig, ORBConfig
    from iv_slam_tpu.ops.extractor import OrbExtractor
    from iv_slam_tpu.slam.vocabulary import Vocabulary

    npz = os.path.join(work, "voc.npz")
    if os.path.exists(npz):
        return npz
    cfg = Config()
    cfg.camera = CameraConfig(fx=400, fy=400, cx=160, cy=120, bf=200,
                              width=320, height=240)
    cfg.orb = ORBConfig(n_features=800, n_levels=4)
    ex = OrbExtractor(cfg.orb, 240, 320)
    descs = []
    for i in range(0, 100, 4):
        img = cv2.imread(f"{work}/seqA/image_0/{i:06d}.png", 0)
        kp = ex(jnp.asarray(img))
        descs.append(np.asarray(kp.desc)[np.asarray(kp.valid)])
    voc = Vocabulary.train(np.concatenate(descs), k=9, L=4, seed=0)
    voc.save(npz)
    voc.save_dbow2_text(os.path.join(work, "voc.txt"))
    return npz


def run_ours(work: str, seq: str) -> float:
    out = os.path.join(work, f"our_{seq}")
    env = dict(os.environ)
    code = (
        "import jax, runpy, sys;"
        "jax.config.update('jax_platforms', 'cpu');"
        "jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache');"
        f"sys.argv = ['run_stereo.py', '--dataset', 'kitti',"
        f" '--data_path', '{work}/{seq}',"
        f" '--settings_path', '{work}/settings.yaml',"
        f" '--out_visualization_path', '{out}',"
        f" '--vocab_path', '{work}/voc.npz'];"
        f"runpy.run_path('{REPO}/examples/run_stereo.py',"
        " run_name='__main__')"
    )
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   stderr=subprocess.DEVNULL)
    return ate(work, seq, os.path.join(out, "Trajectory_KITTI_000.txt"))


def run_reference(work: str, seq: str, ref_bin: str) -> float:
    out = os.path.join(work, f"ref_{seq}")
    os.makedirs(out, exist_ok=True)
    subprocess.run(
        [ref_bin,
         f"--vocab_path={work}/voc.txt",
         f"--settings_path={work}/settings.yaml",
         f"--data_path={work}/{seq}",
         f"--out_visualization_path={out}",
         f"--out_dataset_path={out}/ds",
         "--ivslam_enabled=false", "--enable_viewer=false",
         "--run_single_threaded=true", "--gt_pose_available=false"],
        check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    return ate(work, seq,
               os.path.join(out, "trajectory_kitti",
                            "Trajectory_KITTI_000.txt"))


def ate(work: str, seq: str, traj_path: str) -> float:
    from iv_slam_tpu.io import trajectory

    gt = np.load(os.path.join(work, seq, "gt_twc.npy"))
    est = trajectory.load_kitti(traj_path)
    return trajectory.ate_rmse(est, list(gt[-len(est):]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/parity")
    ap.add_argument("--reference_bin", default="")
    ap.add_argument("--skip_ours", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.work, exist_ok=True)
    sys.path.insert(0, REPO)
    generate(args.work)
    train_vocab(args.work)
    report = {}
    for name, _, _ in SEQUENCES:
        row = {}
        if not args.skip_ours:
            row["ours_ate_m"] = round(run_ours(args.work, name), 4)
        if args.reference_bin:
            row["ref_ate_m"] = round(
                run_reference(args.work, name, args.reference_bin), 4
            )
        if "ours_ate_m" in row and "ref_ate_m" in row:
            row["ratio"] = round(row["ours_ate_m"] / row["ref_ate_m"], 3)
        report[name] = row
    print(json.dumps(report))


if __name__ == "__main__":
    main()
