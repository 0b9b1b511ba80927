#!/usr/bin/env python
"""Monocular SLAM driver (Examples/Monocular/mono_{kitti,euroc,tum}.cc).

  python examples/run_mono.py --dataset kitti --data_path /data/kitti/00 \
      --settings_path settings/KITTI00-02.yaml
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=["kitti", "euroc", "jackal"],
                   default="kitti")
    p.add_argument("--data_path", required=True)
    p.add_argument("--settings_path", default="")
    p.add_argument("--ground_truth_path", default="")
    p.add_argument("--out_visualization_path", default="out_mono")
    p.add_argument("--start_frame", type=int, default=0)
    p.add_argument("--end_frame", type=int, default=-1)
    p.add_argument("--timestamps_file", default="")
    args = p.parse_args()

    import jax

    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")

    from iv_slam_tpu.config import Config, load_reference_yaml
    from iv_slam_tpu.io import datasets, trajectory
    from iv_slam_tpu.slam.system import System

    cfg = Config()
    if args.settings_path:
        cfg = load_reference_yaml(args.settings_path, cfg)
    cfg.system.sensor = "mono"

    if args.dataset == "kitti":
        seq = datasets.load_kitti_stereo(
            args.data_path, args.ground_truth_path or None,
            args.start_frame, args.end_frame,
        )
    elif args.dataset == "euroc":
        seq = datasets.load_euroc_stereo(args.data_path, args.timestamps_file)
    else:
        seq = datasets.load_jackal_session(args.data_path)

    left0 = datasets.load_gray(seq.left_paths[0])
    h, w = left0.shape
    cfg.camera.height, cfg.camera.width = h, w
    sys_ = System(cfg, h, w)

    os.makedirs(args.out_visualization_path, exist_ok=True)

    # SIGINT -> stop but flush outputs (ShutdownMinimal, stereo_kitti.cc:185-196)
    import signal

    interrupted = []

    def _on_sigint(sig, frm):
        interrupted.append(True)
        signal.signal(signal.SIGINT, signal.SIG_DFL)

    signal.signal(signal.SIGINT, _on_sigint)

    # decode-ahead loader (native C++ pool when built; right side skipped)
    from iv_slam_tpu.io.prefetch import StereoPrefetcher

    loader = StereoPrefetcher(seq.left_paths, seq.left_paths,
                              right_mode="skip")
    t_track = []
    for i in range(len(seq)):
        if interrupted:
            print(f"SIGINT at frame {i}: flushing outputs")
            break
        left, _ = loader.next()
        t, gt, name = seq.meta(i)
        t0 = time.perf_counter()
        sys_.track_mono(left, t, gt_pose=gt, img_name=name)
        t_track.append(time.perf_counter() - t0)
        if i % 50 == 0:
            print(f"frame {i}/{len(seq)} state={sys_.state.name}")

    loader.close()
    out = args.out_visualization_path
    sys_.save_trajectory_kitti(os.path.join(out, "Trajectory_KITTI_000.txt"))
    sys_.save_trajectory_tum(os.path.join(out, "KeyFrameTrajectory_TUM_000.txt"))
    sys_.save_failure_log(os.path.join(out, "failure_log.txt"))
    stats = dict(
        frames=len(t_track), failures=sys_.failure_count,
        median_track_s=float(np.median(t_track)) if t_track else 0.0,
        interrupted=bool(interrupted),
    )
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
