#!/usr/bin/env python
"""AR demo driver — the reference's ros_mono_ar node, headless.

The reference's AR demo (Examples/ROS/ORB_SLAM2/src/AR/ros_mono_ar.cc)
subscribes to a camera topic, runs monocular tracking, fits a plane to the
map (ViewerAR::DetectPlane) and renders a virtual cube with the live pose
in a GL window. Here: frames come from a dataset directory (stereo or
mono), tracking runs the same System facade, and the cube/grid overlay is
written per frame to --out_path/ar/ (the headless save-to-file contract).

  python examples/run_ar_demo.py --data_path <kitti-seq-dir> \
      --settings_path settings/kitti00-02_stereo.yaml --out_path /tmp/ar
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--settings_path", default="")
    p.add_argument("--out_path", default="ar_out")
    p.add_argument("--dataset", default="kitti",
                   choices=["kitti", "jackal"])
    p.add_argument("--sensor", default="stereo", choices=["stereo", "mono"])
    p.add_argument("--cube_size", type=float, default=1.0)
    p.add_argument("--min_obs", type=int, default=5,
                   help="observation gate for plane points (ViewerAR uses "
                        ">5; lower for short sequences)")
    p.add_argument("--patience", type=int, default=30,
                   help="frames between automatic gate relaxations")
    p.add_argument("--start_frame", type=int, default=0)
    p.add_argument("--end_frame", type=int, default=-1)
    p.add_argument("--fused_tracking", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    import cv2
    import jax

    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
    elif os.environ.get("IVT_FAST_COMPILE"):
        # test harness hook: XLA:CPU compile time dominates driver-based
        # tests; this disables most HLO optimization passes (identical
        # semantics, slower kernels, much faster compiles)
        jax.config.update("jax_disable_most_optimizations", True)

    from iv_slam_tpu.config import Config, load_reference_yaml
    from iv_slam_tpu.io import datasets
    from iv_slam_tpu.slam.ar import ARRenderer
    from iv_slam_tpu.slam.system import System

    cfg = Config()
    if args.settings_path:
        cfg = load_reference_yaml(args.settings_path, cfg)
    cfg.system.sensor = args.sensor
    cfg.system.fused_tracking = args.fused_tracking

    if args.dataset == "kitti":
        seq = datasets.load_kitti_stereo(args.data_path)
    else:
        seq = datasets.load_jackal_session(args.data_path)
    end = args.end_frame if args.end_frame > 0 else len(seq)
    first = cv2.imread(seq.left_paths[args.start_frame],
                       cv2.IMREAD_GRAYSCALE)
    h, w = first.shape
    cfg.camera.width, cfg.camera.height = w, h
    system = System(cfg, h, w)
    ar = ARRenderer(cfg.camera.K(), cube_size=args.cube_size,
                    min_obs=args.min_obs, patience=args.patience)

    out_dir = os.path.join(args.out_path, "ar")
    os.makedirs(out_dir, exist_ok=True)
    for ni in range(args.start_frame, end):
        left = cv2.imread(seq.left_paths[ni], cv2.IMREAD_GRAYSCALE)
        t = seq.timestamps[ni]
        if args.sensor == "stereo":
            right = cv2.imread(seq.right_paths[ni], cv2.IMREAD_GRAYSCALE)
            Tcw = system.track_stereo(left, right, t)
        else:
            Tcw = system.track_mono(left, t)
        frame = ar.render(left, Tcw, system.tracking.map)
        cv2.imwrite(os.path.join(out_dir, f"{ni:06d}.png"), frame)
        if ni % 50 == 0:
            state = "plane" if ar.plane is not None else "searching"
            print(f"frame {ni}: {state}", flush=True)
    system.shutdown()
    print(f"overlays written to {out_dir}")


if __name__ == "__main__":
    main()
