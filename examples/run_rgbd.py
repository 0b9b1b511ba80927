#!/usr/bin/env python
"""RGB-D SLAM driver (Examples/RGB-D/rgbd_tum.cc).

  python examples/run_rgbd.py --data_path /data/tum/fr1_desk \
      --association_file /data/tum/fr1_desk/associations.txt \
      --settings_path settings/TUM1.yaml
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
    p.add_argument("--data_path", required=True)
    p.add_argument("--association_file", required=True)
    p.add_argument("--settings_path", default="")
    p.add_argument("--vocab_path", default="",
                   help="ORB vocabulary (.npz or DBoW2 .txt); enables "
                        "BoW relocalization")
    p.add_argument("--depth_scale", type=float, default=0.0,
                   help="depth-image scale; 0 = 1/DepthMapFactor from the "
                        "settings YAML (TUM PNGs store depth * 5000)")
    p.add_argument("--out_visualization_path", default="out_rgbd")
    args = p.parse_args()

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
    from iv_slam_tpu.slam.system import System

    cfg = Config()
    if args.settings_path:
        cfg = load_reference_yaml(args.settings_path, cfg)
    cfg.system.sensor = "rgbd"
    # DepthMapFactor semantics (Tracking.cc YAML parse): depth /= factor
    if args.depth_scale <= 0.0:
        f = cfg.camera.depth_map_factor
        args.depth_scale = 1.0 / f if f > 1e-6 else 1.0

    rgb_paths, depth_paths, times = datasets.load_tum_rgbd(
        args.data_path, args.association_file
    )
    img0 = datasets.load_gray(rgb_paths[0])
    h, w = img0.shape
    cfg.camera.height, cfg.camera.width = h, w
    sys_ = System(cfg, h, w)
    if args.vocab_path:
        from iv_slam_tpu.slam.vocabulary import Vocabulary

        sys_.attach_vocabulary(Vocabulary.load(args.vocab_path))

    os.makedirs(args.out_visualization_path, exist_ok=True)

    # SIGINT -> stop but flush outputs (ShutdownMinimal, stereo_kitti.cc:185-196)
    import signal

    interrupted = []

    def _on_sigint(sig, frm):
        interrupted.append(True)
        signal.signal(signal.SIGINT, signal.SIG_DFL)

    signal.signal(signal.SIGINT, _on_sigint)

    # decode-ahead loader: grayscale RGB + 16-bit depth PNGs decoded off
    # the tracking thread (native C++ pool when built)
    from iv_slam_tpu.io.prefetch import StereoPrefetcher

    loader = StereoPrefetcher(rgb_paths, depth_paths,
                              right_mode="unchanged")
    t_track = []
    for i in range(len(rgb_paths)):
        if interrupted:
            print(f"SIGINT at frame {i}: flushing outputs")
            break
        img, depth = loader.next()
        depth = np.asarray(depth).astype(np.float32)
        t0 = time.perf_counter()
        sys_.track_rgbd(img, depth, float(times[i]),
                        depth_scale=args.depth_scale,
                        img_name=os.path.basename(rgb_paths[i]))
        t_track.append(time.perf_counter() - t0)
        if i % 50 == 0:
            print(f"frame {i}/{len(rgb_paths)} state={sys_.state.name}")

    loader.close()
    out = args.out_visualization_path
    sys_.save_trajectory_tum(os.path.join(out, "CameraTrajectory.txt"))
    sys_.save_failure_log(os.path.join(out, "failure_log.txt"))
    print(json.dumps(dict(
        frames=len(rgb_paths), failures=sys_.failure_count,
        median_track_s=float(np.median(t_track)),
    )))


if __name__ == "__main__":
    main()
