#!/usr/bin/env python
"""Stereo SLAM driver — the Examples/Stereo/stereo_kitti.cc equivalent.

Flag surface mirrors the reference binary (stereo_kitti.cc:54-126):
data/GT paths, introspection toggles, dataset creation, start/end frames,
output paths. One driver covers KITTI / EuRoC / Jackal via --dataset.

Usage (KITTI-00, vanilla ORB-SLAM2 configuration):
  python examples/run_stereo.py --dataset kitti \
      --data_path /data/kitti/00 --settings_path settings/KITTI00-02.yaml \
      --ground_truth_path /data/kitti/poses/00.txt \
      --out_visualization_path /tmp/out

Introspection inference (Jackal):
  python examples/run_stereo.py --dataset jackal --data_path <session> \
      --settings_path settings/jackal.yaml --introspection_func_enabled \
      --introspection_model_path ckpt/best --inference_mode
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset",
                   choices=["kitti", "euroc", "jackal", "airsim"],
                   default="kitti")
    p.add_argument("--load_gt_depth_imgs", action="store_true",
                   help="load PFM GT depth images (img_depth/*.pfm) and "
                        "sample per-keypoint GT depth "
                        "(stereo_airsim.cc:339-360)")
    p.add_argument("--data_path", required=True)
    p.add_argument("--vocab_path", default="",
                   help="ORB vocabulary (.npz from tools/train_vocab.py or "
                        "DBoW2 .txt); enables BoW relocalization + loop "
                        "closing (stereo_kitti.cc vocab_path flag)")
    p.add_argument("--settings_path", default="")
    p.add_argument("--ground_truth_path", default="")
    p.add_argument("--img_qual_path", default="",
                   help="precomputed cost-map PNGs (load_img_qual_heatmaps)")
    p.add_argument("--introspection_model_path", default="")
    p.add_argument("--out_visualization_path", default="out")
    p.add_argument("--out_dataset_path", default="")
    p.add_argument("--start_frame", type=int, default=0)
    p.add_argument("--end_frame", type=int, default=-1)
    p.add_argument("--run_single_threaded",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="inline LoopOnce semantics; --no-run_single_threaded "
                        "enables async local BA (threaded LocalMapping)")
    p.add_argument("--real_time_pacing", action="store_true",
                   help="pace frames at dataset timestamps (the reference's "
                        "sleep-to-timestamp loop when not single-threaded, "
                        "stereo_kitti.cc:577-585)")
    p.add_argument("--logging_level", type=int, default=0,
                   help=">=1 saves the training-data debug visualizations "
                        "(bad_region_heatmap_vis/, epipolar_err_vec/, ... — "
                        "SaveImagesToFile, Tracking.cc:722-726)")
    p.add_argument("--sync_loader", action="store_true",
                   help="decode images synchronously in the frame loop "
                        "instead of the decode-ahead loader")
    p.add_argument("--create_ivslam_dataset", action="store_true")
    p.add_argument("--ivslam_enabled", action="store_true")
    p.add_argument("--inference_mode", action="store_true")
    p.add_argument("--introspection_func_enabled", action="store_true")
    p.add_argument("--enable_viewer", action="store_true")
    p.add_argument("--live_viewer_port", type=int, default=0,
                   help="serve the frame/map renders live over HTTP "
                        "(MJPEG; the Pangolin-window analogue, "
                        "src/Viewer.cc:56-70). Implies --enable_viewer.")
    p.add_argument("--gt_pose_available", action="store_true")
    p.add_argument("--timestamps_file", default="",
                   help="EuRoC timestamp list")
    p.add_argument("--rel_pose_uncertainty_path", default="",
                   help="per-frame (translational, rotational) uncertainty "
                        "rows (stereo_kitti.cc:73-84)")
    p.add_argument("--load_rel_pose_uncertainty", action="store_true")
    p.add_argument("--profile_stages", action="store_true",
                   help="per-stage wall-clock report (frontend / track / "
                        "keyframe events / datagen) printed at shutdown")
    p.add_argument("--fused_tracking", action="store_true",
                   help="single-dispatch fused tracking step against the "
                        "device-resident map mirror (slam/fused_track.py)")
    p.add_argument("--prewarm", action="store_true",
                   help="background-compile the fused program ladder at "
                        "startup (slam/prewarm.py; needs --fused_tracking)")
    p.add_argument("--chained_tracking", action="store_true",
                   help="one-frame speculative pipelining of the fused "
                        "step: device program for frame n+1 dispatches "
                        "from frame n's device results; host bookkeeping "
                        "runs one frame behind (needs --fused_tracking)")
    p.add_argument("--rectify_images", action="store_true",
                   help="rectify with the settings' LEFT./RIGHT. blocks "
                        "(stereo_kitti.cc:286-343)")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    # persistent compile cache for accelerator executables (the XLA:CPU AOT
    # path is feature-unsafe in this environment, so CPU runs skip it)
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
    elif os.environ.get("IVT_FAST_COMPILE"):
        # test harness hook: XLA:CPU compile time dominates driver-based
        # tests; this disables most HLO optimization passes (identical
        # semantics, slower kernels, much faster compiles)
        jax.config.update("jax_disable_most_optimizations", True)

    from iv_slam_tpu.config import Config, load_reference_yaml
    from iv_slam_tpu.io import datasets, trajectory
    from iv_slam_tpu.slam.system import System

    cfg = Config()
    if args.settings_path:
        cfg = load_reference_yaml(args.settings_path, cfg)
    cfg.iv.enabled = args.ivslam_enabled
    cfg.iv.inference_mode = args.inference_mode
    cfg.iv.create_dataset = args.create_ivslam_dataset
    cfg.system.fused_tracking = args.fused_tracking
    cfg.system.prewarm = args.prewarm
    cfg.system.single_threaded = args.run_single_threaded
    cfg.system.async_local_ba = not args.run_single_threaded
    # full threaded-LocalMapping: keyframe events (triangulation, fusion,
    # BA, culling, loop closing) on a worker thread — the reference's
    # default thread architecture (System.cc:172-197)
    cfg.system.threaded_local_mapping = not args.run_single_threaded
    cfg.system.chained_tracking = args.chained_tracking

    if args.dataset == "kitti":
        seq = datasets.load_kitti_stereo(
            args.data_path, args.ground_truth_path or None,
            args.start_frame, args.end_frame,
        )
    elif args.dataset == "euroc":
        seq = datasets.load_euroc_stereo(
            args.data_path, args.timestamps_file
        )
    elif args.dataset == "airsim":
        seq = datasets.load_airsim_stereo(
            args.data_path, args.ground_truth_path or None,
            load_gt_depth=args.load_gt_depth_imgs,
        )
    else:
        seq = datasets.load_jackal_session(args.data_path)

    def gt_depth_for(i):
        paths = getattr(seq, "depth_paths", None)
        if not args.load_gt_depth_imgs or paths is None:
            return None
        return datasets.load_gt_depth_pfm(paths[i])

    # optional stereo rectification from the settings' LEFT./RIGHT. blocks
    rect_maps = (None, None)
    if args.rectify_images and args.settings_path:
        from iv_slam_tpu.config import _parse_opencv_yaml
        from iv_slam_tpu.io import rectify

        doc = _parse_opencv_yaml(args.settings_path)
        rect_maps = (
            rectify.load_rectification_from_yaml(doc, "LEFT"),
            rectify.load_rectification_from_yaml(doc, "RIGHT"),
        )

    # decode-ahead stereo loader: the native C++ worker pool (or a Python
    # thread fallback) decodes + rectifies upcoming frames off the
    # tracking thread (the reference does both synchronously per frame,
    # stereo_kitti.cc:444-468); --sync_loader restores in-loop decoding
    from iv_slam_tpu.io.prefetch import StereoPrefetcher

    def make_loader():
        if args.sync_loader:
            class _Sync:
                def __init__(self):
                    self._i = 0

                def next(self):
                    i = self._i
                    self._i += 1
                    left = datasets.load_gray(seq.left_paths[i])
                    right = datasets.load_gray(seq.right_paths[i])
                    if rect_maps[0] is not None:
                        left = rectify.remap(left, rect_maps[0])
                    if rect_maps[1] is not None:
                        right = rectify.remap(right, rect_maps[1])
                    return left, right

                def close(self):
                    pass
            return _Sync()
        return StereoPrefetcher(seq.left_paths, seq.right_paths,
                                rect_maps=rect_maps)

    left0 = datasets.load_gray(seq.left_paths[0])
    h, w = left0.shape
    cfg.camera.height, cfg.camera.width = h, w
    sys_ = System(cfg, h, w)

    if args.vocab_path:
        from iv_slam_tpu.slam.vocabulary import Vocabulary

        sys_.attach_vocabulary(Vocabulary.load(args.vocab_path))

    if args.create_ivslam_dataset:
        cfg.iv.enabled = True
        sys_.enable_datagen(
            args.out_dataset_path
            or os.path.join(args.out_visualization_path,
                            "generated_training_data")
        )
        if args.load_rel_pose_uncertainty and args.rel_pose_uncertainty_path:
            unc = np.loadtxt(
                args.rel_pose_uncertainty_path, delimiter=",", ndmin=2
            )
            sys_.tracking.datagen.set_rel_pose_uncertainty(
                unc, {n: i for i, n in enumerate(seq.names)}
            )

    # introspection sources
    cost_fn = None
    if args.introspection_func_enabled and args.introspection_model_path:
        from iv_slam_tpu.train.trainer import Trainer, TrainConfig

        tr = Trainer(TrainConfig())
        tr.restore(args.introspection_model_path)
        # FCN fused into the frontend program: cost-map inference +
        # weighted extraction as one device dispatch per frame
        sys_.tracking.frontend.attach_introspection(tr.net, tr.variables())
    elif args.img_qual_path:
        def cost_fn(img, _dir=args.img_qual_path, _seq=seq, _i=[0]):
            name = _seq.names[_i[0]]
            _i[0] += 1
            path = os.path.join(_dir, name)
            return datasets.load_gray(path) if os.path.exists(path) else None

    os.makedirs(args.out_visualization_path, exist_ok=True)

    # headless viewer (Viewer.HeadlessMode + SaveFramesToFile /
    # SaveMapDrawingsToFile; src/{Viewer,FrameDrawer,MapDrawer}.cc)
    frame_drawer = map_drawer = live_viewer = None
    if args.enable_viewer or args.live_viewer_port:
        from iv_slam_tpu.slam.viewer import FrameDrawer, MapDrawer

        save = args.enable_viewer  # live-only mode skips the PNG writes
        frame_drawer = FrameDrawer(
            os.path.join(args.out_visualization_path, "frames")
            if save else None)
        map_drawer = MapDrawer(
            os.path.join(args.out_visualization_path, "map")
            if save else None)
    if args.live_viewer_port:
        from iv_slam_tpu.slam.live_viewer import LiveViewer

        live_viewer = LiveViewer(port=args.live_viewer_port).start()
        # control channel: the reference Viewer's menu actions
        # (menuLocalizationMode / menuReset, src/Viewer.cc:101-102 ->
        # 123-141) driving the same System API
        live_viewer.register_control(
            "localization_mode",
            lambda on: (sys_.activate_localization_mode() if on
                        else sys_.deactivate_localization_mode()),
        )
        live_viewer.register_control("reset", lambda _v: sys_.reset())
        print(f"live viewer: http://localhost:{live_viewer.port}/")

    if args.profile_stages:
        from iv_slam_tpu.utils.profiling import StageTimer

        sys_.tracking.stage_timer = StageTimer()

    # iLoggingLevel >= 1 -> per-frame heatmap/error-vector debug images
    # (FeatureEvaluator::SaveImagesToFile via Tracking.cc:722-726)
    eval_vis = None
    if args.logging_level >= 1 and sys_.tracking.datagen is not None:
        from iv_slam_tpu.introspection.vis import FeatureEvalVisualizer

        eval_vis = FeatureEvalVisualizer(args.out_visualization_path)

    # SIGINT -> stop the frame loop but still flush trajectories/dataset
    # (the reference's handler calls ShutdownMinimal for the same effect,
    # stereo_kitti.cc:185-196); second Ctrl-C falls through to the default.
    import signal

    interrupted = []

    def _on_sigint(sig, frm):
        interrupted.append(True)
        signal.signal(signal.SIGINT, signal.SIG_DFL)

    signal.signal(signal.SIGINT, _on_sigint)

    t_track = []
    # depth-1 frontend prefetch: frame i+1's extraction runs on device while
    # frame i's tracking occupies the host (stereo_kitti.cc overlaps I/O
    # with tracking via threads; here jax's async dispatch does it)
    handle = None
    next_cost = None
    cur_left = None
    loader = make_loader()
    if len(seq) > 0:
        left, right = loader.next()
        next_cost = cost_fn(left) if cost_fn else None
        handle = sys_.tracking.submit_frontend(left, right, next_cost)
        cur_left = left
    for i in range(len(seq)):
        if interrupted:
            print(f"SIGINT at frame {i}: flushing outputs (ShutdownMinimal)")
            break
        t, gt, name = seq.meta(i)
        t0 = time.perf_counter()
        cur_handle = handle
        this_left = cur_left
        if i + 1 < len(seq):
            nleft, nright = loader.next()
            next_cost = cost_fn(nleft) if cost_fn else None
            handle = sys_.tracking.submit_frontend(nleft, nright, next_cost)
            cur_left = nleft
        sys_.track_stereo(None, None, t, gt_pose=gt, img_name=name,
                          frontend_handle=cur_handle,
                          gt_depth_map=gt_depth_for(i))
        t_track.append(time.perf_counter() - t0)
        if (eval_vis is not None
                and sys_.tracking.datagen.last_result is not None):
            eval_vis.save_frame(this_left, name,
                                sys_.tracking.datagen.last_result)
        if args.real_time_pacing and i + 1 < len(seq):
            # pace frames at dataset timestamps, exactly the reference's
            # sleep(T - ttrack) when not single-threaded
            # (stereo_kitti.cc:577-585)
            budget = float(seq.timestamps[i + 1]) - float(t)
            if t_track[-1] < budget:
                time.sleep(budget - t_track[-1])
        if frame_drawer is not None and sys_.tracking.current is not None:
            frame = sys_.tracking.current
            frame.materialize()
            fvis = frame_drawer.draw(this_left, frame, sys_.state.name)
            mvis = None
            if i % 10 == 0:
                view = live_viewer.options if live_viewer is not None \
                    else {}
                mvis = map_drawer.draw(
                    sys_.tracking.map, sys_.trajectory_twc(),
                    gt_twc=list(seq.gt_poses[: i + 1])
                    if seq.gt_poses is not None else None,
                    frame_id=i,
                    show_points=view.get("show_points", True),
                    show_keyframes=view.get("show_keyframes", True),
                    show_graph=view.get("show_graph", False),
                    follow_camera=view.get("follow_camera", False),
                )
            if live_viewer is not None:
                m = sys_.tracking.map
                live_viewer.publish(fvis, mvis, stats=dict(
                    frame_id=int(frame.frame_id),
                    state=sys_.state.name,
                    n_keyframes=int(m.kf_alive[: m.n_keyframes].sum()),
                    n_points=int(m.pt_alive[: m.n_points].sum()),
                    failures=sys_.failure_count,
                ))
        if i % 50 == 0:
            print(f"frame {i}/{len(seq)} state={sys_.state.name} "
                  f"median_track={np.median(t_track):.3f}s")

    loader.close()
    if args.create_ivslam_dataset and sys_.tracking.datagen is not None:
        sys_.tracking.datagen.finalize()

    if live_viewer is not None:
        live_viewer.stop()
    out = args.out_visualization_path
    sys_.save_trajectory_kitti(os.path.join(out, "Trajectory_KITTI_000.txt"))
    sys_.save_keyframe_trajectory_tum(
        os.path.join(out, "KeyFrameTrajectory_TUM_000.txt")
    )
    sys_.save_failure_log(os.path.join(out, "failure_log.txt"))
    stats = dict(
        frames=len(t_track),
        failures=sys_.failure_count,
        median_track_s=float(np.median(t_track)) if t_track else 0.0,
        mean_track_s=float(np.mean(t_track)) if t_track else 0.0,
        fps=1.0 / float(np.median(t_track)) if t_track else 0.0,
        interrupted=bool(interrupted),
    )
    if seq.gt_poses is not None and not interrupted:
        est = sys_.trajectory_twc()
        stats["ate_rmse"] = trajectory.ate_rmse(est, list(seq.gt_poses))
    if args.profile_stages and sys_.tracking.stage_timer is not None:
        print(sys_.tracking.stage_timer.report())
    print(json.dumps(stats))
    with open(os.path.join(out, "stats.json"), "w") as f:
        json.dump(stats, f)


if __name__ == "__main__":
    main()
