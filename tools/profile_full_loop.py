"""Profile the full tracking loop frame by frame (bench.py's sequence).

Prints per-frame wall time (spotting compile/RTT spikes), the tracking
StageTimer report, and the LocalMapping worker's stage report, so the
full-loop fps number in bench.py is attributable stage by stage.

Usage:  /opt/venv/bin/python tools/profile_full_loop.py [--frames 80]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=80)
    p.add_argument("--ramp", type=int, default=15)
    p.add_argument("--no-threaded", action="store_true")
    p.add_argument("--chain_depth", type=int, default=2)
    p.add_argument("--staged", action="store_true",
                   help="pre-stage all images on device (chip-capability "
                        "variant of bench.py full_loop_staged_fps)")
    p.add_argument("--no-chained", action="store_true")
    p.add_argument("--log_compiles", action="store_true")
    args = p.parse_args()

    import jax

    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
    if args.log_compiles:
        jax.config.update("jax_log_compiles", True)

    import synth_world

    from iv_slam_tpu.config import Config, CameraConfig, ORBConfig
    from iv_slam_tpu.io import trajectory
    from iv_slam_tpu.slam.system import System
    from iv_slam_tpu.utils.profiling import StageTimer

    H, W = 376, 1241
    fx = 718.856
    rng = np.random.default_rng(11)
    world = synth_world.PlaneWorld(
        rng, tex_size=8192, res=40.0, fx=fx, fy=fx, cx=W / 2.0, cy=H / 2.0,
        w=W, h=H, baseline=0.54,
    )
    gt, frames = [], []
    x = 0.0
    for i in range(args.frames):
        x += min(0.1 * i, 0.8)
        t = np.array([x, 0.1 * np.sin(i * 0.3), 0.0], np.float32)
        Twc = synth_world.camera_pose(t, height=15.0, yaw=0.01 * np.sin(i * 0.2))
        frames.append(world.render_stereo(Twc))
        gt.append(Twc)

    cfg = Config()
    cfg.camera = CameraConfig(
        fx=fx, fy=fx, cx=W / 2.0, cy=H / 2.0, bf=0.54 * fx,
        width=W, height=H, th_depth=35.0, fps=10.0,
    )
    cfg.orb = ORBConfig(n_features=2000, n_levels=8, ini_th_fast=20,
                        min_th_fast=7)
    cfg.system.fused_tracking = True
    cfg.system.prewarm = True
    cfg.system.async_local_ba = True
    cfg.system.threaded_local_mapping = not args.no_threaded
    cfg.system.chained_tracking = not args.no_chained
    cfg.system.chain_depth = args.chain_depth

    t0 = time.perf_counter()
    sys_ = System(cfg, H, W)
    tr = sys_.tracking
    tr.stage_timer = StageTimer()
    tr.local_mapping.stage_timer = StageTimer()
    if sys_._prewarm_thread is not None:
        sys_._prewarm_thread.join()
    print(f"init+prewarm {time.perf_counter() - t0:.1f}s", flush=True)

    if args.staged:
        import jax.numpy as jnp

        dev_pairs = [jnp.asarray(np.stack(f)) for f in frames]
        jax.block_until_ready(dev_pairs)

        def submit(i):
            return tr.submit_frontend_device(dev_pairs[i])
    else:
        def submit(i):
            return tr.submit_frontend(*frames[i])

    handle = submit(0)
    per_frame = []
    for i, (left, right) in enumerate(frames):
        tf = time.perf_counter()
        cur = handle
        if i + 1 < len(frames):
            handle = submit(i + 1)
        sys_.track_stereo(left, right, timestamp=i * 0.1, frontend_handle=cur)
        dt = time.perf_counter() - tf
        per_frame.append(dt)
        print(f"frame {i:3d}  {dt * 1e3:8.1f} ms"
              + ("  KF" if tr.last_kf_frame_id == i else ""), flush=True)

    est = sys_.trajectory_twc()
    k = len(est)
    ate = trajectory.ate_rmse(est, gt[-k:]) if k >= 2 else float("nan")

    # ---- isolated warm-program timings at the session's live shapes ----
    # (separates device-compute cost from queue-wait/GIL effects seen in
    # the loop's stage timers)
    print("\n== isolated warm timings ==", flush=True)
    fe = tr.frontend
    left, right = frames[-1]
    h = fe.submit(left, right)
    h[-1].block_until_ready()

    def timed(label, fn, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        print(f"{label:<32}{min(ts) * 1e3:8.1f} ms (best of {n})",
              flush=True)

    timed("frontend submit+block",
          lambda: fe.submit(left, right)[-1].block_until_ready())
    timed("frontend pack download", lambda: np.asarray(h[-1]))
    if hasattr(tr, "_fused") and tr.last_frame is not None \
            and tr.last_frame.pose is not None and tr.velocity is not None:
        frame = tr.current
        last = tr.last_frame
        T_pred = tr.velocity @ last.pose
        print(f"dmap live rung: {tr._dmap.live_cap}  "
              f"n_points={tr.map.n_points}", flush=True)

        def fused_once():
            _res, flat = tr._fused.track(
                frame, last, last.map_pt, T_pred, tr._dmap
            )
            flat.block_until_ready()

        timed("fused step (dispatch+block)", fused_once)

        def fused_plus_read():
            _res, flat = tr._fused.track(
                frame, last, last.map_pt, T_pred, tr._dmap
            )
            np.asarray(flat)

        timed("fused step + readback", fused_plus_read)
        timed("dmap full sync", lambda: tr._dmap.sync(tr.map))
    sys_.shutdown()

    a = np.asarray(per_frame[args.ramp:])
    print("\n== tracking thread stages ==")
    print(tr.stage_timer.report())
    print("\n== local-mapping worker stages ==")
    # a tracking reset replaces local_mapping (and its stage timer)
    if tr.local_mapping.stage_timer is not None:
        print(tr.local_mapping.stage_timer.report())
    else:
        print("(reset mid-run: worker stage timer lost)")
    print("\n== summary ==")
    print(json.dumps({
        "steady_mean_ms": round(float(a.mean()) * 1e3, 1),
        "steady_median_ms": round(float(np.median(a)) * 1e3, 1),
        "steady_p90_ms": round(float(np.percentile(a, 90)) * 1e3, 1),
        "steady_fps": round(len(a) / float(a.sum()), 2),
        "ate_m": round(float(ate), 4),
        "failures": tr.failure_count,
    }))


if __name__ == "__main__":
    main()
