"""Decompose the fused tracking step's device time.

The isolated fused step measures ~50 ms at the 16k live rung
(tools/profile_full_loop.py) — the steady-state frame floor. This tool
times its stages as separate jitted programs at identical shapes:

  motion-model search | pose LM | full-map local search | pose LM

Usage: /opt/venv/bin/python tools/bench_fused_parts.py [--rung 16384]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(label, fn, n=10):
    fn()  # compile + warm
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:<40}{min(ts) * 1e3:8.2f} ms (best of {n})", flush=True)
    return min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rung", type=int, default=16384)
    p.add_argument("--n_kp", type=int, default=2048)
    p.add_argument("--rounds", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")

    from iv_slam_tpu.config import Config, CameraConfig, ORBConfig
    from iv_slam_tpu.geometry import camera
    from iv_slam_tpu.ops import match as match_ops
    from iv_slam_tpu.solvers import pose_opt

    H, W = 376, 1241
    fx = 718.856
    cfg = Config()
    cfg.camera = CameraConfig(fx=fx, fy=fx, cx=W / 2, cy=H / 2,
                              bf=0.54 * fx, width=W, height=H)
    cfg.orb = ORBConfig(n_features=2000, n_levels=8)
    cam = cfg.camera
    K = camera.Intrinsics.from_config(cam)
    sf = cfg.orb.scale_factors()
    N, P = args.n_kp, args.rung
    rng = np.random.default_rng(0)

    # synthetic frame + map tables at the live shapes
    Xw = rng.uniform(-20, 20, (P, 3)).astype(np.float32)
    Xw[:, 2] += 30.0
    d = dict(
        cur_xy=rng.uniform(0, 300, (N, 2)).astype(np.float32),
        cur_oct=rng.integers(0, 8, N).astype(np.int32),
        cur_angle=rng.uniform(0, 360, N).astype(np.float32),
        cur_desc=rng.integers(0, 256, (N, 32)).astype(np.uint8),
        cur_ur=rng.uniform(0, 300, N).astype(np.float32),
        cur_valid=np.ones(N, bool),
        cur_qual=np.ones(N, np.float32),
        last_xy=rng.uniform(0, 300, (N, 2)).astype(np.float32),
        last_oct=rng.integers(0, 8, N).astype(np.int32),
        last_angle=rng.uniform(0, 360, N).astype(np.float32),
        last_valid=np.ones(N, bool),
        pt_pos=Xw[:N],
        pt_desc=rng.integers(0, 256, (N, 32)).astype(np.uint8),
        pt_ok=np.ones(N, bool),
        T=np.eye(4, dtype=np.float32),
        map_pos=Xw,
        map_desc=rng.integers(0, 256, (P, 32)).astype(np.uint8),
        map_normal=rng.normal(0, 1, (P, 3)).astype(np.float32),
        map_mind=np.full(P, 1.0, np.float32),
        map_maxd=np.full(P, 60.0, np.float32),
        map_qual=np.ones(P, np.float32),
        map_valid=np.ones(P, bool),
    )
    d = {k: jnp.asarray(v) for k, v in d.items()}
    jax.block_until_ready(d)
    sfj = jnp.asarray(sf)
    inv_s2 = jnp.asarray((1.0 / (sf * sf)).astype(np.float32))

    @jax.jit
    def motion_search(d):
        return match_ops.search_by_projection_last_frame(
            d["cur_xy"], d["cur_oct"], d["cur_angle"], d["cur_desc"],
            d["cur_ur"], d["cur_valid"],
            d["pt_pos"], d["pt_desc"], d["last_oct"], d["last_angle"],
            d["pt_ok"], d["T"], d["T"],
            jnp.float32(cam.fx), jnp.float32(cam.fy),
            jnp.float32(cam.cx), jnp.float32(cam.cy),
            jnp.float32(cam.bf), jnp.float32(cam.baseline),
            jnp.float32(W), jnp.float32(H), sfj, jnp.float32(7.0),
        )

    @jax.jit
    def pose_lm(d):
        obs = jnp.concatenate([d["cur_xy"], d["cur_ur"][:, None]], axis=1)
        return pose_opt.pose_optimization(
            d["T"], d["map_pos"][:N], obs, inv_s2[d["cur_oct"]],
            d["cur_qual"], d["cur_valid"], K, n_rounds=args.rounds,
        ).T

    @jax.jit
    def local_search(d):
        return match_ops.search_by_projection_local_map(
            d["cur_xy"], d["cur_oct"], d["cur_desc"], d["cur_ur"],
            d["cur_valid"], d["cur_valid"] & False,
            d["map_pos"], d["map_desc"], d["map_normal"],
            d["map_mind"], d["map_maxd"], d["map_valid"],
            d["T"],
            jnp.float32(cam.fx), jnp.float32(cam.fy),
            jnp.float32(cam.cx), jnp.float32(cam.cy), jnp.float32(cam.bf),
            jnp.float32(W), jnp.float32(H), sfj,
            jnp.float32(np.log(1.2)), jnp.float32(1.0), jnp.float32(0.8),
        )

    t_m = timed("motion search (N x N)",
                lambda: jax.block_until_ready(motion_search(d)))
    t_p = timed(f"pose LM ({args.rounds} x 10 rounds)",
                lambda: jax.block_until_ready(pose_lm(d)))
    t_l = timed(f"local-map search (N x {P})",
                lambda: jax.block_until_ready(local_search(d)))
    print(f"\nsum motion + 2*LM + local = "
          f"{(t_m + 2 * t_p + t_l) * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
