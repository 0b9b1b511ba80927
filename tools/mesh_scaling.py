"""Multi-chip scaling evidence (VERDICT r1 item #8).

Measures the two mesh paths at realistic shapes on a virtual CPU mesh
(or real chips when present):

1. FCN train step on a dp x mp mesh at 512x512 crops — the reference's
   DataParallel training configuration (train_modular.py:305-315) —
   reporting step time and pixels/s (total and per device).
2. Sharded frontend replay (parallel/replay.py): per-device fps at dp=1
   vs dp=N with the same per-device work, so partition overhead (GSPMD
   collectives, resharding) is isolated from compute.

On this box the "devices" are XLA virtual CPU devices sharing ONE core,
so wall-clock cannot speed up with N; the honest scaling signal here is
(a) per-step time growing ~linearly with total work (no superlinear
partition overhead) and (b) identical numerics vs single-device. Run on
a real pod, the same program shards over ICI unchanged.

Usage: JAX_PLATFORMS=cpu python tools/mesh_scaling.py [--devices 8]
Prints one JSON line; paste into PERF.md §multichip.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--image_hw", type=int, default=512)
    p.add_argument("--replay_hw", type=int, nargs=2, default=(240, 320))
    args = p.parse_args()

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)
    except Exception:
        pass
    # if the backend was already initialized (jax is pre-imported by
    # sitecustomize) the updates above may be no-ops; never report
    # scaling numbers for a device count we didn't actually get
    n_actual = len(jax.devices())
    if n_actual != args.devices:
        raise SystemExit(
            f"requested --devices {args.devices} but jax sees {n_actual} "
            "(backend already initialized? run with "
            "JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_"
            f"device_count={args.devices})")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from iv_slam_tpu.models.introspection import IntrospectionNet
    from iv_slam_tpu.parallel import mesh as mesh_lib
    from iv_slam_tpu.train import train_state as ts

    out = {"n_devices": args.devices}

    # --- 1. FCN training step at the reference's 512x512 crop shape ---
    mesh = mesh_lib.make_mesh(args.devices)
    dp = mesh.shape["dp"]
    hw = args.image_hw
    net = IntrospectionNet()
    state, tx = ts.create_train_state(
        jax.random.PRNGKey(0), net, input_hw=(hw, hw),
        tx=ts.make_optimizer(max_iters=100),
    )
    params = mesh_lib.shard_params(state.params, mesh)
    repl = NamedSharding(mesh, P())
    batch_stats = jax.device_put(state.batch_stats, repl)
    opt_state = jax.tree.map(
        lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x,
        state.opt_state,
    )
    state = ts.TrainState(params, batch_stats, opt_state,
                          jax.device_put(state.step, repl))
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(dp, hw, hw, 3)),
                             jnp.float32),
        "target": jnp.asarray(rng.uniform(size=(dp, hw // 8, hw // 8, 1)),
                              jnp.float32),
        "mask": jnp.ones((dp, hw // 8, hw // 8, 1), jnp.float32),
    }
    data = NamedSharding(mesh, P("dp"))
    batch = jax.tree.map(lambda x: jax.device_put(x, data), batch)
    step_fn = ts.make_jit_train_step(net, tx, mesh=mesh)
    print("compiling FCN train step...", file=sys.stderr, flush=True)
    with mesh:
        state2, metrics = step_fn(state, batch)  # compile + warm
        jax.block_until_ready(metrics["loss"])
        print("compiled; timing...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        n_steps = 3
        for _ in range(n_steps):
            state2, metrics = step_fn(state2, batch)
        jax.block_until_ready(metrics["loss"])
        dt = (time.perf_counter() - t0) / n_steps
    out["fcn_train"] = {
        "mesh": dict(mesh.shape), "batch": dp, "crop": hw,
        "step_s": round(dt, 3),
        "pixels_per_s": round(dp * hw * hw / dt),
        "pixels_per_s_per_device": round(dp * hw * hw / dt / args.devices),
        "loss_finite": bool(np.isfinite(float(metrics["loss"]))),
    }

    # --- 2. sharded replay: dp=1 vs dp=N, same per-device work ---
    from iv_slam_tpu.config import CameraConfig, Config, ORBConfig
    from iv_slam_tpu.parallel.replay import ShardedReplay, make_replay_mesh

    h, w = args.replay_hw
    cfg = Config()
    cfg.camera = CameraConfig(fx=400, fy=400, cx=w / 2, cy=h / 2, bf=200,
                              width=w, height=h)
    cfg.orb = ORBConfig(n_features=800, n_levels=4)
    res = {}
    for ndev in (1, args.devices):
        print(f"replay dp={ndev}...", file=sys.stderr, flush=True)
        rmesh = make_replay_mesh(ndev)
        rep = ShardedReplay(cfg, h, w, rmesh)
        imgs = rng.integers(0, 255, (ndev, h, w)).astype(np.uint8)
        rep.process_batch(imgs, imgs)  # compile + warm
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            outs = rep.process_batch(imgs, imgs)
        dt = (time.perf_counter() - t0) / reps
        res[f"dp{ndev}"] = {
            "frames_per_batch": ndev,
            "batch_s": round(dt, 3),
            "fps_total": round(ndev / dt, 2),
            "fps_per_device": round(ndev / dt / ndev, 2),
        }
    d1, dn = res["dp1"]["batch_s"], res[f"dp{args.devices}"]["batch_s"]
    res["partition_overhead_x"] = round(dn / (d1 * args.devices), 3)
    out["replay"] = res

    print(json.dumps(out))


if __name__ == "__main__":
    main()
