"""Introspection ON-vs-OFF ablation — the product's defining claim.

The reference's evaluation compares modes=["ORB_SLAM", "IV_SLAM"] on ATE
and failure counts (scripts/evaluation/evaluate_batch.py:70-71); the CoRL
2020 result is that introspection-weighted extraction + quality-weighted
optimization improves both on degraded imagery. This tool reproduces that
experiment end-to-end on a synthetic degraded world
(tests/synth_world.ShimmerWorld: a fixed image-space band of per-frame
shimmer noise — the glare/reflection analogue):

  1. vanilla run on the eval sequence                -> ATE_off, fails_off
  2. training run with GT poses -> datagen dataset (GP heatmaps)
  3. FCN trained on that dataset
  4. introspective run (FCN fused into the frontend) -> ATE_on, fails_on

Prints one JSON line with both ATEs. tests/test_introspection_helps.py
pins this protocol as a slow regression test.

Usage: /opt/venv/bin/python tools/introspection_ablation.py [--frames 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

H, W = 240, 320


def _config():
    from iv_slam_tpu.config import Config, CameraConfig, ORBConfig

    cfg = Config()
    cfg.camera = CameraConfig(
        fx=400.0, fy=400.0, cx=160.0, cy=120.0, bf=200.0,
        width=W, height=H, th_depth=35.0, fps=10.0,
    )
    cfg.orb = ORBConfig(n_features=600, n_levels=4)
    cfg.gp.max_train_points = 256
    return cfg


def make_frames(world, n, step, seed_phase=0.0, yaw_amp=0.02):
    """Serpentine trajectory. yaw_amp matters for the physics: a STATIC
    image-space feature (the reflection band) under pure translation has
    IDENTICALLY ZERO epipolar error — x^T [Kt]x x = 0 — so the scoring
    only sees the band when the camera ROTATES between frames (the
    paper's Jackal turns constantly). yaw_amp ~0.25 rad gives the
    per-frame yaw deltas a ground robot's turning produces."""
    import synth_world

    gt, frames = [], []
    for i in range(n):
        t = np.array(
            [i * step, 0.03 * np.sin(i * 0.4 + seed_phase), 0.0], np.float32
        )
        Twc = synth_world.camera_pose(
            t, height=10.0, yaw=yaw_amp * np.sin(i * 0.3 + seed_phase)
        )
        frames.append(world.render_stereo(Twc))
        gt.append(Twc)
    return frames, gt


def run_slam(cfg, frames, gt, attach=None, datagen_dir=None,
             gt_poses=False):
    from iv_slam_tpu.io import trajectory
    from iv_slam_tpu.slam.system import System

    sys_ = System(cfg, H, W)
    if attach is not None:
        # net_hw = the TRAINING resolution: inference through a resize to
        # a different grid silently zeroes the small FCN's response (BN
        # statistics + receptive-field shift; measured band response
        # 160/255 at the training res vs 0/255 through a 256x256 resize
        # on the same checkpoint). The reference trains and infers at
        # matching dims too (config TEST.output_img_* == DATASET dims).
        sys_.tracking.frontend.attach_introspection(
            attach[0], attach[1], net_hw=(H, W)
        )
    if datagen_dir is not None:
        sys_.enable_datagen(datagen_dir)
    for i, (left, right) in enumerate(frames):
        sys_.track_stereo(
            left, right, timestamp=i * 0.1,
            gt_pose=gt[i] if gt_poses else None,
            img_name=f"{i:06d}.png",
        )
    if datagen_dir is not None:
        sys_.tracking.datagen.finalize()
    est = sys_.trajectory_twc()
    k = len(est)
    ate = trajectory.ate_rmse(est, gt[-k:]) if k >= 2 else float("nan")
    fails = sys_.failure_count
    sys_.shutdown()
    return float(ate), int(fails)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=50)
    p.add_argument("--train_frames", type=int, default=30)
    p.add_argument("--step", type=float, default=0.10)
    p.add_argument("--strength", type=float, default=0.65)
    p.add_argument("--yaw_amp", type=float, default=0.02)
    p.add_argument("--world", default="ReflectionWorld",
                   choices=("ReflectionWorld", "ShimmerWorld"))
    p.add_argument("--seed", type=int, default=5)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--datagen_features", type=int, default=0,
                   help="feature budget for the TRAINING-DATA run only "
                        "(reference guidance: ~5000 for datagen vs ~2000 "
                        "for inference, introspective_ORB_SLAM/README.md "
                        "ORB Parameters — denser scoring makes denser, "
                        "hotter GP heatmap targets). 0 = same as eval")
    p.add_argument("--work", default="")
    args = p.parse_args()

    import imageio.v3 as iio
    import synth_world

    from iv_slam_tpu.introspection import feature_evaluator as fe
    from iv_slam_tpu.train.data import ImageQualityDataset
    from iv_slam_tpu.train.trainer import Trainer, TrainConfig

    work = args.work or tempfile.mkdtemp(prefix="iv_ablation_")
    rng = np.random.default_rng(args.seed)
    world_cls = getattr(synth_world, args.world)
    kw = (dict(strength=args.strength) if args.world == "ShimmerWorld"
          else dict(alpha=args.strength))
    world = world_cls(
        rng, fx=400.0, fy=400.0, cx=160.0, cy=120.0,
        w=W, h=H, baseline=0.5, **kw,
    )

    # eval sequence (both modes see identical pixels: pre-rendered)
    eval_frames, eval_gt = make_frames(world, args.frames, args.step,
                                       yaw_amp=args.yaw_amp)
    # training sequence: different trajectory phase over the same world
    train_frames, train_gt = make_frames(
        world, args.train_frames, args.step, seed_phase=1.7,
        yaw_amp=args.yaw_amp,
    )

    # ---- 1: vanilla (ORB_SLAM mode) --------------------------------
    ate_off, fails_off = run_slam(_config(), eval_frames, eval_gt)
    print(f"OFF: ate={ate_off:.4f} fails={fails_off}", flush=True)

    # ---- 2: training-data generation -------------------------------
    data_root = os.path.join(work, "data")
    raw_root = os.path.join(work, "raw")
    out = os.path.join(data_root, "00000", "generated_training_data")
    raw_dir = os.path.join(raw_root, "00000", "image_0")
    os.makedirs(raw_dir, exist_ok=True)
    for i, (left, _right) in enumerate(train_frames):
        iio.imwrite(os.path.join(raw_dir, f"{i:06d}.png"), left)
    cfg = _config()
    cfg.iv.enabled = True
    cfg.iv.create_dataset = True
    if args.datagen_features:
        from iv_slam_tpu.config import ORBConfig as _OC

        cfg.orb = _OC(n_features=args.datagen_features, n_levels=4)
        cfg.gp.max_train_points = 512
    old_min = fe.MIN_BAD_PERCENT
    fe.MIN_BAD_PERCENT = -1.0
    try:
        run_slam(cfg, train_frames, train_gt, datagen_dir=out, gt_poses=True)
    finally:
        fe.MIN_BAD_PERCENT = old_min
    heat_dir = os.path.join(out, "bad_region_heatmap")
    heat_files = sorted(os.listdir(heat_dir))
    n_heat = len(heat_files)
    # ---- intermediate gate 1: do the TRAINING TARGETS localize the
    # degradation? (band-vs-background heat; VERDICT r3: a 0.1/255 band
    # response cannot move weighted extraction)
    band = world.bad_region_mask()
    bh, bg = [], []
    for f in heat_files:
        hm = iio.imread(os.path.join(heat_dir, f)).astype(np.float32)
        b = band[: hm.shape[0], : hm.shape[1]]
        bh.append(float(hm[b].mean()))
        bg.append(float(hm[~b].mean()))
    heat_band = float(np.mean(bh)) if bh else float("nan")
    heat_bg = float(np.mean(bg)) if bg else float("nan")
    print(f"datagen: {n_heat} heatmaps, target band={heat_band:.1f}/255 "
          f"vs bg={heat_bg:.1f}/255", flush=True)

    # ---- 3: FCN training -------------------------------------------
    ds = ImageQualityDataset(
        data_root, raw_root, sessions=[0], input_hw=(H, W)
    )
    tcfg = TrainConfig(
        num_epochs=args.epochs, batch_size=2, input_hw=(H, W),
        ckpt_dir=os.path.join(work, "ckpt"), snapshot_interval=100,
        lr_encoder=0.005, lr_decoder=0.005,
    )
    trainer = Trainer(tcfg)
    trainer.train(ds, val_ds=None, log_fn=lambda *_: None)
    print("train: done", flush=True)

    # ---- intermediate gate 2: does the TRAINED FCN flag the band?
    # (mean predicted cost inside the degraded band vs outside on eval
    # frames the model never saw; the extraction weighting at
    # ORBextractor.cc:946-1080 strength only moves budgets when this
    # response is substantial — VERDICT r4 gate: >= 50/255 over bg)
    import jax.numpy as jnp

    from iv_slam_tpu.models.introspection import inference_cost_map

    resp_band, resp_bg = [], []
    for left, _r in eval_frames[:: max(len(eval_frames) // 8, 1)]:
        rgb = jnp.stack([jnp.asarray(left)] * 3, axis=-1)
        cost = np.asarray(inference_cost_map(
            trainer.net, trainer.variables(), rgb, (H, W), (H, W)
        )).astype(np.float32)
        resp_band.append(float(cost[band].mean()))
        resp_bg.append(float(cost[~band].mean()))
    fcn_band = float(np.mean(resp_band))
    fcn_bg = float(np.mean(resp_bg))
    print(f"fcn probe: band={fcn_band:.1f}/255 vs bg={fcn_bg:.1f}/255",
          flush=True)

    # ---- 4: introspective run (IV_SLAM mode) -----------------------
    cfg2 = _config()
    cfg2.orb.enable_introspection = True
    ate_on, fails_on = run_slam(
        cfg2, eval_frames, eval_gt,
        attach=(trainer.net, trainer.variables()),
    )
    print(f"ON: ate={ate_on:.4f} fails={fails_on}", flush=True)

    print(json.dumps({
        "ate_off_m": round(ate_off, 4), "ate_on_m": round(ate_on, 4),
        "failures_off": fails_off, "failures_on": fails_on,
        "improvement": round(1.0 - ate_on / ate_off, 3)
        if ate_off > 0 else None,
        "heat_band": round(heat_band, 1), "heat_bg": round(heat_bg, 1),
        "fcn_band": round(fcn_band, 1), "fcn_bg": round(fcn_bg, 1),
        "work": work,
    }))


if __name__ == "__main__":
    main()
