#!/usr/bin/env python
"""Offline FCN evaluation (testing/{test_modular,inference_modular,
eval_model_outputs}.py equivalents).

Modes:
  inference: run the FCN over session images, write predicted cost maps
      (+ optional overlay visualizations) — inference_modular.py;
  eval: masked-MSE against generated heatmaps on held-out sessions —
      test_modular.py;
  retention: sort keypoints by predicted cost and plot mean ground-truth
      epipolar error vs retained fraction — the "retained-data" curves of
      eval_model_outputs.py:48-60.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["inference", "eval", "retention"],
                   required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--data_root", default="")
    p.add_argument("--raw_img_root", default="")
    p.add_argument("--sessions", type=int, nargs="*", default=[])
    p.add_argument("--img_dir", default="", help="inference-mode input dir")
    p.add_argument("--out_dir", default="fcn_out")
    p.add_argument("--save_overlays", action="store_true")
    p.add_argument("--keypoints_json", default="",
                   help="retention mode: keypoints.json from datagen")
    args = p.parse_args()

    import jax.numpy as jnp

    from iv_slam_tpu.models.introspection import inference_cost_map
    from iv_slam_tpu.train.trainer import Trainer, TrainConfig

    trainer = Trainer(TrainConfig())
    trainer.restore(args.ckpt)
    net, variables = trainer.net, trainer.variables()

    if args.mode == "inference":
        import imageio.v3 as iio

        os.makedirs(args.out_dir, exist_ok=True)
        names = sorted(os.listdir(args.img_dir))
        for name in names:
            img = iio.imread(os.path.join(args.img_dir, name))
            if img.ndim == 2:
                img = np.stack([img] * 3, axis=-1)
            cost = np.asarray(
                inference_cost_map(net, variables, jnp.asarray(img),
                                   out_hw=img.shape[:2])
            )
            iio.imwrite(os.path.join(args.out_dir, name), cost)
            if args.save_overlays:
                overlay = (0.6 * img[..., 0] + 0.4 * cost).astype(np.uint8)
                iio.imwrite(
                    os.path.join(args.out_dir, "overlay_" + name), overlay
                )
        print(f"wrote {len(names)} cost maps to {args.out_dir}")

    elif args.mode == "eval":
        from iv_slam_tpu.train.data import ImageQualityDataset
        from iv_slam_tpu.train.losses import masked_mse

        ds = ImageQualityDataset(
            args.data_root, args.raw_img_root, args.sessions
        )
        losses = []
        for i in range(len(ds)):
            s = ds[i]
            pred = net.apply(variables, jnp.asarray(s.image[None]),
                             train=False)
            losses.append(
                float(masked_mse(pred, jnp.asarray(s.target[None]),
                                 jnp.asarray(s.mask[None])))
            )
        report = dict(masked_mse=float(np.mean(losses)), n=len(losses))
        print(json.dumps(report))

    else:  # retention curves (eval_model_outputs.py:48-60)
        from iv_slam_tpu.train.data import (
            ImageQualityDatasetPP, retention_curve,
        )

        ds = ImageQualityDatasetPP(
            args.data_root, args.raw_img_root, args.sessions,
            network_output_root=args.img_dir,
        )
        costs, errs = [], []
        for i in range(len(ds)):
            s = ds[i]
            xi = np.clip(s.keypt_xy[:, 0].astype(int), 0,
                         s.network_output.shape[1] - 1)
            yi = np.clip(s.keypt_xy[:, 1].astype(int), 0,
                         s.network_output.shape[0] - 1)
            costs.append(s.network_output[yi, xi, 0].astype(np.float32))
            errs.append(s.keypt_epipolar_err)
        curve = retention_curve(
            np.concatenate(costs), np.concatenate(errs)
        )
        print(json.dumps(curve, indent=2))


if __name__ == "__main__":
    main()
