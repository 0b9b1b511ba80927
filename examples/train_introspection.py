#!/usr/bin/env python
"""Train the introspection FCN (training/train_modular.py equivalent).

  python examples/train_introspection.py \
      --data_root <sessions with generated_training_data> \
      --raw_img_root <raw session images> \
      --train_sessions 0 1 2 --val_sessions 3 \
      --ckpt_dir checkpoints/jackal_mobilenet_c1deepsup
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True)
    p.add_argument("--raw_img_root", required=True)
    p.add_argument("--train_sessions", type=int, nargs="+", required=True)
    p.add_argument("--val_sessions", type=int, nargs="*", default=[])
    p.add_argument("--num_epochs", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=0.02)
    p.add_argument("--input_size", type=int, default=512)
    p.add_argument("--ckpt_dir", default="checkpoints/introspection")
    p.add_argument("--resume", default="")
    p.add_argument("--multichip", action="store_true",
                   help="shard over all available devices (dp x mp mesh)")
    args = p.parse_args()

    from iv_slam_tpu.parallel import mesh as mesh_lib
    from iv_slam_tpu.train.data import ImageQualityDataset
    from iv_slam_tpu.train.trainer import Trainer, TrainConfig

    mesh = mesh_lib.make_mesh() if args.multichip else None
    cfg = TrainConfig(
        num_epochs=args.num_epochs,
        batch_size=args.batch_size,
        lr_encoder=args.lr,
        lr_decoder=args.lr,
        input_hw=(args.input_size, args.input_size),
        ckpt_dir=args.ckpt_dir,
    )
    trainer = Trainer(cfg, mesh=mesh)
    if args.resume:
        trainer.restore(args.resume)

    train_ds = ImageQualityDataset(
        args.data_root, args.raw_img_root, args.train_sessions,
        input_hw=cfg.input_hw,
    )
    val_ds = (
        ImageQualityDataset(
            args.data_root, args.raw_img_root, args.val_sessions,
            input_hw=cfg.input_hw,
        )
        if args.val_sessions
        else None
    )
    print(f"train samples: {len(train_ds)}"
          + (f", val: {len(val_ds)}" if val_ds else ""))
    hist = trainer.train(train_ds, val_ds)
    print(f"best val {hist.best_val:.4f} @ epoch {hist.best_epoch}")


if __name__ == "__main__":
    main()
