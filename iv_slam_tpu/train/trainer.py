"""FCN training loop (training/train_modular.py re-designed).

Epoch loop with per-epoch validation, orbax checkpointing every
`snapshot_interval` epochs plus best-by-val tracking, and resume — the
reference's snapshot/besterror logic (train_modular.py:74-110, 398-416,
459-472) on top of the jitted (optionally mesh-sharded) train step.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.introspection import IntrospectionNet
from .data import ImageQualityDataset
from .losses import masked_mse
from . import train_state as ts


@dataclass
class TrainConfig:
    num_epochs: int = 20
    batch_size: int = 8
    lr_encoder: float = 0.02
    lr_decoder: float = 0.02
    momentum: float = 0.9
    weight_decay: float = 1e-4
    lr_pow: float = 0.9
    deep_sup_scale: float = 0.4
    snapshot_interval: int = 5
    input_hw: tuple = (512, 512)
    seed: int = 0
    ckpt_dir: str = "checkpoints"
    # model selection (MODEL.arch_encoder/arch_decoder/fc_dim in the yacs
    # tree, config/defaults.py) — any pair from models/zoo.py
    arch_encoder: str = "mobilenetv2dilated"
    arch_decoder: str = "c1_deepsup"
    fc_dim: int = 0          # 0 = infer from the encoder arch
    num_class: int = 1
    regression_mode: bool = True


@dataclass
class History:
    train_loss: list = field(default_factory=list)
    val_loss: list = field(default_factory=list)
    best_val: float = float("inf")
    best_epoch: int = -1


class Trainer:
    def __init__(self, cfg: TrainConfig, mesh=None):
        self.cfg = cfg
        if (cfg.arch_encoder, cfg.arch_decoder) == (
            "mobilenetv2dilated", "c1_deepsup",
        ) and cfg.num_class == 1:
            self.net = IntrospectionNet()  # flagship recipe, stable ckpts
        else:
            from ..models.zoo import SegmentationModel

            self.net = SegmentationModel(
                arch_encoder=cfg.arch_encoder,
                arch_decoder=cfg.arch_decoder,
                fc_dim=cfg.fc_dim,
                num_class=cfg.num_class,
                regression_mode=cfg.regression_mode,
            )
        max_iters = cfg.num_epochs * 1000  # refined once data is known
        self.tx = ts.make_optimizer(
            cfg.lr_encoder, cfg.lr_decoder, max_iters,
            cfg.momentum, cfg.weight_decay, cfg.lr_pow,
        )
        self.state, self.tx = ts.create_train_state(
            jax.random.PRNGKey(cfg.seed), self.net, cfg.input_hw, self.tx
        )
        self.step_fn = ts.make_jit_train_step(self.net, self.tx, mesh)
        self.eval_fn = jax.jit(self._eval_step)
        self.history = History()

    def _eval_step(self, params, batch_stats, batch):
        pred = self.net.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], train=False,
        )
        return masked_mse(pred, batch["target"], batch["mask"])

    def train(
        self,
        train_ds: ImageQualityDataset,
        val_ds: Optional[ImageQualityDataset] = None,
        log_fn=print,
    ):
        cfg = self.cfg
        rng = np.random.default_rng(cfg.seed)
        for epoch in range(cfg.num_epochs):
            losses = []
            for batch in train_ds.batches(cfg.batch_size, rng):
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                self.state, metrics = self.step_fn(self.state, batch)
                losses.append(float(metrics["loss"]))
            train_loss = float(np.mean(losses)) if losses else float("nan")
            self.history.train_loss.append(train_loss)

            val_loss = float("nan")
            if val_ds is not None and len(val_ds) > 0:
                vlosses = []
                for batch in val_ds.batches(cfg.batch_size, rng, shuffle=False):
                    batch = {k: jnp.asarray(v) for k, v in batch.items()}
                    vlosses.append(
                        float(
                            self.eval_fn(
                                self.state.params, self.state.batch_stats, batch
                            )
                        )
                    )
                val_loss = float(np.mean(vlosses)) if vlosses else float("nan")
            self.history.val_loss.append(val_loss)
            log_fn(
                f"epoch {epoch}: train {train_loss:.4f} val {val_loss:.4f}"
            )

            if val_ds is not None and val_loss < self.history.best_val:
                self.history.best_val = val_loss
                self.history.best_epoch = epoch
                self.save(os.path.join(cfg.ckpt_dir, "best"))
            if (epoch + 1) % cfg.snapshot_interval == 0:
                self.save(os.path.join(cfg.ckpt_dir, f"epoch_{epoch + 1}"))
        self.save(os.path.join(cfg.ckpt_dir, "last"))
        return self.history

    # --- checkpointing (orbax) --------------------------------------------

    def save(self, path: str):
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(
            path,
            dict(
                params=self.state.params,
                batch_stats=self.state.batch_stats,
                step=self.state.step,
            ),
            force=True,
        )
        ckpt.wait_until_finished()
        with open(path + ".history.json", "w") as f:
            json.dump(
                dict(
                    train_loss=self.history.train_loss,
                    val_loss=self.history.val_loss,
                    best_val=self.history.best_val,
                    best_epoch=self.history.best_epoch,
                ),
                f,
            )

    def restore(self, path: str):
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckpt = ocp.StandardCheckpointer()
        target = dict(
            params=self.state.params,
            batch_stats=self.state.batch_stats,
            step=self.state.step,
        )
        restored = ckpt.restore(path, target)
        self.state = ts.TrainState(
            restored["params"], restored["batch_stats"],
            self.state.opt_state, restored["step"],
        )
        hist = path + ".history.json"
        if os.path.exists(hist):
            with open(hist) as f:
                h = json.load(f)
            self.history = History(
                h["train_loss"], h["val_loss"], h["best_val"], h["best_epoch"]
            )

    def variables(self):
        return {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
        }
