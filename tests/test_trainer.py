import os

import numpy as np
import pytest

from iv_slam_tpu.train.trainer import Trainer, TrainConfig


class _SynthDataset:
    """Minimal stand-in matching ImageQualityDataset's batches() API."""

    def __init__(self, rng, n=8, hw=(64, 64)):
        self.rng = rng
        self.n = n
        self.hw = hw
        th, tw = hw[0] // 8, hw[1] // 8
        self.images = rng.normal(size=(n, hw[0], hw[1], 3)).astype(np.float32)
        # target: brightness of the image's top-left patch (learnable signal)
        self.targets = rng.uniform(size=(n, th, tw, 1)).astype(np.float32)
        self.masks = np.ones((n, th, tw, 1), np.float32)

    def __len__(self):
        return self.n

    def batches(self, batch_size, rng, shuffle=True, prefetch=2):
        for s in range(0, self.n, batch_size):
            yield dict(
                image=self.images[s:s + batch_size],
                target=self.targets[s:s + batch_size],
                mask=self.masks[s:s + batch_size],
            )


@pytest.mark.slow
def test_trainer_loss_decreases_and_checkpoints(tmp_path, rng):
    cfg = TrainConfig(
        num_epochs=3, batch_size=4, input_hw=(64, 64),
        ckpt_dir=str(tmp_path / "ckpt"), snapshot_interval=2,
        lr_encoder=0.01, lr_decoder=0.01,
    )
    trainer = Trainer(cfg)
    ds = _SynthDataset(rng)
    hist = trainer.train(ds, val_ds=ds, log_fn=lambda *_: None)
    assert len(hist.train_loss) == 3
    assert hist.train_loss[-1] < hist.train_loss[0]
    assert os.path.exists(os.path.join(cfg.ckpt_dir, "best"))
    assert os.path.exists(os.path.join(cfg.ckpt_dir, "last"))

    # restore into a fresh trainer and verify the state round-trips
    t2 = Trainer(cfg)
    t2.restore(os.path.join(cfg.ckpt_dir, "last"))
    assert int(t2.state.step) == int(trainer.state.step)
    import jax

    leaves1 = jax.tree_util.tree_leaves(trainer.state.params)
    leaves2 = jax.tree_util.tree_leaves(t2.state.params)
    np.testing.assert_allclose(
        np.asarray(leaves1[0]), np.asarray(leaves2[0]), atol=1e-6
    )
