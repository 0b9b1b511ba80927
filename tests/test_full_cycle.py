"""The product's defining loop, end to end (SURVEY.md §1 data-flow cycle):

  SLAM in training mode (GT poses) -> per-feature epipolar scoring -> GP
  heatmaps written as a dataset -> FCN trained on that dataset -> FCN cost
  maps fused into the frontend -> introspection-weighted extraction and
  quality-seeded tracking.

The reference spreads this over three binaries (stereo_kitti train-data
mode, train_modular.py, stereo_kitti inference mode); here it runs in one
process on a synthetic stereo sequence.
"""

import os

import numpy as np
import pytest

from iv_slam_tpu.config import Config, CameraConfig, ORBConfig
from iv_slam_tpu.slam.system import System
from iv_slam_tpu.slam.tracking import State

import synth_world

H, W = 240, 320


def _config():
    cfg = Config()
    cfg.camera = CameraConfig(
        fx=400.0, fy=400.0, cx=160.0, cy=120.0, bf=200.0,
        width=W, height=H, th_depth=35.0, fps=10.0,
    )
    cfg.orb = ORBConfig(n_features=600, n_levels=4)
    cfg.gp.max_train_points = 256
    return cfg


@pytest.mark.slow
def test_full_introspection_cycle(tmp_path, rng):
    from iv_slam_tpu.introspection import feature_evaluator as fe
    from iv_slam_tpu.train.data import ImageQualityDataset
    from iv_slam_tpu.train.trainer import Trainer, TrainConfig

    world, frames, gt = synth_world.make_sequence(rng, n_frames=12, step=0.08)

    # ---- stage 1: training-data generation (datagen session layout) ----
    data_root = tmp_path / "data"
    raw_root = tmp_path / "raw"
    out = data_root / "00000" / "generated_training_data"
    raw_dir = raw_root / "00000" / "image_0"
    os.makedirs(raw_dir)
    import imageio.v3 as iio

    cfg = _config()
    cfg.iv.enabled = True
    cfg.iv.create_dataset = True
    sys_ = System(cfg, H, W)
    sys_.enable_datagen(str(out))
    # clean synthetic tracking scores almost no "bad" features; drop the
    # lower good-for-training bound so heatmaps are written
    old_min = fe.MIN_BAD_PERCENT
    fe.MIN_BAD_PERCENT = -1.0
    try:
        for i, (left, right) in enumerate(frames):
            name = f"{i:06d}.png"
            iio.imwrite(os.path.join(raw_dir, name), left)
            sys_.track_stereo(
                left, right, timestamp=i * 0.1, gt_pose=gt[i], img_name=name
            )
        assert sys_.state == State.OK
        sys_.tracking.datagen.finalize()
    finally:
        fe.MIN_BAD_PERCENT = old_min
    hm_dir = os.path.join(out, "bad_region_heatmap")
    assert os.path.isdir(hm_dir) and len(os.listdir(hm_dir)) >= 4

    # ---- stage 2: FCN training on the generated dataset ----------------
    ds = ImageQualityDataset(
        str(data_root), str(raw_root), sessions=[0], input_hw=(H, W)
    )
    assert len(ds) >= 4
    tcfg = TrainConfig(
        num_epochs=2, batch_size=2, input_hw=(H, W),
        ckpt_dir=str(tmp_path / "ckpt"), snapshot_interval=5,
        lr_encoder=0.005, lr_decoder=0.005,
    )
    trainer = Trainer(tcfg)
    hist = trainer.train(ds, val_ds=ds, log_fn=lambda *_: None)
    assert np.isfinite(hist.train_loss).all()

    # ---- stage 3: introspective inference with the trained FCN ---------
    cfg2 = _config()
    sys2 = System(cfg2, H, W)
    sys2.tracking.frontend.attach_introspection(
        trainer.net, trainer.variables(), net_hw=(256, 256)
    )
    for i, (left, right) in enumerate(frames[:8]):
        sys2.track_stereo(left, right, timestamp=i * 0.1)
    assert sys2.state == State.OK
    assert sys2.failure_count == 0
    # the FCN cost map seeds per-keypoint quality (Frame.cc:130-143):
    # scores come from the network, not the all-ones default
    q = sys2.tracking.current.qual_score[sys2.tracking.current.valid]
    assert (q != 1.0).any()
    assert (q > -1.0).all() and (q <= 1.0).all()
