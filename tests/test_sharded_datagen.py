"""Sharded (multi-chip) training-data generation.

parallel/datagen.py runs the whole datagen pipeline — frontend,
GT-guided prev->cur matching, normalized epipolar scoring, GP heatmaps —
as one dp-sharded program per batch (the reference generates the same
artifacts serially inside the SLAM loop, Tracking.cc:687-775). These
tests pin, on the virtual 8-device CPU mesh:

  * every consecutive pair is scored exactly once across overlapping
    batches, and the dataset artifacts land in the reference schema
    (dataset_creator.h:39-57);
  * a clean rigid world scores low (the GT-consistent geometry produces
    near-zero normalized epipolar errors).
"""

import os

import numpy as np

import synth_world
from iv_slam_tpu.config import CameraConfig, Config, ORBConfig
from iv_slam_tpu.parallel.datagen import ShardedDatagen
from iv_slam_tpu.parallel.replay import make_replay_mesh

H, W = 240, 320


def _cfg():
    cfg = Config()
    cfg.camera = CameraConfig(
        fx=400.0, fy=400.0, cx=160.0, cy=120.0, bf=200.0,
        width=W, height=H, th_depth=35.0,
    )
    cfg.orb = ORBConfig(n_features=300, n_levels=3)
    return cfg


def test_sharded_datagen_schema_and_scores(rng, tmp_path, monkeypatch):
    from iv_slam_tpu.introspection import feature_evaluator as fe

    world, frames, gt = synth_world.make_sequence(rng, n_frames=9,
                                                  step=0.12)
    mesh = make_replay_mesh(8)
    out = str(tmp_path / "generated_training_data")
    # the clean world scores near-zero bad%; disable the 5% lower gate
    # (the ablation tool does the same for clean-world datagen)
    monkeypatch.setattr(fe, "MIN_BAD_PERCENT", -1.0)
    dg = ShardedDatagen(_cfg(), H, W, mesh, out_path=out, score_cap=128)
    stats = dg.process_session(frames, gt, batch=5)
    # every consecutive pair scored once across the overlapping batches
    assert stats["n_pairs"] == len(frames) - 1
    assert np.isfinite(stats["mean_bad_pct"])
    # clean rigid world + GT poses => tiny normalized epipolar errors
    assert stats["mean_bad_pct"] < 20.0, stats
    # reference dataset schema (dataset_creator.h:39-57)
    assert os.path.isdir(os.path.join(out, "bad_region_heatmap"))
    assert os.path.isdir(os.path.join(out, "bad_region_heatmap_mask"))
    heats = os.listdir(os.path.join(out, "bad_region_heatmap"))
    assert len(heats) == stats["n_good"] > 0
    assert os.path.isfile(os.path.join(out, "keypoints.json"))
    assert os.path.isfile(os.path.join(out, "img_names.json"))
    import imageio.v3 as iio

    from iv_slam_tpu.ops import gp

    _bny, _bnx, out_h, out_w = gp.grid_shape(H, W)
    hm = iio.imread(os.path.join(out, "bad_region_heatmap", heats[0]))
    assert hm.shape == (out_h, out_w)
