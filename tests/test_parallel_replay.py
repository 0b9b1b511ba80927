"""Sharded offline replay: the frontend fanned out over the 8-device mesh.

Validates the SLAM-side multi-chip path (parallel/replay.py): results must
be identical to the single-image frontend, and the program must accept
batch shardings over every mesh device.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iv_slam_tpu.config import Config, CameraConfig, ORBConfig
from iv_slam_tpu.parallel.replay import ShardedReplay, make_replay_mesh

import synth_world


@pytest.mark.slow
def test_sharded_replay_matches_single(rng):
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest must provide the virtual 8-device mesh"

    cfg = Config()
    cfg.camera = CameraConfig(fx=400, fy=400, cx=160, cy=120, bf=200,
                              width=320, height=240)
    cfg.orb = ORBConfig(n_features=400, n_levels=3)

    world, frames, _gt = synth_world.make_sequence(rng, n_frames=8)
    lefts = np.stack([f[0] for f in frames])
    rights = np.stack([f[1] for f in frames])

    mesh = make_replay_mesh()
    assert mesh.shape["dp"] == 8
    rep = ShardedReplay(cfg, 240, 320, mesh)
    outs = rep.process_batch(lefts, rights)
    assert len(outs) == 8

    # identical to the single-frame frontend (frame 0 and frame 5)
    for i in (0, 5):
        single = rep.frontend.process(lefts[i], rights[i], 0.0)
        np.testing.assert_array_equal(outs[i]["xy"], single.xy)
        np.testing.assert_array_equal(outs[i]["valid"], single.valid)
        np.testing.assert_array_equal(
            outs[i]["desc"], np.asarray(single.kp.desc)
        )
        np.testing.assert_allclose(
            outs[i]["depth"], single.depth, atol=1e-5
        )

    # ragged batch: padding to the mesh size must not change results
    outs5 = rep.process_batch(lefts[:5], rights[:5])
    assert len(outs5) == 5
    np.testing.assert_array_equal(outs5[2]["xy"], outs[2]["xy"])


@pytest.mark.slow
def test_sharded_replay_with_vocabulary(rng):
    """BoW words computed inside the sharded program must equal the host
    tree walk on the same descriptors."""
    from iv_slam_tpu.slam.vocabulary import Vocabulary

    cfg = Config()
    cfg.camera = CameraConfig(fx=400, fy=400, cx=160, cy=120, bf=200,
                              width=320, height=240)
    cfg.orb = ORBConfig(n_features=200, n_levels=3)

    world, frames, _gt = synth_world.make_sequence(rng, n_frames=8)
    lefts = np.stack([f[0] for f in frames])
    rights = np.stack([f[1] for f in frames])

    corpus = np.random.default_rng(3).integers(
        0, 256, (2000, 32)).astype(np.uint8)
    voc = Vocabulary.train(corpus, k=5, L=2, seed=1)

    rep = ShardedReplay(cfg, 240, 320, make_replay_mesh(), vocabulary=voc)
    outs = rep.process_batch(lefts, rights)
    for i in (0, 3):
        valid = outs[i]["valid"]
        host = voc.transform_words(outs[i]["desc"][valid])
        np.testing.assert_array_equal(outs[i]["bow_nodes"][valid], host)
        assert (outs[i]["bow_nodes"][~valid] == -1).all()
