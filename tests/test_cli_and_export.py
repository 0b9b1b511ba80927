import json
import os
import subprocess
import sys

import numpy as np
import pytest

import synth_world

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def kitti_dir(tmp_path_factory):
    """Tiny KITTI-layout dataset rendered from the synthetic world."""
    import imageio.v3 as iio

    root = tmp_path_factory.mktemp("kitti") / "00"
    (root / "image_0").mkdir(parents=True)
    (root / "image_1").mkdir()
    rng = np.random.default_rng(31)
    world, frames, gt = synth_world.make_sequence(rng, n_frames=6, step=0.08)
    times = []
    for i, (left, right) in enumerate(frames):
        iio.imwrite(root / "image_0" / f"{i:06d}.png", left)
        iio.imwrite(root / "image_1" / f"{i:06d}.png", right)
        times.append(i * 0.1)
    np.savetxt(root / "times.txt", np.array(times))
    poses = np.stack([T[:3, :4].reshape(-1) for T in gt])
    gt_file = root.parent / "00_gt.txt"
    np.savetxt(gt_file, poses)
    # settings YAML matching the synthetic camera
    settings = root.parent / "synth.yaml"
    settings.write_text(
        "%YAML:1.0\n"
        "Camera.fx: 400.0\nCamera.fy: 400.0\nCamera.cx: 160.0\n"
        "Camera.cy: 120.0\nCamera.bf: 200.0\nCamera.fps: 10.0\n"
        "Camera.width: 320\nCamera.height: 240\nThDepth: 35\n"
        "ORBextractor.nFeatures: 800\nORBextractor.scaleFactor: 1.2\n"
        "ORBextractor.nLevels: 4\nORBextractor.iniThFAST: 12\n"
        "ORBextractor.minThFAST: 7\n"
    )
    return root, gt_file, settings


@pytest.mark.slow
def test_run_stereo_cli(kitti_dir, tmp_path):
    root, gt_file, settings = kitti_dir
    out = tmp_path / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "examples", "run_stereo.py"),
            "--dataset", "kitti",
            "--data_path", str(root),
            "--settings_path", str(settings),
            "--ground_truth_path", str(gt_file),
            "--out_visualization_path", str(out),
        ],
        capture_output=True, text=True, env=env, timeout=3000,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    stats = json.loads((out / "stats.json").read_text())
    assert stats["frames"] == 6
    assert stats["failures"] == 0
    assert stats["ate_rmse"] < 0.1, stats
    assert (out / "Trajectory_KITTI_000.txt").exists()
    assert (out / "KeyFrameTrajectory_TUM_000.txt").exists()


def test_config_yaml_loader(kitti_dir):
    _, _, settings = kitti_dir
    from iv_slam_tpu.config import load_reference_yaml

    cfg = load_reference_yaml(str(settings))
    assert cfg.camera.fx == 400.0
    assert cfg.orb.n_features == 800
    assert cfg.orb.n_levels == 4
    assert cfg.camera.depth_threshold == pytest.approx(0.5 * 35)


def test_torch_checkpoint_conversion(rng):
    """Fabricate reference-layout torch state_dicts and convert to Flax."""
    import torch
    import jax.numpy as jnp

    from iv_slam_tpu.models.convert_torch import (
        convert_decoder, convert_encoder,
    )
    from iv_slam_tpu.models.introspection import IntrospectionNet
    from iv_slam_tpu.models.mobilenet import (
        INVERTED_RESIDUAL_SETTING, _dilated_plan,
    )

    # build the torch-layout state_dict shapes for MobileNetV2 features[0:18]
    sd = {}

    def add_bn(prefix, c):
        for k, shape in (
            ("weight", (c,)), ("bias", (c,)),
            ("running_mean", (c,)), ("running_var", (c,)),
        ):
            sd[f"{prefix}.{k}"] = np.random.default_rng(0).normal(
                size=shape
            ).astype(np.float32) * 0.1 + (1.0 if "var" in k or k == "weight" else 0.0)

    sd["features.0.0.weight"] = rng.normal(size=(32, 3, 3, 3)).astype(np.float32)
    add_bn("features.0.1", 32)
    inp = 32
    idx = 1
    for t, c, n, s in INVERTED_RESIDUAL_SETTING:
        for i in range(n):
            base = f"features.{idx}.conv"
            hidden = round(inp * t)
            li = 0
            if t != 1:
                sd[f"{base}.{li}.weight"] = rng.normal(
                    size=(hidden, inp, 1, 1)).astype(np.float32)
                add_bn(f"{base}.{li + 1}", hidden)
                li += 3
            sd[f"{base}.{li}.weight"] = rng.normal(
                size=(hidden, 1, 3, 3)).astype(np.float32)
            add_bn(f"{base}.{li + 1}", hidden)
            li += 3
            sd[f"{base}.{li}.weight"] = rng.normal(
                size=(c, hidden, 1, 1)).astype(np.float32)
            add_bn(f"{base}.{li + 1}", c)
            inp = c
            idx += 1

    dec = {}
    dec["cbr.0.weight"] = rng.normal(size=(80, 320, 3, 3)).astype(np.float32)
    for k in ("weight", "bias", "running_mean", "running_var"):
        dec[f"cbr.1.{k}"] = np.ones(80, np.float32)
    dec["cbr_deepsup.0.weight"] = rng.normal(size=(80, 160, 3, 3)).astype(np.float32)
    for k in ("weight", "bias", "running_mean", "running_var"):
        dec[f"cbr_deepsup.1.{k}"] = np.ones(80, np.float32)
    dec["conv_last.weight"] = rng.normal(size=(1, 80, 1, 1)).astype(np.float32)
    dec["conv_last.bias"] = np.zeros(1, np.float32)
    dec["conv_last_deepsup.weight"] = rng.normal(size=(1, 80, 1, 1)).astype(np.float32)
    dec["conv_last_deepsup.bias"] = np.zeros(1, np.float32)

    enc_p, enc_s = convert_encoder(sd)
    dec_p, dec_s = convert_decoder(dec)
    variables = {
        "params": {"encoder": enc_p, "decoder": dec_p},
        "batch_stats": {"encoder": enc_s, "decoder": dec_s},
    }
    net = IntrospectionNet()
    out = net.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 8, 8, 1)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_run_stream_cli(kitti_dir, tmp_path):
    """Streaming driver (the ROS-node analogue): frames tracked as they
    appear in the watch dir; idle timeout flushes trajectories."""
    root, _, settings = kitti_dir
    watch = tmp_path / "live"
    out = tmp_path / "stream_out"
    (watch / "image_0").mkdir(parents=True)
    (watch / "image_1").mkdir()
    import shutil

    for n in sorted(os.listdir(root / "image_0")):
        shutil.copy(root / "image_0" / n, watch / "image_0" / n)
        shutil.copy(root / "image_1" / n, watch / "image_1" / n)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "examples", "run_stream.py"),
            "--watch_dir", str(watch),
            "--settings_path", str(settings),
            "--out_path", str(out),
            "--idle_timeout", "5",
            "--fps", "10",
        ],
        capture_output=True, text=True, env=env, timeout=3000,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    stats = json.loads(res.stdout.strip().splitlines()[-1])
    assert stats["frames"] == 6
    assert (out / "Trajectory_KITTI_000.txt").exists()
    assert (out / "failure_log.txt").exists()
