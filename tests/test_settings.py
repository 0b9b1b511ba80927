"""The shipped settings matrix parses and matches the reference key set.

One YAML per reference Examples settings file (SURVEY.md §2b): KITTI 00-02 /
03 / 04-12, EuRoC stereo (with LEFT./RIGHT. rectification blocks) + mono,
TUM1-3 (RGB-D DepthMapFactor), AirSim stereo + mono, Jackal.
"""

import glob
import os

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from iv_slam_tpu.config import Config, load_reference_yaml, _parse_opencv_yaml

SETTINGS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "settings"
)


def test_settings_matrix_complete():
    names = {os.path.basename(p) for p in glob.glob(f"{SETTINGS}/*.yaml")}
    required = {
        "KITTI00-02.yaml", "KITTI03.yaml", "KITTI04-12.yaml",
        "EuRoC_stereo.yaml", "EuRoC_mono.yaml",
        "TUM1.yaml", "TUM2.yaml", "TUM3.yaml",
        "airsim_stereo.yaml", "airsim_mono.yaml", "jackal_stereo.yaml",
    }
    assert required <= names, required - names


@pytest.mark.parametrize(
    "path", sorted(glob.glob(f"{SETTINGS}/*.yaml")),
    ids=lambda p: os.path.basename(p),
)
def test_settings_load(path):
    cfg = load_reference_yaml(path, Config())
    assert cfg.camera.fx > 0 and cfg.camera.fy > 0
    assert cfg.camera.width > 0 and cfg.camera.height > 0
    assert cfg.orb.n_features > 0 and cfg.orb.n_levels == 8
    assert cfg.orb.max_keypoints >= cfg.orb.n_features


def test_kitti_calibrations():
    c0 = load_reference_yaml(f"{SETTINGS}/KITTI00-02.yaml").camera
    c3 = load_reference_yaml(f"{SETTINGS}/KITTI03.yaml").camera
    c4 = load_reference_yaml(f"{SETTINGS}/KITTI04-12.yaml").camera
    assert (c0.fx, c3.fx, c4.fx) == (718.856, 721.5377, 707.0912)
    for c in (c0, c3, c4):
        assert (c.width, c.height) == (1241, 376)
        assert 0.5 < c.baseline < 0.6  # KITTI stereo rig ~0.54 m


def test_tum_depth_map_factor():
    for n, f in (("TUM1", 5000.0), ("TUM2", 5208.0), ("TUM3", 5000.0)):
        cfg = load_reference_yaml(f"{SETTINGS}/{n}.yaml")
        assert cfg.camera.depth_map_factor == f


def test_euroc_rectification_blocks():
    from iv_slam_tpu.io import rectify

    doc = _parse_opencv_yaml(f"{SETTINGS}/EuRoC_stereo.yaml")
    for side in ("LEFT", "RIGHT"):
        mx, my = rectify.load_rectification_from_yaml(doc, side)
        assert mx.shape == (480, 752) and my.shape == (480, 752)
        assert np.isfinite(mx).all() and np.isfinite(my).all()
    # rectified projection fx must match the settings' Camera.fx
    cfg = load_reference_yaml(f"{SETTINGS}/EuRoC_stereo.yaml")
    P = np.asarray(doc["LEFT.P"]["data"], float).reshape(3, 4)
    assert abs(P[0, 0] - cfg.camera.fx) < 1e-6
