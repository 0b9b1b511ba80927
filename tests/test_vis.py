"""Debug-visualization suite (FeatureEvaluator::SaveImagesToFile,
feature_evaluator.cpp:1057-1185)."""

import os

import numpy as np
import pytest

from iv_slam_tpu.introspection import vis


@pytest.fixture
def img():
    return np.random.default_rng(5).integers(0, 255, (120, 160), np.uint8)


def test_overlay_heatmap(img):
    cv2 = pytest.importorskip("cv2")
    hm = np.zeros((120, 160), np.uint8)
    hm[40:60, 40:80] = 255
    out = vis.overlay_heatmap_on_image(img, hm, good=True)
    assert out.shape == (120, 160, 3)
    # 50/50 addWeighted of a JET-colormapped heatmap (fe.cpp:3209):
    # the hot region must be redder than the cold region
    hot = out[45:55, 50:70].astype(int)
    cold = out[5:15, 5:25].astype(int)
    assert hot[..., 2].mean() > cold[..., 2].mean()
    # the good-for-training dot is green (clipped inside the frame)
    dot = out[0:40, 100:160]
    g = (dot[..., 1].astype(int) - dot[..., 2]).max()
    assert g > 100
    bad = vis.overlay_heatmap_on_image(img, hm, good=False)
    dot = bad[0:40, 100:160]
    assert (dot[..., 2].astype(int) - dot[..., 1]).max() > 100


def test_overlay_heatmap_masked(img):
    pytest.importorskip("cv2")
    hm = np.full((120, 160), 200, np.uint8)
    mask = np.zeros((120, 160), np.uint8)
    mask[:, :80] = 1
    out = vis.overlay_heatmap_on_image(img, hm, mask=mask)
    assert out[:, 80:].max() == 0 and out[:, :80].max() > 0


def test_error_vec_drawings(img):
    pytest.importorskip("cv2")
    kp = np.array([[30.0, 30.0], [100.0, 80.0]])
    feet = np.array([[40.0, 35.0], [90.0, 70.0]])
    errs = np.array([2.0, -1.0])  # second invalid -> not drawn
    out = vis.draw_epipolar_err_vec(img, kp, feet, errs, bad_percent=12.5)
    assert out.shape == (120, 160, 3)
    # red keypoint circle and green foot circle for the valid entry (the
    # blue arrow overdraws the centers, so scan the circle neighborhoods)
    kp_region = out[25:36, 25:36].reshape(-1, 3)
    assert ((kp_region == [0, 0, 255]).all(axis=1)).any()
    foot_region = out[30:41, 35:46].reshape(-1, 3)
    assert ((foot_region == [0, 255, 0]).all(axis=1)).any()
    # invalid entry untouched (still grayscale there)
    assert out[80, 100, 0] == out[80, 100, 1] == out[80, 100, 2]

    reproj = np.array([[50.0, 50.0], [10.0, 10.0]])
    errs = np.array([9.0, 0.5])
    out = vis.draw_reprojection_err_vec(img, reproj, kp, errs, thresh=5.0)
    # bad keypoint drawn: red projection circle near (50, 50)
    proj_region = out[46:55, 46:55].reshape(-1, 3)
    assert ((proj_region == [0, 0, 255]).all(axis=1)).any()
    assert out[10, 10, 0] == out[10, 10, 1] == out[10, 10, 2]  # below thresh


def test_visualizer_save_frame(tmp_path, img):
    pytest.importorskip("cv2")
    v = vis.FeatureEvalVisualizer(str(tmp_path))
    hm = np.zeros((120, 160), np.uint8)
    result = dict(
        heatmap=hm, good=True, bad_percent=7.0,
        mask=np.ones((120, 160), np.uint8),
        vis_keypoints=np.array([[30.0, 30.0]]),
        vis_feet=np.array([[40.0, 30.0]]),
        vis_errs=np.array([1.5]),
        vis_reproj=np.array([[35.0, 30.0]]),
        vis_thresh=1.0,
    )
    v.save_frame(img, "000042.png", result)
    for d in ("bad_region_heatmap_vis", "bad_region_heatmap_masked_vis",
              "epipolar_err_vec", "reprojection_err_vec"):
        assert os.path.exists(tmp_path / d / "000042.jpg"), d
