"""Async stereo prefetcher (native C++ loader + Python fallback).

The native path is iv_slam_tpu/native/src/ivslam_io.cpp (the reference's
per-frame cv::imread + cv::remap, stereo_kitti.cc:444-468, moved off the
tracking thread); both paths must yield the same arrays as direct loads.
"""

import numpy as np
import pytest

from iv_slam_tpu.io import prefetch, rectify
from iv_slam_tpu.io.datasets import load_gray


@pytest.fixture(scope="module")
def png_seq(tmp_path_factory):
    import imageio.v3 as iio

    root = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(3)
    lp, rp = [], []
    for i in range(6):
        l = rng.integers(0, 255, (48, 64), np.uint8)
        r = rng.integers(0, 255, (48, 64), np.uint8)
        iio.imwrite(root / f"l{i}.png", l)
        iio.imwrite(root / f"r{i}.png", r)
        lp.append(str(root / f"l{i}.png"))
        rp.append(str(root / f"r{i}.png"))
    return lp, rp


@pytest.mark.parametrize("use_native", [False, True])
def test_prefetch_matches_direct(png_seq, use_native):
    if use_native and not prefetch.native_available():
        pytest.skip("_ivslam_io not built")
    lp, rp = png_seq
    pf = prefetch.StereoPrefetcher(lp, rp, prefetch=3, threads=2,
                                   use_native=use_native)
    assert len(pf) == 6
    for i in range(6):
        l, r = pf.next()
        np.testing.assert_array_equal(l, load_gray(lp[i]))
        np.testing.assert_array_equal(r, load_gray(rp[i]))
    with pytest.raises(StopIteration):
        pf.next()
    pf.close()


@pytest.mark.parametrize("use_native", [False, True])
def test_prefetch_rectified(png_seq, use_native):
    if use_native and not prefetch.native_available():
        pytest.skip("_ivslam_io not built")
    cv2 = pytest.importorskip("cv2")
    lp, rp = png_seq
    # a mild real rectification (small rotation + distortion)
    K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])
    D = np.array([-0.1, 0.02, 0.0, 0.0, 0.0])
    c, s = np.cos(0.01), np.sin(0.01)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    P = np.hstack([K, np.zeros((3, 1))])
    maps = rectify.rectification_maps(K, D, R, P, 64, 48)
    pf = prefetch.StereoPrefetcher(lp, rp, rect_maps=(maps, None),
                                   use_native=use_native)
    for i in range(3):
        l, r = pf.next()
        exp_l = cv2.remap(load_gray(lp[i]), maps[0], maps[1],
                          cv2.INTER_LINEAR)
        if use_native:
            # system C++ OpenCV (4.6) and Python cv2 (5.0) quantize
            # bilinear weights differently: allow a few grey levels
            diff = np.abs(l.astype(int) - exp_l.astype(int))
            assert diff.max() <= 8 and (diff > 2).mean() < 0.05
        else:
            np.testing.assert_array_equal(l, exp_l)
        np.testing.assert_array_equal(r, load_gray(rp[i]))
    pf.close()


@pytest.mark.parametrize("use_native", [False, True])
def test_prefetch_right_modes(png_seq, tmp_path, use_native):
    """mono (right skipped) and RGB-D (16-bit depth PNG) modes."""
    if use_native and not prefetch.native_available():
        pytest.skip("_ivslam_io not built")
    import imageio.v3 as iio

    lp, rp = png_seq
    pf = prefetch.StereoPrefetcher(lp[:2], lp[:2], right_mode="skip",
                                   use_native=use_native)
    l, r = pf.next()
    np.testing.assert_array_equal(l, load_gray(lp[0]))
    assert r is None
    pf.close()

    depth = (np.arange(48 * 64, dtype=np.uint16) * 7 % 40000).reshape(48, 64)
    dpath = tmp_path / f"depth16_{use_native}.png"
    iio.imwrite(dpath, depth)
    pf = prefetch.StereoPrefetcher([lp[0]], [str(dpath)],
                                   right_mode="unchanged",
                                   use_native=use_native)
    l, d = pf.next()
    assert d.dtype == np.uint16
    np.testing.assert_array_equal(d, depth)
    pf.close()


def test_prefetch_missing_file_yields_none(png_seq, tmp_path):
    if not prefetch.native_available():
        pytest.skip("_ivslam_io not built")
    lp, rp = png_seq
    pf = prefetch.StereoPrefetcher([lp[0], str(tmp_path / "nope.png")],
                                   rp[:2], use_native=True)
    l, r = pf.next()
    assert l is not None and r is not None
    l, r = pf.next()  # undecodable left -> None, like cv::imread empty
    assert l is None and r is not None
    pf.close()
