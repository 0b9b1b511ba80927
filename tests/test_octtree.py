"""Quadtree keypoint distribution (ops/octtree.py) — the reference's
ComputeKeyPointsOctTree/DistributeOctTree path (ORBextractor.cc:545-878)."""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from iv_slam_tpu.config import ORBConfig
from iv_slam_tpu.ops import fast, octtree
from iv_slam_tpu.ops.extractor import OrbExtractor


def test_distribute_retains_all_when_budget_large():
    rng = np.random.default_rng(0)
    xs = rng.integers(0, 300, 12).astype(np.int32)
    ys = rng.integers(0, 100, 12).astype(np.int32)
    # ensure unique cells so no two points ever share a final node
    xs = np.unique(xs)[:8]
    ys = ys[: xs.size]
    rs = rng.uniform(1, 50, xs.size).astype(np.float32)
    keep = octtree.distribute_octtree(xs, ys, rs, 0, 300, 0, 100, 50)
    assert sorted(keep.tolist()) == list(range(xs.size))


def test_distribute_budget_one_divides_once_then_stops():
    # square region -> one initial node. The reference runs a FULL division
    # pass before checking size>=N (ORBextractor.cc:600-676), so even N=1
    # yields one point per non-empty child quadrant: here the two occupied
    # quadrants' maxima (idx 3 in n1, idx 1 in n4).
    xs = np.array([10, 50, 90, 30], dtype=np.int32)
    ys = np.array([20, 60, 80, 40], dtype=np.int32)
    rs = np.array([5.0, 9.0, 3.0, 7.0], dtype=np.float32)
    keep = octtree.distribute_octtree(xs, ys, rs, 0, 100, 0, 100, 1)
    assert sorted(keep.tolist()) == [1, 3]


def test_distribute_spatial_coverage():
    # four clusters in the four quadrants of a square; budget 4 must pick
    # the max-response point of each cluster (quadtree spatial NMS)
    rng = np.random.default_rng(1)
    centers = [(25, 25), (75, 25), (25, 75), (75, 75)]
    xs, ys, rs, expect = [], [], [], []
    for k, (cx, cy) in enumerate(centers):
        px = cx + rng.integers(-5, 6, 10)
        py = cy + rng.integers(-5, 6, 10)
        pr = rng.uniform(1, 10, 10).astype(np.float32)
        pr[3] = 100.0 + k  # known cluster max
        expect.append(len(xs) * 10 + 3)
        xs.extend(px), ys.extend(py), rs.extend(pr)
    xs = np.asarray(xs, np.int32)
    ys = np.asarray(ys, np.int32)
    rs = np.asarray(rs, np.float32)
    keep = octtree.distribute_octtree(xs, ys, rs, 0, 100, 0, 100, 4)
    assert sorted(rs[keep].tolist()) == [100.0, 101.0, 102.0, 103.0]


def test_distribute_overshoot_bounded():
    # dense grid, tight budget: controlled expansion stops within +2 of N
    g = np.arange(0, 200, 5)
    xs, ys = np.meshgrid(g, g)
    xs, ys = xs.ravel().astype(np.int32), ys.ravel().astype(np.int32)
    rs = np.arange(xs.size, dtype=np.float32)
    for n in (10, 37, 100):
        keep = octtree.distribute_octtree(xs, ys, rs, 0, 200, 0, 200, n)
        assert n <= keep.size <= n + 2
        assert np.unique(keep).size == keep.size


def _peak_score_map(h, w, peaks):
    """Isolated single-pixel peaks -> a valid 'fast_score' style map."""
    s = np.zeros((h, w), dtype=np.int16)
    for (y, x, v) in peaks:
        s[y, x] = v
    return s


def test_compute_keypoints_octtree_finds_isolated_peaks():
    h, w = 120, 160
    peaks = [(30, 40, 25), (30, 120, 30), (80, 40, 9), (80, 120, 40)]
    s = _peak_score_map(h, w, peaks)
    y, x, r = octtree.compute_keypoints_octtree(s, ini_th=12, n_desired=50)
    got = {(yy, xx, rr) for yy, xx, rr in zip(y.tolist(), x.tolist(), r.tolist())}
    # the (80,40) peak scores 9 < iniTh 12, but its cell has no iniTh corner,
    # so the minTh fallback (empty-cell rule, ORBextractor.cc:818-823) finds it
    assert got == {(30, 40, 25.0), (30, 120, 30.0), (80, 40, 9.0), (80, 120, 40.0)}


def test_compute_keypoints_octtree_nms_within_cell():
    # two adjacent pixels: the weaker is suppressed by local 3x3 NMS
    s = _peak_score_map(100, 100, [(50, 50, 20), (50, 51, 30)])
    y, x, r = octtree.compute_keypoints_octtree(s, ini_th=12, n_desired=10)
    assert list(zip(y.tolist(), x.tolist())) == [(50, 51)]


def test_extract_octtree_end_to_end():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 60, (240, 320)).astype(np.uint8)
    # plant strong corners
    for _ in range(120):
        yy, xx = rng.integers(25, 210), rng.integers(25, 290)
        img[yy:yy + 4, xx:xx + 4] = 255
    cfg = ORBConfig(n_features=300, n_levels=4, ini_th_fast=20, min_th_fast=7)
    ex = OrbExtractor(cfg, 240, 320)
    kps = ex.extract_octtree(img)
    valid = np.asarray(kps.valid)
    assert valid.sum() > 30
    assert kps.desc.shape == (ex.capacity, 32)
    ang = np.asarray(kps.angle)[valid]
    assert np.isfinite(ang).all() and (ang >= 0).all() and (ang < 360).all()
    # every valid level-0 keypoint is a genuine FAST corner at minTh
    s0 = np.asarray(fast.fast_score(img, cfg.min_th_fast))
    lvl0 = valid & (np.asarray(kps.octave) == 0)
    yx = np.asarray(kps.yx_level)[lvl0]
    assert (s0[yx[:, 0], yx[:, 1]] > 0).all()
    # octave-0 responses match the score map
    assert np.allclose(np.asarray(kps.response)[lvl0], s0[yx[:, 0], yx[:, 1]])
