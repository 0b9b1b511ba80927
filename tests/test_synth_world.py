"""The synthetic worlds the benches/e2e tests stand on (synth_world.py).

Pin the bench-critical invariants: DistinctTerrainWorld (the loop-closing
bench world, bench.py _lc_world) must exist, render, and carry real 3D
structure — the r5 LC-accuracy finding was that a nadir single-plane world
makes every candidate Sim3 coplanar-degenerate, so the bench world's
non-planarity IS the regression being guarded. (r5 also caught bench.py
referencing this class before it existed: the whole LC triplet crashed.)
"""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

import synth_world


def _bench_world_pose(i, n=240):
    s = i / n
    ang = 2.9 * np.pi * s
    t = np.array([6 * np.sin(ang), 6 * (1 - np.cos(ang)), 0.0], np.float32)
    return synth_world.camera_pose(t, height=10.0, yaw=ang)


def test_distinct_terrain_world_renders_3d():
    rng = np.random.default_rng(3)
    w = synth_world.DistinctTerrainWorld(
        rng, tex_size=1024, res=60.0, fx=400.0, fy=400.0, cx=160.0,
        cy=120.0, w=320, h=240, baseline=0.5,
    )
    for i in (0, 60, 120):
        Twc = _bench_world_pose(i)
        left, right = w.render_stereo(Twc)
        assert left.shape == (240, 320) and left.dtype == np.uint8
        assert left.std() > 10.0  # textured, not flat
        d = w.render_depth(Twc)
        # 3D structure: platforms well above the ground plane must cover
        # a meaningful share of the view (the anti-coplanarity guarantee)
        frac_elevated = float((d < 0.9 * d.max()).mean())
        assert 0.05 < frac_elevated < 0.95, frac_elevated
        assert d.max() - d.min() > 1.0


def test_terrain_depth_consistent_with_stereo_disparity():
    rng = np.random.default_rng(3)
    w = synth_world.DistinctTerrainWorld(
        rng, tex_size=1024, res=60.0, fx=400.0, fy=400.0, cx=160.0,
        cy=120.0, w=320, h=240, baseline=0.5,
    )
    Twc = _bench_world_pose(30)
    left, right = w.render_stereo(Twc)
    d = w.render_depth(Twc)
    # sample a few textured pixels; SAD-match along the epipolar line and
    # compare measured disparity to bf/z
    bf = w.bf
    rng2 = np.random.default_rng(0)
    checked = 0
    for _ in range(200):
        y = int(rng2.integers(20, 220))
        x = int(rng2.integers(80, 300))
        patch = left[y - 4:y + 5, x - 4:x + 5].astype(np.float32)
        if patch.std() < 12:  # need texture for an unambiguous match
            continue
        best, best_dx = 1e18, -1
        for dx in range(0, 70):
            if x - 4 - dx < 0:
                break
            cand = right[y - 4:y + 5, x - 4 - dx:x + 5 - dx].astype(
                np.float32)
            s = float(np.abs(patch - cand).sum())
            if s < best:
                best, best_dx = s, dx
        expect = bf / d[y, x]
        if abs(best_dx - expect) <= 1.5:
            checked += 1
    assert checked >= 20, checked
