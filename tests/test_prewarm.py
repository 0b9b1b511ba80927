"""Compile prewarming + tied-rung shape policy (slam/prewarm.py,
solvers/local_ba.py LBA_RUNGS).

The remote-compile link makes every new program shape cost seconds, so the
hot programs run at a bounded rung ladder that a background thread compiles
at startup. These tests pin (a) the prewarm walk completing without error
and actually matching the live call signatures, and (b) the window-trimming
policy that keeps oversized local-BA windows on the largest rung.
"""

import numpy as np

from iv_slam_tpu.config import Config, CameraConfig, ORBConfig
from iv_slam_tpu.slam.prewarm import prewarm_async
from iv_slam_tpu.slam.tracking import Tracking
from iv_slam_tpu.solvers.local_ba import LBA_RUNGS, _lba_rung, _trim_window


def test_prewarm_walk_completes():
    cfg = Config()
    cfg.camera = CameraConfig(
        fx=400.0, fy=400.0, cx=160.0, cy=120.0, bf=200.0,
        width=320, height=240, th_depth=35.0, fps=10.0,
    )
    cfg.orb = ORBConfig(n_features=800, n_levels=4)
    cfg.system.fused_tracking = True
    tr = Tracking(cfg, 240, 320)
    t = prewarm_async(
        tr,
        live_rungs=[1024],
        fuse_shapes=[(16, 1024)],
        ba_rungs=[LBA_RUNGS[0]],
    )
    t.join(timeout=900)
    assert not t.is_alive()
    assert t.exc is None, t.exc
    # the shared tracker instance was installed for the tracking loop
    assert hasattr(tr, "_fused") and hasattr(tr, "_dmap")


def test_lba_rung_selection():
    assert _lba_rung(5, 500, 900) == LBA_RUNGS[0]
    assert _lba_rung(40, 500, 900) == LBA_RUNGS[1]      # kf overflow
    assert _lba_rung(5, 9000, 900) == LBA_RUNGS[2]      # pt overflow
    # beyond every rung: stays on the last one (caller trims)
    assert _lba_rung(200, 50000, 90000) == LBA_RUNGS[-1]


class _FakeFrame:
    def __init__(self, pids):
        self.map_pt = np.asarray(pids, np.int64)


class _FakeMap:
    """Just enough MapStore surface for _trim_window."""

    def __init__(self, n_kf, pts_per_kf):
        self.kf_frames = {
            k: _FakeFrame(rngs) for k, rngs in enumerate(pts_per_kf)
        }
        self._obs = {}
        for k, pids in enumerate(pts_per_kf):
            for p in pids:
                self._obs.setdefault(int(p), set()).add(k)

    def n_observations(self, pid):
        return len(self._obs.get(int(pid), ()))


def test_trim_window_caps_oversized_windows():
    max_kf, max_pt, _ = LBA_RUNGS[-1]
    n_kf = max_kf + 40
    rng = np.random.default_rng(0)
    # 120 points per keyframe drawn from a pool 2x the point cap
    pool = max_pt * 2
    pts_per_kf = [rng.choice(pool, 120, replace=False) for _ in range(n_kf)]
    m = _FakeMap(n_kf, pts_per_kf)
    local = list(range(40))                      # fits (below cap - 8)
    fixed = list(range(40, n_kf))                # overflows the kf budget
    pts = sorted({int(p) for row in pts_per_kf for p in row})

    tl, tf, tp = _trim_window(m, local, fixed, pts)
    assert tl == local                            # local window untouched
    assert len(tl) + len(tf) <= max_kf
    assert len(tp) <= max_pt
    # kept fixed keyframes anchor at least as many window points as any
    # dropped one (ranked by anchored-point count vs the pre-trim window,
    # exactly as _trim_window scores them)
    window = set(pts)

    def score(k):
        return sum(1 for p in m.kf_frames[k].map_pt if int(p) in window)

    if tf and len(tf) < len(fixed):
        dropped = [k for k in fixed if k not in set(tf)]
        assert min(score(k) for k in tf) >= max(score(k) for k in dropped)


def test_trim_window_noop_when_small():
    m = _FakeMap(4, [np.arange(10) for _ in range(4)])
    local, fixed, pts = [0, 1], [2, 3], list(range(10))
    assert _trim_window(m, local, fixed, pts) == (local, fixed, pts)
