"""Measured-link adaptation (SystemConfig.link_adaptive): the worker's
device programs come in two shape families — chunked (low-RTT: queue
gaps for the tracking thread) and monolithic (high-RTT: minimum host
syncs, each worth a full RTT). The families must be semantically
EQUIVALENT: the link decides latency shape, never the estimate.

The r5 motivation (PERF.md): on a 58 ms-RTT tunnel day the r4 chunked
worker paid ~15 syncs per keyframe event, events crawled, keyframe
backpressure starved DetectLoop, and the loop-closing bench closed 0
loops. The same session at 4 ms RTT wants the chunks.
"""

import numpy as np
import pytest

import synth_world

from iv_slam_tpu.config import Config, CameraConfig, ORBConfig
from iv_slam_tpu.utils import linkprobe

H, W = 240, 320


def _cfg(rtt_ms):
    cfg = Config()
    cfg.camera = CameraConfig(fx=400., fy=400., cx=160., cy=120., bf=200.,
                              width=W, height=H, th_depth=35., fps=10.)
    cfg.orb = ORBConfig(n_features=800, n_levels=8)
    cfg.system.fused_tracking = True
    cfg.system.threaded_local_mapping = True
    cfg.system.async_local_ba = True
    cfg.system.chained_tracking = True
    cfg.system.link_rtt_ms = rtt_ms  # pin the probe
    return cfg


def test_link_profile_selection(monkeypatch):
    """High measured RTT selects the monolithic family; low keeps the
    chunked family; explicit IVT_* env overrides win either way."""
    from iv_slam_tpu.slam.local_mapping import LocalMapping

    lm = LocalMapping(_cfg(None), None)
    assert lm.fuse_chunk == LocalMapping.FUSE_CHUNK
    lm.set_link_profile(high_rtt=True)
    assert lm.monolithic_device and lm.fuse_chunk == 64 \
        and lm.tri_chunk == 16
    lm.set_link_profile(high_rtt=False)
    assert not lm.monolithic_device \
        and lm.fuse_chunk == LocalMapping.FUSE_CHUNK \
        and lm.tri_chunk == LocalMapping.TRI_CHUNK

    monkeypatch.setenv("IVT_FUSE_CHUNK", "32")
    lm.set_link_profile(high_rtt=True)
    assert lm.fuse_chunk == LocalMapping.FUSE_CHUNK  # env pins the attr
    assert lm.tri_chunk == 16 and lm.monolithic_device


def test_probe_pinning():
    linkprobe.set_rtt_ms(99.0)
    try:
        assert linkprobe.probe_rtt_ms() == 99.0
    finally:
        linkprobe.set_rtt_ms(None)
    # a real probe on the CPU backend measures sub-threshold
    assert linkprobe.probe_rtt_ms(force=True) < 12.0


@pytest.mark.slow
def test_profiles_estimate_identically():
    """Chunked and monolithic families over the same sequence yield the
    same trajectory — the link profile changes dispatch granularity,
    not math."""
    from iv_slam_tpu.slam.system import System

    rng = np.random.default_rng(7)
    world, frames, gt = synth_world.make_sequence(rng, n_frames=25,
                                                  step=0.12)

    def run(rtt):
        sys_ = System(_cfg(rtt), H, W)
        lm = sys_.tracking.local_mapping
        for i, (l, r) in enumerate(frames):
            sys_.track_stereo(l, r, timestamp=i * 0.1)
        est = sys_.trajectory_twc()
        mono = lm.monolithic_device
        fails = sys_.failure_count
        sys_.shutdown()
        return np.stack([T[:3, 3] for T in est]), mono, fails

    t_chunk, mono_c, f_c = run(0.0)
    t_mono, mono_m, f_m = run(100.0)
    assert not mono_c and mono_m
    assert f_c == 0 and f_m == 0
    assert len(t_chunk) == len(t_mono)
    np.testing.assert_allclose(t_chunk, t_mono, atol=1e-3)
