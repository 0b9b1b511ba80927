"""Configuration tree for iv_slam_tpu.

One dataclass tree replaces the reference's three-tier config (gflags +
cv::FileStorage YAML + yacs; see SURVEY.md §2f). The YAML loader accepts the
reference's exact key names (``Camera.fx``, ``ORBextractor.nFeatures``, ...,
parsed by the reference at Tracking.cc:100-259) so existing settings files
(e.g. Examples/Stereo/KITTI00-02.yaml) work unchanged.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class CameraConfig:
    """Pinhole camera + stereo parameters (YAML ``Camera.*``)."""

    fx: float = 718.856
    fy: float = 718.856
    cx: float = 607.1928
    cy: float = 185.2157
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    bf: float = 386.1448  # baseline * fx  (YAML Camera.bf)
    fps: float = 10.0
    rgb: bool = True
    width: int = 1241
    height: int = 376
    th_depth: float = 35.0  # YAML ThDepth: close/far stereo point threshold
    # YAML DepthMapFactor: RGB-D depth-image scaling (Tracking.cc parse;
    # TUM PNGs store depth * 5000). The driver divides depth by this.
    depth_map_factor: float = 1.0

    @property
    def baseline(self) -> float:
        return self.bf / self.fx

    @property
    def depth_threshold(self) -> float:
        """Close/far stereo threshold in meters: mThDepth = mbf * ThDepth / fx
        (Tracking.cc YAML parse) — the YAML value is in units of baseline."""
        return self.baseline * self.th_depth

    def K(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=np.float32,
        )


@dataclass
class ORBConfig:
    """ORB extraction parameters (YAML ``ORBextractor.*``).

    Reference defaults: jackal_visual_odom_stereo_inference.yaml; semantics at
    ORBextractor.cc:411-478 (scale pyramid + per-level feature budgets).
    """

    n_features: int = 2000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: int = 12  # reference KITTI yaml uses 20; jackal uses 12
    min_th_fast: int = 7
    enable_introspection: bool = False
    # Static keypoint capacity per image for padded device arrays. Must be
    # >= n_features; data-dependent counts are handled by masking.
    max_keypoints: int = 2048
    # BRIEF lookup formulation, all bit-identical (ops/brief.py):
    # "flat" = one (N, 512) gather from the level image;
    # "onehot" = patch rows + one-hot MXU matmuls (fewer gather elements).
    # Measured on the dev v5e: onehot 81.1 ms/frame vs flat 97.1 (same
    # tunneled-link conditions, identical descriptors).
    desc_path: str = "onehot"
    # Finishing stage (orientation + BRIEF over the pyramid canvas):
    # "pallas" = fused VMEM kernel on TPU (ops/finish_pallas.py; XLA
    # elsewhere); "xla" = prefix-sum orientation + desc_path BRIEF always.
    finish_path: str = "pallas"
    # Stereo SAD sub-pixel stage: "pallas" = VMEM window kernel on TPU
    # (ops/stereo_pallas.py; the XLA path's vmapped dynamic slices lower
    # to two sequential 2000-iteration loops, ~3.5 ms/frame on v5e);
    # "xla" = dynamic-slice formulation always. Bit-identical.
    sad_path: str = "pallas"
    # Keypoint selection (per-cell retain-best + per-level retain-best):
    # "hist" = integer-score threshold search (binary search on counts) +
    # one small ordering sort — exact same keypoints/order as "topk"
    # (FAST scores are integers; tie-break reproduced; fuzz-asserted in
    # tests/test_extractor.py). "topk" = lax.top_k per cell + per level,
    # which lowers to large sorts (~6 ms/frame of the fused frontend on
    # v5e — the single hottest op). Quality-weighted extraction always
    # uses the top_k path (responses are floats there).
    select_path: str = "hist"

    def scale_factors(self) -> np.ndarray:
        """Per-level scale factors [1, s, s^2, ...] (ORBextractor.cc:417-426)."""
        return self.scale_factor ** np.arange(self.n_levels, dtype=np.float32)

    def level_sigma2(self) -> np.ndarray:
        return self.scale_factors() ** 2

    def features_per_level(self) -> np.ndarray:
        """Geometric split of the feature budget (ORBextractor.cc:438-452)."""
        factor = 1.0 / self.scale_factor
        ndesired = (
            self.n_features
            * (1.0 - factor)
            / (1.0 - factor ** self.n_levels)
        )
        per_level = np.zeros(self.n_levels, dtype=np.int32)
        total = 0
        for lvl in range(self.n_levels - 1):
            per_level[lvl] = int(round(ndesired))
            total += per_level[lvl]
            ndesired *= factor
        per_level[self.n_levels - 1] = max(self.n_features - total, 0)
        return per_level


@dataclass
class MatcherConfig:
    """ORB matcher thresholds (ORBmatcher.cc:37-39 + YAML ``ORBMatcher.*``)."""

    th_high: int = 100
    th_low: int = 50
    histo_length: int = 30
    nn_ratio_multiplier: float = 0.95  # YAML ORBMatcher.NNRatioMultiplier
    search_window_multiplier: float = 1.2  # YAML ORBMatcher.SearchWindowMultiplier


@dataclass
class IVConfig:
    """Introspection settings (gflags + YAML ``IVSLAM.*``; SURVEY.md §2f)."""

    enabled: bool = False
    inference_mode: bool = False
    unsupervised_learning: bool = False
    create_dataset: bool = False
    # TrainingMode enum (feature_evaluator.h:68-78, default .h:404);
    # keys of introspection.feature_evaluator.TRAINING_MODES
    training_mode: str = "ref_kf_epipolar_normalized"
    # gflag defaults (Tracking.cc:44-64, Frame.cc:29-33, MapPoint.cc:26,
    # Optimizer.cc:40-49)
    tracking_ba_rate: int = 1
    ref_pose_ang_var_inv: float = 2.0e3
    ref_pose_trans_var_inv: float = 2.0e2
    keypt_qual_chi2_prob_thresh: float = 0.99
    propagate_keyptqual: bool = False
    optimizer_run_extra_iter: bool = True
    optimizer_pose_opt_iter_count: int = 4
    # local-BA variant (LocalMapping.cc:145-163: standard is the active
    # default; "vis" adds the map-point quality update, "constrained" is
    # GT-pinned guided BA for training-data labeling)
    ba_mode: str = "standard"  # standard | vis | constrained


@dataclass
class GPConfig:
    """Gaussian-process heatmap parameters (feature_evaluator.h:390-393,
    feature_evaluator.cpp:1919-1976)."""

    sigma_f: float = 80.0
    length_scale: float = 100.0
    sigma_n: float = 20.0
    bin_stride: int = 20
    bin_size: int = 40
    max_train_points: int = 512  # static cap for the N^3 Cholesky solve


@dataclass
class ViewerConfig:
    enabled: bool = False
    headless: bool = True
    save_frames_to_file: bool = False
    save_map_drawings_to_file: bool = False


@dataclass
class SystemConfig:
    """Top-level runtime switches (stereo_kitti.cc:54-126 flag set)."""

    sensor: str = "stereo"  # stereo | mono | rgbd
    single_threaded: bool = True
    use_bow: bool = False
    enable_loop_closing: bool = False
    gt_pose_available: bool = False
    silent: bool = False
    # single-dispatch fused tracking (slam/fused_track.py): one device
    # program per frame against the device-resident map mirror
    fused_tracking: bool = False
    # post-loop-closure global BA as a deferred device program merged at
    # the next keyframe event (the reference's GBA thread + spanning-tree
    # merge-back, LoopClosing.cc:584,620-745); False = blocking inline
    async_gba: bool = True
    # background-compile the fused-tracking/keyframe-event program ladder
    # at startup (slam/prewarm.py) so map growth never pays a remote
    # compile on the tracking path; needs fused_tracking
    prewarm: bool = False
    # async local BA: dispatch Optimizer::LocalBundleAdjustment without
    # blocking and merge when the device result is ready — the reference's
    # THREADED LocalMapping semantics (LocalMapping.cc runs on its own
    # thread; tracking never waits). False = single-threaded LoopOnce
    # semantics (run_single_threaded=true), BA applied inline.
    async_local_ba: bool = False
    # run the WHOLE keyframe event (triangulation, fusion, local BA,
    # culling, loop closing) on a background worker thread — the
    # reference's actual LocalMapping/LoopClosing thread architecture
    # (System.cc:172-197). Tracking keeps estimating against the
    # device-map mirror while the event's device programs and host
    # bookkeeping run off the critical path; map access is serialized
    # by MapStore.lock (the reference's mMutexMapUpdate). Implies
    # async_local_ba semantics for the BA stage.
    threaded_local_mapping: bool = False
    # speculative one-frame pipelining of the fused tracking step: frame
    # n+1's device program is dispatched from frame n's DEVICE results
    # (pose chain + assignments stay on device) before frame n's host
    # bookkeeping runs, so the device compute + host-link round-trip
    # leave the critical path. Consumption validates the speculation
    # (MapStore.poses_ver unchanged, previous frame accepted, and the
    # mirror-content version stamped at dispatch unchanged — so a worker
    # keyframe event or point cull between dispatch and consumption
    # always forces a fresh dispatch, including in
    # threaded_local_mapping mode) — semantics match the unchained fused
    # path except that a no-op pose re-anchor is skipped when nothing
    # moved. Needs fused_tracking; stereo only.
    chained_tracking: bool = False
    # speculation depth for chained tracking: how many frames of fused
    # device work may be in flight ahead of host consumption. 1 = the
    # round-3 one-frame pipeline. 2 hides the result-pull link RTT
    # (~25 ms on the dev tunnel) behind a second in-flight frame — host
    # state then lags two frames, and an invalidating event (keyframe,
    # merge) re-speculates the whole queue from host state (depth extra
    # dispatches instead of one). Semantics stay exactly equal to the
    # unchained fused path (validated in tests/test_chained_tracking.py).
    chain_depth: int = 1
    # measured-link adaptation. The worker's device programs come in two
    # shape families: CHUNKED (r4 — <=16-target fuse tiles, 8-neighbor
    # triangulation, 5-segment local BA with a host sync between
    # dispatches) opens device-queue gaps so tracking's chained steps
    # never wait behind a worker monolith — the right trade when a host
    # sync is ~free (locally attached chip, CPU backend, 4 ms tunnel
    # days); MONOLITHIC (r3 — one dispatch per stage) minimizes host
    # syncs — the right trade when every sync costs a full RTT (58 ms
    # measured on a bad tunnel day, where chunking starves keyframe
    # cadence and with it loop detection; PERF.md r5). When
    # link_adaptive is on, System probes the RTT once at startup
    # (utils/linkprobe.py) and picks the family by
    # link_rtt_threshold_ms; set link_rtt_ms to pin the decision.
    link_adaptive: bool = True
    link_rtt_ms: Optional[float] = None
    # 40 ms, bracketed by measurement on the KITTI-geometry full loop:
    # at 29-30 ms RTT the CHUNKED family sustains 22.97 fps with healthy
    # keyframe cadence (BENCH_r04, probe 29.3 ms), while the monolithic
    # family's fatter worker dispatches keep the queue >= 3 deep, the
    # busy-mapper gate thins keyframes to ~1/12 frames, and tracking
    # LOSES at frame ~61 (r5, reproduced twice at ~30 ms); at 58 ms it
    # is chunking that starves (15 syncs/event ~ 1 s walls, PERF.md r5).
    # The prior 12 ms threshold picked monolithic on ordinary ~30 ms
    # days and regressed the headline bench.
    link_rtt_threshold_ms: float = 40.0


@dataclass
class Config:
    camera: CameraConfig = field(default_factory=CameraConfig)
    orb: ORBConfig = field(default_factory=ORBConfig)
    matcher: MatcherConfig = field(default_factory=MatcherConfig)
    iv: IVConfig = field(default_factory=IVConfig)
    gp: GPConfig = field(default_factory=GPConfig)
    viewer: ViewerConfig = field(default_factory=ViewerConfig)
    system: SystemConfig = field(default_factory=SystemConfig)


# --- Reference-YAML loader -------------------------------------------------

_YAML_CAMERA_KEYS = {
    "Camera.fx": "fx",
    "Camera.fy": "fy",
    "Camera.cx": "cx",
    "Camera.cy": "cy",
    "Camera.k1": "k1",
    "Camera.k2": "k2",
    "Camera.k3": "k3",
    "Camera.p1": "p1",
    "Camera.p2": "p2",
    "Camera.bf": "bf",
    "Camera.fps": "fps",
    "Camera.width": "width",
    "Camera.height": "height",
    "ThDepth": "th_depth",
    "DepthMapFactor": "depth_map_factor",
}

_YAML_ORB_KEYS = {
    "ORBextractor.nFeatures": "n_features",
    "ORBextractor.scaleFactor": "scale_factor",
    "ORBextractor.nLevels": "n_levels",
    "ORBextractor.iniThFAST": "ini_th_fast",
    "ORBextractor.minThFAST": "min_th_fast",
    "ORBextractor.enableIntrospection": "enable_introspection",
}

_YAML_MATCHER_KEYS = {
    "ORBMatcher.NNRatioMultiplier": "nn_ratio_multiplier",
    "ORBMatcher.SearchWindowMultiplier": "search_window_multiplier",
}


def _parse_opencv_yaml(path: str) -> dict:
    """Parse an OpenCV FileStorage YAML into a flat {key: scalar} dict.

    cv::FileStorage YAML ("%YAML:1.0") is not valid PyYAML; strip the
    directive and any !!opencv-matrix tags, then flatten one level.
    """
    import yaml

    with open(path) as f:
        text = f.read()
    lines = []
    for ln in text.splitlines():
        if ln.startswith("%YAML"):
            continue
        ln = ln.replace("!!opencv-matrix", "")
        lines.append(ln)
    doc = yaml.safe_load("\n".join(lines)) or {}
    return doc


def load_reference_yaml(path: str, cfg: Optional[Config] = None) -> Config:
    """Load a reference settings YAML (Tracking.cc:100-259 key set)."""
    cfg = cfg or Config()
    doc = _parse_opencv_yaml(path)

    def apply(mapping, target):
        for yk, attr in mapping.items():
            if yk in doc and doc[yk] is not None:
                cur = getattr(target, attr)
                val = doc[yk]
                if isinstance(cur, bool):
                    val = bool(int(val))
                elif isinstance(cur, int):
                    val = int(val)
                elif isinstance(cur, float):
                    val = float(val)
                setattr(target, attr, val)

    apply(_YAML_CAMERA_KEYS, cfg.camera)
    apply(_YAML_ORB_KEYS, cfg.orb)
    apply(_YAML_MATCHER_KEYS, cfg.matcher)
    if "Camera.RGB" in doc:
        cfg.camera.rgb = bool(int(doc["Camera.RGB"]))
    if "IVSLAM.unsupervisedLearning" in doc:
        cfg.iv.unsupervised_learning = bool(int(doc["IVSLAM.unsupervisedLearning"]))
    if "Viewer.HeadlessMode" in doc:
        cfg.viewer.headless = bool(int(doc["Viewer.HeadlessMode"]))
    if "Viewer.SaveFramesToFile" in doc:
        cfg.viewer.save_frames_to_file = bool(
            int(doc["Viewer.SaveFramesToFile"]))
    if "Viewer.SaveMapDrawingsToFile" in doc:
        cfg.viewer.save_map_drawings_to_file = bool(
            int(doc["Viewer.SaveMapDrawingsToFile"]))
    cfg.orb.max_keypoints = max(cfg.orb.max_keypoints, _next_pow2(cfg.orb.n_features))
    return cfg


def _next_pow2(n: int) -> int:
    return 1 << max(0, math.ceil(math.log2(max(n, 1))))
