"""System facade (src/System.cc re-designed for the single-process,
host-orchestrated TPU runtime).

Public surface mirrors the reference API (System.h:76-183): TrackStereo,
Reset, Shutdown, SaveTrajectoryKITTI/TUM, GetTrackingState — minus the
thread spawning: the reference's LocalMapping/LoopClosing/Viewer threads
(System.cc:172-197) are inline stages of the sequential pipeline, which is
the semantics of its own single-threaded mode (System.cc:177-189).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..config import Config
from ..io import trajectory
from .tracking import State, Tracking


class System:
    def __init__(self, cfg: Config, height: int, width: int):
        self.cfg = cfg
        self.tracking = Tracking(cfg, height, width)
        self._shutdown = False
        self._prewarm_thread = None
        # measured-link adaptation: probe the host<->device RTT once and
        # pick the worker's program-shape family (chunked vs monolithic)
        # BEFORE prewarm walks the ladder — prewarm then compiles only
        # the selected shapes (SystemConfig.link_adaptive)
        self.link_rtt_ms = None
        if cfg.system.link_adaptive:
            from ..utils import linkprobe

            if cfg.system.link_rtt_ms is not None:
                linkprobe.set_rtt_ms(cfg.system.link_rtt_ms)
            self.link_rtt_ms = linkprobe.probe_rtt_ms()
            self.tracking.local_mapping.set_link_profile(
                self.link_rtt_ms > cfg.system.link_rtt_threshold_ms
            )
        if cfg.system.prewarm and cfg.system.fused_tracking:
            from .prewarm import prewarm_async

            self._prewarm_thread = prewarm_async(self.tracking)

    # --- tracking entry points (System.h:76-118) ---------------------------

    def track_stereo(
        self,
        img_left: np.ndarray,
        img_right: np.ndarray,
        timestamp: float,
        gt_pose: Optional[np.ndarray] = None,
        gt_cov: Optional[np.ndarray] = None,
        img_name: str = "",
        cost_map: Optional[np.ndarray] = None,
        frontend_handle=None,
        gt_depth_map: Optional[np.ndarray] = None,
    ) -> Optional[np.ndarray]:
        """Returns the camera pose Tcw, or None while not initialized."""
        return self.tracking.track_stereo(
            img_left, img_right, timestamp,
            cost_map=cost_map, gt_pose=gt_pose, gt_cov=gt_cov,
            img_name=img_name, frontend_handle=frontend_handle,
            gt_depth_map=gt_depth_map,
        )

    def submit_frontend(self, img_left, img_right, cost_map=None):
        """Prefetch the next frame's frontend (device work overlaps host
        tracking of the current frame)."""
        return self.tracking.submit_frontend(img_left, img_right, cost_map)

    def track_mono(
        self,
        img: np.ndarray,
        timestamp: float,
        gt_pose: Optional[np.ndarray] = None,
        img_name: str = "",
        cost_map: Optional[np.ndarray] = None,
        gt_depth_map: Optional[np.ndarray] = None,
    ) -> Optional[np.ndarray]:
        return self.tracking.track_mono(
            img, timestamp, cost_map=cost_map, gt_pose=gt_pose,
            img_name=img_name, gt_depth_map=gt_depth_map,
        )

    def track_rgbd(
        self,
        img: np.ndarray,
        depth_map: np.ndarray,
        timestamp: float,
        depth_scale: float = 1.0,
        img_name: str = "",
    ) -> Optional[np.ndarray]:
        return self.tracking.track_rgbd(
            img, depth_map, timestamp, depth_scale, img_name
        )

    def attach_vocabulary(self, voc):
        """Enable BoW features: relocalization + loop closing (the reference
        loads ORBvoc at startup, System.cc:105)."""
        self.tracking.attach_vocabulary(voc)

    def enable_datagen(self, out_path=None):
        """Training-data generation mode (create_ivslam_dataset)."""
        self.tracking.enable_datagen(out_path)

    # --- map persistence (reference TODO System.h:165-167, implemented) ----

    def save_map(self, path: str):
        self.tracking.map.save(path)

    def load_map(self, path: str):
        from .map_store import MapStore

        self.tracking.map = MapStore.load(
            path,
            n_levels=self.cfg.orb.n_levels,
            scale_factor=self.cfg.orb.scale_factor,
        )
        self.tracking.local_mapping.map = self.tracking.map

    # --- state -------------------------------------------------------------

    @property
    def state(self) -> State:
        return self.tracking.state

    @property
    def failure_count(self) -> int:
        return self.tracking.failure_count

    def activate_localization_mode(self):
        """System::ActivateLocalizationMode (System.h:122): tracking-only —
        no keyframes/mapping; VO temporal points carry the motion model."""
        self.tracking.only_tracking = True

    def deactivate_localization_mode(self):
        self.tracking.only_tracking = False

    def reset(self):
        self.tracking._reset()

    def shutdown(self):
        self._shutdown = True
        self.tracking.flush_chain()
        self.tracking.local_mapping.join()
        self.tracking.local_mapping.stop_worker()

    # --- output (System.h:148-163) ------------------------------------------

    def trajectory_twc(self):
        # flush the LocalMapping worker queue + any deferred global/local
        # BA so trajectories compose against the final keyframe poses
        # (the reference joins its threads on Shutdown before saving)
        self.tracking.local_mapping.join()
        if getattr(self.tracking, "loop_closing", None) is not None:
            self.tracking.loop_closing.collect_gba()
        self.tracking.local_mapping.apply_pending_ba()
        return self.tracking.trajectory_poses()

    def save_trajectory_kitti(self, path: str):
        trajectory.save_kitti(path, self.trajectory_twc())
        trajectory.save_times(
            os.path.splitext(path)[0] + "_times.txt", self.tracking.frame_times
        )

    def save_trajectory_tum(self, path: str):
        trajectory.save_tum(
            path, self.tracking.frame_times, self.trajectory_twc()
        )

    def save_keyframe_trajectory_tum(self, path: str):
        """SaveKeyFrameTrajectoryTUM (System.cc:614-676): keyframe poses
        only, sorted by id, timestamp + Twc quaternion per line."""
        self.tracking.flush_chain()
        self.tracking.local_mapping.join()
        if getattr(self.tracking, "loop_closing", None) is not None:
            self.tracking.loop_closing.collect_gba()
        self.tracking.local_mapping.apply_pending_ba()
        m = self.tracking.map
        times, poses = [], []
        for k in range(m.n_keyframes):
            if not m.kf_alive[k]:
                continue
            times.append(float(m.kf_timestamp[k]))
            poses.append(np.linalg.inv(m.kf_pose[k]))
        trajectory.save_tum(path, times, poses)

    def save_failure_log(self, path: str):
        with open(path, "w") as f:
            for t in self.tracking.failure_timestamps:
                f.write(f"{t:.6f}\n")
