"""The per-frame tracking state machine (src/Tracking.cc re-designed).

Control flow mirrors Tracking::Track (Tracking.cc:513-880) in its
single-threaded stereo configuration (the reference's bSingleThreaded path,
System.cc:177-189):

  NOT_INITIALIZED -> StereoInitialization (Tracking.cc:882)
  OK   -> TrackWithMotionModel (1303) | TrackReferenceKeyFrame (1154)
       -> TrackLocalMap (1509) -> NeedNewKeyFrame (1694)/CreateNewKeyFrame
       -> LocalMapping.LoopOnce
  LOST -> failure accounting + reset (829-854) and re-initialization

The dense inner loops — extraction, stereo matching, projection search,
pose LM — are jitted device programs (ops/, solvers/); this module is the
sequential host orchestrator that owns the map store.
"""

from __future__ import annotations

import enum
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..geometry import camera
from ..ops import match as match_ops
from ..solvers import pose_opt
from .frame import Frame, StereoFrontend
from .local_mapping import LocalMapping
from .map_store import MapStore


class State(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


class Tracking:
    def __init__(self, cfg: Config, height: int, width: int):
        self.cfg = cfg
        self.height = height
        self.width = width
        self.frontend = StereoFrontend(cfg, height, width)
        self.map = MapStore(
            n_levels=cfg.orb.n_levels, scale_factor=cfg.orb.scale_factor
        )
        self.local_mapping = LocalMapping(cfg, self.map)
        if cfg.system.threaded_local_mapping:
            self._setup_threaded_mapping()
        self.K = camera.Intrinsics.from_config(cfg.camera)
        self.state = State.NO_IMAGES_YET
        self.last_frame: Optional[Frame] = None
        self.current: Optional[Frame] = None
        self.velocity: Optional[np.ndarray] = None  # Tcl: cur <- last
        self.ref_kf: int = -1
        self.last_kf_frame_id: int = -1
        self.local_kfs: List[int] = []
        self.local_pts: np.ndarray = np.zeros(0, np.int64)
        self.n_inliers = 0
        self.min_frames = 0
        self.max_frames = int(cfg.camera.fps)
        # localization-only mode (System::ActivateLocalizationMode): no
        # mapping; temporary visual-odometry points carry frame-to-frame
        # tracking (Tracking::UpdateLastFrame, Tracking.cc:1260-1301)
        self.only_tracking = False
        self._temporal_points: List[int] = []
        self._dmap_dirty = True  # device map mirror needs (re)sync
        # monotonic mirror-content version: bumped on every map event
        # that invalidates in-flight speculative results (worker
        # keyframe events, BA/GBA merges, loop corrections, resets).
        # Speculations stamp it at dispatch; consumption requires it
        # unchanged. The boolean _dmap_dirty alone is NOT enough: a
        # later frame's dispatch clears the flag when it resyncs, and
        # an OLDER in-flight speculation (dispatched before the event,
        # computed against since-recycled arena rows) would then pass
        # the check and write wrong point associations (the ~1-in-2
        # late-run tracking loss this fixes was exactly that race).
        self._mirror_ver = 0

        sf = cfg.orb.scale_factors()
        self.inv_level_sigma2 = (1.0 / (sf * sf)).astype(np.float32)
        self.scale_factors_j = jnp.asarray(sf)
        self.log_scale = float(np.log(cfg.orb.scale_factor))

        # trajectory bookkeeping (Tracking.h:180-183)
        self.rel_poses: List[np.ndarray] = []   # Tcr per frame
        self.rel_refs: List[int] = []           # reference kf per frame
        self.frame_times: List[float] = []
        self.lost_flags: List[bool] = []
        self.failure_timestamps: List[float] = []
        self.failure_count = 0
        self._finalized_twc: List[np.ndarray] = []  # frames of closed sub-sessions
        self._session_start = 0
        self.datagen = None  # introspection DataGenerator (training mode)
        # chained-tracking pipeline state (cfg.system.chained_tracking):
        # deque of dispatched-but-unprocessed frame records, oldest first
        # (maxlen governed by cfg.system.chain_depth)
        from collections import deque

        self._pendq = deque()
        self._spec = None      # speculation record consumed by _track_fused
        self._chain_ok = False
        # optional per-stage wall-clock tracing (utils/profiling.StageTimer;
        # the reference's only instrumentation is whole-TrackStereo timing,
        # stereo_kitti.cc:437-441 — this is the stage-level superset)
        self.stage_timer = None

    def _stage(self, name: str):
        import contextlib

        if self.stage_timer is None:
            return contextlib.nullcontext()
        return self.stage_timer.time(name)

    def _setup_threaded_mapping(self):
        """Start the LocalMapping worker thread (the reference's actual
        thread architecture, System.cc:172-197) and route loop closing
        through it: the worker runs DetectLoop/ComputeSim3/CorrectLoop
        after each keyframe event, exactly the reference's LoopClosing
        thread fed by LocalMapping's queue."""
        self.local_mapping.start_worker()

        def post_kf(kf_id: int):
            if not (
                self.cfg.system.enable_loop_closing
                and hasattr(self, "loop_closing")
                and self.map.kf_alive[kf_id]
            ):
                return
            # merge any finished/running GBA before a potential new
            # correction (device wait outside the lock; apply_global_ba
            # takes it for the host mutations)
            if self.loop_closing.collect_gba():
                self._mark_mirror_stale()
            # a stale local-BA merge after CorrectLoop would overwrite the
            # corrected poses — force the join first (reference sets
            # mbAbortBA + mbStopGBA, LoopClosing.cc:437-449)
            self.local_mapping.apply_pending_ba()
            with self.map.lock:
                if self.loop_closing.process_keyframe(
                    kf_id, fix_scale=self.cfg.system.sensor != "mono"
                ):
                    self._mark_mirror_stale()

        self.local_mapping.post_kf_hook = post_kf

    # ------------------------------------------------------------------ API

    def track_stereo(
        self,
        img_left: np.ndarray,
        img_right: np.ndarray,
        timestamp: float,
        cost_map: Optional[np.ndarray] = None,
        gt_pose: Optional[np.ndarray] = None,
        gt_cov: Optional[np.ndarray] = None,
        img_name: str = "",
        frontend_handle=None,
        gt_depth_map: Optional[np.ndarray] = None,
    ) -> Optional[np.ndarray]:
        """Track one stereo pair. Pass `frontend_handle` from
        `submit_frontend` (called while the previous frame was tracking) to
        overlap the frontend's device work with host-side tracking — the
        reference's I/O-vs-tracking thread overlap, jax-async style.

        In chained mode (cfg.system.chained_tracking) the fused device
        program for this frame is dispatched speculatively and host
        bookkeeping runs ONE FRAME BEHIND; the returned pose is then the
        previous frame's (None until it exists). Flush points (trajectory
        reads, shutdown, reset) drain the lag.

        gt_depth_map: optional full-resolution GT depth image (AirSim PFM
        path, stereo_airsim.cc:339-360); sampled per keypoint as the
        reference's mvKeysGTDepth (Frame.cc:152-191)."""
        if (
            self.cfg.system.chained_tracking
            and self.cfg.system.fused_tracking
            and gt_depth_map is None
            and not self.only_tracking
        ):
            return self._track_stereo_chained(
                img_left, img_right, timestamp, cost_map, gt_pose, gt_cov,
                img_name, frontend_handle,
            )
        self.flush_chain()
        self._poll_async_merges()
        # Defer the frontend host-view download when the fused step will
        # run: the fused dispatch launches against device arrays first and
        # one batched device_get then drains views + results together
        # (halves the per-frame round-trips on a high-latency link).
        defer = (
            self.cfg.system.fused_tracking
            and self.state == State.OK
            and self.velocity is not None
            and not self.only_tracking
            and self.last_frame is not None
            and self.last_frame.pose is not None
            and gt_depth_map is None
        )
        with self._stage("frontend"):
            if frontend_handle is not None:
                frame = self.frontend.collect(
                    frontend_handle, timestamp, gt_pose, gt_cov, img_name,
                    defer=defer,
                )
            else:
                frame = self.frontend.process(
                    img_left, img_right, timestamp, cost_map, gt_pose,
                    gt_cov, img_name, defer=defer,
                )
        if gt_depth_map is not None:
            from .frame import sample_gt_depth

            frame.kp_gt_depth = sample_gt_depth(
                gt_depth_map, frame.xy, frame.valid
            )
        self.current = frame
        with self._stage("track"):
            self._track()
        return frame.pose

    def _poll_async_merges(self):
        """Non-blocking per-frame probes for finished background device
        work (deferred global BA, worker keyframe events, async local BA);
        a merge marks the device map mirror stale."""
        # join a finished deferred global BA as soon as its device result
        # is ready (the reference's GBA thread merges the moment it
        # finishes, LoopClosing.cc:649)
        lc = getattr(self, "loop_closing", None)
        if (lc is not None and lc.pending_gba is not None
                and lc.pending_gba.res.kf_pose.is_ready()):
            lc.collect_gba()
            self._mark_mirror_stale()
        # worker-thread mode: a finished keyframe event means the device
        # map mirror is stale — resync before the next fused step
        if self.local_mapping.poll_map_changed():
            self._mark_mirror_stale()
        # likewise join a finished async LOCAL BA (threaded-LocalMapping
        # semantics): non-blocking readiness probe, merge costs one RPC.
        # In worker mode the worker owns the merge (its next event force-
        # joins); the per-frame poll would contend the same handle.
        if (self.local_mapping._worker is None
                and self.local_mapping.apply_pending_ba(only_if_ready=True)):
            self._mark_mirror_stale()

    # ------------------------------------------------- chained (pipelined)

    def _track_stereo_chained(
        self, img_left, img_right, timestamp, cost_map, gt_pose, gt_cov,
        img_name, frontend_handle,
    ) -> Optional[np.ndarray]:
        """One-frame-pipelined tracking: dispatch this frame's fused device
        program immediately (from the previous frame's DEVICE results when
        a chain is live, or from host state to start one), then run the
        previous frame's host bookkeeping while the device computes. The
        critical path per frame drops to dispatch + host work — the fused
        step's device time and the result download overlap the next frame.

        Speculation is validated at consumption (_track_fused): a keyframe-
        pose rewrite (MapStore.poses_ver) or a rejected predecessor forces
        a fresh dispatch with exact unchained semantics."""
        self._poll_async_merges()
        with self._stage("frontend"):
            if frontend_handle is not None:
                frame = self.frontend.collect(
                    frontend_handle, timestamp, gt_pose, gt_cov, img_name,
                    defer=True,
                )
            else:
                frame = self.frontend.process(
                    img_left, img_right, timestamp, cost_map, gt_pose,
                    gt_cov, img_name, defer=True,
                )
        depth = max(1, int(getattr(self.cfg.system, "chain_depth", 1)))
        q = self._pendq
        spec = None
        if q and self.state == State.OK and q[-1].get("res") is not None:
            # speculative dispatch for THIS frame chained off the chain
            # tail's device results (no host upload, no sync)
            tail = q[-1]
            # mirror version read BEFORE the sync: an event landing any
            # time after this point makes the stamp mismatch at
            # consumption (conservative — a spurious mismatch costs one
            # fresh dispatch; a missed one costs wrong associations)
            mver = self._mirror_ver
            if self._dmap_dirty:
                self._dmap_dirty = False
                with self._stage("dmap_sync"), self.map.lock:
                    self._dmap.sync(self.map)
            with self._stage("spec_dispatch"):
                res, flat = self._fused.track_chained(
                    frame, tail["frame"], tail["res"].assign_map,
                    tail["res"].T, tail["T_prev"], self._dmap,
                )
            spec = dict(frame=frame, res=res, flat=flat,
                        ver=self.map.poses_ver, mver=mver,
                        T_prev=tail["res"].T,
                        fut=self._pull_async(flat))
        elif not q:
            spec = self._host_dispatch_spec(frame)
            if spec is None:
                # no pipeline possible (init / lost / fallback): process
                # this frame immediately
                self.current = frame
                with self._stage("track"):
                    self._track()
                return frame.pose
        q.append(spec if spec is not None else dict(
            frame=frame, res=None, flat=None, ver=-1, mver=-1,
            T_prev=None, fut=None))
        # ---- process the head frame(s) once the pipeline is full
        prev_pose = None
        while len(q) > depth:
            prev_pose = self._process_chain_head()
        return prev_pose

    def _host_dispatch_spec(self, frame):
        """Fresh (unchained) speculative dispatch for `frame` from host
        state — valid only when `frame` is last_frame's direct successor
        (the pending queue is empty, or every earlier frame is
        processed). Returns a spec record or None when the fused gate
        does not hold."""
        import jax.numpy as jnp

        if not (
            self.state == State.OK
            and self.velocity is not None
            and self.last_frame is not None
            and self.last_frame.pose is not None
        ):
            return None
        if not hasattr(self, "_fused"):
            from .device_map import DeviceMap
            from .fused_track import FusedTracker

            self._fused = FusedTracker(self.cfg, self.height, self.width)
            self._dmap = DeviceMap()
            self.local_mapping.dmap = self._dmap
        mver = self._mirror_ver  # before the sync — see chained dispatch
        if self._dmap_dirty:
            self._dmap_dirty = False
            with self._stage("dmap_sync"), self.map.lock:
                self._dmap.sync(self.map)
        self._update_last_frame()
        T_pred = self.velocity @ self.last_frame.pose
        with self._stage("spec_dispatch"):
            res, flat = self._fused.track(
                frame, self.last_frame, self.last_frame.map_pt, T_pred,
                self._dmap,
            )
        return dict(
            frame=frame, res=res, flat=flat, ver=self.map.poses_ver,
            mver=mver,
            T_prev=jnp.asarray(self.last_frame.pose),
            fut=self._pull_async(flat),
        )

    def _process_chain_head(self):
        """Pop and fully process the oldest pending frame; on an
        invalidating outcome, re-speculate every remaining queued frame
        from CURRENT host state (the depth-general form of the round-3
        drop-and-re-seed rule: an invalidation must not leave later
        frames chained to discarded or stale device results)."""
        q = self._pendq
        head = q.popleft()
        self.current = head["frame"]
        self._spec = head
        self._chain_ok = False
        self._used_spec = False
        with self._stage("track"):
            self._track()
        self._spec = None
        stale = any(
            e.get("res") is not None
            and e.get("mver") != self._mirror_ver
            for e in q
        )
        if q and (not self._chain_ok or not self._used_spec or stale):
            # The queued speculations chained off (a) a rejected fused
            # result, (b) a discarded speculative result (head was
            # re-dispatched fresh), or (c) a mirror missing a map event's
            # new/culled points (version-stamp mismatch). Re-seed the
            # whole queue from host state NOW — the head just became
            # last_frame, so the first queued frame is its direct
            # successor.
            self._respeculate_queue()
        return head["frame"].pose

    def _respeculate_queue(self):
        """Strip stale speculations from the pending queue and rebuild
        them from current host state: one fresh host dispatch for the
        first queued frame, chained dispatches for the rest."""
        q = self._pendq
        for e in q:
            e.update(res=None, flat=None, fut=None, ver=-1, mver=-1)
        mver_q = self._mirror_ver  # before any dispatch (see _host_dispatch_spec)
        prev = None
        for e in q:
            if prev is None:
                spec = self._host_dispatch_spec(e["frame"])
                if spec is None:
                    return  # gates do not hold (lost/reset): leave fresh
                e.update(spec)
            else:
                with self._stage("spec_dispatch"):
                    res, flat = self._fused.track_chained(
                        e["frame"], prev["frame"], prev["res"].assign_map,
                        prev["res"].T, prev["T_prev"], self._dmap,
                    )
                e.update(res=res, flat=flat, ver=self.map.poses_ver,
                         mver=mver_q,
                         T_prev=prev["res"].T,
                         fut=self._pull_async(flat))
            prev = e

    def _pull_async(self, flat):
        """Start the device->host pull of a result pack on a helper thread
        (copy_to_host_async is a no-op on some backends; a concurrent
        device_get releases the GIL and lands the bytes before the frame
        is consumed, so the per-frame host sync stops paying the link
        round-trip)."""
        if not hasattr(self, "_puller"):
            from concurrent.futures import ThreadPoolExecutor

            # 3 workers: each pull pays a full link round-trip (~25 ms)
            # before bytes move, so consecutive frames' pulls must overlap
            # their RTTs or the pull chain itself caps throughput at
            # 1/RTT. Each np.asarray releases the GIL while blocked.
            self._puller = ThreadPoolExecutor(
                max_workers=3, thread_name_prefix="iv-result-pull"
            )
        return self._puller.submit(np.asarray, flat)

    def flush_chain(self):
        """Drain the speculation pipeline: process every pending frame
        (oldest first) so host state is current. Called by trajectory
        readers, shutdown, reset, and any non-chained entry point."""
        q = getattr(self, "_pendq", None)
        while q:
            self._process_chain_head()

    def submit_frontend(self, img_left, img_right, cost_map=None):
        handle = self.frontend.submit(img_left, img_right, cost_map)
        # classic path downloads the host pack in collect(); start the
        # device->host copy now so it overlaps tracking of the current
        # frame (fused tracking defers the pack and drains views in its
        # own batched readback instead — don't push bytes it won't read)
        if not self.cfg.system.fused_tracking:
            self.frontend.prefetch_host(handle)
        return handle

    def submit_frontend_device(self, pair, cost_map=None):
        """submit_frontend for a pre-staged device-resident (2, H, W)
        pair (batched/staged replay: the image upload happened earlier,
        off the tracking critical path)."""
        handle = self.frontend.submit_device(pair, cost_map)
        if not self.cfg.system.fused_tracking:
            self.frontend.prefetch_host(handle)
        return handle

    def track_mono(
        self,
        img: np.ndarray,
        timestamp: float,
        cost_map: Optional[np.ndarray] = None,
        gt_pose: Optional[np.ndarray] = None,
        img_name: str = "",
        gt_depth_map: Optional[np.ndarray] = None,
    ) -> Optional[np.ndarray]:
        """Monocular tracking (Tracking::GrabImageMonocular). Uses the
        H/F-RANSAC initializer for the first map; the per-frame loop is
        shared with stereo (mono frames simply carry no depth).

        gt_depth_map: optional GT depth image sampled per keypoint
        (mono_airsim.cc supports PFM GT depth for the feature evaluator's
        reprojection path, same as stereo_airsim.cc:339-360)."""
        self.flush_chain()
        from .frame import MonoFrontend

        if not hasattr(self, "mono_frontend"):
            self.mono_frontend = MonoFrontend(self.cfg, self.height, self.width)
        frame = self.mono_frontend.process(
            img, timestamp, cost_map, gt_pose, img_name
        )
        if gt_depth_map is not None:
            from .frame import sample_gt_depth

            frame.kp_gt_depth = sample_gt_depth(
                gt_depth_map, frame.xy, frame.valid
            )
        self.current = frame
        self._track_mono_flow()
        return frame.pose

    def _track_mono_flow(self):
        frame = self.current
        if self.state in (State.NO_IMAGES_YET, State.NOT_INITIALIZED):
            self.state = State.NOT_INITIALIZED
            self._monocular_initialization()
            self._record_trajectory(lost=self.state != State.OK)
            self.last_frame = frame
            return
        # after initialization the per-frame flow is sensor-agnostic
        self._track_after_init()

    def _track_after_init(self):
        frame = self.current
        ok = False
        fused_done = False
        if self.state == State.OK:
            if (
                self.cfg.system.fused_tracking
                and self.velocity is not None
                and not self.only_tracking
            ):
                ok = self._track_fused()
                fused_done = ok  # fused path already ran the local-map stage
            if not ok and self.velocity is not None:
                ok = self._track_with_motion_model()
            if not ok and not fused_done:
                ok = self._track_reference_keyframe()
        elif self.state == State.LOST and self.cfg.system.use_bow:
            ok = self._relocalization()
        if ok and not fused_done:
            ok = self._track_local_map()
        if ok:
            self.state = State.OK
            if self.last_frame is not None and self.last_frame.pose is not None:
                self.velocity = frame.pose @ np.linalg.inv(self.last_frame.pose)
            out = frame.outlier & (frame.map_pt >= 0)
            frame.map_pt[out] = -1
            frame.outlier[:] = False
            if self.only_tracking:
                # drop references to observation-less (VO) points, then the
                # points themselves (Tracking.cc:789-807)
                for i in np.nonzero(frame.map_pt >= 0)[0]:
                    if not self.map.pt_obs[int(frame.map_pt[i])]:
                        frame.map_pt[i] = -1
                self._delete_temporal_points()
            elif self._need_new_keyframe():
                with self._stage("keyframe_event"):
                    self._create_new_keyframe()
            self._record_trajectory(lost=False)
            with self._stage("datagen"):
                self._run_datagen(frame)
        else:
            self.state = State.LOST
            self._record_trajectory(lost=True)
            self._handle_lost(frame.timestamp)
        self.last_frame = frame

    def _monocular_initialization(self):
        """Tracking::MonocularInitialization (951-1150): two frames with
        > 100 features, windowed level-0 matching, H/F model selection,
        median-depth normalization."""
        import jax

        from ..ops import match as m_ops
        from ..solvers import initializer

        frame = self.current
        prev = self.last_frame
        if prev is None or prev.n_valid <= 100 or frame.n_valid <= 100:
            return
        assign, n = m_ops.search_for_initialization(
            prev.kp.xy, prev.kp.octave, prev.kp.angle, prev.kp.desc,
            prev.kp.valid,
            frame.kp.xy, frame.kp.octave, frame.kp.angle, frame.kp.desc,
            frame.kp.valid,
            prev.kp.xy, jnp.float32(100.0),
            jnp.float32(0.9 * self.cfg.matcher.nn_ratio_multiplier),
        )
        if int(n) < 100:
            return
        assign_np = np.asarray(assign)
        matched = assign_np >= 0
        cap = prev.xy.shape[0]
        p1 = np.where(matched[:, None], prev.xy, 0.0).astype(np.float32)
        p2 = np.where(
            matched[:, None], frame.xy[np.maximum(assign_np, 0)], 0.0
        ).astype(np.float32)
        res = initializer.initialize_mono(
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(matched),
            jnp.asarray(self.cfg.camera.K()), jax.random.PRNGKey(frame.frame_id),
        )
        if not bool(res.ok):
            return
        good = np.asarray(res.is_good)
        pts = np.asarray(res.points)
        # median-depth normalization (Tracking::CreateInitialMapMonocular)
        depths = pts[good, 2]
        if len(depths) < 50:
            return
        med = float(np.median(depths))
        if med <= 0:
            return
        inv_med = 1.0 / med
        pts = pts * inv_med
        T2 = np.eye(4, dtype=np.float32)
        T2[:3, :3] = np.asarray(res.R)
        T2[:3, 3] = np.asarray(res.t) * inv_med
        prev.set_pose(np.eye(4, dtype=np.float32))
        frame.set_pose(T2)
        kf0 = self.map.add_keyframe(prev)
        kf1 = self.map.add_keyframe(frame)
        for i in np.nonzero(good & matched)[0]:
            j = int(assign_np[i])
            pid = self.map.add_point(pts[i], kf0)
            self.map.add_observation(pid, kf0, int(i))
            self.map.add_observation(pid, kf1, j)
            prev.map_pt[i] = pid
            frame.map_pt[j] = pid
            self.map.compute_distinctive_descriptor(pid)
            self.map.update_normal_and_depth(pid)
        self.local_mapping.insert_keyframe(kf0)
        self.local_mapping.insert_keyframe(kf1)
        self.local_mapping.loop_once(run_ba=True)
        self.ref_kf = kf1
        frame.ref_kf = kf1
        self.last_kf_frame_id = frame.frame_id
        self.local_pts = np.nonzero(self.map.pt_alive[: self.map.n_points])[0]
        self.state = State.OK

    def track_rgbd(
        self,
        img: np.ndarray,
        depth_map: np.ndarray,
        timestamp: float,
        depth_scale: float = 1.0,
        img_name: str = "",
    ) -> Optional[np.ndarray]:
        """RGB-D tracking (Tracking::GrabImageRGBD): depth-seeded frames go
        through the stereo state machine (vanilla ORB-SLAM2 behavior — the
        reference's introspection paths fatal out for RGBD,
        Tracking.cc:377-379)."""
        self.flush_chain()
        from .frame import RGBDFrontend

        if not hasattr(self, "rgbd_frontend"):
            self.rgbd_frontend = RGBDFrontend(self.cfg, self.height, self.width)
        frame = self.rgbd_frontend.process(
            img, depth_map, timestamp, depth_scale, img_name
        )
        self.current = frame
        self._track()
        return frame.pose

    # ----------------------------------------------------------- state flow

    def _track(self):
        frame = self.current
        if frame.defer and not (
            self.cfg.system.fused_tracking
            and self.state == State.OK
            and self.velocity is not None
            and not self.only_tracking
        ):
            frame.materialize()  # safety: only the fused path defers
        if self.state in (State.NO_IMAGES_YET, State.NOT_INITIALIZED):
            self.state = State.NOT_INITIALIZED
            self._stereo_initialization()
            self._record_trajectory(lost=self.state != State.OK)
            self.last_frame = frame
            return
        self._track_after_init()

    # ------------------------------------------------------- initialization

    def _stereo_initialization(self):
        frame = self.current
        if frame.n_valid <= 500:
            return
        frame.set_pose(np.eye(4, dtype=np.float32))
        kf_id = self.map.add_keyframe(frame)
        n_created = 0
        for i in np.nonzero(frame.valid & (frame.depth > 0))[0]:
            pos = frame.unproject_stereo(
                i, self.cfg.camera.fx, self.cfg.camera.fy,
                self.cfg.camera.cx, self.cfg.camera.cy,
            )
            qual = (
                frame.qual_score[i]
                if self.cfg.iv.propagate_keyptqual
                else 1.0
            )
            pid = self.map.add_point(pos, kf_id, qual)
            self.map.add_observation(pid, kf_id, int(i))
            frame.map_pt[i] = pid
            self.map.compute_distinctive_descriptor(pid)
            self.map.update_normal_and_depth(pid)
            n_created += 1
        if n_created == 0:
            return
        self.local_mapping.insert_keyframe(kf_id)
        self.local_mapping.loop_once(run_ba=False)
        self.ref_kf = kf_id
        frame.ref_kf = kf_id
        self.last_kf_frame_id = frame.frame_id
        self.local_kfs = [kf_id]
        self.local_pts = np.nonzero(self.map.pt_alive[: self.map.n_points])[0]
        self.state = State.OK

    # ------------------------------------------------------------- tracking

    def _pose_optimize(self, frame: Frame) -> int:
        """Run the batched LM pose solver over the frame's associations and
        write back pose/outliers/chi2 (Optimizer::PoseOptimization)."""
        has_pt = frame.map_pt >= 0
        if has_pt.sum() < 3:
            return 0
        idx = np.arange(frame.map_pt.shape[0])
        pids = np.where(has_pt, frame.map_pt, 0)
        Xw = self.map.pt_pos[pids]
        obs = np.stack(
            [frame.xy[:, 0], frame.xy[:, 1], frame.u_right], axis=1
        ).astype(np.float32)
        inv_s2 = self.inv_level_sigma2[frame.octave]
        if self.cfg.iv.propagate_keyptqual:
            qual = self.map.pt_quality[pids].astype(np.float32)
        else:
            qual = frame.qual_score
        res = pose_opt.pose_optimization(
            jnp.asarray(frame.pose),
            jnp.asarray(Xw),
            jnp.asarray(obs),
            jnp.asarray(inv_s2),
            jnp.asarray(qual),
            jnp.asarray(has_pt),
            self.K,
            n_rounds=self.cfg.iv.optimizer_pose_opt_iter_count,
        )
        frame.set_pose(np.asarray(res.T))
        inlier = np.asarray(res.inlier)
        frame.outlier = has_pt & ~inlier
        # chi2 logging for the unsupervised introspection path
        # (Optimizer.cc:452-455, 486-489: stored at the last LM round)
        frame.chi2 = np.asarray(res.chi2)
        frame.chi2_dof = np.where(
            has_pt, np.where(frame.u_right >= 0, 3, 2), 0
        ).astype(np.int32)
        return int(inlier.sum())

    def _track_fused(self) -> bool:
        """Single-dispatch tracking (slam/fused_track.py): motion search +
        pose LM + full-map local search + pose LM as ONE device program.
        Falls back to the classic multi-dispatch path on failure."""
        from .device_map import DeviceMap
        from .fused_track import FusedTracker

        frame = self.current
        last = self.last_frame
        spec = self._spec
        used_spec = (
            spec is not None
            and spec.get("ver") == self.map.poses_ver
            and spec["frame"] is frame
            # a worker event landing between dispatch and consumption
            # invalidates the result even when no pose moved: the program
            # read a mirror missing the event's new/culled/recycled
            # points. The check is a VERSION stamp, not the _dmap_dirty
            # boolean — a later frame's dispatch clears that flag after
            # resyncing, which would let an older in-flight speculation
            # slip through and write associations against recycled arena
            # rows (observed as a stochastic late-run tracking loss).
            and spec.get("mver") == self._mirror_ver
        )
        self._used_spec = used_spec
        if used_spec:
            # consume the speculative dispatch: its inputs are provably
            # identical to what a fresh dispatch would see (no keyframe
            # pose moved since — the _update_last_frame re-anchor would
            # have been a numeric no-op), so this is the unchained result
            # minus the critical-path wait
            res, flat = spec["res"], spec["flat"]
        else:
            if last is None or last.pose is None:
                frame.materialize()  # classic fallback needs the host views
                return False
            if not hasattr(self, "_fused"):
                self._fused = FusedTracker(self.cfg, self.height, self.width)
                self._dmap = DeviceMap()
                self.local_mapping.dmap = self._dmap
            if self._dmap_dirty:
                # clear BEFORE syncing: a worker event landing mid-sync
                # sets the flag again and the next frame resyncs
                self._dmap_dirty = False
                with self._stage("dmap_sync"):
                    with self.map.lock:
                        self._dmap.sync(self.map)
            self._update_last_frame()
            T_pred = self.velocity @ last.pose
            with self._stage("fused_dispatch"):
                res, flat = self._fused.track(
                    frame, last, last.map_pt, T_pred, self._dmap
                )
        # ONE readback (single RPC) for the fused results AND the deferred
        # frontend host views: the tunneled runtime pays a full link
        # round-trip per materialized array, so everything host-bound
        # ships as one flat float32 vector packed on device. Chained
        # frames had the pull started on the helper thread at dispatch.
        with self._stage("fused_readback"):
            fut = spec.get("fut") if used_spec else None
            out = fut.result() if fut is not None else np.asarray(flat)
        n = frame.u_right.shape[0]
        pack = out[: 10 * n].reshape(n, 10)
        small = out[10 * n:]
        if frame.xy is None:  # deferred frontend views
            frame.xy = np.ascontiguousarray(pack[:, 0:2])
            frame.octave = pack[:, 2].astype(np.int32)
            frame.valid = pack[:, 3] != 0.0
            frame.u_right = np.ascontiguousarray(pack[:, 4])
            frame.depth = np.ascontiguousarray(pack[:, 5])
            frame.qual_score = np.ascontiguousarray(pack[:, 6])
        assign = pack[:, 7].astype(np.int32)
        inlier = pack[:, 8] != 0.0
        chi2 = np.ascontiguousarray(pack[:, 9])
        T = small[:16].reshape(4, 4).astype(np.float32)
        n_motion = int(small[16])
        # local-search compaction overflow check (never silent): the
        # fused step caps frustum-gated candidates at LOCAL_CAP=4096
        if small.shape[0] > 18 and small[18] > 4096:
            import logging

            logging.getLogger(__name__).warning(
                "fused local search: %d frustum-gated points > cap 4096; "
                "extras not searched this frame", int(small[18]),
            )
        # pose-LM edge-compaction overflow (fused_track POSE_CAP):
        # extra active edges were dropped from the pose solve this frame.
        # Throttled: a sustained overflow would otherwise log per frame
        # (r5: the 1024 cap did exactly that at the 2048-capacity config
        # before the cap learned to step up with frame capacity).
        if small.shape[0] > 19 and small[19] > 0:
            self._pose_cap_ovf = getattr(self, "_pose_cap_ovf", 0) + 1
            if self._pose_cap_ovf in (1, 10) or \
                    self._pose_cap_ovf % 100 == 0:
                import logging

                logging.getLogger(__name__).warning(
                    "fused pose LM: %d active edges dropped from the "
                    "compact table this frame (occurrence %d)",
                    int(small[19]), self._pose_cap_ovf,
                )
        if n_motion < 20:
            self._last_fail = (frame.frame_id, "n_motion", n_motion,
                               self.map.n_points)
            return False
        frame.set_pose(T)
        frame.map_pt[:] = assign
        frame.outlier[:] = False
        frame.chi2 = chi2
        frame.chi2_dof = np.where(
            assign >= 0, np.where(frame.u_right >= 0, 3, 2), 0
        ).astype(np.int32)
        good = assign >= 0
        with self.map.lock:
            self.map.increase_found(assign[good])
            self.n_inliers = int(
                np.count_nonzero(self.map.pt_n_obs[assign[good]] > 0)
            )
            if self.n_inliers < 30:
                # roll back associations; the classic path will retry
                self._last_fail = (frame.frame_id, "n_inliers",
                                   self.n_inliers, self.map.n_points)
                frame.map_pt[:] = -1
                return False
            # reference keyframe: the most-voted observer of our matches
            counter = {}
            for pid in assign[good]:
                for kf_id in self.map.pt_obs[pid]:
                    counter[kf_id] = counter.get(kf_id, 0) + 1
            if counter:
                self.ref_kf = max(counter, key=counter.get)
                frame.ref_kf = self.ref_kf
        self._chain_ok = True  # fused result accepted: chain stays valid
        return True

    def mark_map_dirty(self):
        self._mark_mirror_stale()

    def _mark_mirror_stale(self):
        """A map event landed: the device mirror needs a resync before
        the next dispatch, and every in-flight speculative result is
        void (its program read arena rows the event may have recycled).
        The version bump is what consumption checks — see __init__."""
        self._dmap_dirty = True
        self._mirror_ver += 1

    def _update_last_frame(self):
        """Tracking::UpdateLastFrame: refresh the last frame's pose from its
        reference keyframe; in localization-only mode, seed temporary VO
        points from its stereo depths (close points, or the 100 nearest)."""
        last = self.last_frame
        if last.ref_kf >= 0 and self.rel_poses:
            last.set_pose(self.rel_poses[-1] @ self.map.kf_pose[last.ref_kf])
        if (
            not self.only_tracking
            or last.frame_id == self.last_kf_frame_id
            or self.cfg.system.sensor == "mono"
        ):
            return
        cam = self.cfg.camera
        order = np.argsort(np.where(last.depth > 0, last.depth, np.inf))
        n_points = 0
        for i in order:
            z = last.depth[i]
            if z <= 0:
                break
            pid = int(last.map_pt[i])
            if pid < 0 or not self.map.pt_obs[pid]:
                pos = last.unproject_stereo(i, cam.fx, cam.fy, cam.cx, cam.cy)
                new_pid = self.map.add_point(pos, -1)
                self.map.pt_desc[new_pid] = last.desc[i]
                last.map_pt[i] = new_pid
                self._temporal_points.append(new_pid)
            n_points += 1
            if z > cam.depth_threshold and n_points > 100:
                break

    def _delete_temporal_points(self):
        for pid in self._temporal_points:
            self.map.kill_point(pid)
        self._temporal_points.clear()

    def _track_with_motion_model(self) -> bool:
        frame = self.current
        last = self.last_frame
        self._update_last_frame()
        frame.set_pose(self.velocity @ last.pose)
        frame.map_pt[:] = -1

        th = 7.0  # stereo (Tracking.cc:1323-1327)
        swm = self.cfg.matcher.search_window_multiplier
        n = self._search_last_frame(th * swm)
        if n < 20:
            frame.map_pt[:] = -1
            n = self._search_last_frame(2 * th * swm)
        if n < 20:
            return False
        n_in = self._pose_optimize(frame)
        # discard outlier associations, count map matches (Tracking.cc:1466+)
        nmatches_map = self._discard_outliers(frame)
        return nmatches_map >= 10

    def _search_last_frame(self, th: float) -> int:
        frame = self.current
        last = self.last_frame
        has_pt = (last.map_pt >= 0) & ~last.outlier
        pids = np.where(has_pt, last.map_pt, 0)
        alive = self.map.pt_alive[pids] & has_pt
        cam = self.cfg.camera
        assign, n = match_ops.search_by_projection_last_frame(
            frame.kp.xy, frame.kp.octave, frame.kp.angle, frame.kp.desc,
            jnp.asarray(frame.u_right), frame.kp.valid,
            jnp.asarray(self.map.pt_pos[pids]),
            jnp.asarray(self.map.pt_desc[pids]),
            last.kp.octave, last.kp.angle, jnp.asarray(alive),
            jnp.asarray(frame.pose), jnp.asarray(last.pose),
            jnp.float32(cam.fx), jnp.float32(cam.fy),
            jnp.float32(cam.cx), jnp.float32(cam.cy),
            jnp.float32(cam.bf), jnp.float32(cam.baseline),
            jnp.float32(self.width), jnp.float32(self.height),
            self.scale_factors_j, jnp.float32(th),
        )
        assign = np.asarray(assign)
        matched = assign >= 0
        frame.map_pt[:] = np.where(matched, pids[np.maximum(assign, 0)], -1)
        if self.cfg.iv.propagate_keyptqual:
            self._update_quality_scores(frame)
        return int(n)

    def _update_quality_scores(self, frame: Frame):
        """ORBmatcher::UpdateQualityScores (1108-1146): min-propagate
        quality between matched keypoints and their map points."""
        idx = np.nonzero(frame.map_pt >= 0)[0]
        pids = frame.map_pt[idx]
        mpt_q = self.map.pt_quality[pids]
        updated = np.minimum(mpt_q, frame.qual_score[idx])
        changed = np.abs(updated - mpt_q) > 0.01
        self.map.pt_quality[pids[changed]] = updated[changed]
        self.map.mark_dirty(pids[changed])
        frame.qual_score[idx] = updated

    def _track_reference_keyframe(self) -> bool:
        """Tracking::TrackReferenceKeyFrame (1154-1240). With a vocabulary
        attached, the reference's primary use_BoW=true branch: windowless
        SearchByBoW against the reference keyframe — the only matcher that
        survives arbitrary inter-frame flow (no velocity model yet, or the
        motion model failed). Falls back to the use_BoW=false projection
        variant (th=5 window from the last pose) otherwise."""
        frame = self.current
        frame.set_pose(self.last_frame.pose)
        frame.map_pt[:] = -1
        if self.cfg.system.use_bow and getattr(self, "voc", None) is not None:
            if self._track_reference_keyframe_bow():
                return True
            frame.set_pose(self.last_frame.pose)
            frame.map_pt[:] = -1
        swm = self.cfg.matcher.search_window_multiplier
        n = self._search_local_points(
            th=5.0 * swm, nn_ratio=0.7 * self.cfg.matcher.nn_ratio_multiplier
        )
        if n < 15:
            return False
        self._pose_optimize(frame)
        nmatches_map = self._discard_outliers(frame)
        return nmatches_map >= 10

    def _feature_nodes(self, desc: np.ndarray, valid: np.ndarray) -> np.ndarray:
        """DBoW2 FeatureVector node id per keypoint (-1 = invalid)."""
        return self.voc.feature_nodes(desc, valid)

    def _track_reference_keyframe_bow(self) -> bool:
        """SearchByBoW(ref KF, current) -> pose optimization
        (ORBmatcher.cc SearchByBoW + Tracking.cc:1165-1175)."""
        from ..ops import bow_match

        frame = self.current
        rf = self.map.kf_frames[self.ref_kf]
        if rf is None:
            return False
        ref_has = (rf.map_pt >= 0) & rf.valid
        if ref_has.sum() < 15:
            return False
        ref_nodes = self._feature_nodes(rf.desc, rf.valid)
        cur_nodes = self._feature_nodes(frame.desc, frame.valid)
        assign, n = bow_match.search_by_bow(
            jnp.asarray(rf.desc), jnp.asarray(ref_nodes),
            jnp.asarray(rf.angle), jnp.asarray(ref_has),
            frame.kp.desc, jnp.asarray(cur_nodes),
            frame.kp.angle, frame.kp.valid,
            jnp.float32(0.7 * self.cfg.matcher.nn_ratio_multiplier),
        )
        if int(n) < 15:
            return False
        assign = np.asarray(assign)
        ai = np.nonzero(assign >= 0)[0]        # ref features
        frame.map_pt[assign[ai]] = rf.map_pt[ai]
        self._pose_optimize(frame)
        return self._discard_outliers(frame) >= 10

    def _discard_outliers(self, frame: Frame) -> int:
        out = frame.outlier & (frame.map_pt >= 0)
        frame.map_pt[out] = -1
        frame.outlier[out] = False
        good = frame.map_pt >= 0
        # matches to points with observations (in the map)
        return int(np.count_nonzero(self.map.pt_n_obs[frame.map_pt[good]] > 0))

    def _track_local_map(self) -> bool:
        frame = self.current
        self._update_local_map()
        self._search_local_map_points()
        n_in = self._pose_optimize(frame)
        # statistics + strip stereo outliers (Tracking.cc:1655-1684)
        good = (frame.map_pt >= 0) & ~frame.outlier
        self.map.increase_found(frame.map_pt[good])
        if self.only_tracking:
            # localization mode counts every non-outlier match
            # (Tracking.cc:1661-1666)
            self.n_inliers = int(good.sum())
        else:
            self.n_inliers = int(
                np.count_nonzero(self.map.pt_n_obs[frame.map_pt[good]] > 0)
            )
        bad = (frame.map_pt >= 0) & frame.outlier
        frame.map_pt[bad] = -1  # stereo sensor path
        frame.outlier[bad] = False
        return self.n_inliers >= 30

    def _update_local_map(self):
        """UpdateLocalKeyFrames + UpdateLocalPoints (Tracking.cc:2134-2270)."""
        frame = self.current
        counter = {}
        for pid in frame.map_pt[frame.map_pt >= 0]:
            if not self.map.pt_alive[pid]:
                continue
            for kf_id in self.map.pt_obs[pid]:
                counter[kf_id] = counter.get(kf_id, 0) + 1
        if not counter:
            return
        local = sorted(counter, key=counter.get, reverse=True)
        seen = set(local)
        for kf_id in list(local):
            if len(local) > 80:
                break
            for nb, _w in self.map.covisible_keyframes(kf_id)[:10]:
                if nb not in seen:
                    local.append(nb)
                    seen.add(nb)
                    break
        self.local_kfs = local
        best_kf = max(counter, key=counter.get)
        self.ref_kf = best_kf
        frame.ref_kf = best_kf
        pts = set()
        for kf_id in local:
            kf_frame = self.map.kf_frames[kf_id]
            if kf_frame is None:
                continue
            for pid in kf_frame.map_pt[kf_frame.map_pt >= 0]:
                if self.map.pt_alive[pid]:
                    pts.add(int(pid))
        self.local_pts = np.fromiter(pts, np.int64, len(pts))

    def _search_local_map_points(self):
        """SearchLocalPoints (Tracking.cc:2088-2132)."""
        frame = self.current
        cur_pids = frame.map_pt[frame.map_pt >= 0]
        self.map.increase_visible(cur_pids)
        th = 1.0
        if frame.frame_id < 2:
            th = 5.0
        self._search_local_points(
            th=th * self.cfg.matcher.search_window_multiplier,
            nn_ratio=0.8 * self.cfg.matcher.nn_ratio_multiplier,
            exclude_current=True,
        )

    def _search_local_points(
        self, th: float, nn_ratio: float, exclude_current: bool = False
    ) -> int:
        frame = self.current
        pts = self.local_pts
        if pts.size == 0:
            return 0
        cam = self.cfg.camera
        cur_in_frame = set(frame.map_pt[frame.map_pt >= 0].tolist())
        pt_valid = self.map.pt_alive[pts].copy()
        if exclude_current and cur_in_frame:
            in_cur = np.isin(pts, list(cur_in_frame))
            # visible bump for frustum points happens inside the matcher path;
            # the reference also skips points already matched this frame
            pt_valid &= ~in_cur
        # pad the point axis to a coarse bucket: the local set's size is
        # data-dependent and every distinct size would compile a fresh
        # multi-second program through the remote link (this path runs on
        # fused-tracking fallbacks and the classic configuration). The
        # x4 ladder from 1024 matches prewarm's _warm_classic_fallbacks.
        cap = 1024
        while cap < len(pts):
            cap *= 4
        if cap != len(pts):
            pad = cap - len(pts)
            pts = np.concatenate([pts, np.zeros(pad, pts.dtype)])
            pt_valid = np.concatenate([pt_valid, np.zeros(pad, bool)])
        assign, n = match_ops.search_by_projection_local_map(
            frame.kp.xy, frame.kp.octave, frame.kp.desc,
            jnp.asarray(frame.u_right), frame.kp.valid,
            jnp.asarray(frame.map_pt >= 0),
            jnp.asarray(self.map.pt_pos[pts]),
            jnp.asarray(self.map.pt_desc[pts]),
            jnp.asarray(self.map.pt_normal[pts]),
            jnp.asarray(self.map.pt_min_dist[pts]),
            jnp.asarray(self.map.pt_max_dist[pts]),
            jnp.asarray(pt_valid),
            jnp.asarray(frame.pose),
            jnp.float32(cam.fx), jnp.float32(cam.fy),
            jnp.float32(cam.cx), jnp.float32(cam.cy), jnp.float32(cam.bf),
            jnp.float32(self.width), jnp.float32(self.height),
            self.scale_factors_j, jnp.float32(self.log_scale),
            jnp.float32(th), jnp.float32(nn_ratio),
        )
        assign = np.asarray(assign)
        newly = (assign >= 0) & (frame.map_pt < 0)
        frame.map_pt[newly] = pts[assign[newly]]
        return int((frame.map_pt >= 0).sum())

    # ------------------------------------------------------------ keyframes

    def _need_new_keyframe(self) -> bool:
        """Tracking.cc:1694-1772. Worker mode adds the reference's
        busy-mapper backpressure: with >= 3 keyframes still queued the
        insert is refused (LocalMapping.cc mlNewKeyFrames gate)."""
        if (self.local_mapping._worker is not None
                and self.local_mapping.pending_count() >= 3):
            # Starvation guard (TPU adaptation, r5): on a saturated link
            # the worker's per-event syncs queue behind the ~1 MB frame
            # uploads and one event can outlast max_frames of tracking;
            # the reference's refuse-while-busy gate then thins keyframes
            # to ~1 per 12 frames at 0.8 m/frame, match support decays,
            # and tracking is LOST by frame ~50 (live bench, 16 Mbps
            # day). Keep the reference's backpressure inside the normal
            # window, but once the keyframe gap exceeds max_frames let a
            # bounded queue (< 6) accept the insert — a deeper queue is
            # host memory, a lost tracker is the session.
            gap = self.current.frame_id - self.last_kf_frame_id
            if gap < self.max_frames or \
                    self.local_mapping.pending_count() >= 6:
                return False
        frame = self.current
        with self.map.lock:
            n_kfs = self.map.n_keyframes
            n_min_obs = 3 if n_kfs > 2 else 2
            ref_frame = self.map.kf_frames[self.ref_kf]
            n_ref_matches = 0
            if ref_frame is not None:
                pids = ref_frame.map_pt[ref_frame.map_pt >= 0]
                n_ref_matches = int(np.count_nonzero(
                    self.map.pt_alive[pids]
                    & (self.map.pt_n_obs[pids] >= n_min_obs)
                ))
        close = (frame.depth > 0) & (frame.depth < self.cfg.camera.depth_threshold)
        tracked = (frame.map_pt >= 0) & ~frame.outlier
        n_tracked_close = int((close & tracked).sum())
        n_nontracked_close = int((close & ~tracked).sum())
        need_close = (n_tracked_close < 100) and (n_nontracked_close > 70)
        th_ref = 0.75 if n_kfs >= 2 else 0.4
        c1a = frame.frame_id >= self.last_kf_frame_id + self.max_frames
        c1b = frame.frame_id >= self.last_kf_frame_id + self.min_frames
        c1c = (self.n_inliers < n_ref_matches * 0.25) or need_close
        c2 = (
            (self.n_inliers < n_ref_matches * th_ref) or need_close
        ) and self.n_inliers > 15
        return (c1a or c1b or c1c) and c2

    def _create_new_keyframe(self):
        """Tracking.cc:1774-1860: promote frame to KF, create close stereo
        map points, then run local mapping — inline (single-threaded
        LoopOnce semantics) or handed to the worker thread."""
        frame = self.current
        # pull the keyframe's descriptors CONCURRENTLY with the host map
        # work below (lazy property = one blocking ~25 ms link RTT; only
        # the distinctive-descriptor pass at the end needs the bytes)
        desc_fut = (self._pull_async(frame.kp.desc)
                    if frame._desc is None else None)
        with self.map.lock:
            self._create_new_keyframe_locked(frame, desc_fut)
        if self.local_mapping._worker is not None:
            self.local_mapping.kick_async(
                run_ba=frame.frame_id
                % max(self.cfg.iv.tracking_ba_rate, 1) == 0
            )
            return
        run_ba = (
            frame.frame_id % max(self.cfg.iv.tracking_ba_rate, 1) == 0
        )
        self.local_mapping.loop_once(run_ba=run_ba)
        if (
            self.cfg.system.enable_loop_closing
            and hasattr(self, "loop_closing")
            and self.map.kf_alive[self.ref_kf]
        ):
            # merge a deferred global BA from an earlier closure before
            # anything else touches the map at this keyframe event (the
            # reference's RunGlobalBundleAdjustment merge-back runs
            # concurrently; here the next keyframe event is the join point)
            if self.loop_closing.collect_gba():
                self._mark_mirror_stale()
            # force-join any async local BA before a potential loop
            # correction: a stale merge after CorrectLoop would overwrite
            # the corrected poses (the reference sets mbAbortBA +
            # mbStopGBA before correcting, LoopClosing.cc:437-449)
            self.local_mapping.apply_pending_ba()
            if self.loop_closing.process_keyframe(
                self.ref_kf, fix_scale=self.cfg.system.sensor != "mono"
            ):
                self._mark_mirror_stale()

    def _create_new_keyframe_locked(self, frame, desc_fut=None):
        kf_id = self.map.add_keyframe(frame)
        self.ref_kf = kf_id
        frame.ref_kf = kf_id
        cam = self.cfg.camera
        depth_order = np.argsort(np.where(frame.depth > 0, frame.depth, np.inf))
        # reference loop semantics (Tracking.cc:1795-1850): walk close-to-
        # far, create points for unassociated features, stop at the first
        # entry past ThDepth once >100 points are registered. Sorted order
        # makes the cutoff computable up front, so the per-point 4x4
        # inverse becomes ONE vectorized unprojection.
        z_sorted = frame.depth[depth_order]
        n_pos = int(np.count_nonzero(z_sorted > 0))
        n_close = int(np.count_nonzero(
            (z_sorted > 0) & (z_sorted <= cam.depth_threshold)))
        # the reference processes the first past-ThDepth entry too before
        # its (z > th && n > 100) break fires — hence the +1
        k = min(n_close + 1, n_pos) if n_close > 100 else min(101, n_pos)
        idx = depth_order[:k]
        pids = frame.map_pt[idx]
        create = (pids < 0) | (self.map.pt_n_obs[np.maximum(pids, 0)] == 0)
        ci = idx[create]
        if len(ci):
            Twc = np.linalg.inv(frame.pose)
            z = frame.depth[ci]
            pc = np.stack([
                (frame.xy[ci, 0] - cam.cx) * z / cam.fx,
                (frame.xy[ci, 1] - cam.cy) * z / cam.fy,
                z,
            ], axis=1)
            pw = pc @ Twc[:3, :3].T + Twc[:3, 3]
        touched = []
        if len(ci):
            quals = (
                frame.qual_score[ci].astype(np.float32)
                if self.cfg.iv.propagate_keyptqual
                else 1.0
            )
            new_pids = self.map.add_points_batch(
                pw.astype(np.float32), kf_id, quals)
            # seed the fresh points' observation dicts directly: no prior
            # observations exist, so add_observation's remove-old handling
            # is dead weight here (stereo features weigh 2, mono 1 —
            # MapPoint::AddObservation)
            w = np.where(frame.u_right[ci] >= 0, 2, 1)
            obs = self.map.pt_obs
            n_obs = self.map.pt_n_obs
            for pid, i, wi in zip(new_pids, ci, w):
                obs[pid][kf_id] = int(i)
                n_obs[pid] = wi
            frame.map_pt[ci] = new_pids
            touched.extend(new_pids.tolist())
        # register observations of existing tracked points
        for i in np.nonzero(frame.map_pt >= 0)[0]:
            pid = int(frame.map_pt[i])
            if self.map.pt_alive[pid] and kf_id not in self.map.pt_obs[pid]:
                self.map.add_observation(pid, kf_id, int(i))
                touched.append(pid)
        if desc_fut is not None and frame._desc is None:
            frame._desc = desc_fut.result()
        self.map.compute_distinctive_descriptor_batch(touched)
        self.map.update_normal_and_depth_batch(touched)
        self.last_kf_frame_id = frame.frame_id
        self._mark_mirror_stale()
        self.local_mapping.insert_keyframe(kf_id)

    # -------------------------------------------------------- relocalization

    def attach_vocabulary(self, voc):
        """Enable BoW-dependent features (relocalization, loop closing)."""
        from .keyframe_db import KeyFrameDatabase
        from .loop_closing import LoopClosing

        self.voc = voc
        self.kfdb = KeyFrameDatabase(voc)
        self.loop_closing = LoopClosing(self.cfg, self.map, voc, self.kfdb)

    def _relocalization(self) -> bool:
        """Tracking::Relocalization (2272-2421): BoW candidates -> per-
        candidate BoW matching -> PnP RANSAC -> pose optimization; accept
        at >= 50 inliers. (The IV-SLAM fork resets instead of relocalizing
        — Tracking.cc:829-854 `|| true` — so this runs only when BoW mode
        is explicitly enabled.)"""
        import jax

        from ..ops import bow_match
        from ..solvers import pnp

        if not hasattr(self, "voc") or self.map.n_keyframes == 0:
            return False
        frame = self.current
        leaf = self.voc.transform_nodes(frame.desc, frame.valid)
        bow = self.voc.bow_vector(frame.desc, nodes=leaf)
        cands = self.kfdb.detect_relocalization_candidates(bow, self.map)
        if not cands:
            return False
        nodes_cur = self.voc.feature_nodes(frame.desc, nodes=leaf)
        cam = self.cfg.camera
        sf2 = self.map.scale_factors ** 2
        for cand in cands[:5]:
            cf = self.map.kf_frames[cand]
            if cf is None:
                continue
            self.loop_closing._ensure_bow(cand)
            assign, n = bow_match.search_by_bow(
                jnp.asarray(cf.desc),
                jnp.asarray(self.loop_closing.kf_nodes[cand]),
                jnp.asarray(cf.angle), jnp.asarray((cf.map_pt >= 0) & cf.valid),
                frame.kp.desc, jnp.asarray(nodes_cur),
                frame.kp.angle, frame.kp.valid,
                jnp.float32(0.75),
            )
            if int(n) < 15:
                continue
            assign_np = np.asarray(assign)
            ai = np.nonzero(assign_np >= 0)[0]
            pids = cf.map_pt[ai]
            alive = self.map.pt_alive[pids]
            ai, pids = ai[alive], pids[alive]
            bi = assign_np[ai]
            if len(ai) < 6:
                continue
            cap = frame.xy.shape[0]
            Xw = np.zeros((cap, 3), np.float32)
            uv = np.zeros((cap, 2), np.float32)
            s2 = np.ones(cap, np.float32)
            val = np.zeros(cap, bool)
            Xw[: len(ai)] = self.map.pt_pos[pids]
            uv[: len(ai)] = frame.xy[bi]
            s2[: len(ai)] = sf2[frame.octave[bi]]
            val[: len(ai)] = True
            res = pnp.pnp_ransac(
                jnp.asarray(Xw), jnp.asarray(uv), jnp.asarray(s2),
                jnp.asarray(val),
                cam.fx, cam.fy, cam.cx, cam.cy,
                jax.random.PRNGKey(frame.frame_id),
            )
            if not bool(res.ok):
                continue
            frame.set_pose(np.asarray(res.T))
            frame.map_pt[:] = -1
            frame.map_pt[bi] = pids
            n_in = self._pose_optimize(frame)
            if n_in >= 50:
                self.state = State.OK
                return True
        return False

    # -------------------------------------------------------- introspection

    def enable_datagen(self, out_path=None):
        from ..introspection.datagen import DataGenerator

        self.datagen = DataGenerator(self.cfg, self.map, out_path)

    def _run_datagen(self, frame):
        """Training-data generation hooks (Tracking.cc:687-775): run after
        pose estimation on OK frames past the warmup."""
        if (
            self.datagen is None
            or not self.cfg.iv.enabled
            or self.cfg.iv.inference_mode
            or frame.frame_id <= 2
        ):
            return
        self.datagen.set_map(self.map)
        img_hw = (self.height, self.width)
        if self.cfg.iv.unsupervised_learning:
            chi2 = getattr(frame, "chi2", None)
            if chi2 is None:
                return
            found = np.where(
                frame.map_pt >= 0,
                self.map.pt_found[np.maximum(frame.map_pt, 0)],
                0,
            )
            reliable = True
            if frame.gt_pose is not None and self.last_frame is not None:
                from ..introspection import unsupervised as unsup

                ref_kf = self.ref_kf
                if ref_kf >= 0 and self.map.kf_gt_pose[ref_kf] is not None:
                    err6 = unsup.relative_pose_error(
                        np.linalg.inv(self.map.kf_pose[ref_kf]),
                        np.linalg.inv(frame.pose),
                        self.map.kf_gt_pose[ref_kf],
                        frame.gt_pose,
                    )
                    dt = max(
                        (frame.frame_id - self.last_kf_frame_id)
                        / max(self.max_frames, 1),
                        1e-3,
                    )
                    rel_gt = (
                        np.linalg.inv(self.map.kf_gt_pose[ref_kf])
                        @ frame.gt_pose
                    )
                    reliable = unsup.evaluate_tracking_accuracy(
                        err6, rel_gt, dt,
                        self.cfg.iv.ref_pose_ang_var_inv,
                        self.cfg.iv.ref_pose_trans_var_inv,
                    )
            self.datagen.process_frame_unsupervised(
                frame, frame.chi2, frame.chi2_dof, found, reliable, img_hw
            )
        else:
            self.datagen.process_frame_supervised(
                frame, img_hw, prev_frame=self.last_frame
            )

    # -------------------------------------------------------------- failure

    def _handle_lost(self, timestamp: float):
        """Tracking.cc:829-854: reset; count failures once initialized maps
        had > 3 keyframes."""
        if self.map.n_keyframes > 3:
            self.failure_count += 1
            self.failure_timestamps.append(timestamp)
            import logging

            logging.getLogger(__name__).warning(
                "tracking LOST at t=%.2f (kfs=%d pts=%d last_fail=%s)",
                timestamp, self.map.n_keyframes, self.map.n_points,
                getattr(self, "_last_fail", None),
            )
        self._reset()

    def _reset(self):
        # dispatched speculations mirror a dead map now — strip them but
        # KEEP the queued frames: each still gets processed (fresh) so
        # the per-frame trajectory bookkeeping stays gap-free
        for e in self._pendq:
            e.update(res=None, flat=None, fut=None, ver=-1)
        # drain the worker before discarding the map it is mutating
        try:
            self.local_mapping.join()
        except Exception:
            pass  # a failed event on a map being reset is moot
        self.local_mapping.stop_worker()
        # bake out this sub-session's absolute poses before dropping the map
        # (the reference saves per-sub-session trajectories on each failure,
        # Tracking.cc:2433-2504)
        self._finalized_twc.extend(self._compose_session())
        self._session_start = len(self.rel_poses)
        self.map = MapStore(
            n_levels=self.cfg.orb.n_levels,
            scale_factor=self.cfg.orb.scale_factor,
        )
        self.local_mapping = LocalMapping(self.cfg, self.map)
        if hasattr(self, "_dmap"):
            # carry the device mirror over so post-reset keyframe events
            # keep the indexed (prewarmed) fuse path
            self.local_mapping.dmap = self._dmap
        if self.cfg.system.threaded_local_mapping:
            self._setup_threaded_mapping()
        self.state = State.NOT_INITIALIZED
        self.velocity = None
        self.ref_kf = -1
        self.local_kfs = []
        self.local_pts = np.zeros(0, np.int64)
        self._mark_mirror_stale()  # the device map mirrors a dead map now
        if hasattr(self, "voc"):
            self.attach_vocabulary(self.voc)  # fresh KF database for the new map

    # ----------------------------------------------------------- trajectory

    def _record_trajectory(self, lost: bool):
        frame = self.current
        self.frame_times.append(frame.timestamp)
        self.lost_flags.append(lost)
        if lost or frame.pose is None or self.ref_kf < 0:
            self.rel_poses.append(
                self.rel_poses[-1] if self.rel_poses else np.eye(4, dtype=np.float32)
            )
            self.rel_refs.append(self.rel_refs[-1] if self.rel_refs else -1)
        else:
            Tcr = frame.pose @ np.linalg.inv(self.map.kf_pose[self.ref_kf])
            self.rel_poses.append(Tcr.astype(np.float32))
            self.rel_refs.append(self.ref_kf)

    def _compose_session(self) -> List[np.ndarray]:
        out = []
        for Tcr, ref in zip(
            self.rel_poses[self._session_start:],
            self.rel_refs[self._session_start:],
        ):
            if ref < 0:
                out.append(np.eye(4, dtype=np.float32))
            else:
                Tcw = Tcr @ self.map.kf_pose[ref]
                out.append(np.linalg.inv(Tcw).astype(np.float32))
        return out

    def trajectory_poses(self) -> List[np.ndarray]:
        """Absolute Twc per frame, composed like SaveTrajectoryKITTI
        (System.cc:709-772): Tcw = Tcr * Trw with the *current* KF poses."""
        self.flush_chain()
        return self._finalized_twc + self._compose_session()
