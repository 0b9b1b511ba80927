"""Local mapping, run inline per keyframe (LocalMapping.cc:47-170).

The reference runs this on its own thread; the single-threaded LoopOnce
variant (LocalMapping.cc:119-170) — which the driver binaries use with
run_single_threaded=true — is the semantics implemented here:

  ProcessNewKeyFrame -> MapPointCulling (236) -> [CreateNewMapPoints (273)]
  -> [SearchInNeighbors] -> LocalBundleAdjustment (if >2 KFs and run_ba)
  -> KeyFrameCulling (705)

Triangulation of new (non-stereo-seeded) points and neighbor fusion arrive
with loop closure support; stereo keyframes already seed their close map
points in CreateNewKeyFrame, which carries KITTI-style stereo sequences.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..config import Config
from ..utils import argpack


class LocalMapping:
    def __init__(self, cfg: Config, map_store):
        self.cfg = cfg
        self.map = map_store
        self.queue: List[int] = []
        # recently added points: pid -> kf_id when created
        self.recent_points: Dict[int, int] = {}
        self.current_kf: int = -1
        self._local_ba = None  # set lazily to avoid import cycle
        self._pending_ba = None  # in-flight async local BA (LBAHandle)
        # --- worker-thread mode (cfg.system.threaded_local_mapping):
        # the reference's LocalMapping thread (System.cc:172-197)
        self._worker = None
        self._map_changed = False   # worker -> tracking dmap-resync signal
        self.post_kf_hook = None    # loop closing, installed by Tracking
        # device-resident map mirror (tracking's DeviceMap), installed by
        # Tracking when fused tracking is active: fuse gathers candidate
        # point tables from it by arena index instead of re-uploading
        # them (the worker delta-syncs it right before assembling)
        self.dmap = None
        # optional per-stage wall-clock tracing (utils/profiling.StageTimer)
        self.stage_timer = None
        # program-shape family (set_link_profile): chunked by default;
        # high-RTT links switch to the monolithic shapes
        self.fuse_chunk = self.FUSE_CHUNK
        self.tri_chunk = self.TRI_CHUNK
        self.monolithic_device = False

    def set_link_profile(self, high_rtt: bool):
        """Select the worker's device-program shape family from the
        measured link (see SystemConfig.link_adaptive). high_rtt=True:
        monolithic stages (64-target fuse, 16-neighbor triangulation,
        single-dispatch local BA) — minimum host syncs, each worth a
        full RTT. Explicit IVT_FUSE_CHUNK / IVT_TRI_CHUNK env overrides
        win (they are the bisection aid)."""
        import os

        if "IVT_FUSE_CHUNK" not in os.environ:
            self.fuse_chunk = 64 if high_rtt else self.FUSE_CHUNK
        if "IVT_TRI_CHUNK" not in os.environ:
            self.tri_chunk = 16 if high_rtt else self.TRI_CHUNK
        self.monolithic_device = high_rtt

    def _stage(self, name: str):
        import contextlib

        if self.stage_timer is None:
            return contextlib.nullcontext()
        return self.stage_timer.time(name)

    def insert_keyframe(self, kf_id: int):
        self.queue.append(kf_id)
        frame = self.map.kf_frames[kf_id]
        for i in np.nonzero(frame.map_pt >= 0)[0]:
            pid = int(frame.map_pt[i])
            if self.map.pt_first_kf[pid] == kf_id:
                self.recent_points[pid] = kf_id

    def apply_pending_ba(self, only_if_ready: bool = False) -> bool:
        """Merge an in-flight async local BA (solvers/local_ba.py
        LBAHandle). only_if_ready: cheap per-frame poll — merge only when
        the device result already landed, never block. Thread-safe: the
        handle swap happens under the map lock (tracking's per-frame poll
        and the worker's forced join can race here); the device readback
        runs OUTSIDE the lock."""
        with self.map.lock:
            h = self._pending_ba
            if h is None:
                return False
            if only_if_ready and not h.is_ready():
                return False
            self._pending_ba = None
        from ..solvers import local_ba

        local_ba.apply_local_ba(h, self.map)
        return True

    def loop_once(self, run_ba: bool = True):
        while self.queue:
            kf_id = self.queue.pop(0)
            self._process_one(kf_id, run_ba)

    def _process_one(self, kf_id: int, run_ba: bool = True):
        self.current_kf = kf_id
        # a keyframe event is a forced join point for the previous
        # event's async BA (its window overlaps ours)
        with self._stage("lm_join_prev_ba"):
            self.apply_pending_ba()
        with self._stage("lm_cull_points"):
            with self.map.lock:
                self._cull_map_points(kf_id)
        with self._stage("lm_triangulate"):
            self._create_new_map_points(kf_id)
        with self._stage("lm_fuse"):
            self._search_in_neighbors(kf_id)
        if self.map.n_keyframes > 2 and run_ba:
            with self._stage("lm_local_ba"):
                with self.map.lock:
                    self._run_local_ba(kf_id)
                # segmented async BA: step the remaining LM segments OFF
                # the map lock (tracking's host bookkeeping must not wait)
                # — each segment syncs before the next dispatches, so the
                # solve never monopolizes the device queue. WORKER MODE
                # ONLY: in non-worker async mode _process_one runs on the
                # tracking thread, and an eager segment walk (five
                # dispatches, a host sync each) would put ~6 link RTTs on
                # the keyframe event's critical path — there the segments
                # are driven incrementally by the per-frame
                # apply_pending_ba(only_if_ready=True) poll instead
                h = self._pending_ba
                if h is not None and self._worker is not None:
                    h.drive()
        with self._stage("lm_cull_keyframes"):
            with self.map.lock:
                self._cull_keyframes(kf_id)

    # ------------------------------------------------------ worker thread

    def start_worker(self):
        """Run keyframe events on a background thread — the reference's
        LocalMapping::Run thread. Device programs (triangulation, fuse,
        BA) and host bookkeeping leave the tracking critical path; host
        map access is serialized by MapStore.lock with the lock RELEASED
        around blocking device readbacks."""
        import queue
        import threading

        if self._worker is not None:
            return
        self._q = queue.Queue()
        self._idle = threading.Event()
        self._idle.set()
        self.worker_exc = None
        self._worker = threading.Thread(
            target=self._worker_run, daemon=True, name="iv-local-mapping"
        )
        self._worker.start()

    def _worker_run(self):
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                return
            kf_id, run_ba = item
            try:
                self._process_one(kf_id, run_ba)
                hook = self.post_kf_hook
                if hook is not None:
                    hook(kf_id)
            except Exception as e:  # surfaced at the next join()
                self.worker_exc = e
            finally:
                self._map_changed = True
                self._q.task_done()
                if self._q.unfinished_tasks == 0:
                    self._idle.set()

    def kick_async(self, run_ba: bool = True):
        """Hand queued keyframes to the worker (threaded mode's
        loop_once)."""
        while self.queue:
            kf_id = self.queue.pop(0)
            self._idle.clear()
            self._q.put((kf_id, run_ba))

    def pending_count(self) -> int:
        """Keyframes not yet fully processed (reference NeedNewKeyFrame's
        mlNewKeyFrames.size() backpressure gate)."""
        if self._worker is None:
            return len(self.queue)
        return self._q.unfinished_tasks

    def poll_map_changed(self) -> bool:
        """One-shot: did the worker finish an event since the last poll?"""
        if self._map_changed:
            self._map_changed = False
            return True
        return False

    def join(self):
        """Forced join point (trajectory save, loop-closure prep, reset,
        shutdown): drain the worker queue, then merge any in-flight BA.
        Re-raises a worker exception if one occurred."""
        if self._worker is not None:
            self._q.join()
            if self.worker_exc is not None:
                e, self.worker_exc = self.worker_exc, None
                raise e
        self.apply_pending_ba()

    def stop_worker(self):
        if self._worker is None:
            return
        self._q.join()
        self._q.put(None)
        self._worker.join(timeout=60)
        self._worker = None

    # -------------------------------------------------------- triangulation

    def _create_new_map_points(self, kf_id: int, n_neighbors: int = 10):
        """LocalMapping::CreateNewMapPoints (273-525): triangulate new
        points against the best covisible keyframes.

        Device shape: the reference's per-neighbor loop becomes ONE
        launch per keyframe event — the neighbor-batched epipolar search
        feeds triangulation of every (neighbor, feature) pair inside the
        same program (ops/triangulate.py triangulate_event), one dispatch
        + one (NB, N1, 5) download instead of 2 x NB round-trips with a
        host compaction between the stages."""
        import jax.numpy as jnp

        from ..ops import triangulate as tri

        m = self.map
        cam = self.cfg.camera
        import contextlib

        _stack = contextlib.ExitStack()
        _stack.enter_context(self._stage("lm_tri.assemble"))
        # host reads snapshot under the map lock (threaded mode); the
        # upload + dispatch + download run unlocked; the apply loop below
        # re-locks and revalidates
        m.lock.acquire()
        try:
            cur = m.kf_frames[kf_id]
            if cur is None:
                return
            K = cam.K().astype(np.float64)
            Kinv = np.linalg.inv(K)
            sf = m.scale_factors
            sf2 = sf ** 2
            T1 = m.kf_pose[kf_id]
            O1 = m.kf_camera_center(kf_id)
            free1 = cur.valid & (cur.map_pt < 0)
            if free1.sum() < 5:
                return
            is_mono = cur.depth.max() <= 0

            # ---- host gates + per-neighbor tables (LocalMapping.cc:295-330)
            cand = []
            for nb, _w in m.covisible_keyframes(kf_id)[:n_neighbors]:
                T2 = m.kf_pose[nb]
                O2 = m.kf_camera_center(nb)
                baseline = float(np.linalg.norm(O2 - O1))
                if is_mono:
                    # mono gate: baseline / median scene depth > 0.01
                    med_depth = self._median_scene_depth(nb)
                    if med_depth <= 0 or baseline / med_depth < 0.01:
                        continue
                elif baseline < cam.baseline:
                    # stereo gate: baseline must exceed the stereo baseline
                    continue
                nf = m.kf_frames[nb]
                free2 = nf.valid & (nf.map_pt < 0)
                if free2.sum() < 5:
                    continue
                # epipole of cam1 in image 2
                c1_in2 = T2[:3, :3] @ O1 + T2[:3, 3]
                if abs(c1_in2[2]) < 1e-6:
                    continue
                epipole2 = np.array(
                    [cam.fx * c1_in2[0] / c1_in2[2] + cam.cx,
                     cam.fy * c1_in2[1] / c1_in2[2] + cam.cy], np.float32,
                )
                # F12 = K^-T [t12]x R12 K^-1 (ComputeF12, LocalMapping.cc:609)
                # in host numpy: 3x3 work is not worth a device round-trip
                R1m, t1m = T1[:3, :3], T1[:3, 3]
                R2m, t2m = T2[:3, :3], T2[:3, 3]
                R12 = R1m @ R2m.T
                t12 = -(R12 @ t2m) + t1m
                tx = np.array(
                    [[0.0, -t12[2], t12[1]],
                     [t12[2], 0.0, -t12[0]],
                     [-t12[1], t12[0], 0.0]]
                )
                F12 = (Kinv.T @ tx @ R12 @ Kinv).astype(np.float32)
                cand.append(dict(
                    nb=nb, nf=nf, T2=T2, free2=free2, F12=F12,
                    epipole2=epipole2,
                ))
            if not cand:
                return

            # ---- CHUNKED launches: epipolar search + all-pair
            # triangulation fused per <=TRI_CHUNK-neighbor chunk (one
            # compiled shape per session; padded slots masked out). The
            # r3 16-neighbor monolith held the chip ~75 ms per event
            # while tracking's chained steps queued behind it; two ~40 ms
            # chunks with a pull between open a device-queue gap for the
            # tracking thread (same rationale as the chunked fuse).
            nb_cap = self.tri_chunk
            cand = cand[:16]
            f32s = np.float32

            def build_args(chunk):
                pad_nb = nb_cap - len(chunk)
                c0 = chunk[0]

                def stack(get, pad_value=None):
                    rows = [get(c) for c in chunk]
                    if pad_nb:
                        rows += [get(c0) if pad_value is None
                                 else pad_value] * pad_nb
                    return np.stack(rows)

                # device-resident event: keypoint tables (xy/desc/octave/
                # u_right/depth) stack straight from the frames' frontend
                # outputs on device; only the free-masks, the 3x3
                # epipolar geometry, and poses ride the (single, packed)
                # host upload — ~35 KB/event instead of ~2.5 MB of
                # re-uploaded float tables
                def dstack(get, fallback):
                    rows = []
                    for c in chunk + [c0] * pad_nb:
                        v = get(c)
                        rows.append(v if v is not None else
                                    jnp.asarray(fallback(c)))
                    return jnp.stack(rows)

                return (
                    cur.kp.xy, cur.kp.desc, np.asarray(free1),
                    cur.ur_dev if cur.ur_dev is not None
                    else np.asarray(cur.u_right, f32s),
                    cur.depth_dev if cur.depth_dev is not None
                    else np.asarray(cur.depth, f32s),
                    cur.kp.octave,
                    dstack(lambda c: c["nf"].kp.xy, None),
                    dstack(lambda c: c["nf"].kp.desc, None),
                    # padded slots are all-False masks: zero matches
                    np.asarray(stack(
                        lambda c: c["free2"],
                        np.zeros_like(c0["free2"]))),
                    dstack(lambda c: c["nf"].ur_dev,
                           lambda c: np.asarray(c["nf"].u_right, f32s)),
                    dstack(lambda c: c["nf"].depth_dev,
                           lambda c: np.asarray(c["nf"].depth, f32s)),
                    dstack(lambda c: c["nf"].kp.octave, None),
                    np.asarray(stack(lambda c: c["F12"]), f32s),
                    np.asarray(stack(lambda c: c["epipole2"]), f32s),
                    np.full(nb_cap, is_mono),
                    np.asarray(T1, f32s),
                    np.asarray(stack(lambda c: c["T2"]), f32s),
                    np.asarray(sf, f32s),
                    np.asarray(cam.fx, f32s), np.asarray(cam.fy, f32s),
                    np.asarray(cam.cx, f32s), np.asarray(cam.cy, f32s),
                    np.asarray(cam.bf, f32s),
                )

            chunks = [cand[i:i + nb_cap]
                      for i in range(0, len(cand), nb_cap)]
            chunk_args = [build_args(c) for c in chunks]
        finally:
            m.lock.release()
            _stack.close()

        all_rows = []
        with self._stage("lm_tri.device"):
            # compact download per chunk: (T_CAP, 6) accepted-pair table
            # + count (~25 KB) instead of a dense (NB, N1, 5) pack; each
            # chunk is pulled before the next dispatches (queue gaps for
            # the tracking thread)
            for ci, args in enumerate(chunk_args):
                flat = np.asarray(argpack.call_packed(
                    tri.triangulate_event_compact, *args))
                rows = flat[:-2].reshape(tri.T_CAP, 6)
                n_good, n_matched = int(flat[-2]), int(flat[-1])
                if n_matched > tri.T_CAP:  # never silent (VERDICT r2)
                    import logging

                    logging.getLogger(__name__).warning(
                        "triangulate_event: %d epipolar matches > cap %d;"
                        " extras dropped this event", n_matched, tri.T_CAP,
                    )
                rows = rows[: min(n_good, tri.T_CAP)].copy()
                # explicit range guard: padded slots carry all-False
                # masks upstream, but a device-side masking regression
                # must not turn into an IndexError in the apply loop
                rows = rows[rows[:, 0] < len(chunks[ci])]
                rows[:, 0] += ci * nb_cap   # chunk-local -> global index
                all_rows.append(rows)
        rows = (np.concatenate(all_rows) if all_rows
                else np.zeros((0, 6), f32s))

        with self._stage("lm_tri.apply"), m.lock:
            new_pids = []
            for nb_i, f1, f2, x, y, z in rows:
                c = cand[int(nb_i)]
                nf = c["nf"]
                f1, f2 = int(f1), int(f2)
                if cur.map_pt[f1] >= 0 or nf.map_pt[f2] >= 0:
                    continue
                pid = m.add_point(np.array([x, y, z], np.float32), kf_id)
                m.add_observation(pid, kf_id, f1)
                m.add_observation(pid, c["nb"], f2)
                cur.map_pt[f1] = pid
                nf.map_pt[f2] = pid
                new_pids.append(pid)
                self.recent_points[pid] = kf_id
            m.compute_distinctive_descriptor_batch(new_pids)
            m.update_normal_and_depth_batch(new_pids)

    def _median_scene_depth(self, kf_id: int) -> float:
        """KeyFrame::ComputeSceneMedianDepth: median z of the keyframe's map
        points in its camera frame."""
        m = self.map
        frame = m.kf_frames[kf_id]
        T = m.kf_pose[kf_id]
        pids = frame.map_pt[frame.map_pt >= 0]
        pids = pids[m.pt_alive[pids]]
        if len(pids) == 0:
            return -1.0
        z = (m.pt_pos[pids] @ T[:3, :3].T + T[:3, 3])[:, 2]
        return float(np.median(z))

    # --------------------------------------------------------------- fuse

    def _search_in_neighbors(self, kf_id: int):
        """LocalMapping::SearchInNeighbors (527-607): fuse current-KF map
        points into 2-hop covisible keyframes and vice versa.

        Device shape: every (target keyframe x candidate point) projection
        + window search + Hamming runs as ONE dispatch
        (ops/match.py fuse_into_keyframes); the host then applies the
        add-observation / Replace bookkeeping from the returned
        assignment, revalidating liveness in sequence."""
        import jax.numpy as jnp

        from ..ops import match as match_ops

        m = self.map
        cam = self.cfg.camera
        # delta-sync the device mirror first (under the map lock) so the
        # indexed fuse sees this event's triangulated points — the sync
        # uploads only the dirty rows (~70 KB) where the legacy path
        # re-uploaded full candidate tables (~0.5-1 MB)
        if self.dmap is not None:
            with self._stage("lm_fuse.sync"), m.lock:
                self.dmap.sync(m)
        # snapshot host reads under the map lock; unlock for the device
        # round-trip; re-lock for the apply loop (which revalidates)
        with self._stage("lm_fuse.assemble"):
            with m.lock:
                calls = self._assemble_fuse(kf_id)
        results = []
        with self._stage("lm_fuse.device"):
            # CHUNKED dispatch: the forward side ships as <=16-target
            # chunks and the reverse side as its own call, each pulled
            # before the next dispatches. A single monolithic program
            # (r3: 64 x 2048 forward) held the chip for ~90 ms while the
            # tracking thread's 15-35 ms chained steps queued behind it —
            # the keyframe-event stall the staged profile attributes most
            # of its slow frames to. Serial chunk pulls cost the worker a
            # few link RTTs (~4 ms each) but open device-queue gaps the
            # tracking dispatches slide into (the worker is off the
            # critical path; tracking latency is what the fps pays for).
            for fn, args, targets, pid_arr in calls:
                if args is None:
                    results.append((targets, pid_arr, None))
                    continue
                flat = np.asarray(argpack.call_packed(fn, *args))
                results.append((targets, pid_arr, flat))
        with self._stage("lm_fuse.apply"):
            with m.lock:
                for targets, pid_arr, flat in results:
                    if flat is None:
                        continue
                    triples = flat[:-1].reshape(match_ops.F_CAP, 3)
                    count = int(flat[-1])
                    if count > match_ops.F_CAP:
                        import logging

                        logging.getLogger(__name__).warning(
                            "fuse: %d matches > cap %d; extras dropped "
                            "this event", count, match_ops.F_CAP,
                        )
                    triples = triples[: min(count, match_ops.F_CAP)]
                    triples = triples.astype(np.int64)
                    triples = triples[triples[:, 0] < len(targets)]
                    self._apply_fuse_triples(kf_id, targets, pid_arr,
                                             triples)

    # forward-fuse chunk size: one device program per <=16 covisible
    # targets (the prewarmed 16-rung) so the worker never holds the chip
    # longer than ~25 ms per dispatch. Env overrides are a bisection aid
    # (IVT_FUSE_CHUNK=64 / IVT_TRI_CHUNK=16 restore the r3 monoliths).
    import os as _os
    FUSE_CHUNK = int(_os.environ.get("IVT_FUSE_CHUNK", "16"))
    # triangulation chunk size: neighbors per triangulate_event program
    TRI_CHUNK = int(_os.environ.get("IVT_TRI_CHUNK", "8"))
    del _os

    def _assemble_fuse(self, kf_id: int):
        """Build the fuse call list: FORWARD chunks (<=FUSE_CHUNK
        covisible targets x the current keyframe's own points — point
        axis bounded by the 2048 frame capacity) then the REVERSE call
        (the current keyframe as the single target x the union of the
        targets' points). Returns [(fn, args, targets, pid_arr), ...];
        args is None for an empty entry."""
        m = self.map
        targets = []
        for nb, _w in m.covisible_keyframes(kf_id)[:10]:
            targets.append(nb)
            for nb2, _w2 in m.covisible_keyframes(nb)[:5]:
                if nb2 != kf_id and nb2 not in targets:
                    targets.append(nb2)
        cur = m.kf_frames[kf_id]
        mp = cur.map_pt[cur.map_pt >= 0]
        cur_pts = mp[m.pt_alive[mp]]          # feature order, as before
        # reverse fuse: neighbors' points into the current keyframe —
        # np.unique == sorted(set(...)) but vectorized (the python
        # set loop over ~10-20k ids cost ~10 ms per event)
        if targets:
            all_nb = np.concatenate(
                [m.kf_frames[nb].map_pt for nb in targets])
            all_nb = all_nb[all_nb >= 0]
            fuse_pts = np.unique(all_nb[m.pt_alive[all_nb]])
        else:
            fuse_pts = np.zeros(0, np.int64)
        NB_CAP = 64
        targets = targets[:NB_CAP]
        if not targets:
            return []
        calls = []
        if len(cur_pts):
            for i in range(0, len(targets), self.fuse_chunk):
                chunk = targets[i:i + self.fuse_chunk]
                calls.append(self._fuse_args(chunk, cur_pts,
                                             fwd_p_cap=2048))
        if len(fuse_pts):
            calls.append(self._fuse_args([kf_id], fuse_pts))
        return calls

    # reverse-fuse point-axis cap: the union of up to 64 covisible
    # keyframes' points; beyond it the candidate set is truncated (warned
    # by the F_CAP overflow path, never silent)
    P_CAP = 16384

    def _fuse_args(self, targets, pts, fwd_p_cap=None):
        import jax.numpy as jnp

        from ..ops import match as match_ops

        m = self.map
        cam = self.cfg.camera
        if fwd_p_cap is not None:
            p_cap = fwd_p_cap          # frame capacity bounds cur_pts
            pts = pts[:p_cap]
        else:
            pts = pts[: self.P_CAP]
            p_cap = 4096
            while p_cap < len(pts):
                p_cap *= 2
            p_cap = min(p_cap, self.P_CAP)
        pid_arr = np.asarray(pts, np.int64)
        # target-axis rungs {1, 16, 64}: 1 is the reverse side's shape
        nb_cap = 1 if len(targets) == 1 else (16 if len(targets) <= 16
                                              else 64)
        frames = [m.kf_frames[nb] for nb in targets]
        f0 = frames[0]
        pad = nb_cap - len(targets)
        sf = m.scale_factors
        f32s = np.float32

        def ur_stack():
            rows = [f.ur_dev if f.ur_dev is not None
                    else jnp.asarray(np.asarray(f.u_right, f32s))
                    for f in frames]
            return jnp.stack(rows + [rows[0]] * pad)

        kf_args = (
            jnp.stack([f.kp.xy for f in frames] + [f0.kp.xy] * pad),
            jnp.stack([f.kp.octave for f in frames] + [f0.kp.octave] * pad),
            jnp.stack([f.kp.desc for f in frames] + [f0.kp.desc] * pad),
            jnp.stack([f.kp.valid for f in frames] + [f0.kp.valid] * pad),
            ur_stack(),
            np.stack(
                [m.kf_pose[nb] for nb in targets]
                + [m.kf_pose[targets[0]]] * pad
            ).astype(f32s),
        )
        tail = (
            np.asarray(sf, f32s),
            np.asarray(np.log(sf[1] / sf[0])
                       if len(sf) > 1 else 1.0, f32s),
            np.asarray(cam.fx, f32s), np.asarray(cam.fy, f32s),
            np.asarray(cam.cx, f32s), np.asarray(cam.cy, f32s),
            np.asarray(cam.width, f32s), np.asarray(cam.height, f32s),
            np.asarray(cam.bf, f32s),
            np.asarray(3.0, f32s),
        )
        dmap = self.dmap
        if dmap is not None and pid_arr.size and pid_arr.max() < dmap.capacity:
            # indexed path: candidate tables gathered on device from the
            # (just-synced) map mirror — upload is a (p_cap,) int32 index
            # vector + the target masks instead of ~0.5-1 MB of tables
            pid_idx = np.full(p_cap, dmap.capacity, np.int32)
            pid_idx[: len(pts)] = pid_arr
            kf_ok = np.zeros(nb_cap, bool)
            kf_ok[: len(targets)] = True
            args = (
                *kf_args, kf_ok, *dmap.full_views(), pid_idx, *tail,
            )
            return (match_ops.fuse_into_keyframes_compact_indexed, args,
                    targets, pid_arr)

        # legacy path (no device mirror — classic/CPU configurations):
        # upload the candidate point tables directly
        mask = np.zeros((nb_cap, p_cap), bool)
        mask[: len(targets), : len(pts)] = True
        pos = np.zeros((p_cap, 3), np.float32)
        desc = np.zeros((p_cap, 32), np.uint8)
        normal = np.zeros((p_cap, 3), np.float32)
        mind = np.ones(p_cap, np.float32)
        maxd = np.ones(p_cap, np.float32)
        pos[: len(pts)] = m.pt_pos[pid_arr]
        desc[: len(pts)] = m.pt_desc[pid_arr]
        normal[: len(pts)] = m.pt_normal[pid_arr]
        mind[: len(pts)] = m.pt_min_dist[pid_arr]
        maxd[: len(pts)] = m.pt_max_dist[pid_arr]
        args = (
            *kf_args, pos, desc, normal, mind, maxd, mask, *tail,
        )
        return (match_ops.fuse_into_keyframes_compact, args, targets,
                pid_arr)

    def _apply_fuse_triples(self, kf_id, all_targets, pid_arr, triples):
        """Apply the compacted (target, point, feature) fuse matches —
        same bookkeeping as the dense-assignment apply, same order."""
        m = self.map
        touched = set()
        for t, i, feat in triples:
            nb = all_targets[int(t)]
            frame = m.kf_frames[nb]
            pid = int(pid_arr[i])
            if not m.pt_alive[pid] or nb in m.pt_obs[pid]:
                continue
            feat = int(feat)
            existing = int(frame.map_pt[feat])
            if existing >= 0 and m.pt_alive[existing]:
                # keep the better-observed point (MapPoint::Replace)
                if m.n_observations(existing) >= m.n_observations(pid):
                    keep, drop = existing, pid
                else:
                    keep, drop = pid, existing
                for okf, ofeat in list(m.pt_obs[drop].items()):
                    of = m.kf_frames[okf]
                    if okf not in m.pt_obs[keep]:
                        m.add_observation(keep, okf, ofeat)
                        of.map_pt[ofeat] = keep
                    else:
                        of.map_pt[ofeat] = -1
                m.retire_point(drop)
                touched.add(keep)
            else:
                m.add_observation(pid, nb, feat)
                frame.map_pt[feat] = pid
                touched.add(pid)
        alive = [p for p in touched if m.pt_alive[p]]
        m.compute_distinctive_descriptor_batch(alive)
        m.update_normal_and_depth_batch(alive)

    # ------------------------------------------------------------- culling

    def _cull_map_points(self, kf_id: int):
        """MapPointCulling (LocalMapping.cc:236-271): recently created
        points must prove themselves (found/visible ratio, observations).
        Threshold: 2 observations for monocular, 3 for stereo/RGB-D."""
        th_obs = 2 if self.cfg.system.sensor == "mono" else 3
        for pid in list(self.recent_points):
            first_kf = self.recent_points[pid]
            if not self.map.pt_alive[pid]:
                del self.recent_points[pid]
                continue
            age = kf_id - first_kf
            if self.map.found_ratio(pid) < 0.25:
                self.map.kill_point(pid)
                del self.recent_points[pid]
            elif age >= 2 and self.map.n_observations(pid) <= th_obs:
                self.map.kill_point(pid)
                del self.recent_points[pid]
            elif age >= 3:
                del self.recent_points[pid]

    def _cull_keyframes(self, kf_id: int):
        """KeyFrameCulling (LocalMapping.cc:705-780): a local keyframe is
        redundant if >= 90% of its points are seen by >= 3 other keyframes
        at the same or finer scale."""
        for cand, _w in self.map.covisible_keyframes(kf_id):
            if cand == self.map.origin_kf or not self.map.kf_alive[cand]:
                continue
            frame = self.map.kf_frames[cand]
            n_pts = 0
            n_redundant = 0
            for i in np.nonzero(frame.map_pt >= 0)[0]:
                pid = int(frame.map_pt[i])
                if not self.map.pt_alive[pid]:
                    continue
                # stereo: only consider close points (LocalMapping.cc:728-732)
                if (
                    frame.depth[i] > self.cfg.camera.depth_threshold
                    or frame.depth[i] < 0
                ):
                    continue
                n_pts += 1
                if self.map.n_observations(pid) <= 3:
                    continue
                scale_level = frame.octave[i]
                n_obs_finer = 0
                for okf, ofeat in self.map.pt_obs[pid].items():
                    if okf == cand:
                        continue
                    oframe = self.map.kf_frames[okf]
                    if oframe.octave[ofeat] <= scale_level + 1:
                        n_obs_finer += 1
                        if n_obs_finer >= 3:
                            break
                if n_obs_finer >= 3:
                    n_redundant += 1
            if n_pts > 0 and n_redundant > 0.9 * n_pts:
                self._erase_keyframe(cand)

    def _erase_keyframe(self, kf_id: int):
        frame = self.map.kf_frames[kf_id]
        for i in np.nonzero(frame.map_pt >= 0)[0]:
            pid = int(frame.map_pt[i])
            if self.map.pt_alive[pid]:
                self.map.erase_observation(pid, kf_id)
        self.map.kf_alive[kf_id] = False

    # ----------------------------------------------------------------- BA

    def _run_local_ba(self, kf_id: int):
        from ..solvers import local_ba  # local import: solver is heavy

        mode = self.cfg.iv.ba_mode
        if mode == "vis":
            local_ba.local_bundle_adjustment_vis(self.cfg, self.map, kf_id)
        elif mode == "constrained":
            local_ba.constrained_local_bundle_adjustment(
                self.cfg, self.map, kf_id
            )
        elif self.cfg.system.async_local_ba:
            # threaded-reference semantics: tracking proceeds against the
            # pre-BA map; the merge lands when the device result is ready
            # (tracking polls per frame) or at the next keyframe event.
            # Segmented only under a worker thread — on the tracking
            # thread the monolithic single dispatch is the async shape
            # segmented only under a worker thread on a LOW-RTT link:
            # the five inter-segment syncs are queue gaps there and pure
            # RTT tax on a tunneled link (set_link_profile)
            self._pending_ba = local_ba.local_bundle_adjustment_async(
                self.cfg, self.map, kf_id,
                segmented=(self._worker is not None
                           and not self.monolithic_device),
            )
        else:
            local_ba.local_bundle_adjustment(self.cfg, self.map, kf_id)
