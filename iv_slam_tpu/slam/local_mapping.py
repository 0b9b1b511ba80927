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


class LocalMapping:
    def __init__(self, cfg: Config, map_store):
        self.cfg = cfg
        self.map = map_store
        self.queue: List[int] = []
        # recently added points: pid -> kf_id when created
        self.recent_points: Dict[int, int] = {}
        self.current_kf: int = -1
        self._local_ba = None  # set lazily to avoid import cycle

    def insert_keyframe(self, kf_id: int):
        self.queue.append(kf_id)
        frame = self.map.kf_frames[kf_id]
        for i in np.nonzero(frame.map_pt >= 0)[0]:
            pid = int(frame.map_pt[i])
            if self.map.pt_first_kf[pid] == kf_id:
                self.recent_points[pid] = kf_id

    def loop_once(self, run_ba: bool = True):
        while self.queue:
            kf_id = self.queue.pop(0)
            self.current_kf = kf_id
            self._cull_map_points(kf_id)
            if self.map.n_keyframes > 2 and run_ba:
                self._run_local_ba(kf_id)
            self._cull_keyframes(kf_id)

    # ------------------------------------------------------------- culling

    def _cull_map_points(self, kf_id: int):
        """MapPointCulling (LocalMapping.cc:236-271): recently created
        points must prove themselves (found/visible ratio, observations)."""
        th_obs = 3  # stereo
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

        local_ba.local_bundle_adjustment(self.cfg, self.map, kf_id)
