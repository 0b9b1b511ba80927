"""Loop detection + correction (src/LoopClosing.cc, inline variant).

Pipeline per new keyframe (LoopClosing::Run, 57-106):

  detect_loop (108): BoW candidates above the covisible min-score, gated by
      3 temporally-consistent candidate groups;
  compute_sim3 (236): BoW matches -> Sim3 RANSAC -> Sim3 refinement ->
      projection search; accept at >= 40 matches (reference thresholds:
      >= 20 BoW matches to try, >= 20 Sim3 inliers to refine);
  correct_loop (407): propagate the corrected Sim3 through the covisible
      neighborhood, move their map points, fuse duplicates against the loop
      side, then optimize the essential graph.

The reference runs this on a thread and spawns an async global-BA thread;
here it runs inline after local mapping (the driver configuration is
single-threaded), with global BA available as an explicit call.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Config
from ..ops import bow_match
from ..solvers import sim3_solver, sim3_opt, essential_graph as eg
from .keyframe_db import KeyFrameDatabase
from .vocabulary import Vocabulary, l1_score

COVISIBILITY_CONSISTENCY_TH = 3


class LoopClosing:
    def __init__(self, cfg: Config, map_store, voc: Vocabulary,
                 kfdb: KeyFrameDatabase):
        self.cfg = cfg
        self.map = map_store
        self.voc = voc
        self.kfdb = kfdb
        self.last_loop_kf = -1
        self.consistent_groups: List[Tuple[set, int]] = []
        # per-kf cached vocabulary data
        self.kf_nodes: Dict[int, np.ndarray] = {}
        self.kf_bow: Dict[int, dict] = {}
        self.n_loops_closed = 0

    # ------------------------------------------------------------- helpers

    def _ensure_bow(self, kf_id: int):
        if kf_id in self.kf_bow:
            return
        frame = self.map.kf_frames[kf_id]
        self.kf_bow[kf_id] = self.voc.bow_vector(frame.desc, frame.valid)
        fv = self.voc.feature_vector(frame.desc, frame.valid)
        nodes = np.full(frame.desc.shape[0], -1, np.int64)
        for node, feats in fv.items():
            nodes[feats] = node
        self.kf_nodes[kf_id] = nodes

    # ----------------------------------------------------------- main loop

    def process_keyframe(self, kf_id: int, fix_scale: bool = True) -> bool:
        """Returns True if a loop was detected and corrected."""
        self._ensure_bow(kf_id)
        self.kfdb.add(kf_id, self.kf_bow[kf_id])
        if self.map.n_keyframes < 11 or kf_id < self.last_loop_kf + 10:
            return False
        candidates = self._detect_loop(kf_id)
        if not candidates:
            return False
        match = self._compute_sim3(kf_id, candidates, fix_scale)
        if match is None:
            return False
        loop_kf, S_corr = match
        self._correct_loop(kf_id, loop_kf, S_corr)
        self.last_loop_kf = kf_id
        self.n_loops_closed += 1
        return True

    # ------------------------------------------------------------- detect

    def _detect_loop(self, kf_id: int) -> List[int]:
        bow = self.kf_bow[kf_id]
        connected = {k for k, _ in self.map.covisible_keyframes(kf_id)}
        min_score = 1.0
        for nb in connected:
            self._ensure_bow(nb)
            min_score = min(min_score, l1_score(bow, self.kf_bow[nb]))
        cands = self.kfdb.detect_loop_candidates(
            kf_id, bow, min_score, connected, self.map
        )
        if not cands:
            self.consistent_groups = []
            return []
        # temporal consistency over 3 detections (LoopClosing.cc:161-225)
        enough: List[int] = []
        new_groups: List[Tuple[set, int]] = []
        for cand in cands:
            group = {cand} | {
                k for k, _ in self.map.covisible_keyframes(cand)
            }
            consistent_for = 0
            for prev_group, prev_count in self.consistent_groups:
                if group & prev_group:
                    consistent_for = max(consistent_for, prev_count + 1)
            new_groups.append((group, consistent_for))
            if consistent_for >= COVISIBILITY_CONSISTENCY_TH:
                enough.append(cand)
        self.consistent_groups = new_groups
        return enough

    # -------------------------------------------------------- compute sim3

    def _compute_sim3(
        self, kf_id: int, candidates: List[int], fix_scale: bool
    ) -> Optional[Tuple[int, "np.ndarray"]]:
        cur = self.map.kf_frames[kf_id]
        cam = self.cfg.camera
        sf2 = (self.map.scale_factors ** 2)
        for cand in candidates:
            self._ensure_bow(cand)
            cf = self.map.kf_frames[cand]
            cur_has = cur.map_pt >= 0
            cand_has = cf.map_pt >= 0
            assign, n = bow_match.search_by_bow(
                jnp.asarray(cf.desc), jnp.asarray(self.kf_nodes[cand]),
                jnp.asarray(cf.angle), jnp.asarray(cand_has & cf.valid),
                jnp.asarray(cur.desc), jnp.asarray(self.kf_nodes[kf_id]),
                jnp.asarray(cur.angle), jnp.asarray(cur_has & cur.valid),
                jnp.float32(0.75),
            )
            if int(n) < 20:
                continue
            assign = np.asarray(assign)
            ai = np.nonzero(assign >= 0)[0]
            bi = assign[ai]
            # matched map point positions in each camera frame
            p_cand_w = self.map.pt_pos[cf.map_pt[ai]]
            p_cur_w = self.map.pt_pos[cur.map_pt[bi]]
            Tc_cand = self.map.kf_pose[cand]
            Tc_cur = self.map.kf_pose[kf_id]
            P1 = p_cand_w @ Tc_cand[:3, :3].T + Tc_cand[:3, 3]
            P2 = p_cur_w @ Tc_cur[:3, :3].T + Tc_cur[:3, 3]
            uv1 = cf.xy[ai]
            uv2 = cur.xy[bi]
            sig1 = sf2[cf.octave[ai]]
            sig2 = sf2[cur.octave[bi]]
            m = len(ai)
            res = sim3_solver.sim3_ransac(
                jnp.asarray(P1), jnp.asarray(P2),
                jnp.asarray(uv1), jnp.asarray(uv2),
                jnp.asarray(np.maximum(sig1, sig2)),
                jnp.ones(m, bool),
                cam.fx, cam.fy, cam.cx, cam.cy,
                jax.random.PRNGKey(kf_id), n_hyp=256, fix_scale=fix_scale,
            )
            if int(res.n_inliers) < 20:
                continue
            # extend matches through the Sim3 window search
            # (ORBmatcher::SearchBySim3 — reference requires >= 40 total
            # matches around the refined Sim3, LoopClosing.cc:236-404)
            sR = np.asarray(res.R) * float(res.s)
            cand_free = np.asarray(cand_has & cf.valid)
            cur_free = np.asarray(cur_has & cur.valid)
            P1_all = (
                self.map.pt_pos[np.maximum(cf.map_pt, 0)] @ Tc_cand[:3, :3].T
                + Tc_cand[:3, 3]
            )
            P2_all = (
                self.map.pt_pos[np.maximum(cur.map_pt, 0)] @ Tc_cur[:3, :3].T
                + Tc_cur[:3, 3]
            )
            ext_assign, n_ext = bow_match.search_by_sim3(
                jnp.asarray(P1_all.astype(np.float32)), cf.kp.desc,
                jnp.asarray(cf.xy), jnp.asarray(cf.octave),
                jnp.asarray(cand_free),
                jnp.asarray(P2_all.astype(np.float32)), cur.kp.desc,
                jnp.asarray(cur.xy), jnp.asarray(cur.octave),
                jnp.asarray(cur_free),
                jnp.asarray(sR.astype(np.float32)),
                jnp.asarray(np.asarray(res.t).astype(np.float32)),
                cam.fx, cam.fy, cam.cx, cam.cy,
                jnp.asarray(self.map.scale_factors),
                jnp.float32(np.log(self.map.scale_factors[1]
                                   / self.map.scale_factors[0])),
                jnp.asarray(
                    self.map.pt_max_dist[np.maximum(cf.map_pt, 0)].astype(
                        np.float32)
                ),
                jnp.asarray(
                    self.map.pt_max_dist[np.maximum(cur.map_pt, 0)].astype(
                        np.float32)
                ),
            )
            if int(n_ext) + int(res.n_inliers) < 40:
                continue
            # refine (S21: cand(1) -> cur(2)? reference optimizes S12 from
            # current to loop candidate; we refine P1 -> P2)
            opt = sim3_opt.optimize_sim3(
                res.R, res.t, res.s,
                jnp.asarray(P2), jnp.asarray(P1),
                jnp.asarray(uv2), jnp.asarray(uv1),
                jnp.asarray(1.0 / sig2), jnp.asarray(1.0 / sig1),
                res.inliers,
                cam.fx, cam.fy, cam.cx, cam.cy,
                fix_scale=fix_scale,
            )
            if int(opt.n_inliers) < 20:
                continue
            # corrected current pose: S_cur_w = S_cand->cur o T_cand_w
            S_rel = np.eye(4, dtype=np.float32)
            S_rel[:3, :3] = np.asarray(opt.R) * float(opt.s)
            S_rel[:3, 3] = np.asarray(opt.t)
            return cand, (S_rel, float(opt.s))
        return None

    # ------------------------------------------------------------- correct

    def _correct_loop(self, kf_id: int, loop_kf: int, S_corr):
        """Propagate the loop correction and run the essential graph."""
        S_rel, scale = S_corr
        m = self.map
        T_cur_old = m.kf_pose[kf_id].copy()
        T_cand = m.kf_pose[loop_kf]
        # corrected current pose: sRt maps cand-cam -> cur-cam; so corrected
        # T_cur_w = S_rel * T_cand_w (with rotation scaled part normalized)
        T_corr = np.eye(4, dtype=np.float32)
        T_corr[:3, :3] = S_rel[:3, :3] / scale
        T_corr[:3, 3] = S_rel[:3, 3] / scale
        T_cur_new = (np.vstack([S_rel[:3], [0, 0, 0, 1]]) @ T_cand)
        T_cur_new[:3, :] /= scale if scale != 0 else 1.0
        # neighborhood correction: apply delta = T_cur_new * T_cur_old^-1
        delta = T_cur_new @ np.linalg.inv(T_cur_old)
        corrected = {kf_id} | {
            k for k, _ in m.covisible_keyframes(kf_id)
        }
        moved_pts = set()
        for k in corrected:
            T_old = m.kf_pose[k]
            T_new = (delta @ T_old).astype(np.float32)
            m.set_kf_pose(k, T_new)
            frame = m.kf_frames[k]
            for pid in frame.map_pt[frame.map_pt >= 0]:
                if pid in moved_pts or not m.pt_alive[pid]:
                    continue
                moved_pts.add(int(pid))
                p = m.pt_pos[pid]
                pc = T_old[:3, :3] @ p + T_old[:3, 3]
                Twc_new = np.linalg.inv(T_new)
                m.pt_pos[pid] = Twc_new[:3, :3] @ pc + Twc_new[:3, 3]

        # essential graph over all alive keyframes
        self._run_essential_graph(kf_id, loop_kf)
        # full map refinement (the reference spawns RunGlobalBundleAdjustment
        # on a thread, LoopClosing.cc:584; inline here)
        from ..solvers.local_ba import global_bundle_adjustment

        global_bundle_adjustment(self.cfg, self.map, n_iters=10)

    def _run_essential_graph(self, kf_id: int, loop_kf: int):
        m = self.map
        alive = [k for k in range(m.n_keyframes) if m.kf_alive[k]]
        slot = {k: i for i, k in enumerate(alive)}
        K = len(alive)
        edges = set()
        for k in alive:
            for nb, w in m.covisible_keyframes(k):
                if w >= 100 and nb in slot:
                    edges.add((min(k, nb), max(k, nb)))
            # sequential (spanning-tree surrogate) edges
            if k - 1 in slot:
                edges.add((k - 1, k))
        edges.add((min(kf_id, loop_kf), max(kf_id, loop_kf)))
        e_i, e_j, e_R, e_t = [], [], [], []
        for a, b in sorted(edges):
            Sji = m.kf_pose[b] @ np.linalg.inv(m.kf_pose[a])
            e_i.append(slot[a])
            e_j.append(slot[b])
            e_R.append(Sji[:3, :3])
            e_t.append(Sji[:3, 3])
        prob = eg.EGProblem(
            R=jnp.asarray(m.kf_pose[alive][:, :3, :3]),
            t=jnp.asarray(m.kf_pose[alive][:, :3, 3]),
            s=jnp.ones(K),
            fixed=jnp.asarray(
                np.array([k == m.origin_kf for k in alive])
            ),
            e_i=jnp.asarray(np.array(e_i, np.int32)),
            e_j=jnp.asarray(np.array(e_j, np.int32)),
            e_R=jnp.asarray(np.stack(e_R).astype(np.float32)),
            e_t=jnp.asarray(np.stack(e_t).astype(np.float32)),
            e_s=jnp.ones(len(e_i)),
            e_valid=jnp.ones(len(e_i), bool),
        )
        R_opt, t_opt, s_opt = eg.optimize_essential_graph(prob)
        R_opt = np.asarray(R_opt)
        t_opt = np.asarray(t_opt)
        s_opt = np.asarray(s_opt)
        for i, k in enumerate(alive):
            T_old = m.kf_pose[k].copy()
            T_new = np.eye(4, dtype=np.float32)
            T_new[:3, :3] = R_opt[i]
            T_new[:3, 3] = t_opt[i] / max(s_opt[i], 1e-9)
            # move this KF's reference points with the pose change
            frame = m.kf_frames[k]
            delta = np.linalg.inv(T_new) @ T_old
            for pid in frame.map_pt[frame.map_pt >= 0]:
                if m.pt_alive[pid] and m.pt_ref_kf[pid] == k:
                    p = m.pt_pos[pid]
                    m.pt_pos[pid] = delta[:3, :3] @ p + delta[:3, 3]
            m.set_kf_pose(k, T_new)
