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
        # optional per-stage wall-clock tracing (tools/bench_loop_closing)
        self.stage_timer = None
        # persistent loop-closure edges (KeyFrame::GetLoopEdges): past
        # closures stay as normal edges in later essential graphs
        self.loop_edges: set = set()
        # deferred global BA (the reference's GBA thread): dispatched at
        # CorrectLoop, merged at the next keyframe event
        self.pending_gba = None
        self.async_gba = bool(getattr(cfg.system, "async_gba", True))

    # ------------------------------------------------------------- helpers

    # vocabularies at ORBvoc scale (~1M leaves) pay ~50-70 ms of cache-
    # hostile host tree descent per transform; route those through the
    # device descent (ops/bow.py, tree resident in HBM) instead
    DEVICE_TRANSFORM_MIN_NODES = 200_000

    def _ensure_bow(self, kf_id: int):
        if kf_id in self.kf_bow:
            return
        frame = self.map.kf_frames[kf_id]
        # ONE tree descent per keyframe feeds both the BowVector and the
        # FeatureVector (DBoW2 transform() computes both in one walk)
        device = len(self.voc.node_desc) >= self.DEVICE_TRANSFORM_MIN_NODES
        leaf = self.voc.transform_nodes(frame.desc, frame.valid,
                                        device=device)
        self.kf_bow[kf_id] = self.voc.bow_vector(frame.desc, nodes=leaf)
        self.kf_nodes[kf_id] = self.voc.feature_nodes(frame.desc, nodes=leaf)

    # ----------------------------------------------------------- main loop

    def _stage(self, name: str):
        import contextlib

        if self.stage_timer is None:
            return contextlib.nullcontext()
        return self.stage_timer.time(name)

    def process_keyframe(self, kf_id: int, fix_scale: bool = True) -> bool:
        """Returns True if a loop was detected and corrected."""
        with self._stage("lc_bow"):
            self._ensure_bow(kf_id)
            self.kfdb.add(kf_id, self.kf_bow[kf_id])
        if self.map.n_keyframes < 11 or kf_id < self.last_loop_kf + 10:
            return False
        with self._stage("lc_detect"):
            candidates = self._detect_loop(kf_id)
        if not candidates:
            return False
        with self._stage("lc_sim3"):
            match = self._compute_sim3(kf_id, candidates, fix_scale)
        if match is None:
            return False
        loop_kf, S_corr, matched = match
        with self._stage("lc_correct"):
            self._correct_loop(kf_id, loop_kf, S_corr, matched,
                               fix_scale=fix_scale)
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
            # FIXED-shape solver calls: padding the m BoW matches to the
            # frame capacity keeps one compiled sim3_ransac/optimize_sim3
            # program per session — the data-dependent (m,) shapes
            # compiled a fresh remote program per loop event (~10 s each,
            # most of the measured 11.7 s ComputeSim3)
            N = cur.desc.shape[0]

            def _pad(a, tail=()):
                out = np.zeros((N,) + tail, np.float32)
                out[:m] = a
                return out

            sig_max = np.ones(N, np.float32)
            sig_max[:m] = np.maximum(sig1, sig2)
            validp = np.zeros(N, bool)
            validp[:m] = True
            res = sim3_solver.sim3_ransac(
                jnp.asarray(_pad(P1, (3,))), jnp.asarray(_pad(P2, (3,))),
                jnp.asarray(_pad(uv1, (2,))), jnp.asarray(_pad(uv2, (2,))),
                jnp.asarray(sig_max),
                jnp.asarray(validp),
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
            inv2 = np.ones(N, np.float32)
            inv2[:m] = 1.0 / sig2
            inv1 = np.ones(N, np.float32)
            inv1[:m] = 1.0 / sig1
            opt = sim3_opt.optimize_sim3(
                res.R, res.t, res.s,
                jnp.asarray(_pad(P2, (3,))), jnp.asarray(_pad(P1, (3,))),
                jnp.asarray(_pad(uv2, (2,))), jnp.asarray(_pad(uv1, (2,))),
                jnp.asarray(inv2), jnp.asarray(inv1),
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
            # the verified loop matches (mvpCurrentMatchedPoints): BoW
            # pairs first, the Sim3 window search fills empty slots
            # (LoopClosing.cc:345-396 SearchByProjection extends in place)
            matched: Dict[int, int] = {}
            ext = np.asarray(ext_assign)
            for cand_feat, cur_feat in zip(ai, bi):
                pid = int(cf.map_pt[cand_feat])
                if pid >= 0 and self.map.pt_alive[pid]:
                    matched[int(cur_feat)] = pid
            for cand_feat in np.nonzero(ext >= 0)[0]:
                cur_feat = int(ext[cand_feat])
                pid = int(cf.map_pt[cand_feat])
                if (cur_feat not in matched and pid >= 0
                        and self.map.pt_alive[pid]):
                    matched[cur_feat] = pid
            return cand, (S_rel, float(opt.s)), matched
        return None

    # ------------------------------------------------------------- correct

    def _propagate_correction(self, kf_id: int, loop_kf: int, S_corr,
                              fix_scale: bool = True):
        """Correct the current KF's covisible neighborhood + their points
        (LoopClosing.cc:438-521). Returns (corrected ids, pre-correction
        poses, corrected Sim3 per KF, point->corrector-KF map)."""
        S_rel, scale = S_corr
        m = self.map
        T_cur_old = m.kf_pose[kf_id].astype(np.float64)
        T_cand = m.kf_pose[loop_kf]
        # corrected current pose as a Sim3 4x4 [sR|t] (mg2oScw =
        # g2oSrel * Scand_w, LoopClosing.cc:310-318); for mono
        # (fix_scale=False) the loop scale rides through the whole
        # neighborhood correction and into the essential graph
        S_cur_new = np.vstack([S_rel[:3], [0, 0, 0, 1]]).astype(
            np.float64) @ T_cand
        if fix_scale:
            # stereo/RGBD: the reference pins the solver scale at 1; if a
            # residual scale leaked through, collapse to SE3 as [R | t/s]
            S_cur_new[:3, :] /= scale if scale != 0 else 1.0
        inv_T_cur_old = np.linalg.inv(T_cur_old)
        corrected = {kf_id} | {
            k for k, _ in m.covisible_keyframes(kf_id)
        }
        # pre-correction poses: the essential graph's normal-edge
        # measurements must come from these (the reference's
        # NonCorrectedSim3, LoopClosing.cc:438-447 / Optimizer.cc:1869-1886
        # — measuring them from the corrected poses would make every
        # residual zero and the graph a no-op)
        uncorrected = {k: m.kf_pose[k].copy() for k in corrected}
        # corrected Sim3 per neighborhood KF (the reference's CorrectedSim3
        # map): g2oCorrectedSiw = g2oSic * mg2oScw (LoopClosing.cc:460-464)
        # — RIGHT-composed so each covisible keeps its pose relative to
        # the current KF; left-composing a world-frame delta would distort
        # any neighbor whose orientation differs from the current KF's
        corrected_sim3: Dict[int, tuple] = {}
        # which points each corrected KF moves (the reference's
        # mnCorrectedByKF/mnCorrectedReference bookkeeping, used by the
        # essential graph's point correction)
        corrected_ref: Dict[int, int] = {}
        for k in corrected:
            T_old = uncorrected[k].astype(np.float64)
            S_new = T_old @ inv_T_cur_old @ S_cur_new
            s_k = float(np.cbrt(np.linalg.det(S_new[:3, :3])))
            R_k = S_new[:3, :3] / s_k
            t_k = S_new[:3, 3]
            corrected_sim3[k] = (R_k.astype(np.float32),
                                 t_k.astype(np.float32), s_k)
            # stored SE3 pose is [R | t/s] (LoopClosing.cc:488-496)
            T_new = np.eye(4, dtype=np.float32)
            T_new[:3, :3] = R_k
            T_new[:3, 3] = t_k / s_k
            m.set_kf_pose(k, T_new)
            # move the KF's points through the scaled Sim3:
            # p_new = Swi_corr.map(Siw_old.map(p)) (LoopClosing.cc:499-505)
            frame = m.kf_frames[k]
            for pid in frame.map_pt[frame.map_pt >= 0]:
                pid = int(pid)
                if pid in corrected_ref or not m.pt_alive[pid]:
                    continue
                corrected_ref[pid] = k
                p = m.pt_pos[pid]
                pc = T_old[:3, :3] @ p + T_old[:3, 3]
                m.pt_pos[pid] = ((R_k.T @ (pc - t_k)) / s_k).astype(
                    np.float32)
        return corrected, uncorrected, corrected_sim3, corrected_ref

    def _correct_loop(self, kf_id: int, loop_kf: int, S_corr,
                      matched: Optional[Dict[int, int]] = None,
                      fix_scale: bool = True):
        """Propagate the loop correction, fuse the loop sides, and run the
        essential graph + global BA."""
        # join any previous deferred GBA before correcting on top of it
        self.collect_gba()
        m = self.map
        # a loop correction rewrites poses + points wholesale: the device
        # mirror's delta tracking can't follow it — force a full resync
        m.mark_all_dirty()
        corrected, uncorrected, corrected_sim3, corrected_ref = (
            self._propagate_correction(kf_id, loop_kf, S_corr, fix_scale)
        )

        # snapshot covisibility before any fusion: new connections created
        # by fusing loop-side points are the loop edges of the essential
        # graph (LoopClosing.cc:553-571 — vpPreviousNeighbors is the cache
        # refreshed during pose correction, before the loop fusion)
        prev_nb = {
            k: {nb for nb, _ in m.covisible_keyframes(k)} for k in corrected
        }

        # "Start Loop Fusion" (LoopClosing.cc:523-541): the Sim3-verified
        # matches replace the current keyframe's duplicates directly — the
        # loop point wins
        cur_frame = m.kf_frames[kf_id]
        for cur_feat, loop_pid in (matched or {}).items():
            if not m.pt_alive[loop_pid]:
                continue
            existing = int(cur_frame.map_pt[cur_feat])
            if existing >= 0 and m.pt_alive[existing]:
                if existing != loop_pid:
                    self._replace_point(loop_pid, existing)
                    m.compute_distinctive_descriptor(loop_pid)
                    m.update_normal_and_depth(loop_pid)
            elif kf_id not in m.pt_obs[loop_pid]:
                m.add_observation(loop_pid, kf_id, cur_feat)
                cur_frame.map_pt[cur_feat] = loop_pid
                m.compute_distinctive_descriptor(loop_pid)
        # fuse the loop side's map points into the corrected neighborhood
        # (LoopClosing::SearchAndFuse, LoopClosing.cc:547-582)
        self._search_and_fuse(sorted(corrected), loop_kf)
        loop_connections: Dict[int, Dict[int, int]] = {}
        for k in corrected:
            new_nb = {
                nb: w for nb, w in m.covisible_keyframes(k)
                if nb not in prev_nb[k] and nb not in corrected
            }
            if new_nb:
                loop_connections[k] = new_nb

        # essential graph over all alive keyframes
        self._run_essential_graph(
            kf_id, loop_kf, uncorrected, loop_connections, corrected_ref,
            corrected_sim3=corrected_sim3, fix_scale=fix_scale,
        )
        # full map refinement. The reference spawns RunGlobalBundleAdjustment
        # on a thread (LoopClosing.cc:584) and merges the result back into a
        # map that kept growing; here the GBA device program is DISPATCHED
        # asynchronously (XLA dispatch returns futures — tracking continues
        # while the chip crunches) and merged at the next keyframe event
        # (collect_gba), including spanning-tree correction of keyframes
        # created in the interim. 40 LM iterations, not the reference's 10:
        # after SearchAndFuse merges the two loop populations their residual
        # offset is the whole loop drift, and an under-converged GBA leaves
        # the merged landmark field internally inconsistent.
        from ..solvers.local_ba import (
            apply_global_ba, global_bundle_adjustment_async,
        )

        self.pending_gba = global_bundle_adjustment_async(
            self.cfg, self.map, n_iters=40
        )
        if not self.async_gba and self.pending_gba is not None:
            apply_global_ba(self.pending_gba, self.map)
            self.pending_gba = None

    def collect_gba(self, only_if_ready: bool = False) -> bool:
        """Merge a pending deferred global BA into the (possibly grown)
        map — the reference's RunGlobalBundleAdjustment merge-back.
        Returns True if a merge happened. only_if_ready: non-blocking
        probe (skip unless the device result already landed)."""
        h = self.pending_gba
        if h is None:
            return False
        if only_if_ready:
            try:
                if not h.res.kf_pose.is_ready():
                    return False
            except AttributeError:
                pass
        from ..solvers.local_ba import apply_global_ba

        self.pending_gba = None
        apply_global_ba(h, self.map)
        return True

    def _replace_point(self, keep: int, kill: int):
        """MapPoint::Replace (the loop point `keep` wins): absorb `kill`'s
        observations, rewire every observing frame's feature slot, and
        retire `kill`."""
        m = self.map
        for okf, ofeat in list(m.pt_obs[kill].items()):
            of = m.kf_frames[okf]
            if okf not in m.pt_obs[keep]:
                m.add_observation(keep, okf, ofeat)
                of.map_pt[ofeat] = keep
            else:
                of.map_pt[ofeat] = -1
        m.retire_point(kill)
        m.pt_found[keep] += m.pt_found[kill]
        m.pt_visible[keep] += m.pt_visible[kill]

    def _search_and_fuse(self, corrected_kfs, loop_kf: int):
        """LoopClosing::SearchAndFuse (547-582): project the loop side's
        map points (loop KF + its covisibles) into every corrected
        keyframe with the already-corrected poses; radius 4 (ORBmatcher::
        Fuse(Scw, ...) th=4). On conflict the LOOP point wins — the
        reference calls pRep->Replace(pLoopMP) unconditionally.

        Device shape: all (corrected KF x loop point) projections +
        window searches + Hamming as ONE dispatch (the same
        fuse_into_keyframes program local mapping uses, with scw=True:
        the Scw variant of ORBmatcher.cc:983-1106 — no per-candidate
        reprojection gate, level window [pred-1, pred]); host applies
        the Replace bookkeeping."""
        from ..ops import match as match_ops

        m = self.map
        cam = self.cfg.camera

        loop_side = [loop_kf] + [k for k, _ in m.covisible_keyframes(loop_kf)]
        loop_pts = set()
        for k in loop_side:
            if not m.kf_alive[k]:
                continue
            lf = m.kf_frames[k]
            for p in lf.map_pt[lf.map_pt >= 0]:
                if m.pt_alive[p]:
                    loop_pts.add(int(p))
        targets = [k for k in corrected_kfs if m.kf_alive[k]]
        loop_pts = sorted(loop_pts)
        if not loop_pts or not targets:
            return
        pid_arr = np.asarray(loop_pts, np.int64)
        p_cap = 1024
        while p_cap < len(loop_pts):
            p_cap *= 2
        nb_cap = 1
        while nb_cap < len(targets):
            nb_cap *= 2

        mask = np.zeros((nb_cap, p_cap), bool)
        mask[: len(targets), : len(loop_pts)] = True
        pos = np.zeros((p_cap, 3), np.float32)
        desc = np.zeros((p_cap, 32), np.uint8)
        normal = np.zeros((p_cap, 3), np.float32)
        mind = np.ones(p_cap, np.float32)
        maxd = np.ones(p_cap, np.float32)
        pos[: len(loop_pts)] = m.pt_pos[pid_arr]
        desc[: len(loop_pts)] = m.pt_desc[pid_arr]
        normal[: len(loop_pts)] = m.pt_normal[pid_arr]
        mind[: len(loop_pts)] = m.pt_min_dist[pid_arr]
        maxd[: len(loop_pts)] = m.pt_max_dist[pid_arr]

        frames = [m.kf_frames[k] for k in targets]
        f0 = frames[0]
        pad = nb_cap - len(targets)
        sf = m.scale_factors
        assign = match_ops.fuse_into_keyframes(
            jnp.stack([f.kp.xy for f in frames] + [f0.kp.xy] * pad),
            jnp.stack([f.kp.octave for f in frames] + [f0.kp.octave] * pad),
            jnp.stack([f.kp.desc for f in frames] + [f0.kp.desc] * pad),
            jnp.stack([f.kp.valid for f in frames] + [f0.kp.valid] * pad),
            jnp.asarray(np.stack(
                [np.asarray(f.u_right) for f in frames]
                + [np.asarray(f0.u_right)] * pad
            ).astype(np.float32)),
            jnp.asarray(np.stack(
                [m.kf_pose[k] for k in targets]
                + [m.kf_pose[targets[0]]] * pad
            ).astype(np.float32)),
            jnp.asarray(pos), jnp.asarray(desc), jnp.asarray(normal),
            jnp.asarray(mind), jnp.asarray(maxd), jnp.asarray(mask),
            jnp.asarray(sf), jnp.float32(np.log(sf[1] / sf[0])
                                         if len(sf) > 1 else 1.0),
            jnp.float32(cam.fx), jnp.float32(cam.fy),
            jnp.float32(cam.cx), jnp.float32(cam.cy),
            jnp.float32(cam.width), jnp.float32(cam.height),
            jnp.float32(cam.bf),
            jnp.float32(4.0),
            scw=True,
        )
        assign = np.asarray(assign)[: len(targets)]  # one download

        touched = set()
        n_replaced = n_added = 0
        merge_dists = []
        for t, nb in enumerate(targets):
            frame = m.kf_frames[nb]
            for i in np.nonzero(assign[t] >= 0)[0]:
                pid = int(pid_arr[i])
                if not m.pt_alive[pid] or nb in m.pt_obs[pid]:
                    continue
                feat = int(assign[t, i])
                existing = int(frame.map_pt[feat])
                if existing >= 0 and m.pt_alive[existing]:
                    if existing == pid:
                        continue
                    n_replaced += 1
                    merge_dists.append(float(np.linalg.norm(
                        m.pt_pos[pid] - m.pt_pos[existing])))
                    self._replace_point(pid, existing)
                    touched.add(pid)
                else:
                    m.add_observation(pid, nb, feat)
                    frame.map_pt[feat] = pid
                    touched.add(pid)
                    n_added += 1
        for pid in touched:
            if m.pt_alive[pid]:
                m.compute_distinctive_descriptor(pid)
                m.update_normal_and_depth(pid)
        self.last_fuse_stats = {
            "targets": len(targets), "loop_pts": len(loop_pts),
            "replaced": n_replaced, "added": n_added,
            "merge_dist_med": float(np.median(merge_dists))
            if merge_dists else 0.0,
            "merge_dist_p90": float(np.percentile(merge_dists, 90))
            if merge_dists else 0.0,
        }

    def _run_essential_graph(
        self,
        kf_id: int,
        loop_kf: int,
        uncorrected: Optional[Dict[int, "np.ndarray"]] = None,
        loop_connections: Optional[Dict[int, Dict[int, int]]] = None,
        corrected_ref: Optional[Dict[int, int]] = None,
        corrected_sim3: Optional[Dict[int, tuple]] = None,
        fix_scale: bool = True,
    ):
        """Optimizer::OptimizeEssentialGraph (Optimizer.cc:1753-2016).

        Vertex init = current poses, with the corrected neighborhood's
        vertices seeded from the full CorrectedSim3 (scale included — the
        reference's vScw, Optimizer.cc:1814-1831); the loop keyframe is
        the fixed gauge. Edge measurements follow the reference exactly:

        * loop edges — the new covisibility connections created by the
          fuse (weight >= 100; the cur<->loop pair always) — are measured
          from the CORRECTED Sim3s: they encode the loop constraint
          (including its scale, which the graph distributes around the
          cycle for mono);
        * normal edges (sequential spanning-tree surrogate, covisibility
          >= 100, past loop closures) are measured from the PRE-correction
          poses (`uncorrected`, the reference's NonCorrectedSim3): they
          encode the odometry, so optimizing distributes the loop
          discontinuity around the whole cycle.

        Afterwards every map point is moved by its reference keyframe's
        Sim3 delta (points already moved by CorrectLoop use the keyframe
        that corrected them, per mnCorrectedReference).
        """
        m = self.map
        uncorrected = uncorrected or {}
        loop_connections = loop_connections or {}
        corrected_ref = corrected_ref or {}
        corrected_sim3 = corrected_sim3 or {}
        alive = [k for k in range(m.n_keyframes) if m.kf_alive[k]]
        slot = {k: i for i, k in enumerate(alive)}
        K = len(alive)

        def scw(k, corrected_meas):
            """vScw semantics as a 4x4 [sR|t]: corrected Sim3 for the
            neighborhood when measuring corrected edges; NonCorrectedSim3
            (pre-correction SE3) otherwise; plain current pose for
            keyframes outside the neighborhood."""
            if corrected_meas and k in corrected_sim3:
                R, t, s = corrected_sim3[k]
                M = np.eye(4)
                M[:3, :3] = s * np.asarray(R, np.float64)
                M[:3, 3] = t
                return M
            if not corrected_meas:
                return uncorrected.get(k, m.kf_pose[k]).astype(np.float64)
            return m.kf_pose[k].astype(np.float64)

        inserted = set()
        e_i, e_j, e_R, e_t, e_s = [], [], [], [], []

        def add_edge(a, b, corrected_meas):
            key = (min(a, b), max(a, b))
            if key in inserted or a not in slot or b not in slot:
                return
            inserted.add(key)
            # Sji = Sjw o Siw^-1; 4x4 [sR|t] matrices compose/invert as
            # Sim3s under plain matmul/inverse
            Sji = scw(b, corrected_meas) @ np.linalg.inv(
                scw(a, corrected_meas))
            s_ji = float(np.cbrt(np.linalg.det(Sji[:3, :3])))
            e_i.append(slot[a])
            e_j.append(slot[b])
            e_R.append(Sji[:3, :3] / s_ji)
            e_t.append(Sji[:3, 3])
            e_s.append(s_ji)

        # loop edges first (corrected measurements)
        add_edge(kf_id, loop_kf, True)
        for a, nbs in loop_connections.items():
            for b, w in nbs.items():
                if w >= 100:
                    add_edge(a, b, True)
        # normal edges (pre-correction measurements)
        for a, b in self.loop_edges:
            add_edge(a, b, False)
        for k in alive:
            if k - 1 in slot:
                add_edge(k - 1, k, False)
            for nb, w in m.covisible_keyframes(k):
                if w >= 100:
                    add_edge(k, nb, False)

        # vertex init: full corrected Sim3 for the neighborhood, SE3
        # elsewhere (Optimizer.cc:1814-1831)
        R0 = m.kf_pose[alive][:, :3, :3].astype(np.float32).copy()
        t0 = m.kf_pose[alive][:, :3, 3].astype(np.float32).copy()
        s0 = np.ones(K, np.float32)
        for k, (Rk, tk, sk) in corrected_sim3.items():
            if k in slot:
                i = slot[k]
                R0[i], t0[i], s0[i] = Rk, tk, sk

        prob = eg.EGProblem(
            R=jnp.asarray(R0),
            t=jnp.asarray(t0),
            s=jnp.asarray(s0),
            fixed=jnp.asarray(np.array([k == loop_kf for k in alive])),
            e_i=jnp.asarray(np.array(e_i, np.int32)),
            e_j=jnp.asarray(np.array(e_j, np.int32)),
            e_R=jnp.asarray(np.stack(e_R).astype(np.float32)),
            e_t=jnp.asarray(np.stack(e_t).astype(np.float32)),
            e_s=jnp.asarray(np.array(e_s, np.float32)),
            e_valid=jnp.ones(len(e_i), bool),
        )
        R_opt, t_opt, s_opt = eg.optimize_essential_graph(
            prob, fix_scale=fix_scale)
        R_opt = np.asarray(R_opt, np.float64)
        t_opt = np.asarray(t_opt, np.float64)
        s_opt = np.asarray(s_opt, np.float64)
        self.loop_edges.add((min(kf_id, loop_kf), max(kf_id, loop_kf)))

        # per-KF Sim3 delta (vertex init -> optimized), then move each
        # point by its reference keyframe's delta: p_new =
        # correctedSwr.map(Srw.map(p)) (Optimizer.cc:1964-2014)
        deltas = {}
        for i, k in enumerate(alive):
            M_init = np.eye(4)
            M_init[:3, :3] = s0[i] * R0[i].astype(np.float64)
            M_init[:3, 3] = t0[i]
            M_new = np.eye(4)
            M_new[:3, :3] = s_opt[i] * R_opt[i]
            M_new[:3, 3] = t_opt[i]
            deltas[k] = np.linalg.inv(M_new) @ M_init
            # stored SE3 pose = [R | t/s] (Optimizer.cc:1950-1961)
            T_new = np.eye(4, dtype=np.float32)
            T_new[:3, :3] = R_opt[i]
            T_new[:3, 3] = t_opt[i] / max(s_opt[i], 1e-9)
            m.set_kf_pose(k, T_new)
        for pid in range(m.n_points):
            if not m.pt_alive[pid]:
                continue
            ref = corrected_ref.get(pid, int(m.pt_ref_kf[pid]))
            d = deltas.get(ref)
            if d is None:
                continue
            p = m.pt_pos[pid]
            m.pt_pos[pid] = (d[:3, :3] @ p + d[:3, 3]).astype(np.float32)
            m.update_normal_and_depth(pid)
